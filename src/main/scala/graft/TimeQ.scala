package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: runs one registered query N times in one JVM
  * (Bench conditions — same session, caches warm after the first pass)
  * and prints each pass's wall time. Usage: TimeQ <name> [sfDir] [n]. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      (1 to n).foreach { i =>
        name.split(",").foreach { nm =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(nm)(spark, sfDir)
          val t1 = System.nanoTime()
          val rows = df.count()
          val t2 = System.nanoTime()
          println(f"[timeq] $nm pass $i: build ${(t1 - t0) / 1e9}%.3f s + count ${(t2 - t1) / 1e9}%.3f s ($rows rows)")
          if (sys.env.contains("GRAFT_EXPLAIN"))
            println(s"[timeq] plan pass $i:\n" + df.queryExecution.executedPlan.toString.take(3000))
        }
      }
    } finally {
      queries.TextOps.clearCaches()
      queries.StreamOps.clearCaches()
      queries.EventOps.clearCaches()
      spark.stop()
    }
  }
}
