package graft

/** Ad-hoc per-query timer: runs registered queries (comma-separated) N
  * times in one JVM (Bench conditions — same session, caches warm after
  * the first pass) and prints each pass's build + count wall time.
  * Usage: TimeQ <name>[,<name>...] [sfDir] [n]. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Harness.withSession(cpus, logLevel = "ERROR") { spark =>
      (1 to n).foreach { i =>
        names.foreach { nm =>
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
    }
  }
}
