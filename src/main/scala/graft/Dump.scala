package graft

/** Ad-hoc query inspector: prints schema + rows of one registered query
  * (used to freeze literal-VALUES oracles and debug hash mismatches). */
object Dump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    Harness.withSession("4", logLevel = "ERROR") { spark =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.printSchema()
      if (args.length > 2) {
        val lines = df.toJSON.collect().mkString("\n")
        java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
          lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } else df.show(200, truncate = false)
    }
  }
}
