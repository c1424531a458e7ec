package graft.tools


/** Dev utility: run one registered query with timing and dump its
  * formatted physical plan. Usage:
  *   runMain graft.tools.Explain <queryName> [sfDir] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    // Same conf as Bench/Verify (GraftSession) so profiled plans are the
    // plans the bench actually runs.
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `name` may be comma-separated: earlier names warm the session the
    // way the bench does (shared file-index/codegen caches), the LAST name
    // is the one being profiled (timed twice).
    name.split(',').foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (args.contains("--plan")) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      def force(): Long =
        if (args.contains("--noop")) {
          df.write.format("noop").mode("overwrite").save(); -1L
        } else df.count()
      val t0 = System.nanoTime()
      val rows = force()
      val t1 = System.nanoTime()
      force()
      val t2 = System.nanoTime()
      println(f"[explain] $n rows=$rows first=${(t1 - t0) / 1e9}%.2fs second=${(t2 - t1) / 1e9}%.2fs")
      if (args.contains("--finalplan"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
