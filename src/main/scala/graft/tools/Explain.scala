package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one registered query with timing and dump its
  * formatted physical plan. Usage:
  *   runMain graft.tools.Explain <queryName> [sfDir] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--plan")) println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    def force(): Long =
      if (args.contains("--noop")) {
        df.write.format("noop").mode("overwrite").save(); -1L
      } else df.count()
    val t0 = System.nanoTime()
    val n = force()
    val t1 = System.nanoTime()
    force()
    val t2 = System.nanoTime()
    println(f"[explain] $name rows=$n first=${(t1 - t0) / 1e9}%.2fs second=${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
