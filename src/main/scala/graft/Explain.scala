package graft

/** Plan-audit entrypoint: prints the formatted physical plan for each named
  * query (all queries when no names given) against `SPARK_GRAFT_SF_DIR`.
  * The dev loop behind PLANS.md — check pushdown/exchange/codegen shape
  * without a full run. NB "construct-time" work still executes: queries
  * with eager builds (the memoized graph checkpoint, parquet-footer row
  * counts, round-trip scratch writes) run those jobs during plan
  * construction, so explaining everything at a large SF is not free.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(master = s"local[$cpus]",
        shufflePartitions = Some(cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                else args.toSeq
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown: ${unknown.toSeq.sorted.mkString(", ")}")
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
