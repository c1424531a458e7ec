package graft.tools

/** Dev utility: print the formatted physical plan of registered queries. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val names = args.lift(0).getOrElse("weighted_median_price").split(',')
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[4]",
      shufflePartitions = Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
