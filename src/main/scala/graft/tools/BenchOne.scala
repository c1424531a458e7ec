package graft.tools

/** Dev utility: Bench-identical timing (construct + noop action) of one
  * registered query — construction cost is invisible to Explain. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("pagerank_parts")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).selectExpr("id", "sha2(cast(id as string), 256) as h")
      .write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    println(f"[bench1] $name construct=${(t1 - t0) / 1e9}%.2fs action=${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
