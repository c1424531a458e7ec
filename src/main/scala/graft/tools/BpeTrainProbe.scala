package graft.tools

/** Dev utility: per-round cost linearity probe for the BPE merge trainer
  * (round-9 verdict #4 "done" criterion). Times bpeTrainMerges at the
  * given round counts (default 8,16,32) and prints seconds-per-round —
  * with the BpeRecheckpointEvery chain-depth bound the per-round cost
  * must stay flat (±20%) as R grows, where the unbounded replace chain
  * grew it linearly in R (O(R²·corpus) total).
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.lift(0).getOrElse("8,16,32").split(',').map(_.toInt)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).selectExpr("id", "sha2(cast(id as string), 256) as h")
      .write.format("noop").mode("overwrite").save()
    // JIT/reader warm pass, unmeasured
    graft.ops.LlmData.bpeTrainMerges(spark, dir, 2).collect()
    rounds.foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.ops.LlmData.bpeTrainMerges(spark, dir, r).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] rounds=$r merges=$n total=$sec%.2fs " +
        f"per_round=${sec / r}%.3fs")
    }
    spark.stop()
  }
}
