package graft.tools

/** Dev utility: Bench-identical timing (construct + noop action) of one or
  * more registered queries (comma-separated) — construction cost is
  * invisible to Explain. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args.lift(0).getOrElse("pagerank_parts").split(',')
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STAGES=1: per-stage wall/run/cpu/gc breakdown — the
    // evidence layer under the per-query number (task-width pathologies,
    // GC-bound stages, and construct-time jobs all show up here).
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val dur = for {a <- i.submissionTime; b <- i.completionTime} yield b - a
            val m = i.taskMetrics
            println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
              f"wall=${dur.getOrElse(-1L)}ms run=${m.executorRunTime}ms " +
              f"cpu=${m.executorCpuTime / 1000000}ms gc=${m.jvmGCTime}ms " +
              i.name.take(50))
          }
        })
    spark.range(100).selectExpr("id", "sha2(cast(id as string), 256) as h")
      .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[bench1] $name construct=${(t1 - t0) / 1e9}%.2fs action=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
