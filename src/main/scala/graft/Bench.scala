package graft

/** Benchmark entrypoint (driver contract): runs every registered query
  * against `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query
  * seconds. Uses the same session config as [[GraftSession]] so the bench
  * measures the engine at its shipped settings (AQE + partition coalescing
  * + skew-join handling), not a bare-bones session.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Shuffle partitions: CPUs give the parallelism ceiling, but at bench
    // scale (sf<=0.1, ~1e5-row shuffles) 32 partitions is pure fixed cost —
    // scheduler rounds, 32 tiny files per exchange. AQE's coalescer only
    // shrinks below `defaultParallelism` when parallelismFirst=false, so we
    // set that (also the documented recommendation for busy clusters) and
    // let the advisory size pick the real width at any scale.
    val spark = GraftSession.builder(master = s"local[$cpus]",
        shufflePartitions = Some(cpus))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_BYTES", "16m"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the write path + codegen stack once so one-time JVM costs
    // (noop DataSource ServiceLoader scan, Janino bootstrap, JIT) don't
    // land on whichever query happens to run first.
    spark.range(100).selectExpr("id", "sha2(cast(id as string), 256) as h")
      .write.format("noop").mode("overwrite").save()
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation of every output column —
      // a bare count() would let Catalyst prune projections and
      // under-report (flatteringly) the real query cost.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) =>
      val mark = if (failed.contains(k)) "\"failed\"" else v.toString
      s"\"" + k + "\":" + mark
    }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":${failed.size},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
