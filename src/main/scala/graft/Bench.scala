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
    // optional args: bench only the named queries (dev loop for chasing a
    // single regression without the 100-second full sweep). The driver
    // contract (no args = every query) is unchanged. Unknown names fail
    // loudly — a typo would otherwise bench NOTHING and print a 0-second
    // "all clear".
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: " +
        s"${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // AQE coalescing below defaultParallelism (parallelismFirst=false +
    // advisory size) now lives in GraftSession.builder so Bench, Verify,
    // and production jobs all run the same conf.
    val spark = GraftSession.builder(master = s"local[$cpus]",
        shufflePartitions = Some(cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the write path + codegen stack once so one-time JVM costs
    // (noop DataSource ServiceLoader scan, Janino bootstrap, JIT) don't
    // land on whichever query happens to run first.
    spark.range(100).selectExpr("id", "sha2(cast(id as string), 256) as h")
      .write.format("noop").mode("overwrite").save()
    // ...and the shuffle/aggregate/join/generator machinery: exchange
    // write+read, hash + object-hash aggregation, a broadcast join, and a
    // generator, on 20 K synthetic rows. Without this the first heavy
    // query absorbs seconds of one-time Janino/JIT bootstrap for these
    // code paths that belongs to the JVM, not the query (measured ~4.5 s
    // cold-vs-warm on an identical pagerank run at sf0.1).
    locally {
      import org.apache.spark.sql.functions._
      val dim = spark.range(0, 500).selectExpr("id AS e2")
      spark.range(0, 20000).selectExpr("id % 500 AS k", "id AS v")
        .repartition(4, col("k"))
        .groupBy("k").agg(collect_set(col("v")).as("s"), sum(col("v")).as("sv"))
        .select(explode(col("s")).as("e"), col("sv"))
        .join(broadcast(dim), col("e") % 500 === col("e2"))
        .groupBy(col("e2")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    var failed = List.empty[String]
    var construct = Map.empty[String, Double]
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation of every output column —
      // a bare count() would let Catalyst prune projections and
      // under-report (flatteringly) the real query cost.
      try {
        // constructed separately: driver-coordinated operators (k-means,
        // connected components) run Spark jobs at plan-construction time,
        // which Explain-style action timing cannot see.
        val df = fn(spark, sfDir)
        construct += name -> (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision: full-precision doubles bloat the line ~2×
    // and the driver's stdout capture keeps only a bounded tail.
    def ms(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) =>
      val mark = if (failed.contains(k)) "\"failed\"" else ms(v)
      s"\"" + k + "\":" + mark
    }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // value = sum over SUCCESSFUL queries only (time-to-failure is not a
    // meaningful cost; mixing it in makes totals incomparable across runs).
    // total_all keeps the raw wall-clock sum for completeness.
    val totalOk = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    val totalAll = if (results.nonEmpty) results.values.sum else 0.0
    // construction seconds only for queries where it is material (>0.2s)
    val cs = construct.filter(_._2 > 0.2)
      .map { case (k, v) => s"""\"$k\":${ms(v)}""" }.mkString("{", ",", "}")
    // ONE JSON line (driver contract). The big per-query maps go FIRST and
    // the headline fields LAST: a tail-bounded capture of this line then
    // still retains metric/value/failures/sf even when the head is cut
    // (observed driver-side in earlier rounds). Key order is irrelevant to
    // any JSON parser, so a full capture reads identically.
    val line = s"""{"queries":$qs,"construct":$cs,"failed":$failedJson,"metric":"total","value":${ms(totalOk)},"unit":"sec","total_all":${ms(totalAll)},"failures":${failed.size},"cpus":$cpus,"sf":"$sfDir"}"""
    println(line)
    // Durable full copy for when stdout capture truncates the line.
    try {
      val w = new java.io.PrintWriter("BENCH_LAST.json")
      try w.println(line) finally w.close()
    } catch { case _: java.io.IOException => () } // best-effort artifact
    spark.stop()
  }
}
