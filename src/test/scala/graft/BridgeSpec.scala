package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** The checkpoint-layout re-declaration ([[Bridge.tagHashPartitioned]] /
  * [[Tables.checkpointHashPartitioned]]): the declared `HashPartitioning`
  * must (a) be semantically inert — joins/aggregates on the tagged frame
  * return exactly what the untagged frame returns — and (b) actually
  * elide the tagged side's exchange. A wrong declaration would MIS-JOIN
  * silently, so (a) is checked on a join whose every row would move under
  * a wrong layout.
  */
class BridgeSpec extends SparkSpec {

  private def ranked = {
    import spark.implicits._
    (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
  }

  test("tagged checkpoint joins exactly like the untagged one") {
    val n = spark.sparkContext.defaultParallelism
    val plain = ranked.repartition(n, col("k")).localCheckpoint()
    val tagged = Bridge.tagHashPartitioned(plain, Seq("k"), n)
    val probe = ranked.select(col("k"), (col("k") * 2).as("w"))
    val a = probe.join(plain, "k").select(col("k"), col("v"), col("w"))
      .orderBy("k").collect()
    val b = probe.join(tagged, "k").select(col("k"), col("v"), col("w"))
      .orderBy("k").collect()
    assert(a.length == 1000 && a.sameElements(b))
  }

  test("tagged side's exchange is elided; untagged side's is not") {
    val n = spark.sparkContext.defaultParallelism
    val plain = ranked.repartition(n, col("k")).localCheckpoint()
    val tagged = Bridge.tagHashPartitioned(plain, Seq("k"), n)
    val probe = ranked.select(col("k"), (col("k") * 2).as("w"))
      .hint("shuffle_hash")
    val untaggedN = hashExchangeCount(probe.join(plain, "k"))
    val taggedN = hashExchangeCount(probe.join(tagged, "k"))
    assert(taggedN == untaggedN - 1,
      s"tag should remove exactly the checkpoint-side exchange " +
        s"($untaggedN -> $taggedN)")
  }

  test("stats survive the re-tag (broadcast decisions stay intact)") {
    val n = spark.sparkContext.defaultParallelism
    val plain = ranked.repartition(n, col("k")).localCheckpoint()
    val tagged = Bridge.tagHashPartitioned(plain, Seq("k"), n)
    val before = plain.queryExecution.optimizedPlan.stats.sizeInBytes
    val after = tagged.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(after == before, s"sizeInBytes changed: $before -> $after")
    assert(after < Long.MaxValue / 2, "checkpoint lost its measured size")
  }

  test("declared partition count must match the RDD") {
    val n = spark.sparkContext.defaultParallelism
    val plain = ranked.repartition(n, col("k")).localCheckpoint()
    assertThrows[IllegalArgumentException](
      Bridge.tagHashPartitioned(plain, Seq("k"), n + 1))
  }

  test("non-checkpoint input and unknown key are rejected") {
    val n = spark.sparkContext.defaultParallelism
    assertThrows[IllegalArgumentException](
      Bridge.tagHashPartitioned(ranked, Seq("k"), n))
    val plain = ranked.repartition(n, col("k")).localCheckpoint()
    assertThrows[IllegalArgumentException](
      Bridge.tagHashPartitioned(plain, Seq("nope"), n))
  }

  test("layout validator catches a declaration the rows don't have") {
    // SparkSpec turns Bridge.ValidateLayoutKey on for every spec run, so
    // this is the validator's proof: rows physically laid out by k2=k+1
    // but DECLARED as hash(k) — the silent-mis-join scenario — must fail
    // loud at tag time instead of mis-joining downstream.
    val n = spark.sparkContext.defaultParallelism
    val wrong = ranked.withColumn("k2", col("k") + 1)
      .repartition(n, col("k2")).localCheckpoint()
    val ex = intercept[IllegalArgumentException](
      Bridge.tagHashPartitioned(wrong, Seq("k"), n))
    assert(ex.getMessage.contains("does not have the declared layout"),
      ex.getMessage)
    // and a CORRECT declaration passes the same row-by-row validation
    val right = ranked.repartition(n, col("k")).localCheckpoint()
    assert(Bridge.tagHashPartitioned(right, Seq("k"), n).count() == 1000)
  }

  test("sampled validator mode catches a wrong declaration cheaply") {
    // `sample` mode checks only the first Bridge.SampleRows rows per
    // partition (O(partitions·64), cheap enough for prod) — prove it still
    // catches the silent-mis-join scenario: a wrong key declaration
    // mis-places rows in every partition, so the per-partition prefix
    // sample must hit one.
    val n = spark.sparkContext.defaultParallelism
    val prev = spark.conf.get(Bridge.ValidateLayoutKey)
    spark.conf.set(Bridge.ValidateLayoutKey, "sample")
    try {
      val wrong = ranked.withColumn("k2", col("k") + 1)
        .repartition(n, col("k2")).localCheckpoint()
      val ex = intercept[IllegalArgumentException](
        Bridge.tagHashPartitioned(wrong, Seq("k"), n))
      assert(ex.getMessage.contains("does not have the declared layout"),
        ex.getMessage)
      // and a correct declaration passes sampled validation AND still
      // elides the exchange downstream
      val right = ranked.repartition(n, col("k")).localCheckpoint()
      val tagged = Bridge.tagHashPartitioned(right, Seq("k"), n)
      val probe = ranked.select(col("k"), (col("k") * 2).as("w"))
        .hint("shuffle_hash")
      assert(hashExchangeCount(probe.join(tagged, "k")) ==
        hashExchangeCount(probe.join(right, "k")) - 1)
    } finally spark.conf.set(Bridge.ValidateLayoutKey, prev)
  }

  test("duplicate key names in the checkpoint output are rejected") {
    // first-match resolution over duplicate names could tag the WRONG
    // attribute (round-12 ADVICE) — ambiguity must throw, not guess
    val n = spark.sparkContext.defaultParallelism
    val dup = ranked.repartition(n, col("k"))
      .select(col("k"), col("v"), (col("k") * 1).as("k"))
      .localCheckpoint()
    val ex = intercept[IllegalArgumentException](
      Bridge.tagHashPartitioned(dup, Seq("k"), n))
    assert(ex.getMessage.contains("ambiguous"), ex.getMessage)
  }
}
