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
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
    val untaggedN = exchanges(probe.join(plain, "k"))
    val taggedN = exchanges(probe.join(tagged, "k"))
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
}
