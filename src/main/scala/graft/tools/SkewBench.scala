package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Measured before/after for the manual skew ops (PLANS.md §Skew).
  *
  * Builds a 90%-hot-key fact from events (sf dir arg) against a synthetic
  * dimension, then times, with broadcast disabled (forcing a shuffle join,
  * the shape where key skew hurts):
  *   1. plain join, AQE skew-splitting OFF  — the unmitigated baseline
  *   2. Skew.saltedJoin,  AQE OFF           — manual mitigation
  *   3. plain join, AQE skew-splitting ON   — the engine default
  *
  * Usage: runMain graft.tools.SkewBench [sfDir] [salts]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val salts = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of fact rows share one key; dimension too big to broadcast is
    // simulated by disabling broadcast outright.
    // localCheckpoint RETURNS the pinned frame (the result was previously
    // discarded, so every timed variant re-ran the scan + projection and
    // the isolation premise failed)
    val fact = graft.Tables.events(spark, sfDir)
      .select(when(col("user_id") % 10 =!= 0, lit(0L))
        .otherwise(col("user_id")).as("k"),
        col("value"))
      .localCheckpoint()
    val dim = spark.range(0, 2000).select(col("id").as("k"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .localCheckpoint()

    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("b"))

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[skew] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("plain join, AQE skew off") {
      agg(fact.join(dim, Seq("k"))).write.format("noop").mode("overwrite").save()
    }
    time("salted join, AQE skew off") {
      agg(Skew.saltedJoin(fact, dim, "k", salts))
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("plain join, AQE skew on") {
      agg(fact.join(dim, Seq("k"))).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
