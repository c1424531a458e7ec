package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet test-table access (TESTDATA.md). One parquet file per table under
  * the scale-factor dir the driver passes to every query.
  *
  * Scans stay plain `spark.read.parquet` so Catalyst's data-source V2 path
  * keeps predicate pushdown, column pruning, and vectorized decoding — at
  * 100 TB these tables would be partitioned directories instead of single
  * files and nothing here would change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS); Spark's vectorized
    * reader needs `spark.sql.legacy.parquet.nanosAsLong` (or rebasing) for
    * it. Loading via this helper normalizes `ts` to a TimestampType column
    * (microsecond precision) regardless of which mode the session is in.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: double division of epoch-nanos loses
        // sub-microsecond precision (2^53 < 1e18) and can shift a value
        // across a truncation boundary.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
