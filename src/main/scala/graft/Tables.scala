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
  /** Exact row count from parquet FOOTER metadata — driver-side file-status
    * + footer reads, NO Spark job. The cheap way to size algorithm
    * parameters (LSH bucket counts, sample rates) at plan-construction
    * time: row-group counts are exact in every parquet footer. At lake
    * scale prefer catalog statistics or an explicitly supplied N; this
    * helper covers path-addressed tables without a catalog.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[org.apache.hadoop.fs.FileStatus] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet"))
      else Seq(fs.getFileStatus(p))
    files.map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

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
