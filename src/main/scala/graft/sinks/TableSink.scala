package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Table-shaped sinks for the 100 TB layout story (K1 generalized).
  *
  * - [[writePartitioned]]: date/category-partitioned parquet — partition
  *   pruning turns time-window queries into directory listings; the
  *   reference reloads its whole CSV every run (`src/sql_to_kafka.py:127`),
  *   this is the layout that makes that unnecessary.
  * - [[writeBucketed]]: hash-bucketed + sorted `saveAsTable` — joins and
  *   aggregations on the bucket key skip the exchange entirely (verified
  *   in TableSinkSpec by asserting no Exchange in the plan).
  */
object TableSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCol: Option[String] = None,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
