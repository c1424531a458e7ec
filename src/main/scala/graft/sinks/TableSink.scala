package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

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

  /** K5: idempotent catalog DDL — `CREATE TABLE IF NOT EXISTS` from a
    * typed schema (the reference's 26-column products DDL,
    * `/root/reference/src/sql_to_kafka.py:69-105`, whose SQLite types map
    * TEXT→STRING, REAL→DOUBLE in [[graft.schemas.ProductSchemas.flat]]).
    * Generated through the catalog API, not string-pasted DDL, so the
    * schema stays a single source of truth; returns true when the table
    * was created, false when it already existed (the reference logs
    * "created or already exists" — same contract).
    */
  def createIfNotExists(spark: SparkSession, table: String, schema: StructType,
                        provider: String = "parquet"): Boolean = {
    if (spark.catalog.tableExists(table)) false
    else try {
      spark.catalog.createTable(table, provider, schema, Map.empty[String, String])
      true
    } catch {
      // lost a create race (concurrent job init) — same outcome as exists
      case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException => false
    }
  }
}
