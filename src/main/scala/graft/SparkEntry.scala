package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain query registries. Every SQL-expressible query
  * has a DuckDB oracle in [[oracleSql]]; non-SQL-expressible ops (custom XML
  * render, minhash internals) are registered without an oracle and get the
  * driver's rows-only check plus ScalaTest golden tests.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("recent_created_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = Seq(
      ops.Relational.queries, ops.Serialization.queries,
      ops.LlmData.queries, ops.StreamingOps.queries, ops.Skew.queries,
      ops.Curation.queries, ops.Analytics.queries, ops.Stats.queries,
      ops.Learn.queries)
    // ++ on Maps silently keeps the LAST duplicate — a registry collision
    // would shadow one query's oracle with another's (caught once: a
    // second snapshot_diff_orders overrode the first in the same file's
    // Map literal, which even this check can't see — so each module map
    // is also size-asserted against its key list where authored).
    val dup = parts.flatMap(_.keys)
      .groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    require(dup.isEmpty, s"duplicate query names across modules: ${dup.toSeq.sorted.mkString(", ")}")
    parts.reduce(_ ++ _)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.LlmData.oracle ++ ops.StreamingOps.oracle ++
      ops.Skew.oracle ++ ops.Serialization.oracle ++ ops.Curation.oracle ++
      ops.Analytics.oracle ++ ops.Stats.oracle ++ ops.Learn.oracle
}
