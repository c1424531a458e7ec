package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Dedup, DedupSql}
import graft.text.{TextOps, TextSql}

/** Corpus-curation operators beyond the round-3 surface: deterministic
  * weighted sampling, incremental aggregate maintenance, and corpus-level
  * sketch comparison. All three are oracle-checked hash-exact.
  */
object Curation {

  /** Weight cap for [[queries]]' weighted sampler: keep probability is
    * `5% * min(n_chars div 100 + 1, cap)` — data-derived, capped at 50%.
    */
  val WeightCap = 10

  /** Incremental-refresh cutover: rows before this date play the
    * "already-materialized" base aggregate; rows on/after it are the delta.
    */
  val RefreshCut = "1997-01-01"

  private def weightCol: Column =
    least(expr("n_chars div 100") + 1, lit(WeightCap))

  private def prioAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- weighted deterministic sampling -----------------------------------
    // Quality/length-weighted Bernoulli sampling with NO rand(): the keep
    // decision is a pure function of the stable doc id, so the sample is
    // identical across retries, partitionings, and engines (the training-
    // data requirement behind sample_hash_docs), while the keep RATE is
    // data-derived per row (here: document length as the quality proxy).
    // Pure narrow filter on the scan — zero shuffle at any corpus size.
    "sample_weighted_docs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("w", weightCol)
        .filter(pmod(TextOps.polyHash(col("doc_id").cast("string")),
          lit(100)) < col("w") * 5)
        .select(col("doc_id"), col("source"), col("w"))
        .orderBy("doc_id")),

    // ---- incremental aggregate maintenance ---------------------------------
    // Materialized-view refresh without recompute: the base aggregate
    // (rows before RefreshCut) is merged with the delta batch's aggregate
    // by RE-AGGREGATING THE PARTIALS — legal because count/decimal-sum are
    // mergeable. At 100 TB the base is O(groups) rows read back from the
    // materialized view, and refresh cost is one pass over the DELTA only;
    // the oracle recomputes from scratch, so the hash gate proves
    // merge == recompute exactly (decimal partials make the merge
    // insensitive to how rows were split across base and delta).
    "agg_incremental_refresh" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val base = prioAgg(orders.filter(col("o_orderdate") < lit(RefreshCut)))
      val delta = prioAgg(orders.filter(col("o_orderdate") >= lit(RefreshCut)))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ---- corpus-level sketch comparison ------------------------------------
    // Pairwise source-vs-source Jaccard similarity from MERGED MinHash
    // sketches: a source's signature is the elementwise MIN of its
    // documents' signatures (= the signature of the union of their shingle
    // sets), which is an associative partial aggregate — the corpus is
    // read ONCE, the shuffle carries sources x K slots, and the pairwise
    // comparison runs on the sketch table (O(sources^2 * K), corpus-size
    // independent). The estimate (matching slots / K) is an exact binary
    // fraction, so it hashes identically cross-engine.
    "source_jaccard_matrix" -> ((s, dir) => {
      val k = Dedup.K
      val sig = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select(col("source"),
          Dedup.minhashSignature(
            TextOps.shingleHashes(TextOps.tokens(col("text")))).as("sig"))
        .select(col("source"), posexplode(col("sig")))
        .groupBy(col("source"), col("pos")).agg(min(col("col")).as("h"))
      sig.as("x").join(sig.as("y"),
          col("x.pos") === col("y.pos") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg((sum(when(col("x.h") === col("y.h"), 1).otherwise(0)) / lit(k))
          .as("jacc_est"))
        .orderBy("src_a", "src_b")
    })
  )

  def oracle: Map[String, String] = Map(
    "sample_weighted_docs" -> {
      val h = TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source,
         |       least(n_chars // 100 + 1, $WeightCap) AS w
         |FROM documents
         |WHERE ($h) % 100 < least(n_chars // 100 + 1, $WeightCap) * 5
         |ORDER BY doc_id""".stripMargin
    },
    "agg_incremental_refresh" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "source_jaccard_matrix" -> {
      val sh = TextSql.shingleHashes("text")
      val sig = DedupSql.minhashSignature("sh")
      s"""WITH sh AS (
         |  SELECT source, $sh AS sh FROM documents
         |), sigs AS (
         |  SELECT source, $sig AS sig FROM sh
         |), slots AS (
         |  SELECT source, i.i AS pos, sig[i.i + 1] AS h
         |  FROM sigs, range(0, ${Dedup.K}) i(i)
         |), sk AS (
         |  SELECT source, pos, min(h) AS h FROM slots GROUP BY source, pos
         |)
         |SELECT x.source AS src_a, y.source AS src_b,
         |       sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) / ${Dedup.K}.0 AS jacc_est
         |FROM sk x JOIN sk y ON x.pos = y.pos AND x.source < y.source
         |GROUP BY x.source, y.source ORDER BY src_a, src_b""".stripMargin
    })
}
