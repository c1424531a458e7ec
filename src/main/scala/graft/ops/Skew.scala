package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's runtime
  * skew-join splitting (which [[graft.GraftSession]] enables), for the
  * cases AQE can't fix: skewed AGGREGATION keys, and skewed joins where
  * the planner can't see the skew in advance.
  */
object Skew {

  /** skew_key_diagnostics: heavy-key report depth. */
  val DiagTopK = 10

  /** join_size_estimate: 1-in-N deterministic key subset whose self-join
    * is actually executed to prove the count-table estimator.
    */
  val EstSample = 499L

  /** Two-phase salted aggregation: spray the hot key across `salts`
    * partial groups, combine partials. Exactly equivalent to a direct
    * groupBy for decomposable aggregates (sum/count/min/max); the shuffle
    * carries `salts` rows per original group instead of one hot partition.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))

  /** Salted broadcast-free join of a skewed fact against a dimension:
    * replicate each dim row `salts` times, salt the fact side uniformly,
    * join on (key, salt). Use when the dim is too big to broadcast but
    * fact keys are skewed.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Registered queries: salting is TRANSPARENT — each has a plain
    * GROUP-BY / join oracle. The aggregated measure is decimal-cast before
    * summing (exact, associative), so the salted two-phase sum is
    * bit-identical to the oracle's single-phase sum regardless of how the
    * partials interleave.
    */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> ((s, dir) =>
      saltedSumCount(graft.Tables.events(s, dir), "event_type",
        col("value").cast("decimal(18,2)"))
        .select(col("event_type"),
          col("sum_value").cast("double").as("sum_value"), col("n"))
        .orderBy("event_type")),

    "skew_salted_join" -> ((s, dir) => {
      val fact = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val dim = graft.Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      saltedJoin(fact, dim, "suppkey")
        .groupBy(col("s_nationkey"))
        .agg(sum(col("price")).cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("s_nationkey")
    }),

    // ---- skew diagnostics: heavy keys + exact Gini of the key histogram ---
    // The profiling pass that DECIDES whether to salt: top-DiagTopK keys
    // with exact shares, plus the Gini coefficient of the whole key-count
    // distribution as one number (0 = uniform, →1 = one hot key). The
    // Gini rank sum S₁ = Σᵢ i·cᵢ (counts ascending) folds over the
    // COUNT-OF-COUNTS rollup — a tie-group of m keys at count c occupies
    // m consecutive ranks, contributing c·(m·prev + m(m+1)/2) — so the
    // only ordered scan runs on O(distinct count values) rows at ANY
    // corpus size, never on per-key rows. int64 end to end (S₁ ≤ n·T
    // needs n_keys·rows < 2^63 — holds past sf10k); one mirrored double
    // division each for share and gini.
    "skew_key_diagnostics" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keys = graft.Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val cc = keys.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
      val w = Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gs = cc.withColumn("cum_m", sum(col("m")).over(w))
        .agg(
          sum(expr("cnt * ((cum_m - m) * m + (m * (m + 1)) div 2)")).as("s1"),
          sum(col("m")).as("n"), sum(col("cnt") * col("m")).as("t"))
      val topk = keys.orderBy(col("cnt").desc, col("l_partkey"))
        .limit(DiagTopK)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("l_partkey"))).cast("long"))
      topk.crossJoin(broadcast(gs))
        .select(col("rank"), col("l_partkey").as("partkey"), col("cnt"),
          (col("cnt").cast("double") / col("t").cast("double")).as("share"),
          col("n").as("n_keys"), col("t").as("total_rows"),
          ((col("s1") * 2 - (col("n") + 1) * col("t")).cast("double") /
            (col("n") * col("t")).cast("double")).as("gini"))
        .orderBy("rank")
    }),

    // ---- join-size estimation: predict before you pay ----------------------
    // The planner question behind every dedup/co-occurrence operator:
    // |fact ⋈ fact on k| = Σ c(k)² — computed from the per-key count
    // table WITHOUT executing the join (two map-side-combined groupBys,
    // O(keys) arithmetic). The estimate is then PROVEN by actually
    // executing the self-join on a deterministic 1-in-EstSample key
    // subset and counting: predicted_sample == actual_sample row-for-row.
    // At 100 TB the estimate column is what you run; the executed
    // verification stays on the sampled sliver by construction.
    "join_size_estimate" -> ((s, dir) => {
      val li = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("k"))
      val counts = li.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val est = counts.agg(
        count(lit(1)).as("n_keys"), sum(col("c")).as("fact_rows"),
        sum(col("c") * col("c")).as("est_selfjoin_rows"),
        sum(when(col("k") % EstSample === 0, col("c") * col("c"))
          .otherwise(0L)).as("est_sample_rows"),
        max(col("c")).as("max_key_cnt"))
      val sub = li.filter(col("k") % EstSample === 0)
      val actual = sub.as("a").join(sub.as("b"), "k")
        .agg(count(lit(1)).as("actual_sample_rows"))
      est.crossJoin(actual)
        .select(col("n_keys"), col("fact_rows"), col("est_selfjoin_rows"),
          col("max_key_cnt"), col("est_sample_rows"),
          col("actual_sample_rows"))
    }))

  def oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_salted_join" ->
      """SELECT s_nationkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "skew_key_diagnostics" ->
      s"""WITH k AS (
         |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem GROUP BY 1
         |), cc AS (
         |  SELECT cnt, CAST(count(*) AS BIGINT) AS m FROM k GROUP BY cnt
         |), c2 AS (
         |  SELECT cnt, m, CAST(sum(m) OVER (ORDER BY cnt) AS BIGINT) AS cum_m
         |  FROM cc
         |), gs AS (
         |  SELECT
         |    CAST(sum(cnt * ((cum_m - m) * m + (m * (m + 1)) // 2)) AS BIGINT)
         |      AS s1,
         |    CAST(sum(m) AS BIGINT) AS n, CAST(sum(cnt * m) AS BIGINT) AS t
         |  FROM c2
         |), tk AS (
         |  SELECT key, cnt,
         |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank
         |  FROM k ORDER BY cnt DESC, key LIMIT $DiagTopK
         |)
         |SELECT tk.rank, tk.key AS partkey, tk.cnt,
         |  CAST(tk.cnt AS DOUBLE) / CAST(t AS DOUBLE) AS share,
         |  n AS n_keys, t AS total_rows,
         |  CAST(2 * s1 - (n + 1) * t AS DOUBLE) / CAST(n * t AS DOUBLE) AS gini
         |FROM tk CROSS JOIN gs ORDER BY rank""".stripMargin,
    "join_size_estimate" ->
      s"""WITH c AS (
         |  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1
         |), est AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(sum(c) AS BIGINT) AS fact_rows,
         |    CAST(sum(c * c) AS BIGINT) AS est_selfjoin_rows,
         |    CAST(sum(CASE WHEN k % $EstSample = 0 THEN c * c ELSE 0 END)
         |      AS BIGINT) AS est_sample_rows,
         |    CAST(max(c) AS BIGINT) AS max_key_cnt
         |  FROM c
         |), act AS (
         |  SELECT CAST(count(*) AS BIGINT) AS actual_sample_rows
         |  FROM (SELECT l_partkey FROM lineitem WHERE l_partkey % $EstSample = 0) a
         |  JOIN (SELECT l_partkey FROM lineitem WHERE l_partkey % $EstSample = 0) b
         |    ON a.l_partkey = b.l_partkey
         |)
         |SELECT n_keys, fact_rows, est_selfjoin_rows, max_key_cnt,
         |       est_sample_rows, actual_sample_rows
         |FROM est CROSS JOIN act""".stripMargin)
}
