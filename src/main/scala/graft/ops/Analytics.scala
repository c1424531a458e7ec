package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.{Similarity, SimilaritySql}
import graft.text.{TextOps, TextSql}

/** Round-6 analytics operators: sweep-line interval concurrency, lag-k
  * autocorrelation, a count-min sketch with exact-refine audit, weekday
  * seasonality, a grid-bucketed spatial neighbor join, schema-drift
  * profiling, and SemDedup-style per-cluster embedding pruning.
  *
  * Same portability discipline as the rest of the registry (see
  * [[Relational]] scaladoc): integer/decimal-exact partial aggregates, one
  * deterministic double formula at the end, no transcendentals except
  * IEEE-guaranteed `sqrt`, and the DuckDB oracle mirrors every cast in
  * order so both engines perform the identical correctly-rounded ops.
  */
object Analytics {

  /** interval_concurrency: each event opens a half-open hold window of
    * this many minutes; the query reports the max number of simultaneously
    * open windows per UTC day.
    */
  val HoldMinutes = 30
  private val HoldUs = HoldMinutes * 60L * 1000000L
  private val DayUs = 86400L * 1000000L

  /** autocorr_daily_revenue: positional lags 1..AcLags over the observed
    * daily series (gap days are skipped, as in a trading-day series).
    */
  val AcLags = 7

  /** countmin_heavy_terms sketch geometry: depth x width cells. Error
    * bound: est - exact <= e/width * N with probability 1 - (1/2)^depth.
    */
  val CmsDepth = 4
  val CmsWidth = 256
  val CmsTopK = 20

  /** Public LCG multipliers (Numerical Recipes / glibc / Knuth / Borland)
    * as the CMS row-hash mixers: h_i(t) = (poly(t) * A_i + i) mod P mod W.
    * poly < P ~ 1e9 and A_i < 1.2e9, so the product stays under 2^63 in
    * both engines.
    */
  val CmsRowMixers: Seq[Long] = Seq(1103515245L, 69069L, 1664525L, 22695477L)

  /** grid_neighbor_join: coordinates are hashed into [0, GridMod)^2,
    * cells are GridCell x GridCell, and a pair matches iff squared
    * euclidean distance <= GridR2. GridCell >= r guarantees the 3x3
    * neighborhood of a point's home cell covers every candidate.
    *
    * BOTH coordinates are salted two-stage multiplicative scrambles of the
    * key hash (add salt, multiply by MIX, square, mod P — the quadratic-
    * residue mix from [[Curation]]'s JL sign matrix). Neither a suffixed
    * re-hash nor the raw hash works: the polynomial hash is affine in its
    * tail, so hash(k+":x") and hash(k+":y") differ by a constant (all
    * points on one diagonal — 1402 "neighbor" pairs at sf0.01), and the
    * raw hash of short digit keys is lattice-like (consecutive keys 31
    * apart — 1667 pairs). The salted scramble measures 27 pairs vs the
    * 31.8 uniform-scatter expectation.
    */
  val GridMod = 1000000L
  val GridCell = 3000L
  val GridR2 = 3000L * 3000L

  /** schema_drift_profile compares these two calendar-year slices. */
  val DriftYearA = "1995"
  val DriftYearB = "1996"

  /** semdedup_label_prune: prune budget per cluster (the SemDedup paper
    * prunes a fixed FRACTION per k-means cluster; a fixed per-cluster
    * count is the same policy with the budget made explicit).
    */
  val SemPruneK = 5

  private def cents: Column =
    (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")

  private def dec15(c: Column): Column = c.cast("decimal(15,0)")

  /** Daily order revenue in exact cents, keyed by epoch day. */
  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(unix_date(col("o_orderdate").cast("date")).cast("long").as("x"))
      .agg(sum(cents).as("v"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- sweep-line interval concurrency -----------------------------------
    // Max simultaneously-open hold windows per UTC day. Classic sweep:
    // +1 at window start, -1 at (exclusive) end, running sum ordered by
    // time, max per day. Windows are SPLIT at day boundaries so the
    // running sum partitions BY DAY — the scale-critical move: the sweep
    // is a per-day window, not one global ordered pass, so 100 TB of
    // events sweep as #days independent partitions (a finer split key —
    // hour — drops in the same way if single days are hot). Instants are
    // pre-grouped, so the cumulative value after each instant
    // (ends-before-starts, the half-open convention) is order-independent
    // and the max over instants is exact.
    "interval_concurrency" -> ((s, dir) => {
      val iv = Tables.events(s, dir)
        .select(unix_micros(col("ts")).as("t0"),
          (unix_micros(col("ts")) + HoldUs).as("t1"))
      val segs = iv
        .withColumn("d", explode(sequence(
          expr(s"t0 div $DayUs"), expr(s"(t1 - 1) div $DayUs"))))
        .select(col("d"),
          greatest(col("t0"), col("d") * DayUs).as("seg_s"),
          least(col("t1"), (col("d") + 1) * DayUs).as("seg_e"))
      val deltas = segs.select(col("d"), col("seg_s").as("t"), lit(1L).as("delta"))
        .unionAll(segs.select(col("d"), col("seg_e").as("t"), lit(-1L).as("delta")))
        .groupBy(col("d"), col("t"))
        .agg(sum(col("delta")).as("net"),
          sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_start"))
      val sweep = Window.partitionBy(col("d")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("v", sum(col("net")).over(sweep))
        .groupBy(col("d"))
        .agg(max(col("v")).as("max_concurrent"),
          sum(col("n_start")).as("n_intervals"))
        .select(col("d").as("epoch_day"), col("max_concurrent"),
          col("n_intervals"))
        .orderBy(col("epoch_day"))
    }),

    // ---- lag-k autocorrelation of daily revenue ----------------------------
    // Pearson autocorrelation at positional lags 1..AcLags over the daily
    // revenue series. The raw stream aggregates to O(days) rows FIRST, so
    // the single-partition lag window is over a provably tiny frame (the
    // same justification as rolling_median_revenue); all sums are decimal-
    // exact cents and the correlation is one mirrored double formula.
    "autocorr_daily_revenue" -> ((s, dir) => {
      val w = Window.orderBy(col("x"))
      val lagCols = (1 to AcLags).map(k => lag(col("v"), k).over(w).as(s"l$k"))
      val stackExpr = s"stack($AcLags, " +
        (1 to AcLags).map(k => s"$k, l$k").mkString(", ") + ") as (k, prev)"
      dailyRevenue(s, dir)
        .select(col("x") +: col("v") +: lagCols: _*)
        .select(col("v"), expr(stackExpr))
        .filter(col("prev").isNotNull)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("v")).as("sx"), sum(col("prev")).as("sy"),
          sum(dec15(col("v")) * dec15(col("prev"))).as("sxy"),
          sum(dec15(col("v")) * dec15(col("v"))).as("sxx"),
          sum(dec15(col("prev")) * dec15(col("prev"))).as("syy"))
        .select(col("k"), col("n_pairs"),
          col("n_pairs").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"),
          col("sy").cast("double").as("syd"),
          col("sxy").cast("double").as("sxyd"),
          col("sxx").cast("double").as("sxxd"),
          col("syy").cast("double").as("syyd"))
        .select(col("k").cast("int").as("lag"), col("n_pairs"),
          ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            (sqrt(col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
              sqrt(col("nd") * col("syyd") - col("syd") * col("syd"))))
            .as("autocorr"))
        .orderBy(col("lag"))
    }),

    // ---- count-min sketch with exact-refine audit --------------------------
    // A CmsDepth x CmsWidth count-min sketch over the document token
    // stream, audited against the exact top-CmsTopK tokens: est = min over
    // rows of the hashed cell, always >= exact, with the overcount
    // reported per token. Scale shape: the sketch is a map-side-combined
    // groupBy onto CmsDepth*CmsWidth cells — shuffle volume is O(cells),
    // not O(tokens) — and the probe side is a broadcast of CmsTopK rows.
    // (The exact top-k here is itself a groupBy over the token stream;
    // at 100 TB that refine step is the companion vocab_heavy_hitters
    // Misra-Gries sketch instead.)
    "countmin_heavy_terms" -> ((s, dir) => {
      val toks = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .withColumn("h", TextOps.polyHash(col("tok")))
      val bucketArr = array(CmsRowMixers.zipWithIndex.map { case (a, i) =>
        (col("h") * a + i) % TextOps.P % CmsWidth
      }: _*)
      val cells = toks
        .select(posexplode(bucketArr).as(Seq("row_i", "bucket")))
        .groupBy(col("row_i"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val top = toks.groupBy(col("tok"), col("h"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok"))
        .limit(CmsTopK)
      val probes = top
        .select(col("tok"), col("exact_cnt"),
          posexplode(bucketArr).as(Seq("row_i", "bucket")))
      cells.join(broadcast(probes), Seq("row_i", "bucket"))
        .groupBy(col("tok"), col("exact_cnt"))
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("tok").as("token"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    // ---- weekday seasonality index -----------------------------------------
    // Mean daily revenue per weekday relative to the all-days mean. The
    // weekday is PURE INTEGER arithmetic on the epoch day ((x+4) mod 7,
    // 0 = Sunday — 1970-01-01 was a Thursday), so no engine date-locale
    // surface is involved; the index is a ratio of decimal-exact products
    // rounded to double once each, then one division.
    "weekday_seasonality" -> ((s, dir) => {
      val byDow = dailyRevenue(s, dir)
        .withColumn("dow", pmod(col("x") + 4, lit(7)))
        .groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("v")).as("total_cents"))
      val tot = byDow.agg(sum(col("n_days")).as("all_days"),
        sum(col("total_cents")).as("all_cents"))
      byDow.crossJoin(tot)
        .select(col("dow"), col("n_days"), col("total_cents"),
          (col("total_cents").cast("double") / col("n_days").cast("double"))
            .as("mean_daily_cents"),
          ((dec15(col("total_cents")) * dec15(col("all_days"))).cast("double") /
            (dec15(col("n_days")) * dec15(col("all_cents"))).cast("double"))
            .as("seasonality_idx"))
        .orderBy(col("dow"))
    }),

    // ---- grid-bucketed spatial neighbor join -------------------------------
    // All point pairs within euclidean distance r, via the standard
    // spatial-grid equi-join: each point lives in ONE GridCell-sized home
    // cell; the probe side replicates 9x into the 3x3 neighborhood and
    // joins on cell equality, so candidate generation is an equi-join a
    // shuffle can partition (never an all-pairs theta join), and
    // cell >= r makes the neighborhood provably complete. Coordinates are
    // derived deterministically from the key hash (no RNG); the distance
    // test is exact int64. At 100 TB this is the map-matching /
    // collocation shape: candidates ~ density * 9 cells, and a skewed
    // (urban) cell salts like any other hot key.
    "grid_neighbor_join" -> ((s, dir) => {
      def coord(h: Column, salt: Long): Column = {
        val u = (h + salt) * TextOps.MIX % TextOps.P
        u * u % TextOps.P % GridMod
      }
      val pts = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          TextOps.polyHash(col("c_custkey").cast("string")).as("h"))
        .select(col("id"), coord(col("h"), 1).as("x"),
          coord(col("h"), 2).as("y"))
        .withColumn("cx", expr(s"x div $GridCell"))
        .withColumn("cy", expr(s"y div $GridCell"))
      val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
      val probes = pts
        .withColumn("o", explode(offsets))
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("o.dx")).as("pcx"),
          (col("cy") + col("o.dy")).as("pcy"))
      val b = pts.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy"))
      probes.join(b,
          probes("pcx") === b("cx") && probes("pcy") === b("cy") &&
            probes("a_id") < b("b_id"))
        .withColumn("dist2",
          (col("ax") - col("bx")) * (col("ax") - col("bx")) +
            (col("ay") - col("by")) * (col("ay") - col("by")))
        .filter(col("dist2") <= GridR2)
        .select(col("a_id"), col("b_id"), col("dist2"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- schema / distribution drift profile -------------------------------
    // Column-level profile (count, exact distinct, min, max — all BIGINT;
    // prices in cents) for two calendar-year slices, unpivoted to one row
    // per (column, metric) with the year-over-year delta. This is the
    // data-contract regression gate a training pipeline runs before
    // accepting a new snapshot. Scale note: the exact countDistinct
    // shuffles per column; at lake scale swap in approx_count_distinct
    // and keep the same contract rows (the sketch variant is
    // approx_sketches' surface).
    "schema_drift_profile" -> ((s, dir) => {
      def prof(year: String): DataFrame =
        Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${year.toInt + 1}-01-01").cast("timestamp"))
          .agg(
            count(col("o_custkey")).as("ck_n"),
            countDistinct(col("o_custkey")).as("ck_nd"),
            min(col("o_custkey")).as("ck_min"),
            max(col("o_custkey")).as("ck_max"),
            count(cents).as("tp_n"),
            countDistinct(cents).as("tp_nd"),
            min(cents).as("tp_min"),
            max(cents).as("tp_max"),
            count(col("o_orderstatus")).as("st_n"),
            countDistinct(col("o_orderstatus")).as("st_nd"),
            count(col("o_orderpriority")).as("pr_n"),
            countDistinct(col("o_orderpriority")).as("pr_nd"))
      val a = prof(DriftYearA)
      val b = prof(DriftYearB)
      val metrics = Seq(
        ("o_custkey", "count", "ck_n"), ("o_custkey", "n_distinct", "ck_nd"),
        ("o_custkey", "min", "ck_min"), ("o_custkey", "max", "ck_max"),
        ("o_totalprice_cents", "count", "tp_n"),
        ("o_totalprice_cents", "n_distinct", "tp_nd"),
        ("o_totalprice_cents", "min", "tp_min"),
        ("o_totalprice_cents", "max", "tp_max"),
        ("o_orderstatus", "count", "st_n"),
        ("o_orderstatus", "n_distinct", "st_nd"),
        ("o_orderpriority", "count", "pr_n"),
        ("o_orderpriority", "n_distinct", "pr_nd"))
      val stackExpr = s"stack(${metrics.size}, " + metrics.map {
        case (c, m, f) => s"'$c', '$m', a_$f, b_$f"
      }.mkString(", ") + ") as (col_name, metric, v_a, v_b)"
      val aw = a.select(a.columns.map(c => col(c).as(s"a_$c")): _*)
      val bw = b.select(b.columns.map(c => col(c).as(s"b_$c")): _*)
      aw.crossJoin(bw)
        .select(expr(stackExpr))
        .withColumn("delta", col("v_b") - col("v_a"))
        .orderBy(col("col_name"), col("metric"))
    }),

    // ---- SemDedup-style per-cluster embedding pruning ----------------------
    // Semantic dedup over the clustered embedding table (labels stand in
    // for the paper's k-means cluster ids): within each cluster, score
    // every vector by its max cosine to a LOWER-ID vector (the retained
    // representative under greedy-by-id), and prune a fixed per-cluster
    // budget of the most redundant vectors. Pairing is label-blocked —
    // O(sum of cluster^2), never corpus^2 — which is exactly the
    // SemDedup contract: clusters are sized by k at train time, so the
    // quadratic term is bounded by construction; sign-LSH sub-blocking
    // (Dedup's banding) composes inside a cluster if one outgrows memory.
    // Cosines are the bit-identical left-to-right fold shared with the
    // ANN family.
    "semdedup_label_prune" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val a = e.select(col("label"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
      val b = e.select(col("label"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb"))
      val pairs = a.join(b, Seq("label"))
        .filter(col("a_id") < col("b_id"))
        .select(col("label"), col("a_id"), col("b_id"),
          Similarity.cosine(col("a_emb"), col("b_emb")).as("cos"))
      val perVec = Window.partitionBy(col("b_id"))
        .orderBy(col("cos").desc, col("a_id"))
      val perLabel = Window.partitionBy(col("label"))
        .orderBy(col("cos").desc, col("b_id"))
      pairs
        .withColumn("rn", row_number().over(perVec))
        .filter(col("rn") === 1)
        .withColumn("rk", row_number().over(perLabel))
        .filter(col("rk") <= SemPruneK)
        .select(col("label"), col("b_id").as("vec_id"),
          col("a_id").as("keeper_id"), col("cos").as("max_cos"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("label"), col("rk"))
    })
  )

  // --------------------------------------------------------------------------

  private val oracleDow = "(x + 4) % 7"

  private def oracleDaily: String =
    """SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |       sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
      |FROM orders GROUP BY 1""".stripMargin

  private def cmsBucket(h: String, i: String): String = {
    val cases = CmsRowMixers.zipWithIndex.map { case (a, i2) =>
      s"WHEN $i2 THEN $a"
    }.mkString(" ")
    s"(($h) * (CASE $i $cases ELSE 0 END) + $i) % ${TextOps.P} % $CmsWidth"
  }

  def oracle: Map[String, String] = Map(

    "interval_concurrency" ->
      s"""WITH iv AS (
         |  SELECT epoch_us(ts) AS t0, epoch_us(ts) + $HoldUs AS t1 FROM events
         |), segs AS (
         |  SELECT unnest(range(t0 // $DayUs, (t1 - 1) // $DayUs + 1)) AS d,
         |         t0, t1
         |  FROM iv
         |), clipped AS (
         |  SELECT d, greatest(t0, d * $DayUs) AS seg_s,
         |         least(t1, (d + 1) * $DayUs) AS seg_e
         |  FROM segs
         |), deltas AS (
         |  SELECT d, seg_s AS t, 1 AS delta FROM clipped
         |  UNION ALL
         |  SELECT d, seg_e AS t, -1 AS delta FROM clipped
         |), g AS (
         |  SELECT d, t, CAST(sum(delta) AS BIGINT) AS net,
         |         CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_start
         |  FROM deltas GROUP BY d, t
         |), v AS (
         |  SELECT d, n_start,
         |         CAST(sum(net) OVER (PARTITION BY d ORDER BY t) AS BIGINT) AS v
         |  FROM g
         |)
         |SELECT d AS epoch_day, max(v) AS max_concurrent,
         |       CAST(sum(n_start) AS BIGINT) AS n_intervals
         |FROM v GROUP BY d ORDER BY epoch_day""".stripMargin,

    "autocorr_daily_revenue" -> {
      val lagSelects = (1 to AcLags).map(k =>
        s"SELECT $k AS lag, v, lag(v, $k) OVER (ORDER BY x) AS prev FROM daily")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH daily AS (
         |  ${oracleDaily.replace("\n", "\n  ")}
         |), pairs AS (
         |  $lagSelects
         |), m AS (
         |  SELECT lag, count(*) AS n_pairs,
         |    CAST(count(*) AS DOUBLE) AS nd,
         |    CAST(sum(v) AS DOUBLE) AS sxd,
         |    CAST(sum(prev) AS DOUBLE) AS syd,
         |    CAST(sum(CAST(v AS DECIMAL(15,0)) * CAST(prev AS DECIMAL(15,0)))
         |      AS DOUBLE) AS sxyd,
         |    CAST(sum(CAST(v AS DECIMAL(15,0)) * CAST(v AS DECIMAL(15,0)))
         |      AS DOUBLE) AS sxxd,
         |    CAST(sum(CAST(prev AS DECIMAL(15,0)) * CAST(prev AS DECIMAL(15,0)))
         |      AS DOUBLE) AS syyd
         |  FROM pairs WHERE prev IS NOT NULL GROUP BY lag
         |)
         |SELECT CAST(lag AS INT) AS lag, n_pairs,
         |       (nd * sxyd - sxd * syd) /
         |         (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd))
         |         AS autocorr
         |FROM m ORDER BY lag""".stripMargin
    },

    "countmin_heavy_terms" -> {
      val h = TextSql.polyHash("tok")
      s"""WITH toks AS (
         |  SELECT unnest(${TextSql.tokens("text")}) AS tok FROM documents
         |), hashed AS (
         |  SELECT tok, $h AS h FROM toks
         |), rows_i AS (
         |  SELECT unnest(range($CmsDepth)) AS row_i
         |), cells AS (
         |  SELECT row_i, ${cmsBucket("h", "row_i")} AS bucket,
         |         count(*) AS cnt
         |  FROM hashed CROSS JOIN rows_i GROUP BY 1, 2
         |), top AS (
         |  SELECT tok, h, count(*) AS exact_cnt
         |  FROM hashed GROUP BY tok, h
         |  ORDER BY exact_cnt DESC, tok LIMIT $CmsTopK
         |), probes AS (
         |  SELECT tok, exact_cnt, row_i,
         |         ${cmsBucket("h", "row_i")} AS bucket
         |  FROM top CROSS JOIN rows_i
         |)
         |SELECT p.tok AS token, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
         |       CAST(min(c.cnt) AS BIGINT) AS cms_est,
         |       CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
         |FROM probes p JOIN cells c ON c.row_i = p.row_i AND c.bucket = p.bucket
         |GROUP BY p.tok, p.exact_cnt
         |ORDER BY exact_cnt DESC, token""".stripMargin
    },

    "weekday_seasonality" ->
      s"""WITH daily AS (
         |  ${oracleDaily.replace("\n", "\n  ")}
         |), by_dow AS (
         |  SELECT $oracleDow AS dow, count(*) AS n_days,
         |         CAST(sum(v) AS BIGINT) AS total_cents
         |  FROM daily GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(n_days) AS BIGINT) AS all_days,
         |         CAST(sum(total_cents) AS BIGINT) AS all_cents
         |  FROM by_dow
         |)
         |SELECT dow, n_days, total_cents,
         |       CAST(total_cents AS DOUBLE) / CAST(n_days AS DOUBLE)
         |         AS mean_daily_cents,
         |       CAST(CAST(total_cents AS DECIMAL(15,0)) *
         |            CAST(all_days AS DECIMAL(15,0)) AS DOUBLE) /
         |       CAST(CAST(n_days AS DECIMAL(15,0)) *
         |            CAST(all_cents AS DECIMAL(15,0)) AS DOUBLE)
         |         AS seasonality_idx
         |FROM by_dow CROSS JOIN tot ORDER BY dow""".stripMargin,

    "grid_neighbor_join" -> {
      val h = TextSql.polyHash("CAST(id AS VARCHAR)")
      def coord(salt: Long): String =
        s"((h + $salt) * ${TextOps.MIX} % ${TextOps.P}) * " +
          s"((h + $salt) * ${TextOps.MIX} % ${TextOps.P}) % ${TextOps.P} " +
          s"% $GridMod"
      s"""WITH hashed AS (
         |  SELECT id, ($h) AS h FROM (SELECT c_custkey AS id FROM customer)
         |), pts AS (
         |  SELECT id, ${coord(1)} AS x, ${coord(2)} AS y
         |  FROM hashed
         |), cells AS (
         |  SELECT id, x, y, x // $GridCell AS cx, y // $GridCell AS cy FROM pts
         |)
         |SELECT a.id AS a_id, b.id AS b_id,
         |       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
         |FROM cells a JOIN cells b
         |  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         | AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         | AND a.id < b.id
         |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= $GridR2
         |ORDER BY a_id, b_id""".stripMargin
    },

    "schema_drift_profile" -> {
      val metrics = Seq(
        ("o_custkey", "count", "ck_n"), ("o_custkey", "n_distinct", "ck_nd"),
        ("o_custkey", "min", "ck_min"), ("o_custkey", "max", "ck_max"),
        ("o_totalprice_cents", "count", "tp_n"),
        ("o_totalprice_cents", "n_distinct", "tp_nd"),
        ("o_totalprice_cents", "min", "tp_min"),
        ("o_totalprice_cents", "max", "tp_max"),
        ("o_orderstatus", "count", "st_n"),
        ("o_orderstatus", "n_distinct", "st_nd"),
        ("o_orderpriority", "count", "pr_n"),
        ("o_orderpriority", "n_distinct", "pr_nd"))
      def prof(year: String): String =
        s"""SELECT
           |    CAST(count(o_custkey) AS BIGINT) AS ck_n,
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS ck_nd,
           |    CAST(min(o_custkey) AS BIGINT) AS ck_min,
           |    CAST(max(o_custkey) AS BIGINT) AS ck_max,
           |    CAST(count(*) AS BIGINT) AS tp_n,
           |    CAST(count(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(18,2))
           |      * 100 AS BIGINT)) AS BIGINT) AS tp_nd,
           |    CAST(min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS tp_min,
           |    CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS tp_max,
           |    CAST(count(o_orderstatus) AS BIGINT) AS st_n,
           |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS st_nd,
           |    CAST(count(o_orderpriority) AS BIGINT) AS pr_n,
           |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS pr_nd
           |  FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '$year-01-01'
           |    AND o_orderdate < TIMESTAMP '${year.toInt + 1}-01-01'"""
          .stripMargin
      val rows = metrics.map { case (c, m, f) =>
        s"SELECT '$c' AS col_name, '$m' AS metric, a.$f AS v_a, b.$f AS v_b," +
          s" b.$f - a.$f AS delta FROM a CROSS JOIN b"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH a AS (
         |  ${prof(DriftYearA).replace("\n", "\n  ")}
         |), b AS (
         |  ${prof(DriftYearB).replace("\n", "\n  ")}
         |), stacked AS (
         |  $rows
         |)
         |SELECT * FROM stacked ORDER BY col_name, metric""".stripMargin
    },

    "semdedup_label_prune" -> {
      val cos = SimilaritySql.cosine("a.embedding", "b.embedding", 64)
      s"""WITH pairs AS (
         |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         |         $cos AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |), per_vec AS (
         |  SELECT label, a_id, b_id, cos,
         |         row_number() OVER (PARTITION BY b_id
         |                            ORDER BY cos DESC, a_id) AS rn
         |  FROM pairs
         |), best AS (
         |  SELECT label, a_id, b_id, cos FROM per_vec WHERE rn = 1
         |), ranked AS (
         |  SELECT label, b_id, a_id, cos,
         |         row_number() OVER (PARTITION BY label
         |                            ORDER BY cos DESC, b_id) AS rk
         |  FROM best
         |)
         |SELECT label, b_id AS vec_id, a_id AS keeper_id, cos AS max_cos,
         |       CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $SemPruneK
         |ORDER BY label, rk""".stripMargin
    }
  )
}
