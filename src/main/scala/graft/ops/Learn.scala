package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 learned-model operators: the two classical in-database ML
  * shapes a training-data pipeline runs directly on the warehouse —
  * a logistic-regression quality classifier trained by gradient descent
  * (the filter-model family: fastText-style quality gates, DSIR scorers)
  * and DBSCAN density clustering over the embedding space (outlier/
  * cluster structure discovery before curation).
  *
  * Both are expressed as ONE declarative Catalyst plan per pass — no
  * driver loops over rows, no UDFs — and both are oracle-checked
  * hash-exact against DuckDB, which forces the same portability
  * discipline as [[Stats]]: every cross-row reduction is integer/decimal
  * (order-independent), and doubles appear only in per-row arithmetic
  * (deterministic IEEE) and mirrored final formulas.
  *
  * The determinism trick for gradient descent: the sigmoid is the
  * rational "fast sigmoid" s(z) = 1/2 + z/(2(1+|z|)) — pure +,*,/,abs,
  * bit-identical on any IEEE engine, no transcendental exp() whose
  * libm rounding could differ — and each row's activation is floor-
  * quantized to 2^-20 BEFORE the reduction, so gradient sums are exact
  * integers (scaled by integer features) instead of order-dependent
  * double accumulations. Quantization bias is < 1e-6 per step — noise
  * relative to the step size — while making the whole training run
  * reproducible to the last bit on any partitioning of the data.
  */
object Learn {

  /** logreg_quality_gd: gradient-descent steps, learning rate, and the
    * activation quantization scale (2^20).
    */
  val GdIters = 3
  val GdLr = 2.0
  val GdQ = 1048576L

  /** x1 normalization: o_totalprice spans (0, 5e5] dollars → 5e7 cents,
    * so x1 = cents / 5e7 lands in (0, 1].
    */
  val GdX1Scale = 5.0e7

  /** dbscan_grid_cores: epsilon radius in embedding units and the core
    * threshold (neighbor count INCLUDING the point itself, the classic
    * DBSCAN convention).
    */
  val DbEps = 0.08
  val DbMinPts = 5

  /** Orders → integer-feature training rows: y = (status F), x1i = price
    * cents (scaled to (0,1] by [[GdX1Scale]] inside the model), x2 =
    * urgent-priority flag. Integer features are what make the quantized
    * gradient sums exact.
    */
  private def gdFacts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("x1i"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("x2"))

  /** Per-row activation columns for the current weights (one-row frame
    * cross-joined in): z in double, then the floor-quantized residual
    * r = floor(s·2^20) − y·2^20 — the only value the reductions see.
    */
  private def withResidual(joined: DataFrame): DataFrame =
    joined
      .withColumn("z",
        col("w0") + col("w1") * (col("x1i") / lit(GdX1Scale)) +
          col("w2") * col("x2"))
      .withColumn("s",
        lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      .withColumn("r",
        floor(col("s") * lit(GdQ.toDouble)).cast("long") - col("y") * GdQ)

  /** One batch-gradient step: facts × weights → exact integer gradient
    * sums → new one-row weights frame. Each step is a single combinable
    * aggregation over the facts (map-side partial sums of three decimal
    * counters), so N steps = N scans — the canonical distributed GD
    * shape, with the 1-row weight state flowing through the plan as a
    * broadcast cross join rather than a driver collect.
    */
  private def gdStep(facts: DataFrame, w: DataFrame): DataFrame =
    withResidual(facts.crossJoin(broadcast(w)))
      .agg(
        min(col("w0")).as("ow0"), min(col("w1")).as("ow1"),
        min(col("w2")).as("ow2"),
        sum(col("r").cast("decimal(38,0)")).as("g0"),
        sum((col("r") * col("x1i")).cast("decimal(38,0)")).as("g1"),
        sum((col("r") * col("x2")).cast("decimal(38,0)")).as("g2"),
        count(lit(1)).as("n"))
      .select(
        (col("ow0") - lit(GdLr) *
          (col("g0").cast("double") / col("n") / lit(GdQ.toDouble)))
          .as("w0"),
        (col("ow1") - lit(GdLr) *
          (col("g1").cast("double") / col("n") / lit(GdQ.toDouble) /
            lit(GdX1Scale))).as("w1"),
        (col("ow2") - lit(GdLr) *
          (col("g2").cast("double") / col("n") / lit(GdQ.toDouble)))
          .as("w2"))

  /** nb_train_lang / nb_predict_lang: Laplace smoothing constant is the
    * classic +1; NbQ is the log-likelihood quantization scale (10^6) and
    * NbTopK the per-class tokens the train query reports.
    *
    * Quantization determinism note: the ONLY transcendental in the whole
    * NB pair is ln() over the smoothed probability, and it is immediately
    * floor-quantized to an integer weight at scale 10^6. Both engines
    * evaluate ln on the bit-identical double (cnt+1)/(tot+V) — libm
    * implementations agree to <1 ulp, so floor can only disagree if
    * 10^6·ln(p) sits within ~1e-10 of an integer; weights are a function
    * of the few hundred distinct (cnt, class) pairs, putting the overall
    * flip probability around 1e-7 — and deterministic per corpus (green
    * once = green forever). Every reduction over fact-scale rows (the
    * per-doc score sums) is pure int64 arithmetic on those quantized
    * weights, exactly the logreg discipline above.
    */
  val NbQ = 1000000L
  val NbTopK = 5

  /** documents → (doc_id, lang, tok) whitespace tokens, empty-token rows
    * dropped (the zero-token documents drop out of both train and predict
    * on both engines — noted in the scaladoc of the queries).
    */
  private def nbTokens(s: SparkSession, dir: String): DataFrame =
    // parallelized: the tokenize+explode is the CPU of both NB queries and
    // otherwise runs at raw scan width (1 task on the single-row-group
    // test files — the same under-provisioned-scan repair every other
    // text-family query applies; an exact no-op once the scan has
    // session-width splits)
    Tables.parallelized(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")

  /** Per-(class, token) counts and per-class totals — the sufficient
    * statistics of a multinomial NB model. One explode + two combinable
    * groupBys; nothing fact-scale ever sits on one node.
    */
  private def nbCounts(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    // NO lineage break here (round-15 revert of the round-14 lazy
    // localCheckpoint): c fans out to t, v, the smoothed-weight table and
    // the class-prior table, so the corpus tokenize+explode+count re-runs
    // per consumer — but each copy is a narrow scan feeding a map-side-
    // combined partial aggregate that compresses to vocab scale
    // immediately, while the checkpoint paid a (classes x vocab)
    // materialization plus a construct-time job chain. Measured at BOTH
    // available scales the recompute shape wins (sf0.1 cold triple
    // 13.5 s -> 12.3 s; sf1 committed like-window artifacts read
    // nb_predict 4.47 s in r13's recompute shape vs 5.62-5.73 s with the
    // r14 checkpoint). The crossover where a session checkpoint would pay
    // was not reached at any measurable SF; at true corpus scale the
    // right artifact is a persisted model TABLE written once by
    // nb_train, not a per-query lineage break.
    val c = nbTokens(s, dir).groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.groupBy(col("lang")).agg(sum(col("cnt")).as("tot"))
    val v = c.agg(countDistinct(col("tok")).as("vocab"))
    (c, t, v)
  }

  /** Embeddings → (id, x, y, cell) points for the grid-blocked DBSCAN.
    * Floats widen to double EXACTLY before any arithmetic, so the
    * per-pair distance doubles are bit-identical to the oracle's.
    */
  private def dbPoints(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(
      col("vec_id"),
      col("embedding").getItem(0).cast("double").as("x"),
      col("embedding").getItem(1).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / lit(DbEps)))
      .withColumn("cy", floor(col("y") / lit(DbEps)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- logistic-regression quality gate, batch gradient descent ----------
    // Predict order failure (status F) from price + urgency: GdIters
    // unrolled full-batch steps from w = 0, then one evaluation pass
    // (accuracy at the z>0 decision boundary, quantized Brier/MSE).
    // Every pass over the facts is one partial-agg'd scan; the model
    // state is a one-row frame chained by broadcast cross joins, so the
    // whole training run is a single lazy plan — nothing materializes on
    // the driver. At 100 TB each step shuffles 3 decimal counters per
    // partition and nothing else.
    "logreg_quality_gd" -> ((s, dir) => {
      val facts = gdFacts(s, dir)
      val w0 = s.range(1).select(lit(0.0).as("w0"), lit(0.0).as("w1"),
        lit(0.0).as("w2"))
      val wN = (1 to GdIters).foldLeft(w0)((w, _) => gdStep(facts, w))
      withResidual(facts.crossJoin(broadcast(wN)))
        .agg(
          min(col("w0")).as("w0"), min(col("w1")).as("w1"),
          min(col("w2")).as("w2"),
          count(lit(1)).as("n"),
          sum(when((col("z") > 0) === (col("y") === 1L), 1L).otherwise(0L))
            .as("n_correct"),
          sum((col("r") * col("r")).cast("decimal(38,0)")).as("sq"))
        .select(col("w0"), col("w1"), col("w2"), col("n"), col("n_correct"),
          (col("n_correct").cast("double") / col("n")).as("accuracy"),
          (col("sq").cast("double") / col("n") /
            lit(GdQ.toDouble * GdQ.toDouble)).as("mse"))
    }),

    // ---- calibration (reliability) bins for the trained quality gate -------
    // The eval every deployed filter-model needs: bin predictions into
    // centiles of the (rational, deterministic) sigmoid and compare the
    // mean predicted probability with the observed positive rate per
    // bin — a well-calibrated gate sits on the diagonal. Reuses the
    // EXACT registered training (same unrolled plan); predictions are
    // floor-quantized at 2^-20 before the per-bin sum, so every cross-
    // row reduction is int64 and the two final ratios are mirrored
    // divisions. Same one-scan-per-step shape as logreg_quality_gd plus
    // one 10-row aggregation pass.
    "logreg_calibration_bins" -> ((s, dir) => {
      val facts = gdFacts(s, dir)
      val w0 = s.range(1).select(lit(0.0).as("w0"), lit(0.0).as("w1"),
        lit(0.0).as("w2"))
      val wN = (1 to GdIters).foldLeft(w0)((w, _) => gdStep(facts, w))
      withResidual(facts.crossJoin(broadcast(wN)))
        .withColumn("qs", floor(col("s") * lit(GdQ.toDouble)).cast("long"))
        .withColumn("bin", least(floor(col("s") * 100).cast("long"), lit(99L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          sum(col("qs")).as("qsum"))
        .select(col("bin"), col("n"), col("n_pos"),
          (col("qsum").cast("double") / col("n").cast("double") /
            lit(GdQ.toDouble)).as("mean_pred"),
          (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"))
        .withColumn("gap", col("mean_pred") - col("frac_pos"))
        .orderBy("bin")
    }),

    // ---- DBSCAN core/border/noise over the embedding plane -----------------
    // Density classification on the first two embedding coordinates:
    // grid-block each point into an eps-sized cell, fan each point out to
    // its 3×3 neighbor cells (a 9× blowup of ids+coords ONLY — the
    // payload vectors never travel), equi-join probes to cells so every
    // true eps-neighbor pair lands in exactly one partition-local
    // comparison, then count neighbors. Core = count ≥ MinPts; border =
    // non-core with a core neighbor (one semi + one anti join on the
    // ids-only pair list); noise = the rest. The equi-joined grid is the
    // standard scale-out for DBSCAN's range queries: candidate work is
    // density-bounded per cell, never all-pairs.
    "dbscan_grid_cores" -> ((s, dir) => {
      val pts = dbPoints(s, dir)
      val offs = array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
      val probes = pts.select(col("vec_id").as("ai"), col("x").as("ax"),
          col("y").as("ay"), col("cx"), col("cy"),
          explode(offs).as("o"))
        .select(col("ai"), col("ax"), col("ay"),
          (col("cx") + col("o.dx")).as("px"),
          (col("cy") + col("o.dy")).as("py"))
      val eps2 = lit(DbEps) * lit(DbEps)
      val pairs = probes.join(pts.select(col("vec_id").as("bi"),
          col("x").as("bx"), col("y").as("by"), col("cx"), col("cy")),
          probes("px") === col("cx") && probes("py") === col("cy"))
        .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")) <= eps2)
        .select(col("ai"), col("bi"))
      val cnt = pairs.groupBy(col("ai")).agg(count(lit(1)).as("nn"))
      val core = cnt.filter(col("nn") >= DbMinPts).select(col("ai"))
      val border = pairs.filter(col("ai") =!= col("bi"))
        .join(core.withColumnRenamed("ai", "bi"), "bi")
        .select(col("ai")).distinct()
        .join(core, Seq("ai"), "left_anti")
      val nPts = pts.agg(count(lit(1)).as("n_points"))
      val coreAgg = core.agg(count(lit(1)).as("n_core"),
        coalesce(sum(col("ai")), lit(0L)).as("core_id_sum"))
      val borderAgg = border.agg(count(lit(1)).as("n_border"))
      val maxNn = cnt.agg(max(col("nn")).as("max_neighbors"))
      nPts.crossJoin(coreAgg).crossJoin(borderAgg).crossJoin(maxNn)
        .select(col("n_points"), col("n_core"), col("n_border"),
          (col("n_points") - col("n_core") - col("n_border")).as("n_noise"),
          col("core_id_sum"), col("max_neighbors"))
    }),

    // ---- multinomial Naive Bayes: training statistics ----------------------
    // The language-ID / quality-filter model family (fastText-style
    // classifiers trained on warehouse text) reduced to its sufficient
    // statistics: per-(class, token) counts, per-class totals, corpus
    // vocabulary, and the Laplace-smoothed P(token|class) for the top-K
    // tokens per class. Train IS aggregation for NB — one explode + two
    // combinable groupBys — so the "training run" is a single Catalyst
    // plan with map-side partial sums; the per-class top-K goes through a
    // 5-partition window that WindowGroupLimit prunes to K rows per class
    // before the final sort. At 100 TB the shuffle carries one row per
    // distinct (class, token) per partition — vocabulary-, not
    // corpus-scale.
    "nb_train_lang" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (c, t, v) = nbCounts(s, dir)
      c.join(broadcast(t), "lang").crossJoin(broadcast(v))
        .withColumn("p",
          (col("cnt") + 1).cast("double") /
            (col("tot") + col("vocab")).cast("double"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("cnt").desc, col("tok"))).cast("long"))
        .filter(col("rnk") <= NbTopK)
        .select(col("lang"), col("rnk"), col("tok"), col("cnt"), col("tot"),
          col("vocab"), col("p"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // ---- multinomial Naive Bayes: in-database inference --------------------
    // Score every document against every class with the model trained on
    // the same corpus (resubstitution confusion matrix — the standard
    // first sanity check of a warehouse-trained classifier). Integer
    // score discipline: weights are floor(10^6·ln p̂) quantized ONCE per
    // distinct (cnt, class) pair (see NbQ scaladoc), unseen-token mass
    // uses the same-quantized w0 = floor(10^6·ln 1/(tot+V)), priors
    // likewise — so the per-doc reduction Σ c·w is exact int64 and
    // order-independent on any partitioning. Distributed shape: the
    // model (class table + weights) is dimension-scale and broadcast —
    // exactly how a trained model deploys — while the per-doc token
    // counts stay on the shuffle; argmax is a per-doc window over 5
    // candidate rows (WindowGroupLimit prunes to rank 1).
    "nb_predict_lang" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (c, t, v) = nbCounts(s, dir)
      val docs = Tables.load(s, dir, "documents")
      val d = docs.groupBy(col("lang").as("cand"))
        .agg(count(lit(1)).as("n_docs"))
      val na = docs.agg(count(lit(1)).as("n_all"))
      val cls = t.withColumnRenamed("lang", "cand")
        .crossJoin(v).join(d, "cand").crossJoin(na)
        .select(col("cand"),
          floor(lit(NbQ.toDouble) *
            log(lit(1.0) / (col("tot") + col("vocab")).cast("double")))
            .as("w0"),
          floor(lit(NbQ.toDouble) *
            log(col("n_docs").cast("double") / col("n_all").cast("double")))
            .as("prior"))
      val wts = c.join(t, "lang").crossJoin(v)
        .select(col("lang").as("cand"), col("tok"),
          floor(lit(NbQ.toDouble) *
            log((col("cnt") + 1).cast("double") /
              (col("tot") + col("vocab")).cast("double"))).as("w"))
      val dt = nbTokens(s, dir)
        .groupBy(col("doc_id"), col("lang").as("true_lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val scored = dt.crossJoin(broadcast(cls))
        .join(broadcast(wts), Seq("cand", "tok"), "left")
        .groupBy(col("doc_id"), col("true_lang"), col("cand"))
        .agg((min(col("prior")) +
          sum(col("c") * coalesce(col("w"), col("w0")))).as("score"))
      scored
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id"), col("true_lang"))
            .orderBy(col("score").desc, col("cand"))))
        .filter(col("rnk") === 1)
        .groupBy(col("true_lang"), col("cand").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("score_sum"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }))

  def oracle: Map[String, String] = {
    val facts =
      """SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         AS x1i,
        |       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1
        |            ELSE 0 END AS x2
        |FROM orders""".stripMargin
    // one GD step as SQL, parameterized on the previous weights CTE
    def step(prev: String): String =
      s"""SELECT
         |  min(w0) - $GdLr * (CAST(sum(CAST(r AS DECIMAL(38,0))) AS DOUBLE)
         |    / count(*) / $GdQ.0) AS w0,
         |  min(w1) - $GdLr * (CAST(sum(CAST(r * x1i AS DECIMAL(38,0)))
         |    AS DOUBLE) / count(*) / $GdQ.0 / 50000000.0) AS w1,
         |  min(w2) - $GdLr * (CAST(sum(CAST(r * x2 AS DECIMAL(38,0)))
         |    AS DOUBLE) / count(*) / $GdQ.0) AS w2
         |FROM (
         |  SELECT w0, w1, w2, x1i, x2,
         |         CAST(floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * $GdQ.0)
         |              AS BIGINT) - y * $GdQ AS r
         |  FROM (SELECT f.*, w.*,
         |               w0 + w1 * (x1i / CAST(50000000.0 AS DOUBLE)) + w2 * x2 AS z
         |        FROM f, $prev w))""".stripMargin
    Map(

      "logreg_quality_gd" ->
        s"""WITH f AS ($facts),
           |w0i AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1,
           |               0.0::DOUBLE AS w2),
           |s1 AS (${step("w0i")}),
           |s2 AS (${step("s1")}),
           |s3 AS (${step("s2")})
           |SELECT min(w0) AS w0, min(w1) AS w1, min(w2) AS w2,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_correct,
           |       CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
           |            AS DOUBLE) / count(*) AS accuracy,
           |       CAST(sum(CAST(r * r AS DECIMAL(38,0))) AS DOUBLE)
           |         / count(*) / ${GdQ.toDouble * GdQ.toDouble} AS mse
           |FROM (
           |  SELECT y, z, w0, w1, w2,
           |         CAST(floor((0.5 + z / (2.0 * (1.0 + abs(z)))) * $GdQ.0)
           |              AS BIGINT) - y * $GdQ AS r
           |  FROM (SELECT f.*, w.*,
           |               w0 + w1 * (x1i / CAST(50000000.0 AS DOUBLE)) + w2 * x2 AS z
           |        FROM f, s3 w))""".stripMargin,

      "logreg_calibration_bins" ->
        s"""WITH f AS ($facts),
           |w0i AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1,
           |               0.0::DOUBLE AS w2),
           |s1 AS (${step("w0i")}),
           |s2 AS (${step("s1")}),
           |s3 AS (${step("s2")}),
           |act AS (
           |  SELECT y, 0.5 + z / (2.0 * (1.0 + abs(z))) AS s
           |  FROM (SELECT f.*, w.*,
           |               w0 + w1 * (x1i / CAST(50000000.0 AS DOUBLE)) + w2 * x2 AS z
           |        FROM f, s3 w)
           |), q AS (
           |  SELECT y, CAST(floor(s * $GdQ.0) AS BIGINT) AS qs,
           |         least(CAST(floor(s * 100) AS BIGINT), 99) AS bin
           |  FROM act
           |), b AS (
           |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(y) AS BIGINT) AS n_pos,
           |         CAST(sum(qs) AS BIGINT) AS qsum
           |  FROM q GROUP BY bin
           |), m AS (
           |  SELECT bin, n, n_pos,
           |         CAST(qsum AS DOUBLE) / CAST(n AS DOUBLE) / $GdQ.0 AS mean_pred,
           |         CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
           |  FROM b
           |)
           |SELECT bin, n, n_pos, mean_pred, frac_pos,
           |       mean_pred - frac_pos AS gap
           |FROM m ORDER BY bin""".stripMargin,

      "dbscan_grid_cores" ->
        s"""WITH p AS (
           |  SELECT vec_id,
           |         CAST(embedding[1] AS DOUBLE) AS x,
           |         CAST(embedding[2] AS DOUBLE) AS y,
           |         floor(CAST(embedding[1] AS DOUBLE)
           |           / CAST($DbEps AS DOUBLE)) AS cx,
           |         floor(CAST(embedding[2] AS DOUBLE)
           |           / CAST($DbEps AS DOUBLE)) AS cy
           |  FROM embeddings
           |), probes AS (
           |  SELECT p.vec_id AS ai, p.x AS ax, p.y AS ay,
           |         p.cx + dx.d AS px, p.cy + dy.d AS py
           |  FROM p, (VALUES (-1), (0), (1)) dx(d),
           |       (VALUES (-1), (0), (1)) dy(d)
           |), pairs AS (
           |  SELECT a.ai, b.vec_id AS bi
           |  FROM probes a JOIN p b ON a.px = b.cx AND a.py = b.cy
           |  WHERE (a.ax - b.x) * (a.ax - b.x) +
           |        (a.ay - b.y) * (a.ay - b.y)
           |        <= CAST($DbEps AS DOUBLE) * CAST($DbEps AS DOUBLE)
           |), cnt AS (SELECT ai, CAST(count(*) AS BIGINT) AS nn
           |           FROM pairs GROUP BY ai),
           |core AS (SELECT ai FROM cnt WHERE nn >= $DbMinPts),
           |border AS (
           |  SELECT DISTINCT pr.ai FROM pairs pr
           |  JOIN core c ON pr.bi = c.ai
           |  WHERE pr.ai <> pr.bi
           |    AND pr.ai NOT IN (SELECT ai FROM core)
           |)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_points,
           |       (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
           |       (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
           |       (SELECT CAST(count(*) AS BIGINT) FROM p)
           |         - (SELECT CAST(count(*) AS BIGINT) FROM core)
           |         - (SELECT CAST(count(*) AS BIGINT) FROM border)
           |         AS n_noise,
           |       (SELECT coalesce(CAST(sum(ai) AS BIGINT), 0) FROM core)
           |         AS core_id_sum,
           |       (SELECT max(nn) FROM cnt) AS max_neighbors""".stripMargin,

      "nb_train_lang" ->
        s"""WITH tk AS (
           |  SELECT doc_id, lang, tok FROM (
           |    SELECT doc_id, lang,
           |           UNNEST(${graft.text.TextSql.tokens("text")}) AS tok
           |    FROM documents)
           |  WHERE tok <> ''
           |), c AS (
           |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
           |  FROM tk GROUP BY 1, 2
           |), t AS (
           |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1
           |), v AS (
           |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab FROM c
           |), r AS (
           |  SELECT c.lang, tok, cnt, tot, vocab,
           |         CAST(row_number() OVER (PARTITION BY c.lang
           |           ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
           |  FROM c JOIN t ON c.lang = t.lang CROSS JOIN v
           |)
           |SELECT lang, rnk, tok, cnt, tot, vocab,
           |       CAST(cnt + 1 AS DOUBLE) / CAST(tot + vocab AS DOUBLE) AS p
           |FROM r WHERE rnk <= $NbTopK ORDER BY lang, rnk""".stripMargin,

      "nb_predict_lang" ->
        s"""WITH tk AS (
           |  SELECT doc_id, lang, tok FROM (
           |    SELECT doc_id, lang,
           |           UNNEST(${graft.text.TextSql.tokens("text")}) AS tok
           |    FROM documents)
           |  WHERE tok <> ''
           |), c AS (
           |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
           |  FROM tk GROUP BY 1, 2
           |), t AS (
           |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1
           |), v AS (
           |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab FROM c
           |), d AS (
           |  SELECT lang AS cand, CAST(count(*) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY 1
           |), na AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents
           |), cls AS (
           |  SELECT t.lang AS cand,
           |         CAST(floor($NbQ.0 *
           |           ln(1.0 / CAST(tot + vocab AS DOUBLE))) AS BIGINT) AS w0,
           |         CAST(floor($NbQ.0 *
           |           ln(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE)))
           |           AS BIGINT) AS prior
           |  FROM t CROSS JOIN v CROSS JOIN na JOIN d ON d.cand = t.lang
           |), wts AS (
           |  SELECT c.lang AS cand, tok,
           |         CAST(floor($NbQ.0 *
           |           ln(CAST(cnt + 1 AS DOUBLE) /
           |              CAST(tot + vocab AS DOUBLE))) AS BIGINT) AS w
           |  FROM c JOIN t ON c.lang = t.lang CROSS JOIN v
           |), dt AS (
           |  SELECT doc_id, lang AS true_lang, tok,
           |         CAST(count(*) AS BIGINT) AS c
           |  FROM tk GROUP BY 1, 2, 3
           |), sc AS (
           |  SELECT doc_id, true_lang, cls.cand,
           |         min(prior) + sum(c * coalesce(w, w0)) AS score
           |  FROM dt CROSS JOIN cls
           |       LEFT JOIN wts ON wts.cand = cls.cand AND wts.tok = dt.tok
           |  GROUP BY 1, 2, 3
           |), pr AS (
           |  SELECT true_lang, cand, score,
           |         row_number() OVER (PARTITION BY doc_id, true_lang
           |           ORDER BY score DESC, cand) AS rnk
           |  FROM sc
           |)
           |SELECT true_lang, cand AS pred_lang,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(score) AS BIGINT) AS score_sum
           |FROM pr WHERE rnk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  }
}
