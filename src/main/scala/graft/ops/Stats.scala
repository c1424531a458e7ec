package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 statistical-inference operators: CUSUM changepoint detection,
  * a two-sample Kolmogorov-Smirnov test, Theil-Sen robust trend, Spearman
  * rank correlation, a Benford first-digit audit, hub link-prediction
  * scoring over the co-occurrence graph, Gini-Simpson behavioral
  * diversity, and an ordered LISTAGG.
  *
  * Portability discipline (same as [[Analytics]]): every statistic is
  * carried through the plan as exact integer/decimal arithmetic (revenue
  * in cents, ranks doubled to absorb .5 ties, KS distances as integer
  * cross-products) and converted to double by ONE mirrored final formula,
  * so the DuckDB oracle hashes bit-identically. No transcendentals except
  * IEEE-correctly-rounded `sqrt`; Benford's log10 expectations are shared
  * decimal literals, not runtime `log` calls.
  */
object Stats {

  /** ks_test_price compares the o_totalprice distributions of these two
    * order-status populations.
    */
  val KsStatusA = "F"
  val KsStatusB = "O"

  /** link_pred_hub_overlap: hub pool size (top-degree nodes) and the
    * final scored-pair cut.
    */
  val HubK = 100
  val LinkTopK = 20

  /** priority_top_orders_concat: orders kept per priority group. */
  val ConcatK = 5

  /** Coarse-bucket widths (in cents) for the distributed prefix sums:
    * order totals span ~1e4..6e7 cents and extended prices ~1e5..1e7, so
    * these yield hundreds-to-thousands of buckets — small enough for the
    * serial bucket-offset window, large enough that within-bucket windows
    * parallelize.
    */
  val KsBucketWidth = 100000L
  val RankBucketWidth = 10000L

  /** ams_f2_users: number of independent ±1-sketch estimators. */
  val AmsK = 16

  /** gini_best_split: equi-width price histogram bin, in cents ($1000). */
  val GiniBucketWidth = 100000L

  /** abc_pareto_parts: coarse bucket (in centicents of per-part revenue)
    * for the distributed descending cumulative sum.
    */
  val RevCellBucketWidth = 100000000L

  /** bootstrap_ci_revenue: resample count and the Poisson(1) CDF
    * thresholds (out of 100000) that map a uniform hash residue to a
    * per-row resample weight — the Poissonized bootstrap (each row's
    * multiplicity ~ Poisson(1) approximates multinomial resampling, the
    * standard trick for streaming/distributed bootstraps, e.g. the bag of
    * little bootstraps literature). Thresholds are shared literals.
    */
  val BootB = 32
  val BootPoissonCdf: Seq[Long] = Seq(36788L, 73576L, 91970L, 98101L, 99634L, 99941L)

  /** emb_covariance: embedding dimensionality and the fixed-point
    * quantization scale (2^20 — float coordinates carry 24 significant
    * bits, so 20 fractional bits preserve covariance to ~1e-6 relative
    * while making every accumulation exact int64).
    */
  val EmbDim = 64
  val EmbQScale = 1048576L // 2^20
  val EmbQScale2 = 1099511627776.0 // 2^40, the product scale

  /** Benford's law expected first-digit shares, log10(1 + 1/d), as
    * pre-evaluated decimal literals: both engines parse the same digit
    * string into the same correctly-rounded double, where a runtime
    * `log10` would be at the mercy of two different libm's rounding.
    */
  val BenfordShares: Seq[(Int, String)] = Seq(
    1 -> "0.3010299956639812",
    2 -> "0.17609125905568124",
    3 -> "0.12493873660829992",
    4 -> "0.09691001300805642",
    5 -> "0.07918124604762482",
    6 -> "0.06694678963061322",
    7 -> "0.05799194697768673",
    8 -> "0.05115252244738129",
    9 -> "0.04575749056067514")

  private def cents: Column = Analytics.cents

  /** Doubled average rank per distinct value: 2*avg_rank = 2*cum - cnt + 1
    * stays integral for .5-tie averages. Computed over the DISTINCT-value
    * table (one unpartitioned running sum over |distinct| rows — the
    * unavoidable global order of any exact ranking; at 100 TB the exact
    * sort is replaced by quantile-sketch approximate ranks, and the
    * distinct-value table is already far smaller than the fact table).
    */
  private def rank2(df: DataFrame, c: String): DataFrame = {
    val w = Window.orderBy(col(c))
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .select(col(c),
        (sum(col("cnt")).over(w) * 2 - col("cnt") + 1).as(s"${c}_r2"))
  }

  /** Like [[rank2]] but with the running count computed as a two-level
    * distributed prefix sum instead of one unpartitioned window: distinct
    * values are grouped into order-preserving coarse buckets (`v div
    * bucketWidth`), per-bucket totals get a tiny single-partition running
    * sum (O(#buckets) rows), and the within-bucket running sum is a window
    * PARTITIONED BY bucket — every fact-scale sort runs parallel. Exactly
    * the classic parallel scan; identical integers to the serial window,
    * so the DuckDB oracle keeps its one-window formulation.
    */
  /** The ONE two-level distributed prefix-sum construction (per-bucket
    * totals get the only serial window — O(#buckets) rows — and the
    * fact-scale running sums are bucket-partitioned): adds a `${c}_cum`
    * running total over `orderCol` for each aggregate column in `cs`.
    * Shared by the exact-rank, ECDF (KS), and rank-sum (Mann-Whitney)
    * paths so the offset arithmetic cannot drift between them.
    */
  private[ops] def bucketedCumsum(g0: DataFrame, orderCol: String,
                             bucketWidth: Long, cs: Seq[String]): DataFrame = {
    // ONE explicit bucket-keyed exchange SHARED by both consumers: `g`
    // feeds the bucket-offset aggregate AND the main running-sum window,
    // and both need exactly hash(bk) distribution — putting the
    // repartition below the fork lets exchange reuse compute g0's whole
    // subtree once (one fact scan, one shuffle write, two reads). This
    // replaces the round-14 lazy localCheckpoint, whose block-manager
    // materialization of the O(distinct) frame cost more than the
    // duplicated scan it saved below corpus scale (histogram_equidepth
    // sf1: an 18 s-CPU 32-wide checkpoint-write stage vs ~10 s of saved
    // scan+agg; weighted_median sf0.1 2.78→5.12 s — the round-14 verdict
    // watch items), and the round-13 no-break shape, which scanned the
    // facts twice. The shuffle the window needed anyway IS the shared
    // materialization — nothing extra is written at any scale.
    //
    // The repartition width is EXPLICIT (session shuffle parallelism),
    // not the implicit ENSURE_REQUIREMENTS exchange: AQE's bytes-based
    // coalescing sees a few-MB distinct-value frame and folds the
    // CPU-heavy running-sum window into ONE task (measured 2.1 s
    // single-task stages at sf0.1 in this family — bytes are the wrong
    // coalescing signal for per-row-expensive window work). The offsets
    // side is O(buckets) rows — broadcast, so the shared exchange stays
    // the ONLY fact-scale exchange between the cell aggregation and the
    // output. numShufflePartitions (already an Int) rather than parsing
    // the raw conf string: platforms that set "auto" would
    // NumberFormatException every prefix-sum query outside
    // GraftSession-built sessions.
    val nPart = g0.sparkSession.sessionState.conf.numShufflePartitions
    // explicit isnotnull(bk) BELOW the shared exchange: the inner join on
    // bk drops null keys anyway (so this filters nothing the output ever
    // kept), but without it InferFiltersFromConstraints pushes the
    // null-filter down the join-side branch ONLY — the two exchange
    // subtrees stop being canonically equal and the runtime stage cache
    // cannot dedupe them (round-15 plan diff: the off branch carried the
    // filter above its window instead).
    val g = g0.withColumn("bk", expr(s"$orderCol div $bucketWidth"))
      .filter(col("bk").isNotNull)
      .repartition(nPart, col("bk"))
    // the offsets window orders buckets by min(orderCol) — the SAME total
    // order as bk (bk = orderCol div width is monotone, buckets are
    // disjoint ranges), chosen so the offsets branch still references
    // orderCol: otherwise column pruning drops it from this branch's
    // final aggregate and the two copies of the shared exchange stop
    // being canonically equal — the runtime stage cache then runs the
    // distinct-value aggregate and shuffle twice (round-15 stage tables:
    // two ~0.5 s final-agg stages collapse to one)
    val aggs = cs.map(c => sum(col(c)).as(s"bt_$c")) :+
      min(col(orderCol)).as("bk_lo")
    val wOff = Window.orderBy("bk_lo")
    // grand totals ride the SAME O(#buckets) offsets frame and the same
    // broadcast join (an unbounded window over the per-bucket totals):
    // callers that need "sum of c over everything" read `${c}_tot` off
    // any row instead of growing a second fact branch or a fact-scale
    // totals window — both measured regressions (round 15).
    val wTot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val off = g.groupBy(col("bk")).agg(aggs.head, aggs.tail: _*)
      .select(col("bk") +:
        (cs.map(c =>
          (sum(col(s"bt_$c")).over(wOff) - col(s"bt_$c")).as(s"off_$c")) ++
         cs.map(c => sum(col(s"bt_$c")).over(wTot).as(s"${c}_tot"))): _*)
    val inner = Window.partitionBy(col("bk")).orderBy(col(orderCol))
    g.join(broadcast(off), "bk")
      .select(g0.columns.map(col) ++ cs.map(c =>
        (sum(col(c)).over(inner) + col(s"off_$c")).as(s"${c}_cum")) ++
        cs.map(c => col(s"${c}_tot")): _*)
  }

  /** Group-aware two-level prefix sum: running totals of `cs` per
    * `groupCol` in `orderCol` order, without ever sorting a whole group in
    * one task. A window partitioned ONLY by a low-cardinality group key
    * (returnflag: 3 values, priority: 5) serializes each group's distinct-
    * value table onto one task at any scale; here the serial level runs
    * over the (group × bucket) totals — O(groups · range/width) rows —
    * and the intra-bucket windows parallelize on (group, bucket).
    */
  private[ops] def bucketedCumsumBy(g0: DataFrame, groupCol: String,
                                    orderCol: String, bucketWidth: Long,
                                    cs: Seq[String]): DataFrame = {
    // same shared-exchange shape and explicit-width discipline as
    // [[bucketedCumsum]] (see comment there), keyed on (group, bucket)
    val nPart = g0.sparkSession.sessionState.conf.numShufflePartitions
    val g = g0.withColumn("bk", expr(s"$orderCol div $bucketWidth"))
      .filter(col(groupCol).isNotNull && col("bk").isNotNull)
      .repartition(nPart, col(groupCol), col("bk"))
    // min(orderCol) as the offsets order key — same role as in
    // [[bucketedCumsum]]: within a group, bucket order == min-value order,
    // and referencing orderCol keeps the two shared-exchange copies
    // canonically equal under column pruning
    val aggs = cs.map(c => sum(col(c)).as(s"bt_$c")) :+
      min(col(orderCol)).as("bk_lo")
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("bk_lo"))
    // per-group totals ride the same O(groups x buckets) offsets frame
    // and broadcast join (see [[bucketedCumsum]]): `${c}_tot` is the
    // group's grand total on every row — callers stop growing a second
    // fact branch (tot = g.groupBy(p).agg — a second scan+agg) or a
    // fact-scale totals window (a partitionBy(p) exchange whose width is
    // capped by the 3-5 distinct group values at ANY scale).
    val wTot = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off = g.groupBy(col(groupCol), col("bk")).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: col("bk") +:
        (cs.map(c =>
          (sum(col(s"bt_$c")).over(wOff) - col(s"bt_$c")).as(s"off_$c")) ++
         cs.map(c => sum(col(s"bt_$c")).over(wTot).as(s"${c}_tot"))): _*)
    val inner = Window.partitionBy(col(groupCol), col("bk"))
      .orderBy(col(orderCol))
    g.join(broadcast(off), Seq(groupCol, "bk"))
      .select(g0.columns.map(col) ++ cs.map(c =>
        (sum(col(c)).over(inner) + col(s"off_$c")).as(s"${c}_cum")) ++
        cs.map(c => col(s"${c}_tot")): _*)
  }

  private def rank2Cnt(df: DataFrame, c: String,
                       bucketWidth: Long): DataFrame =
    bucketedCumsum(df.groupBy(col(c)).agg(count(lit(1)).as("cnt")),
      c, bucketWidth, Seq("cnt"))
      .select(col(c), col("cnt"),
        (col("cnt_cum") * 2 - col("cnt") + 1).as(s"${c}_r2"))

  private def rank2Distributed(df: DataFrame, c: String,
                               bucketWidth: Long): DataFrame =
    rank2Cnt(df, c, bucketWidth).drop("cnt")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- CUSUM changepoint scan over daily revenue -------------------------
    // S_i = sum_{j<=i}(v_j - mean) flags the day where the cumulative
    // deviation from the global mean peaks — the classic Page (1954)
    // changepoint locator. Scaled by n to stay integral: n*prefix_i - i*T
    // = n*S_i exactly, so the whole scan is int64 arithmetic (headroom:
    // n_days ~ 2.4e3, T < 1e15 cents at sf10 → < 2^63). One groupBy to
    // the O(days) daily table, one ordered running sum over it; the
    // unpartitioned window never sees fact rows.
    "cusum_changepoint" -> ((s, dir) => {
      val d = Analytics.dailyRevenue(s, dir)
      val w = Window.orderBy("x")
      val t = d.agg(count(lit(1)).as("n"), sum(col("v")).as("t"))
      val c = d.select(col("x"), row_number().over(w).cast("long").as("i"),
          sum(col("v")).over(w).as("pre"))
        .crossJoin(t)
        .select(col("x"),
          (col("n") * col("pre") - col("i") * col("t")).as("cusum_scaled"))
      val mx = c.agg(max(abs(col("cusum_scaled"))).as("mx"))
      c.crossJoin(mx)
        .select(col("x").as("epoch_day"), col("cusum_scaled"),
          (abs(col("cusum_scaled")) === col("mx")).as("is_peak"))
        .orderBy("epoch_day")
    }),

    // ---- two-sample Kolmogorov-Smirnov test --------------------------------
    // D = max_x |F_A(x) - F_B(x)| between the F and O order-price
    // populations, with the max carried as the integer cross-product
    // |c_A*n_B - c_B*n_A| (exact — no float ECDF accumulation). Shape:
    // one groupBy collapses facts to distinct price points, one ordered
    // running sum walks the ECDFs over |distinct| rows, one max. At
    // 100 TB the distinct-value sweep runs over quantile-sketch bins
    // instead (the test statistic degrades gracefully with bin width).
    "ks_test_price" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus").isin(KsStatusA, KsStatusB))
        .select(cents.as("v"),
          when(col("o_orderstatus") === KsStatusA, 1L).otherwise(0L).as("a"),
          when(col("o_orderstatus") === KsStatusB, 1L).otherwise(0L).as("b"))
      // ECDFs for both populations at once via the shared [[bucketedCumsum]];
      // the population totals are the helper's `_tot` columns (computed on
      // the O(#buckets) offsets frame and carried through its broadcast
      // join), so the second pruned totals scan of earlier rounds is gone.
      // The argmax stays ONE pass via lexicographic struct max.
      val cum = bucketedCumsum(
        o.groupBy("v").agg(sum(col("a")).as("a"), sum(col("b")).as("b")),
        "v", KsBucketWidth, Seq("a", "b"))
        .select(col("v"), col("a_cum").as("ca"), col("b_cum").as("cb"),
          col("a_tot").as("n_a"), col("b_tot").as("n_b"))
      cum
        .select(col("n_a"), col("n_b"),
          abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("dn"),
          col("v"))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          max(struct(col("dn"), (-col("v")).as("nv"))).as("m"))
        .select(col("n_a"), col("n_b"), col("m.dn").as("d_num"),
          (-col("m.nv")).as("split_at"),
          (col("m.dn").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))).as("d"))
    }),

    // ---- Theil-Sen robust trend over daily revenue -------------------------
    // The median of all pairwise slopes (v_j-v_i)/(x_j-x_i), insensitive
    // to ~29% outlier days where OLS (trend_daily_revenue) is not. The
    // day table is O(days) at ANY corpus scale (the fact scan collapses
    // first), so the O(days²) pair join is ~2.9M rows forever; the exact
    // lower-median via one global row_number sort is fine at that size.
    // Each slope is one correctly-rounded double division of two exact
    // integers, and the median element (not an interpolated midpoint) is
    // selected, so the result hashes bit-identically.
    "theil_sen_trend" -> ((s, dir) => theilSenTrend(s, dir)),

    // ---- Spearman rank correlation: quantity vs extended price -------------
    // Pearson on average-tie ranks. Ranks are doubled (2*cum - cnt + 1)
    // to keep .5 tie-averages integral, so every sum entering the final
    // formula is exact decimal; the correlation is ONE mirrored double
    // expression at the end (autocorr's recipe). The quantity rank table
    // is ~50 rows (broadcast join back); the price rank table is
    // O(distinct prices) and joins back on the shuffle — the global sort
    // it needs IS what exact ranking costs, and the 100 TB variant swaps
    // in approx_percentile sketch ranks.
    "spearman_qty_price" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
        (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("p"))
      // quantity has ~50 distinct values (broadcast rank table); price is
      // near-unique, so its rank table uses the bucket-partitioned prefix
      // sum and joins back on the shuffle. The distinct counts come from a
      // separate pruned scan: folding countDistinct into the main
      // aggregate would Expand the joined fact rows 3×.
      // Grouped moment decomposition keeps every fact-scale aggregate in
      // codegen-friendly LONG arithmetic (q_r2 < 2^24 and p_r2 < 2^24 at
      // sf1, so per-row products and the per-group sums all fit int64);
      // the wide decimal products that would force per-row BigDecimal
      // math run over the ~50-row quantity-group table instead:
      //   Σ qr2·pr2   = Σ_q qr2 · (Σ_{rows with q} pr2)
      //   Σ qr2², Σ qr2 = Σ_q over group counts
      // and the price marginals come straight from the rank table
      // (Σ pr2 = Σ_p cnt·pr2), never touching the joined rows twice.
      val dec = (c: Column) => c.cast("decimal(19,0)")
      val byQ = li
        .join(broadcast(rank2(li, "q")), "q")
        // explicit-width repartition on the join key (the bucketedCumsum
        // discipline): the rank join and the grouped-moment aggregate
        // above it are CPU-heavy decimal work relative to their bytes, and
        // AQE's byte-based coalescing squeezed the ENSURE_REQUIREMENTS
        // exchange to 4 tasks at 10x data (15.5 s CPU / 4.3 s wall on a
        // 32-core session). User-specified width is AQE-exempt and
        // satisfies the shuffle-hash join's distribution requirement.
        .repartition(li.sparkSession.sessionState.conf.numShufflePartitions,
          col("p"))
        // shuffle-hash, not broadcast: the price rank table is O(distinct
        // prices) — near-fact-scale — and must never ship to every
        // executor; co-partitioning on p is the 100 TB shape
        .join(rank2Distributed(li, "p", RankBucketWidth).hint("shuffle_hash"),
          "p")
        .groupBy(col("q_r2"))
        .agg(count(lit(1)).as("cq"), sum(col("p_r2")).as("tp"),
          // pr2² peaks ~2^49 per row (long-safe); only its cross-row sum
          // can overflow int64, so the decimal cost is one add per row on
          // an already-long product
          sum((col("p_r2") * col("p_r2")).cast("decimal(22,0)")).as("syyq"))
      val m = byQ.agg(
        sum(col("cq")).as("n"),
        count(lit(1)).as("n_q"),
        sum(col("q_r2") * col("cq")).cast("double").as("sx"),
        sum(col("tp")).cast("double").as("sy"),
        sum(dec(col("q_r2")) * dec(col("tp"))).cast("double").as("sxy"),
        sum(dec(col("q_r2")) * dec(col("q_r2")) * col("cq")).cast("double")
          .as("sxx"),
        sum(col("syyq")).cast("double").as("syy"))
      val ndp = li.agg(countDistinct(col("p")).as("n_p"))
      m.crossJoin(ndp).select(col("n"), col("n_q"), col("n_p"),
        ((col("n").cast("double") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n").cast("double") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n").cast("double") * col("syy") - col("sy") * col("sy"))))
          .as("rho"))
    }),

    // ---- Benford first-digit audit of order totals -------------------------
    // Fraud/synthesis screens compare the observed first-significant-digit
    // distribution to Benford's law. The digit comes from the decimal
    // rendering of exact cents (both engines print a bigint identically —
    // no float log10), expectations are shared literals, and the only
    // doubles are the two mirrored divisions. One map-side-combined
    // groupBy over 9 keys — embarrassingly scalable.
    "benford_totalprice" -> ((s, dir) => {
      val dig = Tables.load(s, dir, "orders")
        .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      val expected = BenfordShares.foldLeft(lit(0.0)) { case (acc, (d, l)) =>
        when(col("digit") === d, expr(s"CAST($l AS DOUBLE)")).otherwise(acc)
      }
      dig.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(dig.agg(count(lit(1)).as("total")))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total").cast("double")).as("share"),
          expected.as("expected"))
        .withColumn("dev", col("share") - col("expected"))
        .orderBy("digit")
    }),

    // ---- link-prediction scoring of hub pairs ------------------------------
    // Common-neighbors affinity over the part co-occurrence graph
    // (integer-exact — Adamic-Adar's 1/log(deg) weights would reassociate
    // float sums, common-neighbor count is the same ranking family
    // without the hazard). The hub pool bounds the quadratic: top-HubK
    // nodes by degree, HubK² candidate pairs, each scored by ONE codegen'd
    // sorted-merge overlap count over the memoized adjacency arrays
    // (sorted at build) — no Σd² wedge
    // explosion (the trap the oracle's join formulation walks into at 10×
    // the row count). Reuses [[Relational.pageRankGraph]]'s checkpointed
    // adjacency, so construct cost is shared with pagerank/triangles/LP.
    "link_pred_hub_overlap" -> ((s, dir) => {
      val adj = Relational.pageRankGraph(s, dir)
      val hubs = adj.orderBy(col("d").desc, col("src")).limit(HubK)
      val a = hubs.select(col("src").as("u"), col("adj").as("au"),
        col("d").as("du"))
      val b = hubs.select(col("src").as("w"), col("adj").as("aw"),
        col("d").as("dw"))
      // broadcast one hub side against the other spread across the
      // cluster: the intersection work (HubK² set probes over hub-degree
      // arrays) lands on every core instead of the single partition a
      // 100-row nested-loop join would produce
      broadcast(a)
        .join(b.repartition(s.sparkContext.defaultParallelism),
          col("u") < col("w"))
        .select(col("u"), col("w"), col("du"), col("dw"),
          // adjacency arrays are sorted at build (pageRankGraph): the
          // overlap count is a primitive two-pointer merge, no hash set
          graft.functions.ArrayKernels.sorted_intersect_count(
            col("au"), col("aw")).as("n_common"),
          array_contains(col("au"), col("w")).as("is_edge"))
        .filter(col("n_common") > 0)
        .orderBy(col("n_common").desc, col("u"), col("w"))
        .limit(LinkTopK)
    }),

    // ---- Gini-Simpson behavioral diversity per user ------------------------
    // 1 - Σ(n_i/n)² as the exact rational (n² - Σn_i²)/n²: a pure
    // two-level aggregation (user×type partials combine map-side, then
    // user), integer until the single mirrored division. The entropy
    // formulation needs log; Gini-Simpson ranks behavior breadth the
    // same way and stays hashable.
    "user_event_diversity" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          ((col("n_events") * col("n_events") - col("ss")).cast("double") /
            (col("n_events") * col("n_events")).cast("double"))
            .as("gini_simpson"))
        .orderBy("user_id")
    }),

    // ---- Mann-Whitney U test: order prices, F vs O populations -------------
    // The rank-sum sibling of ks_test_price, over the POOLED sample with
    // tie-averaged ranks. Doubled ranks keep everything integral: the
    // pooled rank table comes from the same bucket-partitioned prefix sum,
    // R2_A = Σ_v a_v·r2_v needs NO join back to facts (the distinct table
    // carries the per-population counts), and 2·U_A = R2_A - n_A(n_A+1)
    // exactly. Only the effect size and the tie-corrected z are doubles —
    // one mirrored formula each.
    "mann_whitney_price" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus").isin(KsStatusA, KsStatusB))
        .select(cents.as("v"),
          when(col("o_orderstatus") === KsStatusA, 1L).otherwise(0L).as("a"),
          when(col("o_orderstatus") === KsStatusB, 1L).otherwise(0L).as("b"))
      val ranked = bucketedCumsum(
        o.groupBy("v").agg(sum(col("a")).as("a"), sum(col("b")).as("b"))
          .withColumn("cnt", col("a") + col("b")),
        "v", KsBucketWidth, Seq("cnt"))
        .select(col("a"), col("b"), col("cnt"),
          (col("cnt_cum") * 2 - col("cnt") + 1).as("r2"))
      val m = ranked.agg(
        sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(col("a") * col("r2")).as("r2_a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_term"))
      m.select(col("n_a"), col("n_b"),
          (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
          col("tie_term"))
        .select(col("n_a"), col("n_b"), col("u2_a"),
          (col("n_a") * col("n_b") * 2 - col("u2_a")).as("u2_b"),
          col("tie_term"),
          (col("u2_a").cast("double") /
            (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")))
            .as("effect"),
          ((col("u2_a").cast("double") / 2.0 -
            col("n_a").cast("double") * col("n_b").cast("double") / 2.0) /
            sqrt(col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
              ((col("n_a") + col("n_b") + 1).cast("double") -
                col("tie_term").cast("double") /
                  ((col("n_a") + col("n_b")).cast("double") *
                   (col("n_a") + col("n_b") - 1).cast("double")))))
            .as("z"))
    }),

    // ---- one-way ANOVA: does mean order value differ across priorities? ----
    // F = (SSB/(k-1)) / (SSW/(N-k)) from per-group (n, Σv, Σv²) — one
    // partial-aggregated pass over facts, k output rows. The only
    // order-sensitive float reduction (Σ_g s_g²/n_g over the k groups) is
    // an explicit sorted-array fold in group-key order, so both engines
    // add the same doubles in the same sequence; everything upstream is
    // exact (cents BIGINT, squares DECIMAL(30,0)).
    "anova_price_by_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), cents.as("c"))
      val m = o.groupBy(col("p")).agg(count(lit(1)).as("ng"),
        sum(col("c")).as("sg"),
        sum((col("c") * col("c")).cast("decimal(30,0)")).as("ssg"))
      val nd = (c: Column) => c.cast("double")
      val terms = m.select(col("p"), col("ng"), col("sg"), col("ssg"),
        (nd(col("sg")) * nd(col("sg")) / nd(col("ng"))).as("term"))
      val agg = terms.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("t"), sum(col("ssg")).cast("decimal(38,0)").as("ss"),
        aggregate(array_sort(collect_list(struct(col("p"), col("term")))),
          lit(0.0), (acc, x) => acc + x("term")).as("fold"))
      // ss exceeds 2^53 (~3e19 at sf0.1), and a DIRECT decimal(38)→double
      // cast is where engines drift (DuckDB's is not correctly rounded —
      // off one ulp on some values). Split ss into exact int64 halves at
      // 1e18 and recombine in double: hi/lo extraction is exact integer
      // arithmetic in both engines, int64→double casts and the *1e18+lo
      // recombination are IEEE correctly-rounded single ops — the same
      // double everywhere, data-independent. (Headroom: hi fits int64 to
      // ss ≈ 9.2e36, i.e. ~10^17 × the sf0.1 magnitude.)
      val ssd = expr("CAST(ss div 1000000000000000000 AS BIGINT)")
        .cast("double") * lit(1.0e18) +
        expr("CAST(ss % 1000000000000000000 AS BIGINT)").cast("double")
      agg.select(col("k"), col("n"),
          (col("fold") - nd(col("t")) * nd(col("t")) / nd(col("n"))).as("ssb"),
          (ssd - col("fold")).as("ssw"))
        .select(col("k"), col("n"), col("ssb"), col("ssw"),
          ((col("ssb") / (col("k").cast("double") - 1.0)) /
            (col("ssw") / (col("n").cast("double") - col("k").cast("double"))))
            .as("f"),
          (col("ssb") / (col("ssb") + col("ssw"))).as("eta_sq"))
    }),

    // ---- Kruskal-Wallis H: rank-based k-sample location test ---------------
    // The k-group generalization of Mann-Whitney, on the same doubled-
    // average-rank machinery ([[rank2Cnt]]'s distributed prefix sum —
    // integral .5-tie ranks, fact-scale sorts bucket-partitioned): per
    // group R2_g = Σ 2·rank, H = [12/(N(N+1))·Σ R̄_g²/n_g - 3(N+1)] / C
    // with the tie correction C = 1 - Σ(t³-t)/(N³-N). The k-term float
    // sum is the same sorted-array fold as the ANOVA; N³ runs in doubles
    // (overflows int64 past ~2M rows), every rank sum stays int64.
    "kruskal_price_by_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), cents.as("v"))
      val ranked = rank2Cnt(o, "v", KsBucketWidth) // (v, cnt, v_r2)
      val pv = o.groupBy(col("p"), col("v")).agg(count(lit(1)).as("npv"))
      val byG = pv.join(ranked.select(col("v"), col("v_r2")), "v")
        .groupBy(col("p")).agg(sum(col("npv")).as("ng"),
          sum(col("npv") * col("v_r2")).as("r2g"))
      val nd = (c: Column) => c.cast("double")
      val terms = byG.select(col("p"), col("ng"), col("r2g"),
        ((nd(col("r2g")) / 2.0) * (nd(col("r2g")) / 2.0) / nd(col("ng"))).as("term"))
      // tie term from the per-value counts directly, not from `ranked`:
      // the rank table's copy re-derived the whole prefix-sum pipeline
      // (join + window) just to re-read cnt, while this subtree stops at
      // the groupBy(v) aggregate — whose scan+partial stage is shared
      // with the rank branch by the runtime stage cache
      val ties = o.groupBy(col("v")).agg(count(lit(1)).as("cnt")).agg(
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie_term"))
      val agg = terms.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        aggregate(array_sort(collect_list(struct(col("p"), col("term")))),
          lit(0.0), (acc, x) => acc + x("term")).as("fold"))
      agg.crossJoin(ties)
        .select(col("k"), col("n"), col("tie_term"),
          (lit(12.0) / (nd(col("n")) * (nd(col("n")) + 1.0)) * col("fold") -
            lit(3.0) * (nd(col("n")) + 1.0)).as("h_uncorrected"),
          (lit(1.0) - nd(col("tie_term")) /
            (nd(col("n")) * nd(col("n")) * nd(col("n")) - nd(col("n"))))
            .as("tie_c"))
        .select(col("k"), col("n"), col("tie_term"), col("h_uncorrected"),
          (col("h_uncorrected") / col("tie_c")).as("h"))
    }),

    // ---- Poisson overdispersion of daily event volume ----------------------
    // The index-of-dispersion test (variance-to-mean ratio; ≈1 under a
    // Poisson arrival process, >1 ⇒ bursty): daily counts roll up once,
    // Σc and Σc² stay exact int64/decimal, and D = s²/x̄ plus the
    // chi-square form (n−1)·D come from one mirrored double formula —
    // the monitoring check that tells a pipeline whether event traffic
    // is machine-steady or campaign-bursty.
    "dispersion_daily_events" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("c"))
      val nd = (c: Column) => c.cast("double")
      daily.agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
          sum((col("c") * col("c")).cast("decimal(30,0)")).as("ss"))
        .select(col("n_days"), col("total"),
          (nd(col("total")) / nd(col("n_days"))).as("mean"),
          ((nd(col("ss")) - nd(col("total")) * nd(col("total")) / nd(col("n_days"))) /
            (nd(col("n_days")) - 1.0)).as("variance"))
        .select(col("n_days"), col("total"), col("mean"), col("variance"),
          (col("variance") / col("mean")).as("dispersion"),
          ((nd(col("n_days")) - 1.0) * (col("variance") / col("mean")))
            .as("chi2"))
    }),

    // ---- two-proportion z-test: A/B rate comparison ------------------------
    // The experimentation-platform staple: units hash-split into two
    // arms (customer-key parity — the deterministic assignment every
    // A/B system uses) and the pooled two-proportion z statistic on a
    // binary outcome (order ended FAILED). One partial-agg'd pass to
    // two rows of exact integers; every ratio is a mirrored final
    // double formula. (The event-stream conversion variant is
    // degenerate on this corpus — every clicker purchases, p = 1 —
    // so the outcome with real variance is the one under test.)
    "ab_conversion_ztest" -> ((s, dir) => {
      val m = Tables.load(s, dir, "orders")
        .groupBy((col("o_custkey") % 2).as("arm"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("x"))
      val a = m.filter(col("arm") === 0)
        .select(col("n").as("n_a"), col("x").as("x_a"))
      val b = m.filter(col("arm") === 1)
        .select(col("n").as("n_b"), col("x").as("x_b"))
      val nd = (c: Column) => c.cast("double")
      a.crossJoin(b)
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          (nd(col("x_a")) / nd(col("n_a"))).as("p_a"),
          (nd(col("x_b")) / nd(col("n_b"))).as("p_b"),
          ((nd(col("x_a")) + nd(col("x_b"))) /
            (nd(col("n_a")) + nd(col("n_b")))).as("p_pooled"))
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          col("p_a"), col("p_b"), col("p_pooled"),
          ((col("p_a") - col("p_b")) /
            sqrt(col("p_pooled") * (lit(1.0) - col("p_pooled")) *
              (lit(1.0) / nd(col("n_a")) + lit(1.0) / nd(col("n_b")))))
            .as("z"))
    }),

    // ---- Kaplan-Meier survival curve over user lifetimes -------------------
    // The right-censored survival estimator (Kaplan & Meier 1958) on user
    // activity spans: lifetime = last-first event HOURS, a user still
    // active within 24 hours of the corpus end is CENSORED (contributes to
    // risk sets but not deaths). Risk sets and death counts are exact
    // integers from one distinct-lifetime rollup (reverse running sum);
    // the survival product Π(1 - dᵢ/rᵢ) is inherently order-recursive,
    // so it runs as the usual sorted-array prefix fold on the O(distinct
    // lifetimes) rows — facts are touched once.
    "survival_kaplan_meier" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("d"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("t0"), max(col("d")).as("t1"))
      val maxD = ev.agg(max(col("d")).as("dmax"))
      val lt = users.crossJoin(broadcast(maxD))
        .select((col("t1") - col("t0")).as("lt"),
          when(col("t1") < col("dmax") - 24, 1L).otherwise(0L).as("death"))
      val g = lt.groupBy(col("lt"))
        .agg(count(lit(1)).as("n"), sum(col("death")).as("dd"))
      val w = Window.orderBy(col("lt"))
      val tot = lt.agg(count(lit(1)).as("ntot"))
      val cum = g.crossJoin(broadcast(tot))
        .select(col("lt"), col("n"), col("dd"),
          (col("ntot") - sum(col("n")).over(w) + col("n")).as("n_risk"))
      val one = cum.filter(col("dd") > 0)
        .agg(array_sort(collect_list(struct(col("lt"), col("n_risk"),
          col("dd")))).as("xs"))
        // guard: sequence(1, 0) runs DESCENDING on an empty fold input
        // and the element_at probe would throw — no deaths ⇒ no rows
        .filter(size(col("xs")) > 0)
      one.select(explode(transform(sequence(lit(1), size(col("xs"))), t => struct(
          element_at(col("xs"), t)("lt").as("lifetime_hours"),
          element_at(col("xs"), t)("n_risk").as("n_risk"),
          element_at(col("xs"), t)("dd").as("n_deaths"),
          aggregate(slice(col("xs"), lit(1), t), lit(1.0),
            (acc, x) => acc * (lit(1.0) -
              x("dd").cast("double") / x("n_risk").cast("double")))
            .as("survival")))).as("r"))
        .select(col("r")("lifetime_hours").as("lifetime_hours"),
          col("r")("n_risk").as("n_risk"),
          col("r")("n_deaths").as("n_deaths"),
          col("r")("survival").as("survival"))
        .orderBy("lifetime_hours")
    }),

    // ---- classifier evaluation: AUC via the rank-sum identity --------------
    // AUC of a quality score against a binary label (is the doc English?)
    // WITHOUT sorting per threshold: AUC = U/(n⁺·n⁻), the Mann-Whitney
    // identity, on the same doubled-average-rank prefix-sum machinery as
    // kruskal/mann-whitney — tie-correct, exact integers until the one
    // final division. The score is the integer distinct-token ppm ratio
    // (shared with select_token_budget). This is how model-eval AUC runs
    // at 100 TB: one groupBy score value, one O(distinct-scores) ranked
    // pass, no per-example sort.
    "score_auc_langid" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
          size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long")
            .as("dtoks"))
        .filter(col("toks") > 0)
        .select(expr("dtoks * 1000000 div toks").as("v"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          when(col("lang") === "en", 0L).otherwise(1L).as("neg"))
      val ranked = bucketedCumsum(
        d.groupBy(col("v")).agg(sum(col("pos")).as("pos"),
            sum(col("neg")).as("neg"))
          .withColumn("cnt", col("pos") + col("neg")),
        "v", 10000L, Seq("cnt"))
        .select(col("pos"), col("neg"),
          (col("cnt_cum") * 2 - col("cnt") + 1).as("r2"))
      ranked.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
          sum(col("pos") * col("r2")).as("r2_pos"))
        .select(col("n_pos"), col("n_neg"),
          (col("r2_pos") - col("n_pos") * (col("n_pos") + 1)).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          (col("u2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
            .as("auc"))
        .select(col("n_pos"), col("n_neg"), col("u2"), col("auc"),
          (col("auc") * 2.0 - 1.0).as("gini"))
    }),

    // ---- Page-Hinkley drift scan over 1997 daily revenue -------------------
    // The sequential drift detector (Page 1954, PH variant): M_t =
    // Σ_{j≤t}(x_j - x̄_j) with x̄_j the running mean, PH_t = M_t -
    // min_{i≤t} M_i — a sustained downward shift grows PH. Inherently
    // order-recursive (x̄_j depends on the prefix), so after the one
    // daily-rollup shuffle the O(365) series runs the same array-state
    // prefix fold as holt_daily_revenue: [S, M, j] triples, identical
    // multiply-add sequence in both engines (array state — NOT struct;
    // see the Holt note on DuckDB's struct_pack rebinding). O(days²)
    // fold work on O(days) rows; facts are touched once.
    "page_hinkley_drift" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(sum(cents).as("rev"))
      val one = daily.agg(
        array_sort(collect_list(struct(col("d"), col("rev")))).as("xs"))
      val st = one.select(col("xs"),
        transform(sequence(lit(1), size(col("xs"))), t =>
          aggregate(slice(col("xs"), lit(1), t),
            array(lit(0.0), lit(0.0), lit(0.0)),
            (acc, x) => array(
              element_at(acc, 1) + x("rev").cast("double"),
              element_at(acc, 2) + (x("rev").cast("double") -
                (element_at(acc, 1) + x("rev").cast("double")) /
                  (element_at(acc, 3) + lit(1.0))),
              element_at(acc, 3) + lit(1.0)))).as("stt"))
        .select(col("xs"), transform(col("stt"), a => element_at(a, 2)).as("ms"))
      st.select(explode(transform(sequence(lit(1), size(col("xs"))), t => struct(
          element_at(col("xs"), t)("d").as("d"),
          element_at(col("xs"), t)("rev").as("rev"),
          element_at(col("ms"), t).as("m"),
          (element_at(col("ms"), t) -
            array_min(slice(col("ms"), lit(1), t))).as("ph")))).as("r"))
        .select(col("r")("d").as("d"), col("r")("rev").as("rev"),
          col("r")("m").as("m"), col("r")("ph").as("ph"))
        .orderBy("d")
    }),

    // ---- seasonal-trend decomposition of daily revenue ---------------------
    // Classical additive decomposition: trend = centered 7-day moving
    // average (full windows only), seasonal = per-weekday mean of the
    // detrended series, residual = the rest. The detrended value is
    // carried SCALED by 7 (7v - Σ₇v — exact int64), so the weekday means
    // are integer sums until one mirrored division, and every window runs
    // over the O(days) daily table, never facts.
    "stl_decompose_daily" -> ((s, dir) => {
      val d = Analytics.dailyRevenue(s, dir)
      val w7 = Window.orderBy("x").rowsBetween(-3, 3)
      val t = d.select(col("x"), col("v"),
        sum(col("v")).over(w7).as("s7"), count(lit(1)).over(w7).as("c7"))
        .filter(col("c7") === 7)
        .withColumn("det7", col("v") * 7 - col("s7"))
        .withColumn("dow", pmod(col("x") + 4, lit(7)))
      val seas = t.groupBy(col("dow"))
        .agg(sum(col("det7")).as("sd"), count(lit(1)).as("cd"))
        .select(col("dow"),
          (col("sd").cast("double") / (col("cd") * 7).cast("double"))
            .as("seasonal"))
      t.join(broadcast(seas), "dow")
        .select(col("x").as("epoch_day"), col("v").as("cents"),
          (col("s7").cast("double") / 7.0).as("trend"), col("seasonal"),
          (col("v").cast("double") - col("s7").cast("double") / 7.0 -
            col("seasonal")).as("residual"))
        .orderBy("epoch_day")
    }),

    // ---- AMS F2 sketch over the user event stream --------------------------
    // Alon-Matias-Szegedy second frequency moment: each of AmsK
    // estimators keeps ONE counter Σ sign_j(u)·count_u; its square
    // estimates F2 = Σ count_u² unbiasedly. Fully integer end to end
    // (±1 signs from the shared polynomial hash, squares < 2^63), each
    // estimate lands beside the exact F2 with its Chebyshev
    // within-bound flag — the approx_sketches contract. Sketch updates
    // are one map-side-combined groupBy; the per-user exact counts
    // exist only to PROVE the sketch at test SF.
    "ams_f2_users" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .withColumn("h",
          graft.text.TextOps.polyHash(col("user_id").cast("string")))
      val exact = counts.agg(sum(col("c") * col("c")).as("f2_exact"))
      counts
        .select(col("c"), col("h"),
          explode(expr(s"sequence(0, ${AmsK - 1})")).as("j"))
        .select(col("j"),
          ((lit(1) - ((col("h") * (lit(1103515245L) + col("j") * 2) + col("j"))
            % graft.text.TextOps.P % 2) * 2) * col("c")).as("sc"))
        .groupBy(col("j")).agg(sum(col("sc")).as("s_j"))
        .select(col("j"), (col("s_j") * col("s_j")).as("f2_est"))
        .crossJoin(exact)
        .withColumn("within_2x",
          abs(col("f2_est") - col("f2_exact")) <= col("f2_exact") * 2)
        .orderBy("j")
    }),

    // ---- exact fixed-point embedding covariance ----------------------------
    // The d×d second-moment matrix behind PCA/whitening/ZCA, as ONE
    // map-side-combined custom Aggregator ([[graft.functions.Gramian]]):
    // coordinates quantize to 20-bit fixed point (floor(x·2^20 + 0.5) —
    // mirrored exactly in the oracle), so the whole Gramian is exact
    // int64 and hash-stable under any partitioning. The shuffle carries
    // one flat d(d+3)/2-long state per partition — the oracle's
    // all-pairs explode formulation ships |corpus|·d²/2 rows, which is
    // precisely the shape this operator exists to avoid at scale. Output:
    // the upper triangle as (i, j, cov) scalar rows.
    "emb_covariance" -> ((s, dir) => {
      val st = gramianAgg(s, dir)
      val dd = EmbDim
      st.select(explode(expr(
          s"""flatten(transform(sequence(0, ${dd - 1}), i ->
             |  transform(sequence(i, ${dd - 1}), j -> struct(
             |    i AS i, j AS j, g[0] AS n,
             |    g[CAST(i + 1 AS INT)] AS sx,
             |    g[CAST(j + 1 AS INT)] AS sy,
             |    g[CAST(${1 + dd} + i * $dd - (i * (i - 1)) div 2 + (j - i)
             |      AS INT)] AS sxy))))""".stripMargin)).as("p"))
        .select(col("p.i").as("i"), col("p.j").as("j"), col("p.n").as("n"),
          col("p.sx").as("sx"), col("p.sy").as("sy"), col("p.sxy").as("sxy"),
          ((col("p.n").cast("decimal(20,0)") * col("p.sxy").cast("decimal(20,0)")
            - col("p.sx").cast("decimal(20,0)") * col("p.sy").cast("decimal(20,0)"))
            .cast("double") /
            (col("p.n").cast("double") * col("p.n").cast("double")) /
            lit(EmbQScale2)).as("cov"))
        .orderBy("i", "j")
    }),

    // ---- CART-style best split: price threshold predicting return flag -----
    // The decision-tree building block: among equi-width price buckets,
    // find the binary split minimizing weighted Gini impurity of
    // l_returnflag. Facts collapse to per-bucket class counts (one
    // map-side-combined groupBy over ~600 keys), candidate splits are a
    // running sum over that tiny table, impurity components stay integer
    // ((nL² - ΣcL²) etc.), and the argmin is a lexicographic struct min
    // over identical doubles in both engines. At 100 TB this is exactly
    // how tree libraries scan split candidates: histogram, not sort.
    "gini_best_split" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
        expr(s"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          s" div $GiniBucketWidth").as("bk"),
        col("l_returnflag").as("cls"))
      val b = li.groupBy(col("bk")).agg(
        sum(when(col("cls") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("cls") === "N", 1L).otherwise(0L)).as("cn"),
        sum(when(col("cls") === "R", 1L).otherwise(0L)).as("cr"))
      val w = Window.orderBy("bk")
      val cum = b.select(col("bk"),
        sum(col("ca")).over(w).as("la"), sum(col("cn")).over(w).as("ln"),
        sum(col("cr")).over(w).as("lr"))
      val t = b.agg(sum(col("ca")).as("ta"), sum(col("cn")).as("tn"),
        sum(col("cr")).as("tr"))
      val split = cum.crossJoin(t)
        .select(col("bk"),
          (col("la") + col("ln") + col("lr")).as("nl"),
          (col("ta") + col("tn") + col("tr") - col("la") - col("ln") - col("lr"))
            .as("nr"),
          (col("la") * col("la") + col("ln") * col("ln") + col("lr") * col("lr"))
            .as("sl2"),
          ((col("ta") - col("la")) * (col("ta") - col("la")) +
           (col("tn") - col("ln")) * (col("tn") - col("ln")) +
           (col("tr") - col("lr")) * (col("tr") - col("lr"))).as("sr2"))
        .filter(col("nl") > 0 && col("nr") > 0)
        .select(col("bk"), col("nl"), col("nr"),
          (((col("nl") * col("nl") - col("sl2")).cast("double") /
             col("nl").cast("double") +
            (col("nr") * col("nr") - col("sr2")).cast("double") /
             col("nr").cast("double")) /
            (col("nl") + col("nr")).cast("double")).as("wgini"))
      split.agg(min(struct(col("wgini"), col("bk"))).as("m"),
          max(col("nl") + col("nr")).as("n"))
        .select(col("m.bk").as("split_bucket"),
          ((col("m.bk") + 1) * GiniBucketWidth).as("split_cents"),
          col("n"), col("m.wgini").as("wgini"))
    }),

    // ---- distribution drift between document sources -----------------------
    // Pairwise total-variation distance between per-source language
    // distributions: TVD = ½·Σ|p_l - q_l| carried as the exact integer
    // Σ|n1_l·N2 - n2_l·N1| over the (sources × langs) grid — no float
    // accumulation, one mirrored division at the end. The grid is
    // O(sources²·langs) — metadata-sized at any corpus scale; only the
    // count table touches facts (one map-side-combined groupBy).
    "source_lang_tvd" -> ((s, dir) => {
      val c = Tables.load(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("source")).agg(sum(col("n")).as("nt"))
      val langs = c.select(col("lang")).distinct()
      val pairs = tot.select(col("source").as("s1"), col("nt").as("n1"))
        .crossJoin(tot.select(col("source").as("s2"), col("nt").as("n2")))
        .filter(col("s1") < col("s2"))
      pairs.crossJoin(langs)
        .join(c.select(col("source").as("s1"), col("lang"),
          col("n").as("c1")), Seq("s1", "lang"), "left")
        .join(c.select(col("source").as("s2"), col("lang"),
          col("n").as("c2")), Seq("s2", "lang"), "left")
        .select(col("s1"), col("s2"), col("n1"), col("n2"),
          abs(coalesce(col("c1"), lit(0L)) * col("n2") -
              coalesce(col("c2"), lit(0L)) * col("n1")).as("dn"))
        .groupBy(col("s1"), col("s2"), col("n1"), col("n2"))
        .agg(sum(col("dn")).as("tvd_num"))
        .select(col("s1"), col("s2"), col("n1"), col("n2"), col("tvd_num"),
          (col("tvd_num").cast("double") /
            (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
            .as("tvd"))
        .orderBy("s1", "s2")
    }),

    // ---- Poissonized bootstrap CI for mean order revenue -------------------
    // BootB deterministic resamples: each (row, b) draws a Poisson(1)
    // multiplicity from the shared hash mix (no RNG, same draw on any
    // cluster or engine), each resample mean is an exact integer ratio,
    // and the CI is an order statistic of the 32 means (disc ranks — no
    // interpolation). One exploded pass with map-side combine: the
    // shuffle carries B partial rows per partition. This is how you
    // bootstrap a 100 TB aggregate — multiplicities, not copies.
    "bootstrap_ci_revenue" -> ((s, dir) => {
      val p = graft.text.TextOps.P
      val wExpr = {
        val mix = ((col("h") * (lit(1103515245L) + col("b") * 2) + col("b"))
          % p % 100000L)
        // reverse fold so the OUTERMOST when tests the smallest threshold
        // (ascending CASE semantics, same as the oracle's WHEN chain)
        BootPoissonCdf.zipWithIndex.reverse
          .foldLeft(lit(BootPoissonCdf.size.toLong)) {
            case (acc, (t, i)) => when(mix < t, i.toLong).otherwise(acc)
          }
      }
      val o = Tables.load(s, dir, "orders")
        .select(cents.as("c"),
          graft.text.TextOps.polyHash(col("o_orderkey").cast("string")).as("h"))
      val means = o
        .select(col("c"), col("h"),
          explode(expr(s"sequence(0, ${BootB - 1})")).as("b"))
        .select(col("b"), col("c"), wExpr.as("w"))
        .groupBy(col("b"))
        .agg(sum(col("w") * col("c")).as("vsum"), sum(col("w")).as("wsum"))
        .select(col("b"),
          (col("vsum").cast("double") / col("wsum").cast("double")).as("m"))
      val ranked = means.select(col("m"), row_number().over(
        Window.orderBy(col("m"), col("b"))).as("rk"))
      val t = Tables.load(s, dir, "orders")
        .agg(count(lit(1)).as("n"), sum(cents).as("total"))
      ranked.crossJoin(t)
        .groupBy(col("n"), col("total"))
        .agg(min(when(col("rk") === 2, col("m"))).as("ci_lo"),
          min(when(col("rk") === BootB - 1, col("m"))).as("ci_hi"))
        .select(col("n"),
          (col("total").cast("double") / col("n").cast("double"))
            .as("mean_cents"),
          col("ci_lo"), col("ci_hi"), lit(BootB).as("n_resamples"))
    }),

    // ---- one-pass Pearson correlation matrix -------------------------------
    // All pairwise correlations among the lineitem numerics from ONE
    // aggregate pass (sums, squares, cross-products — the only fact-scale
    // work), then the 6 pair formulas over a single row. Products stay
    // int64 per row; only the cross-row sums are decimal. The classic
    // "sufficient statistics once, derive many" shape.
    "corr_matrix_lineitem" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(
        (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("x1"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("x2"),
        (col("l_discount").cast("decimal(8,4)") * 10000).cast("long").as("x3"),
        (col("l_tax").cast("decimal(8,4)") * 10000).cast("long").as("x4"))
      val cols = Seq("x1", "x2", "x3", "x4")
      val sums = cols.map(c => sum(col(c)).cast("double").as(s"s_$c")) ++
        (for (a <- cols; b <- cols if a <= b) yield
          sum((col(a) * col(b)).cast("decimal(24,0)")).cast("double")
            .as(s"s_${a}_$b"))
      val m = li.agg(count(lit(1)).cast("double").as("n"), sums: _*)
      val pairs = for (a <- cols; b <- cols if a < b) yield (a, b)
      val rows = pairs.map { case (a, b) =>
        struct(lit(a).as("var_a"), lit(b).as("var_b"),
          ((col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
            (sqrt(col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a")) *
             sqrt(col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b"))))
            .as("corr"))
      }
      m.select(explode(array(rows: _*)).as("r"))
        .select(col("r.var_a").as("var_a"), col("r.var_b").as("var_b"),
          col("r.corr").as("corr"))
        .orderBy("var_a", "var_b")
    }),

    // ---- Welch's t-test: order prices, F vs O populations ------------------
    // The unequal-variance two-sample t — the parametric sibling of
    // ks/mann_whitney over the same populations, computed entirely from
    // one pass of exact sufficient statistics (counts, cent sums, decimal
    // squared sums) with the t statistic, Cohen's d, and the
    // Welch-Satterthwaite degrees of freedom as mirrored final formulas.
    "welch_ttest_price" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus").isin(KsStatusA, KsStatusB))
        .select(col("o_orderstatus").as("st"), cents.as("c"))
      val m = o.groupBy(col("st")).agg(count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        sum((col("c") * col("c")).cast("decimal(30,0)")).as("ss"))
      val a = m.filter(col("st") === KsStatusA)
        .select(col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a"))
      val b = m.filter(col("st") === KsStatusB)
        .select(col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b"))
      val nd = (c: Column) => c.cast("double")
      a.crossJoin(b)
        .select(col("n_a"), col("n_b"),
          (nd(col("s_a")) / nd(col("n_a"))).as("mean_a"),
          (nd(col("s_b")) / nd(col("n_b"))).as("mean_b"),
          ((nd(col("ss_a")) - nd(col("s_a")) * nd(col("s_a")) / nd(col("n_a"))) /
            (nd(col("n_a")) - 1.0)).as("var_a"),
          ((nd(col("ss_b")) - nd(col("s_b")) * nd(col("s_b")) / nd(col("n_b"))) /
            (nd(col("n_b")) - 1.0)).as("var_b"))
        .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          ((col("mean_a") - col("mean_b")) /
            sqrt(col("var_a") / col("n_a").cast("double") +
                 col("var_b") / col("n_b").cast("double"))).as("t"),
          (pow(col("var_a") / col("n_a").cast("double") +
               col("var_b") / col("n_b").cast("double"), 2.0) /
            (pow(col("var_a") / col("n_a").cast("double"), 2.0) /
               (col("n_a").cast("double") - 1.0) +
             pow(col("var_b") / col("n_b").cast("double"), 2.0) /
               (col("n_b").cast("double") - 1.0))).as("df"),
          ((col("mean_a") - col("mean_b")) /
            sqrt(((col("n_a").cast("double") - 1.0) * col("var_a") +
                  (col("n_b").cast("double") - 1.0) * col("var_b")) /
                 (col("n_a").cast("double") + col("n_b").cast("double") - 2.0)))
            .as("cohens_d"))
    }),

    // ---- exact grouped box plot: price five-number summary per priority ----
    // Exact q1/median/q3 (disc lower ranks — no interpolation) plus
    // min/max and the IQR-fence outlier count, per priority, via the
    // grouped ECDF: distinct (priority, value) counts, a priority-
    // partitioned running sum (parallel across groups), and rank
    // SELECTION by struct-min — the grouped form of the exact order
    // statistics machinery, never a per-group sort of raw facts.
    "boxplot_price_by_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), cents.as("v"))
      val g = o.groupBy(col("p"), col("v")).agg(count(lit(1)).as("cnt"))
      // group-aware two-level prefix sum (see weighted_median_price)
      val cum = bucketedCumsumBy(g, "p", "v", 1000000L, Seq("cnt"))
        .select(col("p"), col("v"), col("cnt_cum").as("cw"), col("cnt_tot"))
      // per-group n is the helper's cnt_tot (computed on the O(groups x
      // buckets) offsets frame, carried through its broadcast join — no
      // second fact branch, no group-capped window); lo/hi are rank
      // selections too: the smallest v whose running count reaches 1 is
      // the minimum, and the one reaching n is the maximum (cw is
      // strictly increasing across a group's distinct values).
      def pick(rank: Column): Column =
        min(when(col("cw") >= rank, col("v")))
      val q = cum.withColumn("n", col("cnt_tot"))
        .groupBy(col("p"), col("n"))
        .agg(pick(lit(1L)).as("lo"),
          pick(expr("(n + 3) div 4")).as("q1"), // ceil(n/4)
          pick(expr("(n + 1) div 2")).as("med"), // lower median
          pick(expr("(n * 3 + 3) div 4")).as("q3"), // ceil(3n/4)
          pick(col("n")).as("hi"))
      // classic 1.5·IQR fences kept integer-exact by doubling both sides:
      // v < q1 - 1.5(q3-q1)  ⇔  2v < 5·q1 - 3·q3
      val fenced = o.join(broadcast(q), "p")
        .filter(col("v") * 2 < col("q1") * 5 - col("q3") * 3 ||
          col("v") * 2 > col("q3") * 5 - col("q1") * 3)
        .groupBy(col("p")).agg(count(lit(1)).as("n_outliers"))
      q.join(fenced, Seq("p"), "left")
        .select(col("p").as("o_orderpriority"), col("n"), col("lo"),
          col("q1"), col("med"), col("q3"), col("hi"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
        .orderBy("o_orderpriority")
    }),

    // ---- sequential pattern mining: top event-type trigrams ----------------
    // The most frequent length-3 behavioral patterns across user streams:
    // per-user lead(1)/lead(2) windows assemble consecutive triples (a
    // per-user sort — the unavoidable order of sequence mining, fully
    // partition-parallel), then one map-side-combined count and a top-20
    // cut. Exact integer counts; ties break lexicographically.
    "event_trigram_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e1"))
        .select(col("e1"),
          lead(col("e1"), 1).over(w).as("e2"),
          lead(col("e1"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    }),

    // ---- ordered LISTAGG: top order keys per priority ----------------------
    // The SQL LISTAGG/string_agg shape: row_number + rank-filter compiles
    // to WindowGroupLimit (per-partition top-k, no full sort of the fact
    // table), and the group concat assembles the k survivors in rank
    // order via array_sort on (rn, key) structs — deterministic on both
    // engines, O(k) per group.
    "priority_top_orders_concat" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("c").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= ConcatK)
        .groupBy(col("o_orderpriority"))
        .agg(
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("rn"), col("o_orderkey").as("k")))),
            x => x.getField("k").cast("string"))).as("top_keys"),
          sum(col("c")).as("topk_cents"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // ---- weighted median: quantity-weighted price centre per return flag ---
    // Same grouped-cell + cumulative-rank machinery as
    // boxplot_price_by_priority, but the cells carry TWO masses — row count
    // and quantity — so the plain and weighted medians come out of one
    // O(distinct prices) two-level prefix-sum pass ([[bucketedCumsumBy]]:
    // serial only over (flag × price-bucket) totals, never a whole flag in
    // one task). Lower-median selection (min v with
    // 2·cum ≥ total) keeps every comparison integer; no doubles anywhere.
    "weighted_median_price" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("p"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("v"),
          col("l_quantity").cast("long").as("w"))
      val g = li.groupBy(col("p"), col("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("w")).as("wt"))
      // group-aware two-level prefix sum: a window partitioned by the
      // 3-value returnflag alone would sort each flag's whole distinct-
      // price table in ONE task at any scale
      // per-group totals are the helper's `_tot` columns — computed on
      // the O(groups x buckets) offsets frame and carried through its
      // broadcast join; no second fact branch, no group-capped window
      val cum = bucketedCumsumBy(g, "p", "v", 1000000L, Seq("cnt", "wt"))
        .select(col("p"), col("v"),
          col("cnt_cum").as("cc"), col("wt_cum").as("cw"),
          col("cnt_tot").as("n"), col("wt_tot").as("tw"))
      cum
        .groupBy(col("p"), col("n"), col("tw"))
        .agg(min(when(col("cc") * 2 >= col("n"), col("v"))).as("median_cents"),
          min(when(col("cw") * 2 >= col("tw"), col("v"))).as("wmedian_cents"))
        .select(col("p").as("l_returnflag"), col("n"),
          col("tw").as("total_qty"), col("median_cents"),
          col("wmedian_cents"))
        .orderBy("l_returnflag")
    }),

    // ---- winsorized + trimmed means: robust pricing centre per priority ----
    // Rank cutoffs (ceil(0.05n)/ceil(0.95n)) come from the grouped-cell
    // cumulative table, broadcast back over the facts for ONE clamp/filter
    // aggregation pass — integer cents end to end, the two means converted
    // by one mirrored double division each.
    "winsorized_price_stats" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), cents.as("v"))
      val g = o.groupBy(col("p"), col("v")).agg(count(lit(1)).as("cnt"))
      // same group-aware two-level discipline as weighted_median_price
      val cum = bucketedCumsumBy(g, "p", "v", 1000000L, Seq("cnt"))
        .select(col("p"), col("v"), col("cnt_cum").as("cw"),
          col("cnt_tot").as("n"))
      def pick(rank: Column): Column = min(when(col("cw") >= rank, col("v")))
      val q = cum
        .groupBy(col("p"), col("n"))
        .agg(pick(expr("(n * 5 + 99) div 100")).as("p05"),
          pick(expr("(n * 95 + 99) div 100")).as("p95"))
      o.join(broadcast(q), "p")
        .groupBy(col("p"), col("n"), col("p05"), col("p95"))
        .agg(
          sum(greatest(col("p05"), least(col("p95"), col("v")))).as("wsum"),
          sum(when(col("v").between(col("p05"), col("p95")), col("v")))
            .as("tsum"),
          count(when(col("v").between(col("p05"), col("p95")), lit(1)))
            .as("tn"))
        .select(col("p").as("o_orderpriority"), col("n"), col("p05"),
          col("p95"),
          (col("wsum").cast("double") / col("n")).as("winsor_mean_cents"),
          (col("tsum").cast("double") / col("tn")).as("trimmed_mean_cents"),
          col("tn").as("n_kept"))
        .orderBy("o_orderpriority")
    }),

    // ---- MAD outlier days: breakdown-resistant daily-revenue anomalies -----
    // Complements anomaly_daily_revenue's moment z-scores with the median
    // absolute deviation (50% breakdown point vs the mean/stddev's 0%).
    // The fact scan collapses to the O(days) daily table first; both
    // medians are then row_number rank-picks over that calendar-bounded
    // series (~2.4K rows at ANY corpus scale — the single-partition
    // windows are deliberately tiny, same argument as theil_sen_trend).
    // dev > 3·MAD compares integers; top-20 by deviation.
    "mad_outlier_days" -> ((s, dir) => {
      val d = Analytics.dailyRevenue(s, dir)
      val tot = d.agg(count(lit(1)).as("n"))
      val byV = Window.orderBy(col("v"), col("x"))
      val med = d.withColumn("rn", row_number().over(byV)).crossJoin(tot)
        .filter(col("rn") === expr("(n + 1) div 2")).select(col("v").as("med"))
      val dev = d.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("v") - col("med")))
      val byDev = Window.orderBy(col("dev"), col("x"))
      val mad = dev.withColumn("rn", row_number().over(byDev)).crossJoin(tot)
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("dev").as("mad"))
      dev.crossJoin(broadcast(mad))
        .select(col("x").as("epoch_day"), col("v").as("revenue_cents"),
          col("dev").as("dev_cents"), col("med").as("med_cents"),
          col("mad").as("mad_cents"),
          (col("dev") > col("mad") * 3).as("is_outlier"))
        .orderBy(col("dev_cents").desc, col("epoch_day")).limit(20)
    }),

    // ---- ABC / Pareto classification of parts by revenue -------------------
    // The 80/95 cumulative-share split every inventory/curation pipeline
    // runs: parts collapse to per-REVENUE-VALUE cells (classification at
    // cell granularity — equal-revenue parts share a class, so no
    // arbitrary tie-break enters the result), the descending cumulative
    // revenue comes from the shared two-level [[bucketedCumsum]] (the
    // only serial window is O(#coarse buckets)), and the class decision
    // 5·cum ≤ 4·tot / 20·cum ≤ 19·tot stays in exact integer centicents
    // (decimal(38,0) headroom for the multiplied compare at any SF).
    "abc_pareto_parts" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(col("l_partkey"),
        ((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
          (lit(100L) - (col("l_discount").cast("decimal(18,2)") * 100)
            .cast("long"))).as("cc"))
      val parts = li.groupBy(col("l_partkey")).agg(sum(col("cc")).as("rev"))
      val cells = parts.groupBy(col("rev"))
        .agg(count(lit(1)).as("n_parts"),
          (col("rev") * count(lit(1))).as("rev_sum"))
        .withColumn("neg", -col("rev"))
      // the grand total is the helper's rev_sum_tot (computed on the
      // O(#buckets) offsets frame, carried through its broadcast join) —
      // the separate tot branch re-derived the cells aggregate
      val cum = bucketedCumsum(cells, "neg", RevCellBucketWidth,
        Seq("rev_sum"))
        .withColumn("t", col("rev_sum_tot"))
      val c38 = col("rev_sum_cum").cast("decimal(38,0)")
      val t38 = col("t").cast("decimal(38,0)")
      cum
        .select(col("n_parts"), col("rev_sum"),
          when(c38 * 5 <= t38 * 4, "A")
            .when(c38 * 20 <= t38 * 19, "B").otherwise("C").as("abc_class"),
          col("t"))
        .groupBy(col("abc_class"))
        .agg(sum(col("n_parts")).as("n_parts"),
          sum(col("rev_sum")).as("revenue_cc"),
          (sum(col("rev_sum")).cast("double") / min(col("t")))
            .as("revenue_share"))
        .orderBy("abc_class")
    }))

  // --------------------------------------------------------------------------

  /** Theil-Sen: the lower median of all pairwise daily-revenue slopes.
    *
    * The DISTRIBUTED part is the only part that scales with the corpus:
    * the fact scan collapses to the O(days) daily table (bounded by the
    * calendar — ~2.4K rows at every SF, ~4K for a decade). Slope-pair
    * expansion and rank selection over C(days,2) ≈ 3M doubles is a
    * DRIVER-SIZED problem at normal calendars, and a Spark sort of it is
    * pure ceremony (measured: the range-partitioned zipWithIndex
    * selection spent 7 s of scheduler/row-conversion overhead on work the
    * driver does in ~200 ms) — so up to [[TsMaxDriverDays]] the selection
    * runs on the collected day series, the same documented
    * driver-coordination family as kcenter/bloom, memoized per
    * (session, dir). The tie ORDER among equal slopes cannot change the
    * value at a given rank, so sorting the raw doubles reproduces the
    * oracle's (slope, x1, x2) order exactly.
    *
    * Above the cap (a ~decade of days costs C(4k,2)·8 B ≈ 64 MB on the
    * driver; a century would cost 2.7 GB and silently OOM) the SAME exact
    * selection runs distributed: pair expansion fans out over the
    * broadcast day array (each task emits one i-stripe of slopes — never
    * the full C(n,2) in one place), a range-partitioned sort orders them,
    * and per-partition counts locate the global rank so exactly one
    * partition materializes one element. Identical result by
    * construction — the fallback spec pins driver == distributed.
    */
  val TsMaxDriverDays = 4000

  private val tsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int),
      (Long, Long, Double)]()

  def theilSenTrend(s: SparkSession, dir: String,
                    maxDriverDays: Int = TsMaxDriverDays): DataFrame = {
    tsMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    val (nDays, m, med) = tsMemo.computeIfAbsent((s, dir, maxDriverDays), _ => {
      val d = Analytics.dailyRevenue(s, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val n = d.length.toLong
      val nPairs = n * (n - 1) / 2
      val medianRank = (nPairs + 1) / 2 - 1 // 0-indexed lower median
      if (d.length <= maxDriverDays) {
        val slopes = new Array[Double](nPairs.toInt)
        var k = 0
        var i = 0
        while (i < d.length) {
          var j = i + 1
          while (j < d.length) {
            slopes(k) = (d(j)._2 - d(i)._2).toDouble / (d(j)._1 - d(i)._1).toDouble
            k += 1
            j += 1
          }
          i += 1
        }
        java.util.Arrays.sort(slopes)
        (n, nPairs, slopes(medianRank.toInt))
      } else {
        val sc = s.sparkContext
        val bd = sc.broadcast(d)
        val parts = math.min(d.length, math.max(sc.defaultParallelism, 32))
        val sorted = sc.parallelize(0 until d.length, parts)
          .flatMap { i =>
            val dd = bd.value
            (i + 1 until dd.length).iterator.map(j =>
              (dd(j)._2 - dd(i)._2).toDouble / (dd(j)._1 - dd(i)._1).toDouble)
          }
          .sortBy(identity) // RangePartitioner: globally ordered partitions
        val counts = sorted.mapPartitions(it => Iterator(it.size.toLong),
          preservesPartitioning = true).collect()
        // before(i) = ranks preceding partition i; partition p holds the
        // global medianRank iff before(p) <= medianRank < before(p+1).
        // before.last = total > medianRank always, so the last index with
        // before <= medianRank is a real partition (empty ones skip past).
        val before = counts.scanLeft(0L)(_ + _)
        val p = before.lastIndexWhere(_ <= medianRank)
        val off = medianRank - before(p)
        val value = sorted.mapPartitionsWithIndex((idx, it) =>
          if (idx == p) it.slice(off.toInt, off.toInt + 1) else Iterator.empty)
          .collect()(0)
        bd.destroy()
        (n, nPairs, value)
      }
    })
    s.range(1).select(lit(nDays).as("n_days"), lit(m).as("n_pairs"),
      lit(med).as("slope_cents_per_day"))
  }

  /** Top principal component of the embedding corpus: power iteration on
    * the d×d covariance assembled by the same exact fixed-point Gramian
    * the `emb_covariance` query ships ([[graft.functions.Gramian]] — ONE
    * distributed pass), then [[PcaIters]] deterministic driver-side
    * matvec rounds on the d×d matrix (microseconds at any corpus scale —
    * the corpus never participates in the iteration). Start vector e_0,
    * L2-normalized each round; returns (eigenvector, eigenvalue). No
    * oracle (an eigensolve is not SQL); StatsSpec pins the residual
    * ‖Cv - λv‖ and the Rayleigh quotient.
    */
  val PcaIters = 300

  private val pcaMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (Array[Double], Double)]()

  /** Driver-coordinated stats memos (Theil–Sen slope table, PCA power
    * iteration) — [[graft.Memos.clearAll]]'s entry point into this file.
    */
  def clearStatsCaches(): Unit = { tsMemo.clear(); pcaMemo.clear() }

  /** The ONE quantize-and-Gramian construction shared by the
    * `emb_covariance` query and [[topPrincipalComponent]] — the 20-bit
    * quantization expression is load-bearing for oracle parity (the SQL
    * mirror matches it cast-for-cast), so it must not fork.
    */
  private def gramianAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{udaf => mkUdaf}
    val q = Tables.load(s, dir, "embeddings")
      .select(expr(s"transform(embedding, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * $EmbQScale.0 + 0.5) AS BIGINT))")
        .as("e"))
    val gram = mkUdaf(new graft.functions.Gramian(EmbDim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    q.agg(gram(col("e")).as("g"))
  }

  def topPrincipalComponent(s: SparkSession, dir: String): (Array[Double], Double) = {
    pcaMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    pcaMemo.computeIfAbsent((s, dir), _ => {
      val d = EmbDim
      val g = gramianAgg(s, dir).head().getSeq[Long](0)
      val n = g(0).toDouble
      val cov = Array.ofDim[Double](d, d)
      var k = 1 + d
      for (i <- 0 until d; j <- i until d) {
        val c = (n * g(k) - g(1 + i).toDouble * g(1 + j)) / (n * n) / EmbQScale2
        cov(i)(j) = c
        cov(j)(i) = c
        k += 1
      }
      var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
      var lambda = 0.0
      for (_ <- 1 to PcaIters) {
        val w = Array.tabulate(d)(i => {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
          acc
        })
        lambda = math.sqrt(w.map(x => x * x).sum)
        v = w.map(_ / lambda)
      }
      (v, lambda)
    })
  }

  private def oracleCents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  def oracle: Map[String, String] = Map(

    "cusum_changepoint" ->
      s"""WITH daily AS (
         |  ${Analytics.oracleDaily.replace("\n", "\n  ")}
         |), t AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS t
         |  FROM daily
         |), c AS (
         |  SELECT x,
         |         n * CAST(sum(v) OVER (ORDER BY x) AS BIGINT)
         |           - CAST(row_number() OVER (ORDER BY x) AS BIGINT) * t
         |           AS cusum_scaled
         |  FROM daily, t
         |)
         |SELECT x AS epoch_day, cusum_scaled,
         |       abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM c)
         |         AS is_peak
         |FROM c ORDER BY epoch_day""".stripMargin,

    "ks_test_price" ->
      s"""WITH o AS (
         |  SELECT $oracleCents AS v,
         |         CASE WHEN o_orderstatus = '$KsStatusA' THEN 1 ELSE 0 END AS a,
         |         CASE WHEN o_orderstatus = '$KsStatusB' THEN 1 ELSE 0 END AS b
         |  FROM orders WHERE o_orderstatus IN ('$KsStatusA', '$KsStatusB')
         |), g AS (
         |  SELECT v, CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b
         |  FROM o GROUP BY v
         |), t AS (
         |  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
         |  FROM o
         |), d AS (
         |  SELECT v, n_a, n_b,
         |         abs(CAST(sum(a) OVER (ORDER BY v) AS BIGINT) * n_b
         |           - CAST(sum(b) OVER (ORDER BY v) AS BIGINT) * n_a) AS dn
         |  FROM g, t
         |), m AS (SELECT max(dn) AS d_num FROM d)
         |SELECT n_a, n_b, d_num, min(v) AS split_at,
         |       CAST(d_num AS DOUBLE) /
         |         (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d
         |FROM d, m WHERE dn = d_num GROUP BY n_a, n_b, d_num""".stripMargin,

    "theil_sen_trend" ->
      s"""WITH daily AS (
         |  ${Analytics.oracleDaily.replace("\n", "\n  ")}
         |), pairs AS (
         |  SELECT d1.x AS x1, d2.x AS x2,
         |         CAST(d2.v - d1.v AS DOUBLE) / CAST(d2.x - d1.x AS DOUBLE)
         |           AS slope
         |  FROM daily d1 JOIN daily d2 ON d2.x > d1.x
         |), t AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         |r AS (
         |  SELECT slope,
         |         CAST(row_number() OVER (ORDER BY slope, x1, x2) AS BIGINT)
         |           AS rn
         |  FROM pairs
         |)
         |SELECT n_days, m AS n_pairs, slope AS slope_cents_per_day
         |FROM r, t, nd WHERE rn = (m + 1) // 2""".stripMargin,

    "spearman_qty_price" ->
      """WITH li AS (
        |  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS p
        |  FROM lineitem
        |), qr AS (
        |  SELECT q, CAST(sum(cnt) OVER (ORDER BY q) * 2 - cnt + 1 AS BIGINT)
        |           AS q_r2
        |  FROM (SELECT q, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY q)
        |), pr AS (
        |  SELECT p, CAST(sum(cnt) OVER (ORDER BY p) * 2 - cnt + 1 AS BIGINT)
        |           AS p_r2
        |  FROM (SELECT p, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY p)
        |), j AS (
        |  SELECT li.q, li.p, q_r2, p_r2
        |  FROM li JOIN qr ON li.q = qr.q JOIN pr ON li.p = pr.p
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(DISTINCT q) AS BIGINT) AS n_q,
        |         CAST(count(DISTINCT p) AS BIGINT) AS n_p,
        |         CAST(sum(q_r2) AS DOUBLE) AS sx,
        |         CAST(sum(p_r2) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(q_r2 AS DECIMAL(19,0)) *
        |                  CAST(p_r2 AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(q_r2 AS DECIMAL(19,0)) *
        |                  CAST(q_r2 AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(p_r2 AS DECIMAL(19,0)) *
        |                  CAST(p_r2 AS DECIMAL(19,0))) AS DOUBLE) AS syy
        |  FROM j
        |)
        |SELECT n, n_q, n_p,
        |       (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |         (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |          sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS rho
        |FROM m""".stripMargin,

    "benford_totalprice" -> {
      val cases = BenfordShares.map { case (d, l) =>
        s"WHEN $d THEN CAST($l AS DOUBLE)"
      }.mkString(" ")
      s"""WITH dig AS (
         |  SELECT CAST(substr(CAST($oracleCents AS VARCHAR), 1, 1) AS INT)
         |           AS digit
         |  FROM orders
         |), g AS (
         |  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dig GROUP BY digit
         |), t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM dig)
         |SELECT digit, n,
         |       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         |       CASE digit $cases ELSE 0.0 END AS expected,
         |       CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
         |         - (CASE digit $cases ELSE 0.0 END) AS dev
         |FROM g, t ORDER BY digit""".stripMargin
    },

    "link_pred_hub_overlap" ->
      s"""WITH pp AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |), edges AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM pp a JOIN pp b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |), deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
         |), hubs AS (
         |  SELECT src AS u, d FROM deg ORDER BY d DESC, src LIMIT $HubK
         |), cn AS (
         |  SELECT e1.src AS u, e2.src AS w, CAST(count(*) AS BIGINT)
         |           AS n_common
         |  FROM edges e1 JOIN edges e2
         |    ON e1.dst = e2.dst AND e1.src < e2.src
         |  WHERE e1.src IN (SELECT u FROM hubs)
         |    AND e2.src IN (SELECT u FROM hubs)
         |  GROUP BY e1.src, e2.src
         |)
         |SELECT cn.u, cn.w, h1.d AS du, h2.d AS dw, n_common,
         |       EXISTS (SELECT 1 FROM edges e
         |               WHERE e.src = cn.u AND e.dst = cn.w) AS is_edge
         |FROM cn JOIN hubs h1 ON cn.u = h1.u JOIN hubs h2 ON cn.w = h2.u
         |WHERE n_common > 0
         |ORDER BY n_common DESC, cn.u, cn.w LIMIT $LinkTopK""".stripMargin,

    "user_event_diversity" ->
      """WITH g AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type
        |), u AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |         CAST(count(*) AS BIGINT) AS n_types,
        |         CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM g GROUP BY user_id
        |)
        |SELECT user_id, n_events, n_types,
        |       CAST(n_events * n_events - ss AS DOUBLE) /
        |         CAST(n_events * n_events AS DOUBLE) AS gini_simpson
        |FROM u ORDER BY user_id""".stripMargin,

    "mann_whitney_price" ->
      s"""WITH o AS (
         |  SELECT $oracleCents AS v,
         |         CASE WHEN o_orderstatus = '$KsStatusA' THEN 1 ELSE 0 END AS a,
         |         CASE WHEN o_orderstatus = '$KsStatusB' THEN 1 ELSE 0 END AS b
         |  FROM orders WHERE o_orderstatus IN ('$KsStatusA', '$KsStatusB')
         |), g AS (
         |  SELECT v, CAST(sum(a) AS BIGINT) AS a, CAST(sum(b) AS BIGINT) AS b,
         |         CAST(sum(a) + sum(b) AS BIGINT) AS cnt
         |  FROM o GROUP BY v
         |), r AS (
         |  SELECT a, b, cnt,
         |         CAST(sum(cnt) OVER (ORDER BY v) * 2 - cnt + 1 AS BIGINT) AS r2
         |  FROM g
         |), m AS (
         |  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         |         CAST(sum(a * r2) AS BIGINT) AS r2_a,
         |         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
         |  FROM r
         |), u AS (
         |  SELECT n_a, n_b, r2_a - n_a * (n_a + 1) AS u2_a, tie_term FROM m
         |)
         |SELECT n_a, n_b, u2_a, n_a * n_b * 2 - u2_a AS u2_b, tie_term,
         |       CAST(u2_a AS DOUBLE) /
         |         (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS effect,
         |       (CAST(u2_a AS DOUBLE) / 2.0 -
         |          CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
         |         sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
         |           (CAST(n_a + n_b + 1 AS DOUBLE) -
         |            CAST(tie_term AS DOUBLE) /
         |              (CAST(n_a + n_b AS DOUBLE) *
         |               CAST(n_a + n_b - 1 AS DOUBLE)))) AS z
         |FROM u""".stripMargin,

    "anova_price_by_priority" ->
      s"""WITH o AS (SELECT o_orderpriority AS p, $oracleCents AS c FROM orders),
         |m AS (
         |  SELECT p, CAST(count(*) AS BIGINT) AS ng, CAST(sum(c) AS BIGINT) AS sg,
         |         CAST(sum(CAST(c AS DECIMAL(30,0)) * c) AS DECIMAL(30,0)) AS ssg
         |  FROM o GROUP BY p
         |), t AS (
         |  SELECT p, ng, sg, ssg,
         |         CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS term
         |  FROM m
         |), a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
         |         CAST(sum(sg) AS BIGINT) AS t_, CAST(sum(ssg) AS DECIMAL(38,0)) AS ss,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY p)),
         |                     (x, y) -> x + y) AS fold
         |  FROM t
         |), b AS (
         |  SELECT k, n,
         |         fold - CAST(t_ AS DOUBLE) * CAST(t_ AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
         |         (CAST(CAST(CAST(ss AS HUGEINT) // 1000000000000000000 AS BIGINT) AS DOUBLE)
         |            * 1000000000000000000.0
         |          + CAST(CAST(CAST(ss AS HUGEINT) % 1000000000000000000 AS BIGINT) AS DOUBLE))
         |         - fold AS ssw
         |  FROM a
         |)
         |SELECT k, n, ssb, ssw,
         |       (ssb / (CAST(k AS DOUBLE) - 1.0)) /
         |         (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f,
         |       ssb / (ssb + ssw) AS eta_sq
         |FROM b""".stripMargin,

    "kruskal_price_by_priority" ->
      s"""WITH o AS (SELECT o_orderpriority AS p, $oracleCents AS v FROM orders),
         |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY v),
         |r AS (
         |  SELECT v, cnt,
         |         CAST(sum(cnt) OVER (ORDER BY v) * 2 - cnt + 1 AS BIGINT) AS r2
         |  FROM g
         |), pv AS (
         |  SELECT p, v, CAST(count(*) AS BIGINT) AS npv FROM o GROUP BY p, v
         |), bg AS (
         |  SELECT p, CAST(sum(npv) AS BIGINT) AS ng,
         |         CAST(sum(npv * r.r2) AS BIGINT) AS r2g
         |  FROM pv JOIN r ON pv.v = r.v GROUP BY p
         |), t AS (
         |  SELECT p, ng, r2g,
         |         (CAST(r2g AS DOUBLE) / 2.0) * (CAST(r2g AS DOUBLE) / 2.0)
         |           / CAST(ng AS DOUBLE) AS term
         |  FROM bg
         |), ties AS (
         |  SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term FROM g
         |), a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY p)),
         |                     (x, y) -> x + y) AS fold
         |  FROM t
         |), b AS (
         |  SELECT k, n, tie_term,
         |         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * fold
         |           - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_uncorrected,
         |         1.0 - CAST(tie_term AS DOUBLE) /
         |           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
         |             - CAST(n AS DOUBLE)) AS tie_c
         |  FROM a, ties
         |)
         |SELECT k, n, tie_term, h_uncorrected, h_uncorrected / tie_c AS h
         |FROM b""".stripMargin,

    "dispersion_daily_events" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS d, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(c) AS BIGINT) AS total,
        |         CAST(sum(CAST(c AS DECIMAL(30,0)) * c) AS DECIMAL(30,0)) AS ss
        |  FROM daily
        |), v AS (
        |  SELECT n_days, total,
        |         CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |         (CAST(ss AS DOUBLE) - CAST(total AS DOUBLE) * CAST(total AS DOUBLE)
        |            / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0)
        |           AS variance
        |  FROM m
        |)
        |SELECT n_days, total, mean, variance,
        |       variance / mean AS dispersion,
        |       (CAST(n_days AS DOUBLE) - 1.0) * (variance / mean) AS chi2
        |FROM v""".stripMargin,

    "ab_conversion_ztest" ->
      """WITH m AS (
        |  SELECT o_custkey % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS x
        |  FROM orders GROUP BY 1
        |), ab AS (
        |  SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
        |  FROM m a, m b WHERE a.arm = 0 AND b.arm = 1
        |), p AS (
        |  SELECT n_a, x_a, n_b, x_b,
        |         CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        |         CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        |         (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE)) /
        |           (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS p_pooled
        |  FROM ab
        |)
        |SELECT n_a, x_a, n_b, x_b, p_a, p_b, p_pooled,
        |       (p_a - p_b) /
        |         sqrt(p_pooled * (1.0 - p_pooled) *
        |           (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z
        |FROM p""".stripMargin,

    "survival_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS d
        |  FROM events WHERE user_id IS NOT NULL
        |), u AS (
        |  SELECT user_id, min(d) AS t0, max(d) AS t1 FROM ev GROUP BY user_id
        |), mx AS (SELECT max(d) AS dmax FROM ev),
        |lt AS (
        |  SELECT CAST(t1 - t0 AS BIGINT) AS lt,
        |         CASE WHEN t1 < dmax - 24 THEN 1 ELSE 0 END AS death
        |  FROM u, mx
        |), g AS (
        |  SELECT lt, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(death) AS BIGINT) AS dd
        |  FROM lt GROUP BY lt
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM lt),
        |cum AS (
        |  SELECT lt, n, dd,
        |         CAST(ntot - sum(n) OVER (ORDER BY lt) + n AS BIGINT) AS n_risk
        |  FROM g, tot
        |), dr AS (SELECT lt, n_risk, dd FROM cum WHERE dd > 0),
        |series AS (
        |  SELECT list(lt ORDER BY lt) AS ls, list(n_risk ORDER BY lt) AS rs,
        |         list(dd ORDER BY lt) AS ds
        |  FROM dr
        |)
        |SELECT UNNEST(ls) AS lifetime_hours, UNNEST(rs) AS n_risk,
        |       UNNEST(ds) AS n_deaths,
        |       UNNEST(list_transform(range(1, len(ls) + 1), t ->
        |         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |           list_transform(range(1, t + 1), j ->
        |             1.0 - CAST(ds[j] AS DOUBLE) / CAST(rs[j] AS DOUBLE))),
        |           (a, b) -> a * b))) AS survival
        |FROM series ORDER BY lifetime_hours""".stripMargin,

    "score_auc_langid" -> {
      val toks = graft.text.TextSql.tokens("text")
      s"""WITH d0 AS (SELECT lang, $toks AS toks0 FROM documents),
         |d AS (
         |  SELECT lang, CAST(len(toks0) AS BIGINT) AS toks,
         |         CAST(len(list_distinct(toks0)) AS BIGINT) AS dtoks
         |  FROM d0
         |), f AS (
         |  SELECT dtoks * 1000000 // toks AS v,
         |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |         CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS neg
         |  FROM d WHERE toks > 0
         |), g AS (
         |  SELECT v, CAST(sum(pos) AS BIGINT) AS pos,
         |         CAST(sum(neg) AS BIGINT) AS neg,
         |         CAST(sum(pos) + sum(neg) AS BIGINT) AS cnt
         |  FROM f GROUP BY v
         |), r AS (
         |  SELECT pos, neg,
         |         CAST(sum(cnt) OVER (ORDER BY v) * 2 - cnt + 1 AS BIGINT) AS r2
         |  FROM g
         |), m AS (
         |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         |         CAST(sum(neg) AS BIGINT) AS n_neg,
         |         CAST(sum(pos * r2) AS BIGINT) AS r2_pos
         |  FROM r
         |), u AS (
         |  SELECT n_pos, n_neg, r2_pos - n_pos * (n_pos + 1) AS u2 FROM m
         |), a AS (
         |  SELECT n_pos, n_neg, u2,
         |         CAST(u2 AS DOUBLE) /
         |           (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
         |  FROM u
         |)
         |SELECT n_pos, n_neg, u2, auc, auc * 2.0 - 1.0 AS gini FROM a""".stripMargin
    },

    "page_hinkley_drift" ->
      s"""WITH daily AS (
         |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         |         CAST(sum($oracleCents) AS BIGINT) AS rev
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |  GROUP BY 1
         |), series AS (
         |  SELECT list(d ORDER BY d) AS ds, list(rev ORDER BY d) AS xs FROM daily
         |), folded AS (
         |  SELECT ds, xs,
         |    list_transform(range(1, len(xs) + 1), t ->
         |      list_reduce(
         |        list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0],
         |          list_transform(xs[1:t], v -> [CAST(v AS DOUBLE), 0.0, 0.0])),
         |        (acc, x) -> [acc[1] + x[1],
         |                     acc[2] + (x[1] - (acc[1] + x[1]) / (acc[3] + 1.0)),
         |                     acc[3] + 1.0])) AS st
         |  FROM series
         |), withm AS (
         |  SELECT ds, xs, list_transform(st, a -> a[2]) AS ms FROM folded
         |)
         |SELECT UNNEST(ds) AS d, UNNEST(xs) AS rev, UNNEST(ms) AS m,
         |       UNNEST(list_transform(range(1, len(ms) + 1), t ->
         |         ms[t] - list_min(ms[1:t]))) AS ph
         |FROM withm ORDER BY d""".stripMargin,

    "stl_decompose_daily" ->
      s"""WITH daily AS (
         |  ${Analytics.oracleDaily.replace("\n", "\n  ")}
         |), t AS (
         |  SELECT x, v,
         |         CAST(sum(v) OVER w AS BIGINT) AS s7,
         |         CAST(count(*) OVER w AS BIGINT) AS c7
         |  FROM daily
         |  WINDOW w AS (ORDER BY x ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
         |), f AS (
         |  SELECT x, v, s7, v * 7 - s7 AS det7, (x + 4) % 7 AS dow
         |  FROM t WHERE c7 = 7
         |), seas AS (
         |  SELECT dow,
         |         CAST(sum(det7) AS DOUBLE) / CAST(count(*) * 7 AS DOUBLE)
         |           AS seasonal
         |  FROM f GROUP BY dow
         |)
         |SELECT x AS epoch_day, CAST(v AS BIGINT) AS cents,
         |       CAST(s7 AS DOUBLE) / 7.0 AS trend, seasonal,
         |       CAST(v AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0 - seasonal
         |         AS residual
         |FROM f JOIN seas USING (dow) ORDER BY epoch_day""".stripMargin,

    "ams_f2_users" -> {
      val h = graft.text.TextSql.polyHash("CAST(user_id AS VARCHAR)")
      s"""WITH counts AS (
         |  SELECT CAST(count(*) AS BIGINT) AS c, ($h) AS h
         |  FROM events GROUP BY user_id
         |), e AS (
         |  SELECT j, (1 - ((h * (1103515245 + j * 2) + j)
         |    % ${graft.text.TextOps.P} % 2) * 2) * c AS sc
         |  FROM counts, (SELECT unnest(range($AmsK)) AS j)
         |), s AS (
         |  SELECT j, CAST(sum(sc) AS BIGINT) AS s_j FROM e GROUP BY j
         |), x AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM counts)
         |SELECT CAST(j AS INT) AS j, s_j * s_j AS f2_est, f2_exact,
         |       abs(s_j * s_j - f2_exact) <= f2_exact * 2 AS within_2x
         |FROM s, x ORDER BY j""".stripMargin
    },

    "emb_covariance" ->
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CAST(floor(CAST(x AS DOUBLE) * $EmbQScale.0 + 0.5) AS BIGINT))
         |    AS e
         |  FROM embeddings
         |), xs AS (
         |  SELECT vec_id, i, e[i + 1] AS x
         |  FROM q, (SELECT unnest(range($EmbDim)) AS i)
         |), g AS (
         |  SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(a.x) AS BIGINT) AS sx,
         |         CAST(sum(b.x) AS BIGINT) AS sy,
         |         CAST(sum(a.x * b.x) AS BIGINT) AS sxy
         |  FROM xs a JOIN xs b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY a.i, b.i
         |)
         |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n, sx, sy, sxy,
         |       CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
         |            - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
         |         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / $EmbQScale2
         |         AS cov
         |FROM g ORDER BY i, j""".stripMargin,

    "gini_best_split" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |           // $GiniBucketWidth AS bk,
         |         l_returnflag AS cls
         |  FROM lineitem
         |), b AS (
         |  SELECT bk,
         |    CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN cls = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
         |    CAST(sum(CASE WHEN cls = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
         |  FROM li GROUP BY bk
         |), cum AS (
         |  SELECT bk, CAST(sum(ca) OVER (ORDER BY bk) AS BIGINT) AS la,
         |         CAST(sum(cn) OVER (ORDER BY bk) AS BIGINT) AS ln,
         |         CAST(sum(cr) OVER (ORDER BY bk) AS BIGINT) AS lr
         |  FROM b
         |), t AS (
         |  SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cn) AS BIGINT) AS tn,
         |         CAST(sum(cr) AS BIGINT) AS tr
         |  FROM b
         |), sp AS (
         |  SELECT bk, la + ln + lr AS nl,
         |         ta + tn + tr - la - ln - lr AS nr,
         |         la * la + ln * ln + lr * lr AS sl2,
         |         (ta - la) * (ta - la) + (tn - ln) * (tn - ln)
         |           + (tr - lr) * (tr - lr) AS sr2
         |  FROM cum, t
         |), g AS (
         |  SELECT bk, nl, nr,
         |         (CAST(nl * nl - sl2 AS DOUBLE) / CAST(nl AS DOUBLE)
         |          + CAST(nr * nr - sr2 AS DOUBLE) / CAST(nr AS DOUBLE))
         |           / CAST(nl + nr AS DOUBLE) AS wgini
         |  FROM sp WHERE nl > 0 AND nr > 0
         |), best AS (
         |  SELECT bk, wgini FROM g ORDER BY wgini, bk LIMIT 1
         |)
         |SELECT best.bk AS split_bucket,
         |       (best.bk + 1) * $GiniBucketWidth AS split_cents,
         |       (SELECT max(nl + nr) FROM g) AS n, best.wgini AS wgini
         |FROM best""".stripMargin,

    "source_lang_tvd" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source, lang
        |), tot AS (
        |  SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY source
        |), langs AS (SELECT DISTINCT lang FROM c),
        |pairs AS (
        |  SELECT a.source AS s1, a.nt AS n1, b.source AS s2, b.nt AS n2
        |  FROM tot a JOIN tot b ON a.source < b.source
        |), d AS (
        |  SELECT s1, s2, n1, n2,
        |         abs(coalesce(c1.n, 0) * n2 - coalesce(c2.n, 0) * n1) AS dn
        |  FROM pairs CROSS JOIN langs
        |  LEFT JOIN c c1 ON c1.source = pairs.s1 AND c1.lang = langs.lang
        |  LEFT JOIN c c2 ON c2.source = pairs.s2 AND c2.lang = langs.lang
        |)
        |SELECT s1, s2, n1, n2, CAST(sum(dn) AS BIGINT) AS tvd_num,
        |       CAST(sum(dn) AS DOUBLE) /
        |         (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS tvd
        |FROM d GROUP BY s1, s2, n1, n2 ORDER BY s1, s2""".stripMargin,

    "bootstrap_ci_revenue" -> {
      val h = graft.text.TextSql.polyHash("CAST(o_orderkey AS VARCHAR)")
      val cases = BootPoissonCdf.zipWithIndex
        .map { case (t, i) => s"WHEN mix < $t THEN $i" }.mkString(" ")
      s"""WITH o AS (
         |  SELECT $oracleCents AS c, ($h) AS h FROM orders
         |), e AS (
         |  SELECT b, c,
         |         CASE $cases ELSE ${BootPoissonCdf.size} END AS w
         |  FROM (SELECT c, h,
         |          (h * (1103515245 + b * 2) + b)
         |            % ${graft.text.TextOps.P} % 100000 AS mix, b
         |        FROM o, (SELECT unnest(range($BootB)) AS b))
         |), g AS (
         |  SELECT b, CAST(sum(w * c) AS BIGINT) AS vsum,
         |         CAST(sum(w) AS BIGINT) AS wsum
         |  FROM e GROUP BY b
         |), means AS (
         |  SELECT b, CAST(vsum AS DOUBLE) / CAST(wsum AS DOUBLE) AS m FROM g
         |), r AS (
         |  SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means
         |), t AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT)
         |    AS total
         |  FROM o
         |)
         |SELECT n, CAST(total AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
         |       min(CASE WHEN rk = 2 THEN m END) AS ci_lo,
         |       min(CASE WHEN rk = ${BootB - 1} THEN m END) AS ci_hi,
         |       CAST($BootB AS INT) AS n_resamples
         |FROM r, t GROUP BY n, total""".stripMargin
    },

    "corr_matrix_lineitem" -> {
      val cols = Seq("x1", "x2", "x3", "x4")
      val sums = cols.map(c => s"CAST(sum($c) AS DOUBLE) AS s_$c") ++
        (for (a <- cols; b <- cols if a <= b)
          yield s"CAST(sum($a * $b) AS DOUBLE) AS s_${a}_$b")
      val sel = (for (a <- cols; b <- cols if a < b) yield
        s"""SELECT '$a' AS var_a, '$b' AS var_b,
           |  (n * s_${a}_$b - s_$a * s_$b) /
           |    (sqrt(n * s_${a}_$a - s_$a * s_$a) *
           |     sqrt(n * s_${b}_$b - s_$b * s_$b)) AS corr FROM m"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH li AS (
         |  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
         |           AS x1,
         |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |           AS x2,
         |         CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT)
         |           AS x3,
         |         CAST(CAST(l_tax AS DECIMAL(8,4)) * 10000 AS BIGINT) AS x4
         |  FROM lineitem
         |), m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, ${sums.mkString(",\n    ")}
         |  FROM li
         |)
         |$sel
         |ORDER BY var_a, var_b""".stripMargin
    },

    "welch_ttest_price" ->
      s"""WITH o AS (
         |  SELECT o_orderstatus AS st, $oracleCents AS c
         |  FROM orders WHERE o_orderstatus IN ('$KsStatusA', '$KsStatusB')
         |), m AS (
         |  SELECT st, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(c) AS BIGINT) AS s,
         |         CAST(sum(CAST(c AS DECIMAL(30,0)) * c) AS DECIMAL(30,0))
         |           AS ss
         |  FROM o GROUP BY st
         |), ab AS (
         |  SELECT a.n AS n_a, a.s AS s_a, a.ss AS ss_a,
         |         b.n AS n_b, b.s AS s_b, b.ss AS ss_b
         |  FROM m a, m b WHERE a.st = '$KsStatusA' AND b.st = '$KsStatusB'
         |), mm AS (
         |  SELECT n_a, n_b,
         |         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         |         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         |         (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE)
         |            * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         |           / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
         |         (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE)
         |            * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         |           / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
         |  FROM ab
         |)
         |SELECT n_a, n_b, mean_a, mean_b,
         |       (mean_a - mean_b) /
         |         sqrt(var_a / CAST(n_a AS DOUBLE)
         |              + var_b / CAST(n_b AS DOUBLE)) AS t,
         |       pow(var_a / CAST(n_a AS DOUBLE)
         |           + var_b / CAST(n_b AS DOUBLE), 2.0) /
         |         (pow(var_a / CAST(n_a AS DOUBLE), 2.0)
         |            / (CAST(n_a AS DOUBLE) - 1.0)
         |          + pow(var_b / CAST(n_b AS DOUBLE), 2.0)
         |            / (CAST(n_b AS DOUBLE) - 1.0)) AS df,
         |       (mean_a - mean_b) /
         |         sqrt(((CAST(n_a AS DOUBLE) - 1.0) * var_a
         |               + (CAST(n_b AS DOUBLE) - 1.0) * var_b) /
         |              (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))
         |         AS cohens_d
         |FROM mm""".stripMargin,

    "boxplot_price_by_priority" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS p, $oracleCents AS v FROM orders
         |), g AS (
         |  SELECT p, v, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY p, v
         |), cum AS (
         |  SELECT p, v, cnt,
         |         CAST(sum(cnt) OVER (PARTITION BY p ORDER BY v) AS BIGINT)
         |           AS cw
         |  FROM g
         |), tot AS (
         |  SELECT p, CAST(sum(cnt) AS BIGINT) AS n, min(v) AS lo,
         |         max(v) AS hi
         |  FROM g GROUP BY p
         |), q AS (
         |  SELECT cum.p, n, lo, hi,
         |         min(CASE WHEN cw >= (n + 3) // 4 THEN v END) AS q1,
         |         min(CASE WHEN cw >= (n + 1) // 2 THEN v END) AS med,
         |         min(CASE WHEN cw >= (n * 3 + 3) // 4 THEN v END) AS q3
         |  FROM cum JOIN tot ON cum.p = tot.p
         |  GROUP BY cum.p, n, lo, hi
         |), fenced AS (
         |  SELECT o.p, CAST(count(*) AS BIGINT) AS n_outliers
         |  FROM o JOIN q ON o.p = q.p
         |  WHERE o.v * 2 < q.q1 * 5 - q.q3 * 3
         |     OR o.v * 2 > q.q3 * 5 - q.q1 * 3
         |  GROUP BY o.p
         |)
         |SELECT q.p AS o_orderpriority, n, lo, q1, med, q3, hi,
         |       coalesce(f.n_outliers, 0) AS n_outliers
         |FROM q LEFT JOIN fenced f ON q.p = f.p
         |ORDER BY o_orderpriority""".stripMargin,

    "event_trigram_topk" ->
      """WITH t AS (
        |  SELECT event_type AS e1,
        |         lead(event_type, 1) OVER w AS e2,
        |         lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "priority_top_orders_concat" ->
      s"""WITH r AS (
         |  SELECT o_orderpriority, o_orderkey, $oracleCents AS c,
         |         row_number() OVER (PARTITION BY o_orderpriority
         |           ORDER BY $oracleCents DESC, o_orderkey) AS rn
         |  FROM orders
         |)
         |SELECT o_orderpriority,
         |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn)
         |         AS top_keys,
         |       CAST(sum(c) AS BIGINT) AS topk_cents,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM r WHERE rn <= $ConcatK
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "weighted_median_price" ->
      """WITH li AS (
        |  SELECT l_returnflag AS p,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem
        |), g AS (
        |  SELECT p, v, CAST(count(*) AS BIGINT) AS cnt,
        |         CAST(sum(w) AS BIGINT) AS wt
        |  FROM li GROUP BY p, v
        |), cum AS (
        |  SELECT p, v,
        |         CAST(sum(cnt) OVER (PARTITION BY p ORDER BY v) AS BIGINT)
        |           AS cc,
        |         CAST(sum(wt) OVER (PARTITION BY p ORDER BY v) AS BIGINT)
        |           AS cw
        |  FROM g
        |), tot AS (
        |  SELECT p, CAST(sum(cnt) AS BIGINT) AS n,
        |         CAST(sum(wt) AS BIGINT) AS tw
        |  FROM g GROUP BY p
        |)
        |SELECT cum.p AS l_returnflag, n, tw AS total_qty,
        |       min(CASE WHEN cc * 2 >= n THEN v END) AS median_cents,
        |       min(CASE WHEN cw * 2 >= tw THEN v END) AS wmedian_cents
        |FROM cum JOIN tot ON cum.p = tot.p
        |GROUP BY cum.p, n, tw ORDER BY l_returnflag""".stripMargin,

    "winsorized_price_stats" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS p, $oracleCents AS v FROM orders
         |), g AS (
         |  SELECT p, v, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY p, v
         |), cum AS (
         |  SELECT p, v,
         |         CAST(sum(cnt) OVER (PARTITION BY p ORDER BY v) AS BIGINT)
         |           AS cw
         |  FROM g
         |), tot AS (
         |  SELECT p, CAST(sum(cnt) AS BIGINT) AS n FROM g GROUP BY p
         |), q AS (
         |  SELECT cum.p, n,
         |         min(CASE WHEN cw >= (n * 5 + 99) // 100 THEN v END) AS p05,
         |         min(CASE WHEN cw >= (n * 95 + 99) // 100 THEN v END) AS p95
         |  FROM cum JOIN tot ON cum.p = tot.p GROUP BY cum.p, n
         |)
         |SELECT o.p AS o_orderpriority, n, p05, p95,
         |       CAST(sum(greatest(p05, least(p95, v))) AS DOUBLE) / n
         |         AS winsor_mean_cents,
         |       CAST(sum(CASE WHEN v BETWEEN p05 AND p95 THEN v END)
         |            AS DOUBLE) /
         |         count(CASE WHEN v BETWEEN p05 AND p95 THEN 1 END)
         |         AS trimmed_mean_cents,
         |       CAST(count(CASE WHEN v BETWEEN p05 AND p95 THEN 1 END)
         |            AS BIGINT) AS n_kept
         |FROM o JOIN q ON o.p = q.p
         |GROUP BY o.p, n, p05, p95 ORDER BY o_orderpriority""".stripMargin,

    "mad_outlier_days" ->
      s"""WITH d0 AS (${Analytics.oracleDaily}),
         |d AS (SELECT x, CAST(v AS BIGINT) AS v FROM d0),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |med AS (
         |  SELECT v AS med FROM (
         |    SELECT v, row_number() OVER (ORDER BY v, x) AS rn FROM d), tot
         |  WHERE rn = (n + 1) // 2),
         |dev AS (SELECT x, v, abs(v - med) AS dev, med FROM d, med),
         |mad AS (
         |  SELECT dev AS mad FROM (
         |    SELECT dev, row_number() OVER (ORDER BY dev, x) AS rn
         |    FROM dev), tot
         |  WHERE rn = (n + 1) // 2)
         |SELECT x AS epoch_day, v AS revenue_cents, dev AS dev_cents,
         |       med AS med_cents, mad AS mad_cents,
         |       dev > mad * 3 AS is_outlier
         |FROM dev, mad
         |ORDER BY dev_cents DESC, epoch_day LIMIT 20""".stripMargin,

    "abc_pareto_parts" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
        |                        AS BIGINT)) AS cc
        |  FROM lineitem
        |), parts AS (
        |  SELECT l_partkey, CAST(sum(cc) AS BIGINT) AS rev
        |  FROM li GROUP BY 1
        |), cells AS (
        |  SELECT rev, CAST(count(*) AS BIGINT) AS n_parts,
        |         CAST(rev * count(*) AS BIGINT) AS rev_sum
        |  FROM parts GROUP BY rev
        |), cum AS (
        |  SELECT rev, n_parts, rev_sum,
        |         CAST(sum(rev_sum) OVER (ORDER BY rev DESC) AS BIGINT) AS c
        |  FROM cells
        |), tot AS (SELECT CAST(sum(rev_sum) AS BIGINT) AS t FROM cells)
        |SELECT CASE WHEN c * 5 <= t * 4 THEN 'A'
        |            WHEN c * 20 <= t * 19 THEN 'B' ELSE 'C' END AS abc_class,
        |       CAST(sum(n_parts) AS BIGINT) AS n_parts,
        |       CAST(sum(rev_sum) AS BIGINT) AS revenue_cc,
        |       CAST(sum(rev_sum) AS DOUBLE) / min(t) AS revenue_share
        |FROM cum, tot GROUP BY 1 ORDER BY abc_class""".stripMargin
  )
}
