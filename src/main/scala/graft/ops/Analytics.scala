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
    * apart — at cell=r=3000 that measured 1402 and 1667 "neighbor" pairs
    * where uniform scatter expects 31.8; the salted scramble measured 27).
    * r=20000 keeps the sf0.001 slice (150 points) non-empty for the
    * every-query smoke gate while candidate pairs stay O(density · 9
    * cells).
    */
  val GridMod = 1000000L
  /** Match radius r of the spatial family (GridR2 = r²). Also the CELL
    * EDGE of the DuckDB oracle's blocking (the oracle keeps the fixed
    * cell = r, 3×3 layout — at oracle scale the blocking is incidental;
    * the ENGINE picks its cell edge from measured density, below).
    */
  val GridCell = 20000L
  /** Density-adaptive cell edges (round-9 scale fix; VERDICT r8 #2).
    * With a FIXED cell = r over a fixed extent, candidate pairs grow
    * ∝ density² (sf1 slopes 19–26×) and the join has only (GridMod/r)²
    * = 2500 distinct cell keys — a parallelism ceiling on a real
    * cluster. The engine instead derives the cell edge from the measured
    * point count n so expected points/cell stays CONSTANT:
    *
    *  - radius join: cell = GridMod·sqrt(NbrCellPts/n), clamped to
    *    [r/NbrRingCap, r]. Probing ceil(r/cell) rings keeps the 3×3-style
    *    completeness argument (any point within r is ≤ ceil(r/cell)
    *    cells away on each axis); the ring cap bounds probe replication
    *    at (2·NbrRingCap+1)². Output is intrinsically ∝ n·r²·density
    *    (all in-radius pairs), so the win here is a constant factor
    *    ((2r+c)² vs 9r² candidate area) plus unbounded cell-key
    *    cardinality for shuffle parallelism.
    *  - kNN join (k-bounded OUTPUT — the quadratic candidates were
    *    avoidable): two-phase settle. Phase 1 uses cell c with expected
    *    π·c²·density ≈ KnnSettleFactor·k in-circle points and probes
    *    only 3×3 — complete within radius c — so a point with ≥ k
    *    candidates at dist ≤ c is SETTLED (nothing outside the 3×3
    *    block can beat its kth neighbor). Phase-1 candidates are
    *    O(n · points/cell) — linear in n at any density. The unsettled
    *    tail (Poisson P[N(c) < k] with mean 3k ≈ 0.2%, density-invariant
    *    by construction) re-probes the full ceil(r/c)-ring neighborhood
    *    exactly as the radius join does. Both phases are exact, so the
    *    all-pairs equality spec and the DuckDB oracle are unchanged.
    */
  val NbrCellPts = 2L
  val NbrRingCap = 3L
  val KnnSettleFactor = 3L
  /** Cell-edge floor: bounds the ring-offset literal at
    * (2·r/GridMinCell+1)² = 41² for the unsettled tail. */
  val GridMinCell = 1000L
  /** grid_knn_join: neighbors reported per point (within GridR2). */
  val GridKnnK = 4
  /** emb_mmr_select: picks, and the query vector's id. The lambda/(1-λ)
    * weights are written as the literal pair 0.7/0.3 in BOTH engines
    * (computing 1-λ driver-side would yield 0.30000000000000004). */
  val MmrK = 8
  val MmrQueryId = 0L
  val GridR = 20000L
  val GridR2 = GridR * GridR

  /** schema_drift_profile compares these two calendar-year slices. */
  val DriftYearA = "1995"
  val DriftYearB = "1996"

  /** semdedup_label_prune: prune budget per cluster (the SemDedup paper
    * prunes a fixed FRACTION per k-means cluster; a fixed per-cluster
    * count is the same policy with the budget made explicit).
    */
  val SemPruneK = 5

  /** semdedup_label_prune cluster-size guard: past this many rows in one
    * label, within-label pairing switches from exact all-pairs to sign-LSH
    * banded blocking ([[semdedupPrune]]) — the SemDedup contract bounds
    * cluster sizes at train time, but nothing used to enforce it here and
    * the all-pairs term was the registry's worst committed sf1 slope
    * (8.2x on 10x data). The test corpus sits below the threshold at
    * sf0.01 (labels ~50 rows: exact path, result unchanged) and above it
    * at sf0.1+ (labels 200+/2000 rows: banded path).
    */
  val SemBandThreshold = 128L

  /** Banding geometry for the oversized-label fallback: [[SemBands]]
    * disjoint bands of `rb` sign bits each over the leading dims, where
    * `rb` is sized PER LABEL from that label's row count (smallest rb in
    * [[SemBandMinBits]]..[[SemBandMaxBits]] with `2^rb * SemBandTarget >=
    * n_label` — [[Similarity.planeBitsFor]]'s fixed-point integer form as
    * a column, no floating log2). Expected same-bucket candidates per band
    * are then O(n_label * SemBandTarget) — linear in the label, never
    * quadratic, at ANY label size; bands * maxBits = 64 = the embedding
    * dim, so band bit ranges never alias.
    */
  val SemBands = 4
  val SemBandTarget = 32L
  val SemBandMinBits = 4
  val SemBandMaxBits = 16

  /** hybrid_rrf_search: reciprocal-rank-fusion constant (the k=60 of
    * Cormack/Clarke/Buettcher SIGIR'09), per-leg candidate depth, and the
    * final fused cut. The semantic leg's query vector is the embedding of
    * [[RrfQueryId]] (doc_id == vec_id by testdata construction).
    */
  val RrfK = 60
  val RrfDepth = 50
  val RrfTopK = 20
  val RrfQueryId = 0L

  /** domain_score_linear: hashed-bigram feature space size, the lang slice
    * that plays the target domain, and the selection cut.
    */
  val DomFeatures = 4096L
  val DomLang = "en"
  val DomTopK = 50

  /** kcenter_coreset: number of greedy k-center picks; the seed is the
    * smallest vec_id (deterministic, no RNG).
    */
  val KcK = 8

  /** quantile_sketch_audit: MRL level capacity, rank tolerance (fraction
    * of n the sketch estimate's rank interval may miss the target by),
    * and the audited percent probes.
    */
  val MrlK = 512
  val MrlTolPct = 5L
  val MrlProbes = Seq(10, 25, 50, 75, 90)

  /** kanon_risk_audit: groups of quasi-identifier combinations smaller
    * than this are re-identification risks.
    */
  val KanonK = 5L
  /** t-closeness release threshold (Li et al. 2007's worked examples). */
  val TCloseT = 0.15

  private[ops] def cents: Column =
    (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")

  private def dec15(c: Column): Column = c.cast("decimal(15,0)")

  /** Daily order revenue in exact cents, keyed by epoch day. */
  private[ops] def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(unix_date(col("o_orderdate").cast("date")).cast("long").as("x"))
      .agg(sum(cents).as("v"))

  /** Squared euclidean distance from a float-array column to a driver-held
    * center, as the same left-to-right double fold as [[Similarity.dot]]'s
    * HOF form: both engines difference in double AFTER the float read, so
    * the fold is bit-identical to the DuckDB mirror.
    */
  private def dist2ToCenter(v: Column, center: Array[Float]): Column = {
    val c = typedLit(center.toSeq)
    aggregate(zip_with(v, c, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)
  }

  /** Hashed deterministic points of the spatial-grid family, bucketed at
    * the given cell edge: (id, x, y, cx, cy). Coordinate scramble
    * rationale unchanged from round 7 (salted quadratic-residue mix — see
    * the [[GridCell]] scaladoc history in git for the lattice
    * measurements that ruled out the raw/suffixed hashes).
    */
  private def gridPoints(s: SparkSession, dir: String, cell: Long): DataFrame = {
    def coord(h: Column, salt: Long): Column = {
      val u = (h + salt) * TextOps.MIX % TextOps.P
      u * u % TextOps.P % GridMod
    }
    Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("id"),
        TextOps.polyHash(col("c_custkey").cast("string")).as("h"))
      .select(col("id"), coord(col("h"), 1).as("x"),
        coord(col("h"), 2).as("y"))
      .withColumn("cx", expr(s"x div $cell"))
      .withColumn("cy", expr(s"y div $cell"))
  }

  /** Point count of the grid family's input — ONE cheap column-pruned
    * action at plan-construction time (the documented driver-coordinated
    * pattern) that feeds the density-adaptive cell-edge choice. Memoized
    * per (session, dir): both grid queries (and every Verify/Bench
    * construct) share the same scalar, and a count over immutable
    * session data never changes. Cleared via [[clearKcenterCache]]'s
    * sibling hook in [[graft.Memos]].
    */
  private val gridCountMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Long]()

  def clearGridCountCache(): Unit = gridCountMemo.clear()

  private def gridPointCount(s: SparkSession, dir: String): Long = {
    gridCountMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    gridCountMemo.computeIfAbsent((s, dir), _ =>
      math.max(1L, Tables.load(s, dir, "customer")
        .select(col("c_custkey")).count()))
  }

  /** Candidate pairs (a from `probePts`, b from `allPts`) COMPLETE within
    * `radius`: the probe side replicates into the (2R+1)² ring
    * neighborhood with R = ceil(radius/cell) — any point within radius is
    * at most R cells away on each axis — then an equi-join on cell and an
    * exact int64 distance cut at radius². `idRel` supplies the
    * pair-direction predicate (undirected `a < b` for the pair listing,
    * directed `a <> b` for kNN). Candidate generation stays an equi-join
    * a shuffle can partition — never an all-pairs theta join — with cell
    * keys ∝ (GridMod/cell)², unbounded as cells shrink.
    */
  private def gridCandidates(probePts: DataFrame, allPts: DataFrame,
                             cell: Long, radius: Long,
                             idRel: DataFrame => Column): DataFrame = {
    val rings = ((radius + cell - 1) / cell).toInt
    val offsets = array((for (dx <- -rings to rings; dy <- -rings to rings)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes = probePts
      .withColumn("o", explode(offsets))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("o.dx")).as("pcx"),
        (col("cy") + col("o.dy")).as("pcy"))
    val b = allPts.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    // Explicit fixed-width co-partitioning on the cell keys (the
    // pageRankGraph/bucketedCumsum discipline): the candidate-pair
    // expansion is CPU-heavy relative to its input BYTES, so AQE's
    // byte-based coalescing squeezed the join down to 4 tasks on a
    // 32-core session at 10× data (measured: the two 21 s-CPU expansion
    // stages ran 4-wide — an 8× parallelism loss on pure CPU work).
    // Matching hash partitioning on each side's join keys satisfies the
    // join's distribution requirement, so this adds NO extra exchange —
    // it only pins the width AQE would otherwise collapse. At lake scale
    // the cell-key shuffle is already wide and the floor is a no-op.
    val cores = probePts.sparkSession.sparkContext.defaultParallelism
    probes.repartition(cores, col("pcx"), col("pcy"))
      .join(b.repartition(cores, col("cx"), col("cy")),
        probes("pcx") === b("cx") && probes("pcy") === b("cy") &&
          idRel(probes))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(radius * radius))
  }

  /** Two-phase radius-bounded exact kNN join over a points table
    * (id, x, y, cx, cy bucketed at `cell` — see [[gridPoints]]). The
    * library form of the `grid_knn_join` registry entry so the settle
    * phase (cell < radius, the 100 TB shape) is unit-testable on a dense
    * synthetic cloud: the registered query's testdata only reaches
    * cell < r from sf0.1 up. Semantics: for every point, the k nearest
    * OTHER points within `radius`, ranked by (dist2, b_id); points with
    * fewer than k in-radius neighbors report what exists. See the
    * [[KnnSettleFactor]] scaladoc for the completeness argument.
    */
  def gridKnnJoin(pts: DataFrame, cell: Long, k: Int,
                  radius: Long): DataFrame = {
    // phase-1 settledness needs dist ≤ cell to imply dist ≤ radius
    require(cell >= 1 && cell <= radius,
      s"gridKnnJoin: cell ($cell) must be in [1, radius=$radius]")
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("a_id"))
      .orderBy(col("dist2"), col("b_id"))
    val wCnt = Window.partitionBy(col("a_id"))
    val neq = (probes: DataFrame) => probes("a_id") =!= col("b_id")
    val ph1 = gridCandidates(pts, pts, cell, cell, neq)
      .withColumn("in_c", count(lit(1)).over(wCnt))
      .withColumn("knn_rank", row_number().over(wRank).cast("long"))
      .filter(col("knn_rank") <= k)
      .localCheckpoint()
    val settled = ph1.filter(col("in_c") >= k)
    val unsettledPts = pts.join(
      settled.select(col("a_id").as("id")).distinct(), Seq("id"), "left_anti")
    val ph2 = gridCandidates(unsettledPts, pts, cell, radius, neq)
      .withColumn("knn_rank", row_number().over(wRank).cast("long"))
      .filter(col("knn_rank") <= k)
    settled.select(col("a_id"), col("knn_rank"), col("b_id"), col("dist2"))
      .unionByName(
        ph2.select(col("a_id"), col("knn_rank"), col("b_id"), col("dist2")))
      .orderBy(col("a_id"), col("knn_rank"))
  }

  /** Greedy k-center (Gonzalez'85 farthest-first traversal) over the
    * embeddings table: seed = smallest vec_id, then KcK-1 rounds of
    * "farthest point from the chosen set" (ties to the smaller vec_id).
    * Returns (selection order, vec_id, squared distance to the chosen set
    * at selection time — the greedy coverage radius, non-increasing).
    *
    * Driver-coordinated by nature (each pick depends on the previous — the
    * same documented pattern as PageRank/bloom in [[Relational]]): KcK-1
    * Spark jobs, each ONE narrow corpus pass computing a least-chain of
    * [[dist2ToCenter]] kernels against broadcast literal centers, reduced
    * by TakeOrderedAndProject — no shuffle, no all-pairs. At 100 TB this
    * is exactly how coreset seeding runs (k passes, k ~ tens), and the
    * result is memoized per (session, dir) so Verify/Bench construct once.
    */
  private val kcMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Seq[(Int, Long, Double)]]()

  def clearKcenterCache(): Unit = kcMemo.clear()

  def kcenterSelect(s: SparkSession, dir: String): Seq[(Int, Long, Double)] = {
    // same stopped-session sweep as Dedup's index memos: entries are tiny,
    // but a session key must not outlive its session
    kcMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    kcMemo.computeIfAbsent((s, dir), _ => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val seed = e.orderBy(col("vec_id")).limit(1).head()
      val picks = scala.collection.mutable.ArrayBuffer(
        (1, seed.getLong(0), 0.0, seed.getSeq[Float](1).toArray))
      var md: Column = dist2ToCenter(col("embedding"), picks.head._4)
      for (i <- 2 to KcK) {
        val r = e.select(col("vec_id"), col("embedding"), md.as("md"))
          .orderBy(col("md").desc, col("vec_id")).limit(1).head()
        val emb = r.getSeq[Float](1).toArray
        picks += ((i, r.getLong(0), r.getDouble(2), emb))
        md = least(md, dist2ToCenter(col("embedding"), emb))
      }
      picks.map(p => (p._1, p._2, p._3)).toSeq
    })
  }

  /** Exact driver-side mirror of DuckDB's `sqrt(list_sum(c·c))`: the same
    * left-to-right double fold over the float reads, then one correctly
    * rounded sqrt — so a driver-held center's norm is bit-identical to
    * the oracle's recomputation.
    */
  private def vecNorm(c: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR'98) — the diversity-aware top-k every RAG/curation pipeline
    * wants where plain top-k returns k near-duplicates: greedily pick
    * argmax of MmrLambda·rel(d) − MmrMu·max_{s∈S} cos(d, s), rel being
    * cosine to the fixed query vector (vec_id = MmrQueryId), ties to the
    * smaller vec_id. Driver-coordinated like [[kcenterSelect]] (each pick
    * conditions the next): MmrK rounds, each ONE narrow corpus pass — the
    * relevance and the running max-sim chain are codegen'd kernel dots
    * against broadcast literal centers, reduced by
    * TakeOrderedAndProject(1). No shuffle, no all-pairs; memoized per
    * (session, dir).
    */
  private val mmrMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Seq[(Int, Long, Double, Double, Double)]]()

  def clearMmrCache(): Unit = mmrMemo.clear()

  def mmrSelect(s: SparkSession, dir: String): Seq[(Int, Long, Double, Double, Double)] = {
    mmrMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    mmrMemo.computeIfAbsent((s, dir), _ => {
      import graft.sim.Similarity
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val qVec = e.filter(col("vec_id") === MmrQueryId)
        .head().getSeq[Float](1).toArray
      def cosTo(center: Array[Float]): Column =
        Similarity.dot(col("embedding"), typedLit(center.toSeq)) /
          (sqrt(Similarity.dot(col("embedding"), col("embedding"))) *
            lit(vecNorm(center)))
      val rel = cosTo(qVec)
      var ms: Column = lit(0.0)
      val base = e.filter(col("vec_id") =!= MmrQueryId)
      val picked = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Double, Double, Double, Array[Float])]
      for (i <- 1 to MmrK) {
        val cand = if (picked.isEmpty) base
          else base.filter(!col("vec_id").isin(picked.map(_._2).toSeq: _*))
        val r = cand.select(col("vec_id"), col("embedding"),
            rel.as("rel"), ms.as("ms"),
            (lit(0.7) * rel - lit(0.3) * ms).as("mmr"))
          .orderBy(col("mmr").desc, col("vec_id")).limit(1).head()
        picked += ((i, r.getLong(0), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getSeq[Float](1).toArray))
        ms = greatest(ms, cosTo(picked.last._6))
      }
      picked.map(p => (p._1, p._2, p._3, p._4, p._5)).toSeq
    })
  }

  /** semdedup_label_prune body, parameterized by the cluster-size guard so
    * the spec can force either path on the small test corpus.
    *
    * Labels with at most `bandThreshold` rows pair exactly (all lower-id
    * pairs within the label). Oversized labels go through sign-LSH banded
    * blocking instead: [[SemBands]] disjoint bands of `rb` leading-dim
    * sign bits each, `rb` sized per label so the expected bucket holds
    * ~[[SemBandTarget]] vectors ([[Similarity.planeBitsFor]]'s fixed-point
    * comparison as a column expression), candidates = lower-id pairs
    * sharing any (band, hash) bucket. Candidate work per oversized label
    * is O(n_label * SemBandTarget * SemBands) — linear, never quadratic,
    * which is the missing enforcement of the SemDedup train-time
    * cluster-size bound. The scored pairs from both paths then share one
    * (max-cos-to-lower-id, per-label top-K) ranking.
    *
    * Scale shape: the per-label sizes frame is O(labels) and broadcast;
    * the banded self-join shuffles only (label, band, hash, id) — vectors
    * never ride through the band exchange; scored candidates re-attach
    * embeddings by id (two hash joins). The DuckDB oracle mirrors the
    * threshold switch, the per-label `rb`, and every band hash bit, so
    * correctness parity is independent of banding recall.
    */
  /** Per-label sizes for [[semdedupPrune]]'s split, memoized per
    * (session, corpus plan): O(cluster-count) rows — the SemDedup cluster
    * ids are bounded by the train-time k, so collecting them driver-side
    * is the same bounded-collect shape as [[gridPointCount]] / the IVF
    * centroids. Resolving the split at plan-construction time keeps the
    * EMPTY branch out of the physical plan entirely: at small SFs the
    * query is the exact all-pairs plan, unchanged; past the threshold the
    * plan is banded-only — the data-driven union form would pay the empty
    * branch's exchange ladder at every scale (measured ~1 s of pure
    * sequential stage latency on a 20k-vector corpus).
    */
  private val semSizesMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, Long), Array[(Int, Long)]]()

  private[graft] def clearSemSizesCache(): Unit = semSizesMemo.clear()

  private def semLabelSizes(e: DataFrame): Array[(Int, Long)] = {
    semSizesMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    semSizesMemo.computeIfAbsent(
      (e.sparkSession, e.queryExecution.analyzed.semanticHash().toLong),
      _ => e.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
        .collect().map(r => (r.getInt(0), r.getLong(1))))
  }

  /** Smallest rb in [min, max] with 2^rb * target >= n — the fixed-point
    * integer form of [[Similarity.planeBitsFor]] (no floating log2).
    */
  private def semBandBits(n: Long): Int = SemBandMinBits +
    (SemBandMinBits until SemBandMaxBits)
      .count(b => (1L << b) * SemBandTarget < n)

  def semdedupPrune(emb: DataFrame,
                    bandThreshold: Long = SemBandThreshold): DataFrame = {
    val e = emb.select(col("label"), col("vec_id"), col("embedding"))
    val sizes = semLabelSizes(e)
    val bigSizes = sizes.filter(_._2 > bandThreshold)
    val smallSet = sizes.filter(_._2 <= bandThreshold).map(_._1).toSeq
    // prune the per-branch isin filter when a branch covers the whole
    // corpus — the common case (uniform cluster sizes) keeps the plan a
    // single branch with no label predicate at all
    def slice(labels: Seq[Int]): DataFrame =
      if (labels.length == sizes.length) e
      else e.filter(col("label").isin(labels: _*))
    val small = slice(smallSet)
    val big = slice(bigSizes.map(_._1).toSeq)

    val smallPairs = small
      .select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .join(small.select(col("label"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .select(col("label"), col("a_id"), col("b_id"),
        Similarity.cosine(col("a_emb"), col("b_emb")).as("cos"))

    // band i's hash: rb sign bits read from dims [i*rb+1, i*rb+rb] — the
    // dim offset moves with the per-label rb, and bands*maxBits = dim so
    // the index can never exceed the vector
    def bandHash(i: Int): Column =
      (0 until SemBandMaxBits).map { j =>
        when(lit(j) < col("rb") &&
          element_at(col("embedding"),
            (lit(i) * col("rb") + lit(j + 1)).cast("int")) > lit(0f),
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    // Explicit fixed-width partitioning on the CPU-carrying exchanges
    // (the gridCandidates discipline): id-pair rows are byte-tiny, so
    // AQE's byte-based coalescing collapses the band join and the
    // per-vector argmax window to 1-2 tasks while their work (candidate
    // expansion, 3 dot products per pair, the window sort) is pure CPU —
    // measured at 10x data as a ladder of single-task stages. Matching
    // hash partitioning satisfies each operator's own distribution
    // requirement, so the pins replace the exchanges AQE would have
    // inserted — no extra shuffle, and user-specified widths are exempt
    // from AQE coalescing. At lake scale the exchanges are byte-wide
    // anyway and the floor is a no-op. Band-duplicate candidate pairs are
    // NOT distinct'ed: the per-vector rn = 1 cut collapses them to one
    // identical row (same b_id, same cos, same a_id), and the dedup's
    // exchange + aggregate cost more than the <= SemBands-fold duplicate
    // cosines they save.
    val cores = emb.sparkSession.sparkContext.defaultParallelism
    // rb attaches as a literal lookup over the (bounded) oversized-label
    // set — no broadcast-join stage for a per-label scalar
    val rbCol = bigSizes.foldLeft(lit(0)) { case (acc, (l, n)) =>
      when(col("label") === lit(l), lit(semBandBits(n))).otherwise(acc) }
    lazy val bands = big.withColumn("rb", rbCol)
      .select(col("label"), col("vec_id"),
        posexplode(array((0 until SemBands).map(bandHash): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    lazy val bigPairs = bands
      .select(col("label"), col("band"), col("bh"), col("vec_id").as("a_id"))
      .repartition(cores, col("label"), col("band"), col("bh"))
      .join(bands.select(col("label"), col("band"), col("bh"),
          col("vec_id").as("b_id"))
        .repartition(cores, col("label"), col("band"), col("bh")),
        Seq("label", "band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select(col("label"), col("a_id"), col("b_id"))
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb")),
        Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")),
        Seq("b_id"))
      .select(col("label"), col("a_id"), col("b_id"),
        Similarity.cosine(col("a_emb"), col("b_emb")).as("cos"))

    // only materialized branches enter the plan (see semLabelSizes): the
    // common uniform-cluster case is a single branch with no union
    val pairs = ((if (smallSet.nonEmpty) Seq(smallPairs) else Nil) ++
      (if (bigSizes.nonEmpty) Seq(bigPairs) else Nil))
      .reduce(_ unionByName _)
      .repartition(cores, col("b_id"))
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
  }

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
    // All point pairs within euclidean distance r, via the spatial-grid
    // equi-join with a DENSITY-ADAPTIVE cell edge (see the NbrCellPts
    // scaladoc): each point lives in ONE home cell, the probe side
    // replicates into the ceil(r/cell)-ring neighborhood (provably
    // complete within r) and joins on cell equality — an equi-join a
    // shuffle can partition, never an all-pairs theta join. Coordinates
    // are derived deterministically from the key hash (no RNG); the
    // distance test is exact int64. The OUTPUT (all in-radius pairs) is
    // intrinsically ∝ n·r²·density; adapting the cell trims the candidate
    // area from 9r² toward (2r+cell)² and keeps cell-key cardinality (and
    // so shuffle parallelism) growing with n instead of frozen at 2500.
    "grid_neighbor_join" -> ((s, dir) => {
      val n = gridPointCount(s, dir)
      val cell = math.min(GridR, math.max((GridR + NbrRingCap - 1) / NbrRingCap,
        (GridMod * math.sqrt(NbrCellPts.toDouble / n)).toLong))
      val pts = gridPoints(s, dir, cell)
      gridCandidates(pts, pts, cell, GridR,
          probes => probes("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("dist2"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- grid-bucketed radius-bounded kNN join -----------------------------
    // The k-nearest-neighbors-within-r sibling of grid_neighbor_join (the
    // map-matching / nearest-facility shape), with a k-BOUNDED output —
    // so unlike the radius join the quadratic candidate set is avoidable.
    // Two-phase settle (see the KnnSettleFactor scaladoc): phase 1 probes
    // only the 3×3 neighborhood of density-adaptive cells (complete
    // within one cell edge c), and any point with ≥ k candidates at
    // dist ≤ c is exactly settled — its top-k there IS its kNN-within-r,
    // because an unseen point sits beyond c ≥ its kth distance. That
    // phase is O(n · points-per-cell) — linear at any density. The
    // unsettled tail (expected <1% by the Poisson construction; ALL
    // points when the corpus is too sparse for c < r, where the rings
    // collapse to the classic 3×3 anyway) re-probes the full
    // ceil(r/c)-ring neighborhood. Both row_number bounds compile to
    // WindowGroupLimit — each map task forwards at most k candidates per
    // point into the rank exchange. Points with fewer than k in-radius
    // neighbors report what exists (both engines). The phase-1 top-k is
    // localCheckpointed (≤ k rows/point) so the settled output and the
    // anti-join don't recompute the candidate join.
    "grid_knn_join" -> ((s, dir) => {
      val n = gridPointCount(s, dir)
      val cell = math.min(GridR, math.max(GridMinCell,
        (GridMod * math.sqrt(
          KnnSettleFactor * GridKnnK / (math.Pi * n))).toLong))
      gridKnnJoin(gridPoints(s, dir, cell), cell, GridKnnK, GridR)
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
    // budget of the most redundant vectors. Pairing is label-blocked and
    // CLUSTER-SIZE GUARDED (see [[semdedupPrune]]): labels within
    // [[SemBandThreshold]] pair exactly; oversized labels switch to
    // sign-LSH banded blocking with per-label bucket sizing, so the
    // within-label candidate count stays linear at any cluster size —
    // the SemDedup contract's train-time size bound, enforced in the
    // query instead of assumed. The oracle mirrors the switch and the
    // banding bit-for-bit, so parity is independent of banding recall.
    // Cosines are the bit-identical left-to-right fold shared with the
    // ANN family.
    "semdedup_label_prune" -> ((s, dir) =>
      semdedupPrune(Tables.load(s, dir, "embeddings"))),

    // ---- Pareto frontier (2D skyline) --------------------------------------
    // Orders not dominated on (order day, price): B dominates A iff B is
    // >= on both dims and > on at least one. The scale design is the
    // bucket-pruned skyline, not an all-pairs dominance join: (1) per-day
    // max price — a map-side-combinable groupBy onto O(calendar days)
    // rows; (2) a running max over STRICTLY LATER days — a window over
    // the tiny per-day frame (day count is calendar-bounded, so the
    // single-partition window is over thousands of rows at ANY corpus
    // size); (3) broadcast the per-day thresholds back and filter: a row
    // survives iff it IS its day's max and beats every later day's max.
    // Candidate work is one narrow scan + one O(days) window — the
    // O(n^2) NOT EXISTS form never materializes.
    "skyline_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("d"),
          cents.as("c"))
      val perDay = o.groupBy(col("d")).agg(max(col("c")).as("maxc"))
      val wLater = Window.orderBy(col("d").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val thr = perDay.withColumn("thr", max(col("maxc")).over(wLater))
      o.join(broadcast(thr), "d")
        .filter(col("c") === col("maxc") &&
          (col("thr").isNull || col("c") > col("thr")))
        .select(col("o_orderkey"), col("d").as("epoch_day"),
          col("c").as("price_cents"))
        .orderBy(col("epoch_day"), col("o_orderkey"))
    }),

    // ---- grouped OLS: revenue trend per nation -----------------------------
    // Least-squares fit of order price (cents) against order day, per
    // nation — the grouped regression a feature pipeline runs to detect
    // drifting segments. All five sufficient statistics are decimal-exact
    // partial aggregates (one shuffle on nation); slope / intercept / r²
    // are closed-form rationals of those sums, evaluated double-for-double
    // in both engines (r² via the squared-covariance form — no sqrt, no
    // transcendentals). Nation is a broadcast dim; customer→orders is the
    // one fact join.
    "regress_nation_trend" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("x"),
          cents.as("y"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dec15(col("x")) * dec15(col("y"))).as("sxy"),
          sum(dec15(col("x")) * dec15(col("x"))).as("sxx"),
          sum(dec15(col("y")) * dec15(col("y"))).as("syy"))
        .select(col("n_name"), col("n_orders"),
          col("n_orders").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
          col("sxy").cast("double").as("sxyd"),
          col("sxx").cast("double").as("sxxd"),
          col("syy").cast("double").as("syyd"))
        .select(col("n_name"), col("n_orders"),
          ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
            .as("slope_cents_per_day"),
          ((col("syd") * col("sxxd") - col("sxd") * col("sxyd")) /
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
            .as("intercept_cents"),
          (((col("nd") * col("sxyd") - col("sxd") * col("syd")) *
            (col("nd") * col("sxyd") - col("sxd") * col("syd"))) /
            ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
              (col("nd") * col("syyd") - col("syd") * col("syd"))))
            .as("r2"))
        .orderBy(col("n_name"))
    }),

    // ---- hybrid retrieval: reciprocal rank fusion --------------------------
    // RRF (Cormack et al. SIGIR'09) over two legs: the registered BM25
    // pipeline (lexical) and exact cosine against one query embedding
    // (semantic). Each leg is ranked to RrfDepth — the rank windows are
    // rewritten by Spark to WindowGroupLimit, so the per-leg cut is a
    // top-k, not a global sort — then FULL OUTER joined and fused with
    // score = Σ 1/(RrfK + rank), a pure rational in both engines (a leg
    // a doc is absent from contributes 0). At scale each leg is its own
    // distributed top-k (BM25 postings / ANN index) and the fusion joins
    // two k-row frames — broadcast-trivial.
    "hybrid_rrf_search" -> ((s, dir) => {
      val lex = LlmData.bm25Scored(s, dir)
        .withColumn("lex_rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("lex_rank") <= RrfDepth)
        .select(col("doc_id"), col("lex_rank").cast("long").as("lex_rank"))
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === RrfQueryId)
        .select(col("embedding").as("q_vec"))
      val sem = e.filter(col("vec_id") =!= RrfQueryId)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          Similarity.cosine(col("embedding"), col("q_vec")).as("sim"))
        .withColumn("sem_rank",
          row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))))
        .filter(col("sem_rank") <= RrfDepth)
        .select(col("doc_id"), col("sem_rank").cast("long").as("sem_rank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
          (coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)))
            .as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(RrfTopK)
    }),

    // ---- DSIR-style hashed-bigram domain scoring ---------------------------
    // Data-selection-by-importance-resampling (Xie et al. '23) with the
    // log-ratio replaced by the exact-integer contrast
    // w_f = t_f·R − r_f·T (t/r = target/corpus counts of hashed bigram
    // feature f, T/R their totals): positive where the feature is
    // over-represented in the target domain (here lang=DomLang), so
    // Σ c_f·w_f ranks documents by domain affinity with NO floating point
    // anywhere — the scores hash exactly. Scale shape: features fold onto
    // DomFeatures buckets (map-side combine, shuffle O(buckets)); the
    // weight table is a broadcast of ≤DomFeatures rows; the doc pass is
    // one narrow scan. At lake scale the int64 products become decimals;
    // the plan is unchanged.
    "domain_score_linear" -> ((s, dir) => {
      val base = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bi = base.select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .as("bg"))
        .withColumn("f", TextOps.polyHash(col("bg")) % DomFeatures)
      val raw = bi.groupBy(col("f")).agg(count(lit(1)).as("rf"))
      val tgt = bi.filter(col("lang") === DomLang)
        .groupBy(col("f")).agg(count(lit(1)).as("tf"))
      val w = raw.join(tgt, Seq("f"), "left")
        .na.fill(0L, Seq("tf"))
        .crossJoin(broadcast(raw.agg(sum(col("rf")).as("rtot"))))
        .crossJoin(broadcast(tgt.agg(sum(col("tf")).as("ttot"))))
        .select(col("f"), (col("tf") * col("rtot") - col("rf") * col("ttot")).as("w"))
      bi.groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("c"))
        .join(broadcast(w), "f")
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"), sum(col("c") * col("w")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(DomTopK)
    }),

    // ---- mergeable quantile sketch with exact-rank audit -------------------
    // The [[graft.functions.MrlQuantile]] MRL'98 sketch over lineitem
    // price cents, audited at MrlProbes percentiles: for each probe the
    // query reports the exact order statistic (oracle-checked) and a
    // within-tolerance BOOLEAN — the sketch estimate's rank interval
    // [count(v < est)+1, count(v <= est)] must come within MrlTolPct% of
    // n of the target rank. The estimate itself is (deliberately) not
    // emitted raw: merge order varies with partitioning, so like
    // approx_sketches the contract is the bound, not the bits. Scale
    // shape: the sketch pass is ONE map-side-combined aggregate carrying
    // O(k log(n/k)) per partition — the product at 100 TB, where the
    // exact-rank legs here (a global row_number at test SF) are replaced
    // by nothing: they exist to PROVE the sketch, not to ship.
    "quantile_sketch_audit" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{udaf => mkUdaf}
      val n = Tables.parquetRowCount(s, s"$dir/lineitem.parquet")
      val tol = n * MrlTolPct / 100L
      def target(pct: Int): Long = (pct * n + 99L) / 100L
      val v = Tables.parallelized(Tables.load(s, dir, "lineitem"))
        .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("v"))
      val mrl = mkUdaf(new graft.functions.MrlQuantile(MrlK),
        org.apache.spark.sql.Encoders.LONG)
      // one sketch over the whole column; weights per distinct value, then
      // a cumulative-weight scan over the O(k log n) samples
      val cum = v.agg(mrl(col("v")).as("sk"))
        .select(explode(col("sk")).as("s"))
        .groupBy(col("s._1").as("sv")).agg(sum(col("s._2")).as("w"))
        .withColumn("cw", sum(col("w"))
          .over(Window.orderBy(col("sv"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val estCols = MrlProbes.map(p =>
        min(when(col("cw") >= target(p), col("sv"))).as(s"est$p"))
      val ests = cum.agg(estCols.head, estCols.tail: _*)
      // exact ranks of each estimate in one pass over the column
      val rankCols = MrlProbes.flatMap(p => Seq(
        sum(when(col("v") < col(s"est$p"), 1L).otherwise(0L)).as(s"lo$p"),
        sum(when(col("v") <= col(s"est$p"), 1L).otherwise(0L)).as(s"hi$p")))
      val ranks = v.crossJoin(broadcast(ests)).agg(rankCols.head, rankCols.tail: _*)
      // exact order statistics (the oracle-checked truth), distributed:
      // per-distinct-value counts get the two-level bucketed running sum
      // (Stats.bucketedCumsum — the only serial window is the O(#buckets)
      // offset table), and the rank-r statistic is the smallest v whose
      // cumulative count reaches r. Replaces the previous
      // row_number().over(Window.orderBy(v)) — a single-partition sort of
      // the WHOLE column, the last one in the registry — with sorts
      // partitioned by value bucket. Same integers: cum(v) = #elements
      // <= v, so min(v : cum(v) >= r) IS the element at sorted position r.
      val dist = v.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val exCols = MrlProbes.map(p =>
        min(when(col("cnt_cum") >= target(p), col("v"))).as(s"ex$p"))
      val exact = Stats.bucketedCumsum(dist, "v", Stats.KsBucketWidth,
        Seq("cnt")).agg(exCols.head, exCols.tail: _*)
      val probe = s.createDataFrame(
        MrlProbes.map(p => (p, target(p)))).toDF("pct", "target_rank")
      probe.crossJoin(broadcast(exact))
        .crossJoin(broadcast(ranks))
        .select(col("pct"), col("target_rank"),
          MrlProbes.map(p => when(col("pct") === p, col(s"ex$p")))
            .reduceRight(_.otherwise(_)).as("exact_value"),
          MrlProbes.map(p =>
            when(col("pct") === p,
              col(s"hi$p") >= col("target_rank") - tol &&
                col(s"lo$p") + 1 <= col("target_rank") + tol))
            .reduceRight(_.otherwise(_)).as("sketch_within_tol"))
        .orderBy(col("pct"))
    }),

    // ---- k-anonymity risk audit --------------------------------------------
    // Privacy gate over the quasi-identifier triple (nation, order year,
    // priority): group sizes below KanonK are re-identification risks the
    // pipeline must suppress or generalize before release. One map-side-
    // combined aggregate after a broadcast dim join — the cheapest audit
    // in the registry, and the one a 100 TB release pipeline runs last.
    "kanon_risk_audit" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy").as("o_year"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("group_size"))
        .withColumn("at_risk", col("group_size") < KanonK)
        .orderBy(col("n_name"), col("o_year"), col("o_orderpriority"))
    }),

    // ---- l-diversity audit -------------------------------------------------
    // k-anonymity's companion gate: a QI group can be large (k-safe) yet
    // leak its sensitive attribute if every member shares one value.
    // Per QI group (nation, order year, priority) count DISTINCT order
    // statuses = the group's l; report the distribution of l (groups,
    // rows, and the homogeneous l=1 population at risk of attribute
    // disclosure). Two combinable aggregates after the same broadcast dim
    // join as kanon_risk_audit — the second groupBy runs over one row per
    // QI group, dimension-scale at any corpus size.
    "ldiv_audit" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy").as("o_year"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"), col("o_orderpriority"))
        .agg(countDistinct(col("o_orderstatus")).as("l"),
          count(lit(1)).as("grp_rows"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_groups"), sum(col("grp_rows")).as("n_rows"))
        .withColumn("at_risk", col("l") < 2)
        .orderBy(col("l"))
    }),

    // ---- t-closeness audit -------------------------------------------------
    // The third privacy gate (Li, Li, Venkatasubramanian, ICDE'07): a QI
    // group passes only if its SENSITIVE-ATTRIBUTE DISTRIBUTION stays
    // within t of the global one, measured by Earth Mover's Distance over
    // the ordered attribute — which for ordinal values is the mean
    // |prefix-sum| of the probability differences. Exact integer form:
    // diff_i = cnt_{g,i}·N − tot_i·n_g over the implicit denominator
    // n_g·N, so the per-group EMD numerator is an int64 window prefix sum
    // and t materializes in ONE mirrored double division. Shape: the same
    // broadcast dim join as kanon_risk_audit, then everything runs on the
    // groups×m grid (dimension-scale at any corpus size); the grid
    // densify (cross join groups × sensitive values) is what makes
    // missing (group, value) cells count as probability 0 instead of
    // silently shrinking the EMD. int64 bound: cnt·N <= N² ≈ 2e12 at sf1.
    "tcloseness_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("prio"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val f = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("prio"))
      val tot = f.groupBy(col("prio")).agg(count(lit(1)).as("tot"))
      val nAll = tot.agg(sum(col("tot")).as("n_all"),
        count(lit(1)).as("m_vals"))
      val grp = f.groupBy(col("n_name")).agg(count(lit(1)).as("n_g"))
      val cnt = f.groupBy(col("n_name"), col("prio"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("prio"))
      grp.crossJoin(broadcast(tot))
        .join(cnt, Seq("n_name", "prio"), "left")
        .crossJoin(broadcast(nAll))
        .select(col("n_name"), col("prio"), col("n_g"),
          col("n_all"), col("m_vals"),
          (coalesce(col("cnt"), lit(0L)) * col("n_all") -
            col("tot") * col("n_g")).as("diff"))
        .withColumn("cum", sum(col("diff")).over(w))
        .groupBy(col("n_name"), col("n_g"), col("n_all"), col("m_vals"))
        .agg(sum(abs(col("cum"))).as("emd_num"))
        .select(col("n_name"), col("n_g"),
          // m_vals = 1 (single sensitive value) makes the denominator 0
          // while EMD is trivially 0 — report 0, not NaN (round-9 ADVICE)
          when(col("m_vals") > 1,
            col("emd_num").cast("double") /
              (col("n_g") * col("n_all") * (col("m_vals") - 1)).cast("double"))
            .otherwise(lit(0.0))
            .as("t_dist"))
        .withColumn("at_risk", col("t_dist") > TCloseT)
        .orderBy(col("n_name"))
    }),

    // ---- greedy k-center coreset seeding -----------------------------------
    // The [[kcenterSelect]] farthest-first traversal, surfaced as a query:
    // one row per pick with the greedy coverage radius at selection time.
    // The tiny result is driver-materialized (like the XML document sink);
    // the heavy lifting is the KcK-1 distributed passes inside the memo.
    "kcenter_coreset" -> ((s, dir) => {
      import s.implicits._
      kcenterSelect(s, dir)
        .toDF("sel_order", "vec_id", "radius2")
        .orderBy(col("sel_order"))
    }),

    // ---- MMR diverse top-k -------------------------------------------------
    // The [[mmrSelect]] greedy relevance-vs-redundancy traversal surfaced
    // as a query: one row per pick with its relevance, max similarity to
    // the prior picks at selection time, and the MMR score that won the
    // round. Tiny driver-materialized result over MmrK distributed
    // passes (the kcenter_coreset contract).
    "emb_mmr_select" -> ((s, dir) => {
      import s.implicits._
      mmrSelect(s, dir)
        .toDF("sel_order", "vec_id", "rel", "max_sim", "mmr")
        .orderBy(col("sel_order"))
    })
  )

  // --------------------------------------------------------------------------

  private val oracleDow = "(x + 4) % 7"

  private[ops] def oracleDaily: String =
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

    "grid_knn_join" -> {
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
         |), cand AS (
         |  SELECT a.id AS a_id, b.id AS b_id,
         |         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
         |  FROM cells a JOIN cells b
         |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         |   AND a.id <> b.id
         |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= $GridR2
         |), ranked AS (
         |  SELECT a_id, b_id, dist2,
         |         row_number() OVER (PARTITION BY a_id
         |                            ORDER BY dist2, b_id) AS knn_rank
         |  FROM cand
         |)
         |SELECT a_id, CAST(knn_rank AS BIGINT) AS knn_rank, b_id, dist2
         |FROM ranked WHERE knn_rank <= $GridKnnK
         |ORDER BY a_id, knn_rank""".stripMargin
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
      val cosBig = SimilaritySql.cosine("ea.embedding", "eb.embedding", 64)
      // per-label band width: min + count of b in [min, max) with
      // 2^b * target < n_label — mirrors semdedupPrune's integer column
      val rbExpr = s"$SemBandMinBits + " +
        (SemBandMinBits until SemBandMaxBits).map(b =>
          s"(CASE WHEN ${(1L << b) * SemBandTarget} < n_label THEN 1 ELSE 0 END)")
          .mkString(" + ")
      // band hash: bit j set iff j < rb and dim [band*rb + j + 1] > 0 —
      // same condition order and same 1-based dim index as the engine
      val bh = (0 until SemBandMaxBits).map(j =>
        s"CASE WHEN $j < rb AND (embedding)[t.band * rb + ${j + 1}] > 0" +
          s" THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH n AS (
         |  SELECT label, count(*) AS n_label FROM embeddings GROUP BY label
         |), rt AS (
         |  SELECT label, n_label, $rbExpr AS rb FROM n
         |), e AS (
         |  SELECT em.label, em.vec_id, em.embedding, rt.n_label, rt.rb
         |  FROM embeddings em JOIN rt USING (label)
         |), small_pairs AS (
         |  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         |         $cos AS cos
         |  FROM e a JOIN e b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE a.n_label <= $SemBandThreshold
         |), bands AS (
         |  SELECT label, vec_id, t.band, $bh AS bh
         |  FROM e, UNNEST(range(0, $SemBands)) AS t(band)
         |  WHERE n_label > $SemBandThreshold
         |), cand AS (
         |  SELECT DISTINCT a.label, a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.label = b.label AND a.band = b.band AND a.bh = b.bh
         |   AND a.vec_id < b.vec_id
         |), big_pairs AS (
         |  SELECT c.label, c.a_id, c.b_id, $cosBig AS cos
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.a_id
         |  JOIN embeddings eb ON eb.vec_id = c.b_id
         |), pairs AS (
         |  SELECT * FROM small_pairs UNION ALL SELECT * FROM big_pairs
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
    },

    "skyline_orders" ->
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM orders
         |), pd AS (
         |  SELECT d, max(c) AS maxc FROM o GROUP BY d
         |), thr AS (
         |  SELECT d, maxc,
         |         max(maxc) OVER (ORDER BY d DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS thr
         |  FROM pd
         |)
         |SELECT o.o_orderkey, o.d AS epoch_day, o.c AS price_cents
         |FROM o JOIN thr ON o.d = thr.d
         |WHERE o.c = thr.maxc AND (thr.thr IS NULL OR o.c > thr.thr)
         |ORDER BY epoch_day, o_orderkey""".stripMargin,

    "regress_nation_trend" ->
      s"""WITH pts AS (
         |  SELECT n.n_name,
         |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |), m AS (
         |  SELECT n_name, count(*) AS n_orders,
         |    CAST(count(*) AS DOUBLE) AS nd,
         |    CAST(sum(x) AS DOUBLE) AS sxd,
         |    CAST(sum(y) AS DOUBLE) AS syd,
         |    CAST(sum(CAST(x AS DECIMAL(15,0)) * CAST(y AS DECIMAL(15,0)))
         |      AS DOUBLE) AS sxyd,
         |    CAST(sum(CAST(x AS DECIMAL(15,0)) * CAST(x AS DECIMAL(15,0)))
         |      AS DOUBLE) AS sxxd,
         |    CAST(sum(CAST(y AS DECIMAL(15,0)) * CAST(y AS DECIMAL(15,0)))
         |      AS DOUBLE) AS syyd
         |  FROM pts GROUP BY n_name
         |)
         |SELECT n_name, n_orders,
         |  (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
         |    AS slope_cents_per_day,
         |  (syd * sxxd - sxd * sxyd) / (nd * sxxd - sxd * sxd)
         |    AS intercept_cents,
         |  ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) /
         |    ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) AS r2
         |FROM m ORDER BY n_name""".stripMargin,

    "hybrid_rrf_search" -> {
      val cos = SimilaritySql.cosine("embedding", "q_vec", 64)
      s"""WITH lexs AS (
         |  SELECT doc_id, score FROM (${LlmData.bm25ScoredSql.replace("\n", "\n  ")})
         |), lex AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
         |  FROM lexs QUALIFY lex_rank <= $RrfDepth
         |), q AS (
         |  SELECT embedding AS q_vec FROM embeddings WHERE vec_id = $RrfQueryId
         |), sem0 AS (
         |  SELECT vec_id AS doc_id, $cos AS sim
         |  FROM embeddings, q WHERE vec_id <> $RrfQueryId
         |), sem AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY sim DESC, doc_id) AS sem_rank
         |  FROM sem0 QUALIFY sem_rank <= $RrfDepth
         |)
         |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         |  lex.lex_rank, sem.sem_rank,
         |  COALESCE(CAST(1 AS DOUBLE) / ($RrfK + lex.lex_rank), CAST(0 AS DOUBLE))
         |    + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + sem.sem_rank), CAST(0 AS DOUBLE))
         |    AS rrf_score
         |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
         |ORDER BY rrf_score DESC, doc_id LIMIT $RrfTopK""".stripMargin
    },

    "domain_score_linear" -> {
      val h = TextSql.polyHash("bg")
      s"""WITH base AS (
         |  SELECT doc_id, lang, ${TextSql.tokens("text")} AS toks FROM documents
         |  WHERE len(${TextSql.tokens("text")}) >= 2
         |), bi AS (
         |  SELECT doc_id, lang,
         |         ($h) % $DomFeatures AS f
         |  FROM (SELECT doc_id, lang,
         |               UNNEST(list_transform(range(1, len(toks)),
         |                 i -> toks[i] || ' ' || toks[i + 1])) AS bg
         |        FROM base)
         |), raw AS (
         |  SELECT f, count(*) AS rf FROM bi GROUP BY f
         |), tgt AS (
         |  SELECT f, count(*) AS tf FROM bi WHERE lang = '$DomLang' GROUP BY f
         |), tot AS (
         |  SELECT (SELECT sum(rf) FROM raw) AS rtot,
         |         (SELECT sum(tf) FROM tgt) AS ttot
         |), w AS (
         |  SELECT raw.f,
         |         COALESCE(tgt.tf, 0) * rtot - raw.rf * ttot AS w
         |  FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN tot
         |), dc AS (
         |  SELECT doc_id, f, count(*) AS c FROM bi GROUP BY doc_id, f
         |)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |       CAST(sum(c * w) AS BIGINT) AS score
         |FROM dc JOIN w ON dc.f = w.f
         |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $DomTopK""".stripMargin
    },

    "quantile_sketch_audit" -> {
      // exact order statistics + literal TRUE for the sketch bound (the
      // approx_sketches pattern: tolerance booleans, engine-computed)
      val rows = MrlProbes.map { p =>
        s"""SELECT $p AS pct, (SELECT ($p * n + 99) // 100 FROM n) AS target_rank,
           |  (SELECT v FROM r WHERE rn = (SELECT ($p * n + 99) // 100 FROM n))
           |    AS exact_value,
           |  TRUE AS sketch_within_tol""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS v FROM lineitem
         |), n AS (SELECT count(*) AS n FROM v),
         |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
         |SELECT * FROM (
         |$rows
         |) ORDER BY pct""".stripMargin
    },

    "kanon_risk_audit" ->
      s"""SELECT n.n_name, strftime(o.o_orderdate, '%Y') AS o_year,
         |       o.o_orderpriority,
         |       CAST(count(*) AS BIGINT) AS group_size,
         |       count(*) < $KanonK AS at_risk
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "ldiv_audit" ->
      s"""WITH g AS (
         |  SELECT n.n_name, strftime(o.o_orderdate, '%Y') AS o_year,
         |         o.o_orderpriority,
         |         CAST(count(DISTINCT o.o_orderstatus) AS BIGINT) AS l,
         |         CAST(count(*) AS BIGINT) AS grp_rows
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1, 2, 3
         |)
         |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
         |       CAST(sum(grp_rows) AS BIGINT) AS n_rows,
         |       l < 2 AS at_risk
         |FROM g GROUP BY l ORDER BY l""".stripMargin,

    "tcloseness_audit" ->
      s"""WITH f AS (
         |  SELECT n.n_name, o.o_orderpriority AS prio
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |), tot AS (
         |  SELECT prio, CAST(count(*) AS BIGINT) AS tot FROM f GROUP BY 1
         |), nall AS (
         |  SELECT CAST(sum(tot) AS BIGINT) AS n_all,
         |         CAST(count(*) AS BIGINT) AS m_vals FROM tot
         |), grp AS (
         |  SELECT n_name, CAST(count(*) AS BIGINT) AS n_g FROM f GROUP BY 1
         |), cnt AS (
         |  SELECT n_name, prio, CAST(count(*) AS BIGINT) AS cnt
         |  FROM f GROUP BY 1, 2
         |), grid AS (
         |  SELECT g.n_name, t.prio, g.n_g, a.n_all, a.m_vals,
         |         COALESCE(c.cnt, 0) * a.n_all - t.tot * g.n_g AS diff
         |  FROM grp g CROSS JOIN tot t CROSS JOIN nall a
         |  LEFT JOIN cnt c ON c.n_name = g.n_name AND c.prio = t.prio
         |), cums AS (
         |  SELECT n_name, n_g, n_all, m_vals,
         |         sum(diff) OVER (PARTITION BY n_name ORDER BY prio) AS cum
         |  FROM grid
         |), e AS (
         |  SELECT n_name, n_g, n_all, m_vals,
         |         CAST(sum(abs(cum)) AS BIGINT) AS emd_num
         |  FROM cums GROUP BY 1, 2, 3, 4
         |)
         |SELECT n_name, n_g,
         |       CASE WHEN m_vals > 1 THEN CAST(emd_num AS DOUBLE)
         |         / CAST(n_g * n_all * (m_vals - 1) AS DOUBLE)
         |         ELSE 0.0 END AS t_dist,
         |       CASE WHEN m_vals > 1 THEN CAST(emd_num AS DOUBLE)
         |         / CAST(n_g * n_all * (m_vals - 1) AS DOUBLE)
         |         ELSE 0.0 END > $TCloseT
         |         AS at_risk
         |FROM e ORDER BY n_name""".stripMargin,

    "kcenter_coreset" -> {
      def d2(a: String, b: String): String =
        s"list_sum(list_transform(range(1, ${LlmData.EmbDim + 1}), i -> " +
          s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) * " +
          s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE))))"
      // unrolled greedy: dK = running least-chain of squared distances to
      // the picks so far (LEAST applied in pick order, exactly the
      // engine's fold); pK+1 = the next farthest point
      val steps = (2 to KcK).map { i =>
        val prevD = s"d${i - 1}"
        val pick =
          s"""p$i AS (
             |  SELECT vec_id, md FROM $prevD ORDER BY md DESC, vec_id LIMIT 1
             |)""".stripMargin
        val nextD = if (i == KcK) "" else
          s""", d$i AS (
             |  SELECT d.vec_id, LEAST(d.md, ${d2("e.embedding", "c.embedding")}) AS md
             |  FROM $prevD d JOIN e ON d.vec_id = e.vec_id
             |  CROSS JOIN (SELECT e2.embedding FROM e e2
             |              JOIN p$i ON e2.vec_id = p$i.vec_id) c
             |)""".stripMargin
        pick + nextD
      }.mkString(",\n")
      val sel = (2 to KcK).map(i =>
        s"UNION ALL SELECT $i AS sel_order, vec_id, md AS radius2 FROM p$i")
        .mkString("\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), seed AS (
         |  SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1
         |), d1 AS (
         |  SELECT e.vec_id, ${d2("e.embedding", "seed.embedding")} AS md
         |  FROM e CROSS JOIN seed
         |),
         |$steps
         |SELECT * FROM (
         |  SELECT 1 AS sel_order, (SELECT vec_id FROM seed) AS vec_id,
         |         CAST(0 AS DOUBLE) AS radius2
         |  $sel
         |) ORDER BY sel_order""".stripMargin
    },

    "emb_mmr_select" -> {
      def cos(a: String, b: String): String =
        graft.sim.SimilaritySql.cosine(a, b, LlmData.EmbDim)
      // unrolled greedy: p_i picks the round's MMR argmax from d_i; d_i+1
      // drops the pick and extends every survivor's max-sim chain with
      // GREATEST applied in pick order, exactly the engine's fold. Every
      // chain CTE is MATERIALIZED: d_{i+1} references d_i/p_i three
      // times, and letting the planner inline them expands d1 into the
      // plan ~3^K times (the compare hung before this hint).
      val steps = (1 to MmrK).map { i =>
        val pick =
          s"""p$i AS MATERIALIZED (
             |  SELECT vec_id, rel, ms, 0.7 * rel - 0.3 * ms AS mmr
             |  FROM d$i ORDER BY mmr DESC, vec_id LIMIT 1
             |)""".stripMargin
        val nextD = if (i == MmrK) "" else
          s""", d${i + 1} AS MATERIALIZED (
             |  SELECT d.vec_id, d.rel,
             |         GREATEST(d.ms, ${cos("e.embedding", "c.embedding")}) AS ms
             |  FROM d$i d JOIN e ON d.vec_id = e.vec_id
             |  CROSS JOIN (SELECT e2.embedding FROM e e2
             |              JOIN p$i ON e2.vec_id = p$i.vec_id) c
             |  WHERE d.vec_id <> (SELECT vec_id FROM p$i)
             |)""".stripMargin
        pick + nextD
      }.mkString(",\n")
      val sel = (1 to MmrK).map(i =>
        s"SELECT $i AS sel_order, vec_id, rel, ms AS max_sim, mmr FROM p$i")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), q AS (
         |  SELECT embedding FROM e WHERE vec_id = $MmrQueryId
         |), d1 AS MATERIALIZED (
         |  SELECT e.vec_id, ${cos("e.embedding", "q.embedding")} AS rel,
         |         CAST(0 AS DOUBLE) AS ms
         |  FROM e CROSS JOIN q WHERE e.vec_id <> $MmrQueryId
         |),
         |$steps
         |SELECT * FROM (
         |$sel
         |) ORDER BY sel_order""".stripMargin
    }
  )
}
