package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator surface of the reference engine, Spark-first.
  *
  * Covers SURVEY.md §2.1–§2.4, §2.6, §2.8: scans (S1/S2), filters (F1/F2),
  * projection/row-shaping (P1–P4), JSON row encoding (P3), counts and the
  * pipeline summary (A1/A2), the ordered "recent created products" flagship
  * (F1∧F2+O1, reference `src/sql_to_kafka.py:138-169` +
  * `test/test_sql_to_kafka.py:187-192`), plus the join/group-by/window/
  * distinct/set-op/limit surface the reference lacks (§2.9) but the
  * 100 TB extension requires.
  *
  * Every query here is paired with DuckDB oracle SQL in
  * [[graft.SparkEntry.oracleSql]]. Determinism rules for hash-exact oracle
  * parity:
  *   - aggregate doubles through `DECIMAL(18,2)` (exact, order-independent),
  *     then cast the result back to double — identical bits on both engines;
  *   - row-wise double arithmetic is IEEE-exact and safe as-is;
  *   - dates/timestamps are emitted as formatted strings;
  *   - every result has a total ORDER BY.
  *
  * Scale notes (100 TB): filters/projections push into the parquet scan;
  * dimension joins are explicitly `broadcast`; the fact-fact join shuffles
  * on the join key only after pre-aggregation where possible; windows
  * partition on high-cardinality keys. AQE handles skew at runtime.
  */
object Relational {

  /** F1∧F2+O1 flagship: equality status filter AND lexicographic
    * date-string range filter, descending order. Reference semantics:
    * `src/sql_to_kafka.py:145-153` (string `>=` on ISO dates — correct
    * because ISO-8601 sorts lexicographically) and DESC order from the
    * stale-but-semantic test `test/test_sql_to_kafka.py:187-192`.
    *
    * Parameterized like the reference's `(days_back, article_status)` pair,
    * but with an explicit threshold instead of a buried `current_date()`
    * (lesson of the reference's mocked-clock tests, SURVEY §5.1).
    */
  def recentByStatus(df: DataFrame, statusCol: String, dateCol: String,
                     idCols: Seq[String], status: String, threshold: String): DataFrame = {
    val dateStr = date_format(col(dateCol), "yyyy-MM-dd")
    df.filter(col(statusCol) === lit(status) && dateStr >= lit(threshold))
      .withColumn("ready_date", dateStr)
      .select((Seq("ready_date") ++ idCols ++ Seq(statusCol)).map(col): _*)
      .orderBy(col("ready_date").desc +: idCols.map(col): _*)
  }

  /** Exact decimal sum of a double column, returned as double: identical
    * bits in Spark and DuckDB regardless of aggregation order.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** histogram_equidepth: number of equi-depth buckets. */
  val HistBuckets = 8L

  /** compaction_plan: target output size in rows per compacted bin (the
    * row-count stand-in for `maxPartitionBytes` at the planning layer).
    */
  val CompactTargetRows = 25000L

  /** CDC-applied snapshot of orders (shared by `cdc_apply_orders` and
    * `snapshot_diff_orders`): a deterministic three-batch changelog
    * (upserts, deletes, re-upserts) last-writer-wins-merged into the base
    * — the snapshot+changelog merge every table format (Delta/Hudi/
    * Iceberg MoR) performs, in pure Catalyst.
    */
  private def cdcSnapshot(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(s, dir, "orders")
    val ops = orders.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), lit(1L).as("seq"),
        lit("upsert").as("op"), lit("U").as("status"),
        (col("o_totalprice") * 1.2).as("price"))
      .unionAll(orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit(2L).as("seq"),
          lit("delete").as("op"), lit(null).cast("string").as("status"),
          lit(null).cast("double").as("price")))
      .unionAll(orders.filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("k"), lit(3L).as("seq"),
          lit("upsert").as("op"), lit("R").as("status"),
          (col("o_totalprice") * 1.3).as("price")))
    val last = ops.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1).drop("rn", "seq")
    orders.join(last, col("o_orderkey") === col("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(coalesce(col("o_orderkey"), col("k")).as("o_orderkey"),
        when(col("op").isNull, col("o_orderstatus")).otherwise(col("status"))
          .as("o_orderstatus"),
        when(col("op").isNull, col("o_totalprice")).otherwise(col("price"))
          .as("o_totalprice"),
        when(col("op").isNull, lit("keep")).otherwise(lit("upsert"))
          .as("action"))
  }

  /** Per-session scratch for round-trip queries — see [[Tables.scratchDir]]
    * (the one shared definition, with shutdown-hook cleanup).
    */
  private def scratchDir(s: SparkSession, name: String): String =
    Tables.scratchDir(s, name)

  /** Edge + out-degree working set for [[pageRankParts]], memoized per
    * (session, dataset dir) — the self-join edge build is the dominant
    * construct cost (5.8–16.7 s at sf0.1), and iterative callers (bench
    * reruns, parameter sweeps) should pay it once per dataset, the same
    * discipline as Dedup's session-scoped LSH index memo. The checkpointed
    * RDD blocks are ContextCleaner-reclaimed with the session; stopped
    * sessions are swept from the map on every access.
    */
  private val prGraphCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def clearPageRankCache(): Unit = prGraphCache.clear()

  /** Every graph-family memo at once (adjacency build, k-core profile,
    * bloom masks) — [[graft.Memos.clearAll]]'s entry point into this file.
    */
  def clearGraphCaches(): Unit = {
    prGraphCache.clear(); kcoreMemo.clear(); bloomMaskCache.clear()
  }

  /** Adjacency list `(src, adj: array<dst>, d)` of the part co-occurrence
    * graph, eager-checkpointed. Two shuffles end to end:
    *   1. group lineitem by order into the per-order distinct part set,
    *      then expand the k² ordered pairs with two generators. This
    *      replaces the earlier shuffle_hash self-join: same rows, ONE
    *      pass over lineitem instead of two exchange reads + a hash
    *      relation build.
    *   2. group pairs by src into the distinct neighbor array —
    *      cross-order edge dedup happens INSIDE the aggregate (measured:
    *      a standalone `distinct` removed only 0.3% of pairs yet shuffled
    *      all 2.4 M rows at sf0.1 and materialized them in the
    *      checkpoint; the adjacency checkpoint is the ~20 K-row node
    *      table instead).
    * Out-degree is `size(adj)` — free, no third shuffle.
    *
    * Explicit-width repartitions on both grouping keys: the working set is
    * sub-16 MB, so AQE's advisory size would coalesce each stage to 1-3
    * tasks and serialize the k² expansion (measured 9.9 s single-threaded
    * at local[32]); a user repartition is exempt from coalescing. At real
    * scale the scan already has more partitions than `cores` and the
    * stats-sized AQE width is the right one — the floor only binds when
    * the working set is tiny relative to the machine.
    *
    * Checkpoint is EAGER: under AQE a lazy localCheckpoint's toRdd
    * re-materializes its upstream query stages on every downstream plan
    * construction, so the lazy form re-ran the build once per iteration.
    */
  private[ops] def pageRankGraph(s: SparkSession, dir: String): DataFrame = {
    prGraphCache.keySet.removeIf(_._1.sparkContext.isStopped)
    prGraphCache.computeIfAbsent((s, dir), _ => {
      val cores = s.sparkContext.defaultParallelism
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(cores, col("l_orderkey"))
        // array_distinct(collect_list), not collect_set: the list
        // aggregate appends (no per-insert set probe) and the one-shot
        // in-row dedup is over ~k elements — measured ~10% off the whole
        // construct. Neighbor ORDER inside adj is nondeterministic, which
        // is sound: every consumer is order-invariant (size, and an
        // integer sum over exploded elements).
        .groupBy(col("l_orderkey"))
        .agg(array_distinct(collect_list(col("l_partkey"))).as("ps"))
        .select(explode(col("ps")).as("src"), col("ps"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .repartition(cores, col("src"))
        .groupBy(col("src"))
        // sorted ascending: O(d log d) once at build buys the sorted-merge
        // intersection kernel (SortedIntersect*) for every downstream
        // consumer (triangles, link prediction) and makes the checkpoint
        // fully deterministic; the other consumers are order-invariant.
        .agg(sort_array(array_distinct(collect_list(col("dst")))).as("adj"))
        .select(col("src"), col("adj"), size(col("adj")).cast("long").as("d"))
        // NO declared-layout re-tag here (Bridge.tagHashPartitioned was
        // A/B-measured and REVERTED, round 12): declaring hash(src) on
        // this checkpoint elides every consumer's adjacency-side
        // ENSURE_REQUIREMENTS exchange — which looks like a win (sf0.1
        // graph family 21.5 s -> 18.9 s) but at sf1 regressed triangles
        // 7.9 -> 34 s, bfs 7.3 -> 16.6 s, labelprop 7.1 -> 13.7 s
        // (window factor 1.16x on unchanged queries). Two mechanisms,
        // both from LOSING the exchanges as AQE re-plan/materialization
        // points: (1) derived frames (the oriented-edge o/oadj spine,
        // the per-hop BFS edge explode) stop being shuffle-materialized
        // and RECOMPUTE once per consumer — the triangle static plan
        // carries the o subtree three times; (2) joins whose small side
        // AQE broadcast-converts at runtime (labels, ranks, degrees)
        // stay static SortMergeJoins that SORT rows carrying adjacency
        // arrays — the round-11 payload-sort pathology reintroduced.
        // The tag pays only where consumers join the CHECKPOINT ITSELF
        // (SNM's pair-join build side); see PLANS.md round-12.
        .localCheckpoint(eager = true)
    })
  }

  /** PageRank over the part co-occurrence graph (parts shipping in the
    * same order form a symmetric edge set); three unrolled power
    * iterations (d = 0.85) rank the hubs. All arithmetic is int64
    * fixed-point (rank unit 1e-12): integer `div` truncation is
    * deterministic in every engine, so the iteration is hash-exact with
    * no float-reassociation caveats. Overflow headroom holds to ~1e5
    * nodes at this unit (85 * N * ONE < 2^63) — shrink the unit for
    * bigger graphs. GraphX/pregel is the 1000-iteration answer; bounded
    * iterations stay in Catalyst codegen.
    *
    * `broadcastRanks` picks the per-iteration join shape for the rank
    * vector against the edge set:
    *   - `true` (default): BROADCAST the rank vector — edges never
    *     shuffle, only map-side-combined contribution partials move,
    *     grouped on dst. Right whenever nodes ≪ edges AND the rank table
    *     fits an executor (~2 M nodes at 16 bytes/row ≈ 32 MB per
    *     iteration; fine to ~10 M).
    *   - `false`: shuffle-hash-join ranks against the adjacency table on
    *     src — the adjacency side is already co-partitioned from the
    *     checkpoint write, so only the O(nodes) rank table shuffles per
    *     iteration. The
    *     crossover is where the rank broadcast stops fitting comfortably
    *     (≈tens of MB, i.e. ~10⁷ nodes); past it the broadcast
    *     re-ships the vector to every executor each iteration while the
    *     shuffle moves it once.
    * Both modes are hash-identical (RelationalSpec pins this).
    */
  def pageRankParts(s: SparkSession, dir: String,
                    broadcastRanks: Boolean = true): DataFrame = {
    val one = 1000000000000L
    val base = 15L * one / 100
    val adj = pageRankGraph(s, dir)
    var rank = adj.select(col("src").as("node"), lit(one).as("r"))
    for (_ <- 1 to 3) {
      // per-node outbound weight first (node-level arithmetic on the rank
      // row), then the rank vector joins the ADJACENCY TABLE — O(nodes)
      // probe rows — and only then explodes to edge-level contribution
      // rows, which flow straight into the map-side-combined groupBy(dst).
      // Joining after an edge-level explode would probe once per EDGE
      // (120× more here). No per-iteration checkpoint: with adj pinned,
      // each rank_k subplan appears exactly ONCE in the final plan, so one
      // action materializes the whole chain with each stage executed once
      // — per-iteration checkpoint jobs bought nothing (measured ~2 s of
      // pure job overhead at sf0.1).
      val w = rank.join(adj, col("node") === col("src"))
        .select(col("node"), expr("r div d").as("w"))
      val ranks = if (broadcastRanks) broadcast(w) else w.hint("shuffle_hash")
      rank = adj.join(ranks, adj("src") === ranks("node"))
        .select(explode(col("adj")).as("dst"), col("w"))
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * s) div 100")).as("r"))
    }
    rank.orderBy(col("r").desc, col("node")).limit(20)
  }

  /** Synchronous label propagation (Raghavan et al. 2007, "Near linear
    * time algorithm to detect community structures") over the part
    * co-occurrence graph: labels start as node ids; each of the
    * [[LpRounds]] rounds every node adopts its neighbors' most frequent
    * label (ties to the SMALLEST label — fully deterministic, no RNG and
    * no async order dependence). Output: the 20 largest communities.
    *
    * Scale shape: reuses the memoized checkpointed adjacency
    * ([[pageRankGraph]]) shared with PageRank/triangles, so the edge
    * build runs once per (session, dir). Per round: one shuffle keyed on
    * dst (neighbor-label fetch — a hash join between the O(edges) edge
    * list and the O(nodes) label frame; labels are O(nodes) so the join
    * is NEVER a broadcast at scale) and one map-side-combined count
    * aggregate; the argmax is a WindowGroupLimit per node, not a global
    * sort. Like the PageRank chain, no per-iteration action: each round's
    * subplan appears once in the final plan.
    */
  val LpRounds = 3
  /** markov_stationary: fixed-point unit (1e-9) and power-iteration rounds. */
  val MarkovFp = 1000000000L
  val MarkovIters = 4

  def labelPropagation(s: SparkSession, dir: String): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    val adj = pageRankGraph(s, dir)
    var lab = adj.select(col("src").as("node"), col("src").as("lbl"))
    for (_ <- 1 to LpRounds) {
      // Label fetch joins the ADJACENCY TABLE (O(nodes) probe rows, the
      // pageRankParts trick) and only then explodes to edge-level
      // (neighbor, label) rows that flow straight into the map-side-
      // combined count. Explicit-width repartition on the neighbor key:
      // the per-round aggregates are CPU-heavy relative to their byte
      // size, and AQE's byte-based coalescing would serialize them onto
      // 1–2 tasks (measured 13 s → 7 s warm at sf0.1 with both fixes).
      // hash(dst) clusters (dst, lbl) too, so each round is exactly one
      // exchange; the argmax is min(struct(-count, label)) —
      // lexicographic struct ordering gives (count DESC, label ASC)
      // without a window sort.
      lab = adj.join(lab, adj("src") === lab("node"))
        .select(explode(col("adj")).as("dst"), col("lbl"))
        .repartition(cores, col("dst"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("dst").as("node"), col("m.l").as("lbl"))
    }
    lab.groupBy(col("lbl"))
      .agg(count(lit(1)).as("size"), min(col("node")).as("min_node"))
      .select(col("lbl").as("community"), col("size"), col("min_node"))
      .orderBy(col("size").desc, col("community")).limit(20)
  }

  /** Triangle counting over the part co-occurrence graph via degree-ordered
    * edge orientation (the standard distributed-triangle shape: Suri &
    * Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
    * Reducer"). Every symmetric edge is kept once, directed from the
    * lower (degree, node) endpoint to the higher — the oriented
    * out-degree is then O(√E) even for hub nodes, so the wedge
    * self-join that dominates the cost is bounded by Σ d_out² = O(E^1.5)
    * instead of the Σ d² blow-up a naive neighbor pairing hits on hubs.
    * Each triangle survives exactly once (as the wedge at its
    * lowest-ranked vertex closed by its oriented third edge), so no
    * /3 or /6 correction — counts stay integer-exact and hash-stable.
    *
    * Triangles are found per ORIENTED EDGE, not per wedge: (u, v) closes
    * one triangle for every w in N⁺(u) ∩ N⁺(v), so the dominant operator
    * is a codegen'd sorted-merge intersection
    * ([[graft.functions.SortedIntersectLongs]] — two-pointer over
    * primitive longs; `array_intersect`'s per-row boxed hash set measured
    * 3.5× the stage CPU and all of its GC) over 2·|E| adjacency arrays
    * rather
    * than a join that materializes every length-2 path. On this graph
    * (avg degree ≈ 180 at sf0.1) the wedge-join formulation shuffles
    * ~160 M wedge rows; the intersection form moves ~1 M edge rows with
    * one O(degree) adjacency array attached each (measured 57 s → see
    * PLANS.md). The per-edge array transfer IS the algorithm's stated
    * shuffle cost at any scale (each edge needs both endpoint
    * neighborhoods co-located once).
    *
    * Plan shape: the oriented out-adjacency is one groupBy over the
    * oriented edges (derived from the memoized [[pageRankGraph]]
    * checkpoint — the lineitem scan + k² pair expansion is shared with
    * PageRank and runs once per session/dir); edges pick up N⁺(u) on the
    * same src partitioning (exchange reuse) and N⁺(v) on one dst
    * shuffle; the intersection explodes straight into the
    * map-side-combined per-corner count. Local clustering coefficient
    * 2·t/(d·(d−1)) is one integer-derived double division — bit-exact in
    * any engine.
    */
  def triangleCounts(s: SparkSession, dir: String): DataFrame =
    triangleCounts(s, dir,
      sys.env.get("SPARK_GRAFT_TRI_CHUNK").map(_.toInt).getOrElse(0))

  /** `chunk > 0` caps the per-row adjacency payload: each vertex's sorted
    * out-list is split into range-disjoint slices of ≤ `chunk` ids before
    * the per-edge join, so the shuffled rows carry bounded arrays instead
    * of whole hub neighborhoods. The union of slice-pair intersections
    * equals the full intersection: every common element lives in exactly
    * one (u-slice, v-slice) pair, and that pair survives the
    * range-overlap pruning filter. Because both endpoint id sets sample
    * the same key space, the i-th slice of u and of v cover similar value
    * ranges, so overlap pruning keeps ~max(slices(u), slices(v)) pairs
    * per edge, not the cross product.
    *
    * MEASURED NOT TO PAY on this graph (round-8 A/B at 10× data, 4 cores,
    * PLANS.md): intersect-stage CPU 130–137 s unchunked vs 195 s at
    * chunk=256 and 268 s at chunk=1024, while GC was under 2% of stage
    * CPU in every variant — the sf1 cost is intrinsic kernel work from
    * densification, not adjacency-transfer GC, and the slice-pair row
    * overhead only adds to it. Default stays 0 (unchunked); the knob and
    * its equality spec remain as the documented escape hatch for graphs
    * whose hub lists genuinely exceed executor row budgets
    * (SPARK_GRAFT_TRI_CHUNK).
    */
  def triangleCounts(s: SparkSession, dir: String, chunk: Int): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    val adj = pageRankGraph(s, dir)
    val deg = adj.select(col("src").as("node"), col("d"))
    // symmetric edges with both endpoint degrees; orientation keeps one
    // direction per undirected edge: (d, node) strictly increasing
    val e = adj
      .select(col("src"), col("d").as("ds"), explode(col("adj")).as("dst"))
      .join(deg.select(col("node").as("dst"), col("d").as("dd")), "dst")
    val o = e
      .filter(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src"), col("dst"))
    // explicit width for the same reason as the graph build: the working
    // set is tiny at test SF, and AQE would serialize the intersection
    val oadj = o.repartition(cores, col("src"))
      .groupBy(col("src"))
      // sorted: the per-edge intersection below runs as a primitive
      // two-pointer merge (SortedIntersectLongs) instead of
      // array_intersect's per-row boxed hash set — the intersect stage
      // measured 67 s CPU + 5.4 s GC → 19 s CPU + 0 GC at sf0.1
      // (the residual is explode + the partial count agg; same rows,
      // same counts)
      .agg(sort_array(collect_list(col("dst"))).as("out"))
    // SHUFFLE_HASH on the adjacency side of both attach joins: above the
    // broadcast threshold these would fall to SortMergeJoin, and each SMJ
    // SORTS the edge frame with its attached neighbor arrays — at 10×
    // data the two payload sorts measured ~100× sf0.1's intersect-stage
    // CPU (3853 s vs ~40 s; GC 700 s) on a graph whose Σd² is exactly
    // 10×. A shuffled hash join keeps the scale-correct both-sides-
    // shuffled shape but builds its hash map from the O(nodes) adjacency
    // side and STREAMS the edge rows — no sort ever touches a row
    // carrying an array. Build side per task is nodes/shuffle.partitions
    // rows, which is exactly the frame the groupBy above already
    // materialized per task.
    val tri =
      if (chunk <= 0)
        o.join(oadj.select(col("src"), col("out").as("ou"))
            .hint("SHUFFLE_HASH"), "src")
          .join(oadj.select(col("src").as("dst"), col("out").as("ov"))
            .hint("SHUFFLE_HASH"), "dst")
          .select(col("src").as("u"), col("dst").as("v"),
            explode(graft.functions.ArrayKernels.sorted_intersect(
              col("ou"), col("ov"))).as("w"))
      else {
        val ch = oadj
          .select(col("src"), explode(expr(
            s"transform(sequence(0, (size(out) - 1) div $chunk), " +
              s"i -> slice(out, i * $chunk + 1, $chunk))")).as("part"))
          .select(col("src"), col("part"),
            element_at(col("part"), 1).as("lo"),
            element_at(col("part"), -1).as("hi"))
        o.join(ch.select(col("src"), col("part").as("pu"),
            col("lo").as("lou"), col("hi").as("hiu"))
            .hint("SHUFFLE_HASH"), "src")
          .join(ch.select(col("src").as("dst"), col("part").as("pv"),
            col("lo").as("lov"), col("hi").as("hiv"))
            .hint("SHUFFLE_HASH"), "dst")
          .filter(col("hiu") >= col("lov") && col("lou") <= col("hiv"))
          .select(col("src").as("u"), col("dst").as("v"),
            explode(graft.functions.ArrayKernels.sorted_intersect(
              col("pu"), col("pv"))).as("w"))
      }
    // per-triangle corner explode (3 rows per triangle) — measured BEST at
    // sf1: a weighted-corner variant (2 + |ww| rows per edge via
    // struct(node, weight) emission) read 185 s stage CPU vs 130 s for
    // this form; the struct allocation per element costs more than the
    // extra primitive rows the hash-agg absorbs (PLANS.md round-8 A/B).
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
      .join(deg, "node")
      .select(col("node"), col("n_tri"), col("d"),
        ((col("n_tri") * 2).cast("double") /
          (col("d") * (col("d") - 1)).cast("double")).as("local_cc"))
      .orderBy(col("n_tri").desc, col("node")).limit(20)
  }

  /** k-core peeling profile over the part co-occurrence graph: rounds of
    * "drop every node whose degree within the surviving subgraph is < k",
    * k = ⌊max degree / 2⌋ (derived from the data so the profile is
    * meaningful at every SF — a fixed k would either peel nothing on the
    * dense sf0.1 graph or everything at sf0.001). The output is the
    * per-round (survivors, directed edges) profile — the standard
    * density/robustness fingerprint — rather than the final membership,
    * so the result is a fixed [[KcoreRounds]]+1 rows whatever the data.
    *
    * Deterministic by construction: synchronous rounds (all degree checks
    * against the PREVIOUS round's survivor set), a fixed round count
    * mirrored by the oracle's unrolled CTEs (full peeling iterates to a
    * fixpoint — the round bound makes the oracle expressible and the
    * profile is monotone anyway). Scale shape: each round is two
    * co-partitioned semi-joins of the O(E) edge list against the O(N)
    * survivor frame plus one map-side-combined degree count; survivor
    * frames are eagerly checkpointed per round (CC/PageRank discipline) so
    * round r never re-derives rounds 1..r-1, and the whole profile is
    * memoized per (session, dir).
    */
  val KcoreRounds = 6
  /** hll_sliding_distinct_users: sketch-vs-exact tolerance (percent).
    * DataSketches HLL_4 at the default lgK=12 has ~1.6% relative standard
    * error (0.836/sqrt(2^12) ≈ 1.3% idealized, ~1.6% measured for HLL_4's
    * estimator) once past the exact/sparse regime; 8% is ~5 sigma — wide
    * enough that an unlucky-but-legitimate sketch never fails the gate
    * across the O(days) windows each run re-judges, narrow enough that a
    * broken sketch path (wrong union, wrong column, off-by-10×) still
    * trips it. (Was 5% ≈ 3 sigma, documented as 5 — round-10 ADVICE.)
    */
  val HllSlidingTolPct = 8L

  private val kcoreMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def kcoreProfile(s: SparkSession, dir: String): DataFrame = {
    kcoreMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    kcoreMemo.computeIfAbsent((s, dir), _ => {
      val adj = pageRankGraph(s, dir)
      val k = adj.agg(max(col("d"))).head().getLong(0) / 2
      // peel over a SHRINKING surviving-edge frame: each round is one
      // map-side-combined degree count plus two semi-joins against the
      // (small, checkpointed) survivor set — the full edge list is never
      // re-joined after round 1, so later rounds cost proportional to
      // what actually survives. The profile itself is a literal 7-row
      // frame. Driver actions are the round's only serial cost, so each
      // checkpoint is LAZY and its count() is issued immediately: the one
      // count job both materializes the checkpoint and returns the
      // profile number — 2 driver actions per round instead of the 4 the
      // eager-checkpoint-then-count form paid (the profile query is pure
      // sequential job latency — round-15 A/B numbers in
      // OPTIMIZATION_r15.md). The pageRankGraph lazy-checkpoint hazard
      // (toRdd re-materializing upstream per downstream plan) does not
      // arise because the count() action runs before any downstream plan
      // is constructed from the frame.
      var e = adj.select(col("src"), explode(col("adj")).as("dst"))
        .localCheckpoint(false)
      var rows = Vector((0, k, adj.count(), e.count()))
      // fixed-point early exit: once (survivors, edges) repeats, the
      // survivor set is stable (same edges → same degrees → same
      // survivors), so every later round emits the SAME counts — fill
      // the remaining profile rows without running further Spark jobs.
      // The oracle's fixed-depth recursion computes those rounds
      // literally and lands on identical rows.
      var r = 1
      var converged = false
      while (r <= KcoreRounds && !converged) {
        val surv = e.groupBy(col("src")).agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k).select(col("src").as("node"))
          .localCheckpoint(false)
        val nSurv = surv.count()
        e = e.join(surv.withColumnRenamed("node", "src"), "src")
          .join(surv.withColumnRenamed("node", "dst"), "dst")
          .localCheckpoint(false)
        rows :+= ((r, k, nSurv, e.count()))
        converged = rows(r)._3 == rows(r - 1)._3 && rows(r)._4 == rows(r - 1)._4
        r += 1
      }
      while (r <= KcoreRounds) {
        rows :+= ((r, k, rows.last._3, rows.last._4))
        r += 1
      }
      import s.implicits._
      rows.toDF("round", "k", "survivors", "edges_directed")
        .orderBy("round")
    })
  }

  /** The 100 TB path for `sliding_distinct_users`: one mergeable HLL
    * sketch per day (a single partial-agg'd groupBy over the stream — the
    * raw (day, user) pairs never shuffle), then each day unions the
    * trailing week's sketches with a range-frame window. O(days) rows and
    * O(days x 7) sketch merges after the first pass, instead of
    * re-touching every event 7 times the way the exact broadcast-ranged
    * join does. RelationalSpec bounds its error against the exact query.
    */
  def hllSlidingDistinct(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
    events
      .select(unix_date(col("ts").cast("date")).cast("long").as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(date_format(
        date_add(lit("1970-01-01").cast("date"), col("day").cast("int")),
        "yyyy-MM-dd").as("d"),
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)).as("u7_approx"))
      .orderBy("d")
  }

  /** Bloom-filtered semi join: fold the (small, distinct) build-side key
    * set into an `mBits`-bit bloom bitmask (`mBits/64` longs, `kHashes`
    * universal hashes), broadcast the one-row mask, pre-filter the probe
    * side with the bloom membership test, THEN run the exact semi join.
    *
    * The result is IDENTICAL to a plain semi join — blooms have no false
    * negatives, and false positives die in the exact join — which is why
    * the DuckDB oracle is the plain `EXISTS` query. What changes at scale
    * is WHERE rows die: the bloom test is a narrow codegen'd predicate
    * evaluated at the probe scan, so non-matching rows never reach the
    * semi-join exchange. This is the same lever as Spark's runtime
    * row-level bloom (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
    * made explicit, deterministic, and engine-portable. Defaults fit a
    * dimension-sized build side (4096 bits / 3 hashes ≈ 1% fp at ~400
    * keys); both knobs are per-call.
    */
  /** Bloom masks memoized per (session, build plan, key, mBits, kHashes):
    * the mask build is the one driver action in [[bloomSemiJoin]], and a
    * runtime filter computed for an ingested batch should be computed once
    * and reused by every query probing against it (same `semanticHash`
    * keying as the dedup/pagerank memos). 512 bytes per entry at the
    * default width — the map is effectively free. Two guards:
    *   - the cached entry keeps its canonicalized plan, and a hit is
    *     honored only when `sameResult` confirms it (semanticHash is
    *     32-bit — a collision must compute fresh, never serve another
    *     plan's mask: a wrong mask means silent bloom FALSE NEGATIVES);
    *   - like every session memo here, it assumes the underlying data is
    *     immutable within the session. After rewriting the build-side
    *     files in place, call [[clearBloomMaskCache]] (the plan — and so
    *     the key — does not change when only the data under it does).
    */
  private val bloomMaskCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int, String),
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Seq[Long])]()

  def clearBloomMaskCache(): Unit = bloomMaskCache.clear()

  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    val P = graft.text.TextOps.P
    val MP = graft.text.TextOps.MIX % P
    val words = mBits / 64
    // j-th universal hash of a key, reduced to a bit position in [0, mBits)
    def positions(key: Column): Seq[Column] = (0 until kHashes).map { j =>
      ((key.cast("long") * lit((2 * j + 1) * MP % P) + lit((2 * j + 2) * MP % P))
        % P + P) % P % mBits
    }
    // 1L << (pos % 64): the Scala `shiftleft` helper only takes a literal
    // shift, the SQL function accepts a column
    def bit(pos: Column): Column =
      call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
    // pos / 64 is exact in doubles (power-of-two divisor), so the cast
    // truncates to the true word index
    def word(pos: Column): Column = (pos / 64).cast("int")
    // Materialize the mask driver-side (mBits/64 longs — 512 bytes at the
    // default) and embed it as a LITERAL: a lazy one-row cross join gets
    // reordered ABOVE the semi join by Catalyst (observed), which would
    // evaluate the bloom after the join it exists to prune. As a literal
    // the test is a narrow codegen'd predicate sitting directly on the
    // probe scan. One tiny driver action per call — the same shape as
    // Spark's InjectRuntimeFilter, explicit; at scale, compute once per
    // ingested batch and reuse.
    bloomMaskCache.keySet.removeIf(_._1.sparkContext.isStopped)
    // Distributed mask build: each key contributes kHashes (word, bit)
    // pairs, partial-aggregated map-side with bit_or and reduced to at
    // most `words` groups — O(keys) parallel work, one shuffle of
    // ≤ partitions×words rows, and a `words`-row collect. No distinct()
    // (OR is idempotent) and no collect_list of the key set into a single
    // row: the previous one-row fold evaluated O(keys × words × kHashes)
    // `when`s in ONE task (~10 s at sf0.1) and would concentrate the whole
    // key set in a single row at scale.
    def buildMask(): Seq[Long] = {
      val k = col(buildKey).cast("long")
      val pairs = positions(k).map(p => struct(word(p).as("w"), bit(p).as("b")))
      val partial = build
        .where(k.isNotNull) // collect_list skipped nulls; keep that contract
        .select(explode(array(pairs: _*)).as("pb"))
        .groupBy(col("pb.w").as("w"))
        .agg(call_function("bit_or", col("pb.b")).as("m"))
        .collect()
      val arr = Array.fill(words)(0L)
      partial.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr.toSeq
    }
    val plan = build.queryExecution.analyzed
    val cached = bloomMaskCache.computeIfAbsent(
      (build.sparkSession, plan.semanticHash(), s"$buildKey/$mBits/$kHashes"),
      _ => (plan, buildMask()))
    // 32-bit hash collision: never serve another plan's mask
    val maskArr = if (cached._1.sameResult(plan)) cached._2 else buildMask()
    val bloomLit = typedlit(maskArr)
    val mightContain = positions(col(probeKey)).map(p =>
      element_at(bloomLit, word(p) + 1).bitwiseAND(bit(p)) =!= 0L)
      .reduce(_ && _)
    probe.filter(mightContain)
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }

  /** SCD2 interval construction shared by orders_scd2_intervals and
    * scd2_point_lookup: per customer, each order opens a version valid
    * until the next order's date (exclusive), the last one open-ended at
    * the 9999-12-31 sentinel. ONE definition so the tiebreak and sentinel
    * cannot drift between the builder and its consumers.
    */
  private def scd2Intervals(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
      coalesce(date_format(lead(col("o_orderdate"), 1).over(seq), "yyyy-MM-dd"),
        lit("9999-12-31")).as("valid_to"),
      lead(col("o_orderkey"), 1).over(seq).isNull.cast("int").as("is_current"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship: F1 ∧ F2 + O1 over orders --------------------------------
    "recent_created_orders" -> ((s, dir) =>
      recentByStatus(Tables.load(s, dir, "orders"),
        "o_orderstatus", "o_orderdate", Seq("o_orderkey", "o_custkey"),
        status = "O", threshold = "1998-01-01")),

    // Typed-date variant of the flagship: the predicate compares the
    // TIMESTAMP column directly, so BOTH filters push into the parquet
    // scan (the parity variant's date_format() string compare cannot).
    // At 100 TB this is the difference between pruning row groups at the
    // source and decoding every date. Semantically identical here because
    // ISO date strings sort like dates (SURVEY §1.2).
    "recent_created_orders_typed" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === lit("O") &&
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ready_date"),
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("ready_date").desc, col("o_orderkey"), col("o_custkey"))),

    // ---- F1: parameterized equality predicate ------------------------------
    "filter_eq_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === lit("signup"))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")),

    // ---- F2: lexicographic range on full ISO string, yyyy-MM-dd threshold --
    // Reproduces the reference's "threshold date at midnight is included"
    // subtlety (`'...T08:00' >= '2026-07-13'`, SURVEY §1.2).
    "filter_range_isostring" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .withColumn("o_iso", date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"))
        .filter(col("o_iso") >= lit("2000-06-15"))
        .select(col("o_orderkey"), col("o_iso"))
        .orderBy("o_orderkey")),

    // ---- P1/P2/P4: projection + row shaping + scalar string fns ------------
    "project_shape_docs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), upper(col("lang")).as("lang_uc"),
          concat_ws("_", col("lang"), col("source")).as("tag"),
          element_at(split(col("source"), "c"), -1).as("src_num"),
          col("n_chars"))
        .orderBy("doc_id")),

    // ---- P3: per-row JSON encoding (Kafka message body) --------------------
    // Reference `src/sql_to_kafka.py:209` json.dumps per row; here
    // `to_json(struct(...))` — codegen'd, no UDF.
    "json_encode_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("user_id"), col("event_type"))).as("js"))
        .orderBy("event_id")),

    // ---- A1: count ---------------------------------------------------------
    "count_lineitem" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem").agg(count(lit(1)).as("n"))),

    // ---- A2: pipeline summary record ---------------------------------------
    "pipeline_summary" -> ((s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("products_processed"),
        min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("min_date"),
        max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("max_date"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))),

    // ---- group-by aggregation (TPC-H Q1 shape) -----------------------------
    "agg_pricing_summary" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- star join: broadcast all dimensions, one shuffle for the agg ------
    "join_star_region_rev" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      orders
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("r_name")
    }),

    // ---- 6-table join: the TPC-H Q5 shape ----------------------------------
    // Local-supplier volume: lineitem ⋈ orders is the one genuine
    // fact-fact shuffle; supplier/customer/nation/region all broadcast, so
    // the plan is shuffle-join core + broadcast halo with ONE exchange for
    // the final aggregate. The year filter pushes to the orders scan
    // (typed date compare) and Catalyst reorders the dimension joins —
    // the query exists to prove multi-join planning stays sane, which is
    // the make-or-break property for warehouse workloads at 100 TB. The
    // c_nationkey = s_nationkey residual ("local" supplier) rides the
    // customer broadcast join.
    "join_local_supplier_volume" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val orders = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "customer")),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
             (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- scan-heavy join ratio: the TPC-H Q14 shape ------------------------
    // Promo revenue share per ship-month: lineitem ⋈ part on partkey
    // (part broadcasts at test SF; at warehouse scale both sides are
    // bucketed on partkey and the join is exchange-free), conditional
    // decimal aggregation, then a row-wise IEEE divide of two exact
    // decimal sums — deterministic under any partitioning.
    "promo_revenue_parts" -> ((s, dir) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(Tables.load(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          (sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double") * 100.0 / sum(disc).cast("double")).as("promo_pct"),
          count(lit(1)).as("n_items"))
        .orderBy("ship_month")
    }),

    // ---- fact-fact join: shuffle on the join key, decimal-exact revenue ----
    "join_lineitem_orders" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ---- window: top-3 orders per customer (deterministic tiebreak) --------
    "window_topk_per_customer" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // ---- window: running decimal-exact sum per user over event time --------
    "window_running_value" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy("user_id", "event_id")
    }),

    // ---- batch sessionization: gap->boundary->cumsum, no state store -------
    // The batch twin of stream_sessionize (mapGroupsWithState): same 30-min
    // gap rule via lag + running sum of boundary flags. Tie-safe: equal
    // timestamps give gap 0 in any order, and every emitted column is an
    // order-invariant aggregate, so the window's tie order can't leak into
    // the result. At scale this is ONE shuffle on user_id reused by both
    // windows and the groupBy (same partitioning — no extra exchange).
    "sessionize_batch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("t"))
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, dir)
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("new_session",
          when(lag(col("t"), 1).over(byTs).isNull ||
            col("t") - lag(col("t"), 1).over(byTs) >= gapUs, 1).otherwise(0))
        .withColumn("sid", sum(col("new_session"))
          .over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          (max(col("t")) - min(col("t"))).as("duration_us"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .select(col("user_id"), col("s_start"), col("duration_us"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "s_start")
    }),

    // ---- ordered funnel: view -> click -> purchase -------------------------
    // Product-analytics step sequencing: a user converts at step k only if
    // the step-k event happens STRICTLY AFTER their step-(k-1) conversion
    // time (min-ts per step, chained). Three aggregates + two joins, all
    // keyed on user_id — one hash exchange per step input and the joins
    // reuse the aggregates' partitioning; step frames shrink monotonically
    // (click-side join is against converted users only), so at 100 TB each
    // later step processes a strict subset. Output is the tall (step,
    // users) funnel table; counts only, so timestamp-precision differences
    // between engines cannot surface.
    // ---- funnel conversion latency distribution ----------------------------
    // Time-to-convert (first view → first subsequent purchase) per user,
    // summarized as exact quartiles + mean: latencies stay integer
    // MICROSECONDS end to end (epoch_us deltas — no float time math),
    // quartiles come from the distinct-value cumulative-count selection
    // (the boxplot_price_by_priority recipe: no per-user sort of facts,
    // the serial window only sees O(distinct latencies) rows), and the
    // mean is one mirrored double division. Two filtered aggregates +
    // one user-keyed join.
    "funnel_latency_quartiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts").cast("timestamp"))).as("tv"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tp"))
      val lat = v.join(p, "user_id").filter(col("tp") >= col("tv"))
        .groupBy(col("user_id"), col("tv")).agg(min(col("tp")).as("tp"))
        .select((col("tp") - col("tv")).as("lat"))
      val g = lat.groupBy(col("lat")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("lat"))
      val cum = g.select(col("lat"), col("cnt"), sum(col("cnt")).over(w).as("cw"))
      val tot = lat.agg(count(lit(1)).as("n"), sum(col("lat")).as("sum_lat"))
      def pick(rank: Column) = min(when(col("cw") >= rank, col("lat")))
      cum.crossJoin(tot)
        .groupBy(col("n"), col("sum_lat"))
        .agg(pick(expr("(n + 3) div 4")).as("q1_us"),
          pick(expr("(n + 1) div 2")).as("med_us"),
          pick(expr("(n * 3 + 3) div 4")).as("q3_us"))
        .select(col("n").as("n_converted"), col("q1_us"), col("med_us"),
          col("q3_us"),
          (col("sum_lat").cast("double") / col("n").cast("double") /
            lit(1000000.0)).as("mean_seconds"))
    }),

    // ---- null-safe equality (<=>) join audit -------------------------------
    // The <=> operator contrast every engine-parity suite needs: a plain
    // equi join drops NULL keys, a null-safe join matches NULL to NULL.
    // Audited on (click, error) user pairs WITHOUT a raw null×null row
    // explosion: both sides pre-aggregate to (key, multiplicity) — the
    // null group rides along as one row — and the pair counts are
    // Σ ca·cb over the null-safe key join. One tiny keyed join of two
    // pre-aggregated frames; the identity n_nullsafe = n_eq + n_nullpairs
    // is emitted as a checked flag.
    "join_null_safe_audit" -> ((s, dir) => {
      // the synthetic corpus has no NULL user_ids, so mask every 11th
      // event (a deterministic PII-redaction stand-in) — the NULL key
      // group must exist for the <=> contrast to be non-vacuous
      val ev = Tables.events(s, dir)
        .withColumn("uid", when(col("event_id") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("user_id")))
      def side(t: String, k: String, c: String) =
        ev.filter(col("event_type") === t).groupBy(col("uid").as(k))
          .agg(count(lit(1)).as(c))
      val a = side("click", "ka", "ca")
      val b = side("error", "kb", "cb")
      val eqPairs = a.join(b, col("ka") === col("kb"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("n_eq_join"))
      val nsPairs = a.join(b, col("ka") <=> col("kb"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("n_nullsafe_join"))
      val nulls = a.filter(col("ka").isNull)
        .agg(coalesce(sum(col("ca")), lit(0L)).as("na_null"))
        .crossJoin(b.filter(col("kb").isNull)
          .agg(coalesce(sum(col("cb")), lit(0L)).as("nb_null")))
        .select((col("na_null") * col("nb_null")).as("n_null_pairs"))
      eqPairs.crossJoin(nsPairs).crossJoin(nulls)
        .select(col("n_eq_join"), col("n_nullsafe_join"), col("n_null_pairs"),
          (col("n_nullsafe_join") === col("n_eq_join") + col("n_null_pairs"))
            .as("identity_holds"))
    }),

    "funnel_view_click_purchase" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def step(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts"))
      val v = step("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = step("click").join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = step("purchase").join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("view"))
        .crossJoin(c.agg(count(lit(1)).as("click")))
        .crossJoin(p.agg(count(lit(1)).as("purchase")))
        .selectExpr(
          """stack(3, '1_view', view, '2_click', click,
            |         '3_purchase', purchase) AS (step, users)""".stripMargin)
        .orderBy("step")
    }),

    // ---- latest-state compaction: CDC snapshot per key ---------------------
    // The "current state" view over an append-only event log: exactly one
    // row per user — the latest event (ties broken by event_id, which is
    // unique) plus the total count. At 100 TB: one shuffle on user_id,
    // window + filter fuse into a single pass per partition
    // (WindowGroupLimit pushes rn=1 down); the log is never re-sorted
    // globally.
    "events_latest_state" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val latest = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(latest))
        .withColumn("n_events", count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("n_events"))
        .orderBy("user_id")
    }),

    // ---- time-series gap fill: dense calendar + forward fill ---------------
    // Missing (user, day) cells get n_events = 0 and the most recent day's
    // value carried forward. NOT the textbook grid-then-left-join: each
    // daily row generates the gap days UP TO the user's next real day via
    // lead() + sequence() explode — the generating row already carries the
    // forward-fill value, so there is no dense-calendar self-join at all
    // (the grid+join formulation is a plan diamond: the daily aggregate
    // gets re-expanded under both join branches, pruned differently, and
    // scanned twice — this is the DuckDB oracle's formulation, so the
    // hash-equality also proves the two equivalent). Plan shape: the
    // explicit user_id repartition is the ONLY hash exchange — the daily
    // aggregate (grouping keys a superset of the partitioning) and the
    // lead() window reuse it; the explode is narrow (asserted in
    // RelationalSpec).
    "timeseries_gapfill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(s, dir).repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("day_value"))
        .withColumn("next_day", lead(col("day"), 1).over(byDay))
        .select(col("user_id"), col("day"), col("n_events"), col("day_value"),
          explode(sequence(col("day"),
            coalesce(date_sub(col("next_day"), 1), col("day")))).as("gday"))
        .select(col("user_id"), date_format(col("gday"), "yyyy-MM-dd").as("d"),
          when(col("gday") === col("day"), col("n_events")).otherwise(lit(0L))
            .as("n_events"),
          col("day_value").as("filled_value"))
        .orderBy("user_id", "d")
    }),

    // ---- MERGE INTO semantics: batch upsert as a full-outer reconcile ------
    // Row-level MERGE (matched -> update, not-matched -> insert) expressed
    // as ONE full-outer join on the key plus per-column coalesce — the
    // engine-agnostic formulation table formats compile MERGE into. The
    // batch here is derived from the table itself (keys % 10 = 0 updated,
    // % 10 = 3 re-keyed as inserts) so the query is self-contained and
    // oracle-checkable. One shuffle per side on the key; at scale
    // TableSink.upsertPartitions is the partition-pruned write path for
    // the reconciled result.
    "merge_upsert_orders" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val updates = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit("X").as("status"),
          (col("o_totalprice") * 1.1).as("price"))
      val inserts = orders.filter(col("o_orderkey") % 10 === 3)
        .select((col("o_orderkey") + 100000000L).as("k"), lit("N").as("status"),
          col("o_totalprice").as("price"))
      orders.join(updates.unionAll(inserts), col("o_orderkey") === col("k"), "full_outer")
        .select(coalesce(col("o_orderkey"), col("k")).as("o_orderkey"),
          when(col("k").isNull, col("o_orderstatus")).otherwise(col("status"))
            .as("o_orderstatus"),
          when(col("k").isNull, col("o_totalprice")).otherwise(col("price"))
            .as("o_totalprice"),
          when(col("o_orderkey").isNull, lit("insert"))
            .when(col("k").isNull, lit("keep")).otherwise(lit("update")).as("action"))
        .orderBy("o_orderkey")
    }),

    // ---- CDC apply: ordered changelog with tombstones ----------------------
    // merge_upsert handles one batch of upserts; this is the FULL CDC
    // shape: a sequenced change feed where a key can receive several
    // operations (update → delete → re-insert, synthesized at %5/%10/%20)
    // and LAST-WRITER-WINS decides, deletes dropping the row. The
    // compaction window (row_number by seq DESC) runs over the FEED —
    // O(changes), never the snapshot — then one full-outer join applies
    // the survivors; tombstone rows vanish in a filter. This is the
    // snapshot+changelog merge every table format (Delta/Hudi/Iceberg
    // MoR) performs, expressed in pure Catalyst: at 100 TB the join is
    // the one snapshot-sized shuffle, and bucketing both sides on the
    // key (TableSink.writeBucketed) makes it exchange-free.
    "cdc_apply_orders" -> ((s, dir) =>
      cdcSnapshot(s, dir).orderBy("o_orderkey")),

    // ---- snapshot diff: what the changelog actually changed ----------------
    // The DESCRIBE-HISTORY companion to cdc_apply_orders: base vs the
    // CDC-applied snapshot, every key classified (deleted / updated by
    // VALUE comparison / unchanged), aggregated per class with the base
    // revenue it touches. One key-partitioned join of two snapshot-sized
    // frames (exchange-free when both are bucketed on the key) and a
    // 3-row rollup — the audit a lake compaction/retention job emits.
    "cdc_diff_rollup" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val snap = cdcSnapshot(s, dir).select(col("o_orderkey").as("k2"),
        col("o_orderstatus").as("st"), col("o_totalprice").as("pr"))
      base.join(snap, col("o_orderkey") === col("k2"), "left")
        .withColumn("change",
          when(col("k2").isNull, lit("deleted"))
            .when(col("st") =!= col("o_orderstatus") ||
              col("pr") =!= col("o_totalprice"), lit("updated"))
            .otherwise(lit("unchanged")))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue_base"))
        .orderBy("change")
    }),

    // ---- declarative data-quality constraint suite (Deequ-style) -----------
    // Profiling (profile_orders) measures; this VALIDATES: each named
    // constraint yields an exact metric and a boolean verdict, emitted as a
    // tall (check_name, value, passed) table a pipeline can gate on. Two
    // aggregate passes — scalar metrics and the NDV kept separate (same
    // HashAggregate-vs-Expand reason as profile_orders) — recombined by a
    // free 1-row cross join, then unpivoted with stack(). Every value is an
    // exact count or an integer-ratio double, so the result is hash-stable.
    "dq_constraint_checks" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val day = col("o_orderdate").cast("date")
      val scalars = orders.agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("custkey_nonnull"),
        min(col("o_totalprice")).as("min_price"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
          .as("bad_status"),
        sum(when(day < lit("1995-01-01").cast("date") ||
          day > lit("2001-12-31").cast("date"), 1).otherwise(0)).as("bad_date"))
      scalars.crossJoin(orders.agg(countDistinct(col("o_orderkey")).as("key_ndv")))
        .selectExpr(
          """stack(6,
            |  'orderdate_in_range',      CAST(bad_date AS DOUBLE),        bad_date = 0,
            |  'orderkey_unique',         CAST(key_ndv AS DOUBLE) / n_rows, key_ndv = n_rows,
            |  'orderstatus_in_domain',   CAST(bad_status AS DOUBLE),      bad_status = 0,
            |  'custkey_complete',        CAST(custkey_nonnull AS DOUBLE) / n_rows, custkey_nonnull = n_rows,
            |  'row_count_positive',      CAST(n_rows AS DOUBLE),          n_rows > 0,
            |  'totalprice_non_negative', min_price,                       min_price >= 0.0
            |) AS (check_name, value, passed)""".stripMargin)
        .orderBy("check_name")
    }),

    // ---- ORC round trip: second lake format through the same scan stack ----
    // Parquet -> ORC -> aggregate: the scan after the round trip must hash
    // equal to the parquet-side oracle, proving the ORC reader/writer pair
    // is lossless for the engine's types (longs, doubles, strings). The
    // rewrite is per-run scratch I/O (java.io.tmpdir), not a hot path; the
    // aggregate itself is the usual partial-agg'd groupBy.
    "orc_roundtrip_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "orc/customer")
      graft.sources.Sources.writeOrc(Tables.load(s, dir, "customer"), scratch)
      graft.sources.Sources.orc(s, scratch)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("acctbal"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy("c_mktsegment")
    }),

    // ---- schema evolution: mergeSchema read across writer epochs -----------
    // The lake reality every long-lived table hits: an old writer epoch
    // without a column and a new epoch with it must read back as ONE
    // frame (mergeSchema), old rows null-filled, and aggregate correctly.
    // Round-trip proof in the roundtrip-family contract: the merged-scan
    // aggregate must hash-equal the oracle recomputed from the source
    // table. Scratch I/O per run; the aggregate is the usual
    // partial-agg'd groupBy. At scale mergeSchema=true is a footer-only
    // schema union — no data rewrite, which is the point.
    "schema_evolution_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "evolve/orders")
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$scratch/epoch1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$scratch/epoch2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$scratch/epoch1", s"$scratch/epoch2")
        .groupBy(coalesce(col("o_orderstatus"), lit("<pre-schema>")).as("status"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("status")
    }),

    // ---- CSV round trip: the reference's native input format as a full
    // sink/source pair. DateType serializes as yyyy-MM-dd, doubles as
    // shortest-round-trip decimals, and the explicit-schema read restores
    // the exact values — the aggregate after the round trip must hash
    // equal to the parquet-side oracle (lossless proof, same contract as
    // orc_roundtrip_agg). Scratch I/O per run, not a hot path.
    "csv_roundtrip_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "csv/orders")
      // the midnight timestamps travel as plain dates (yyyy-MM-dd both ways)
      Tables.load(s, dir, "orders")
        .withColumn("o_orderdate", col("o_orderdate").cast("date"))
        .write.mode("overwrite")
        .option("header", "true").csv(scratch)
      graft.sources.Sources.csv(s, scratch,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_custkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_orderstatus",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("o_totalprice",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("o_orderdate",
            org.apache.spark.sql.types.DateType),
          org.apache.spark.sql.types.StructField("o_orderpriority",
            org.apache.spark.sql.types.StringType))))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"),
          max(col("o_orderdate")).cast("string").as("last_date"))
        .orderBy("o_orderstatus")
    }),

    // ---- partition-pruned scan: layout as an operator ----------------------
    // Writes orders partitioned by status, then aggregates ONE partition:
    // the filter resolves to a directory listing (PartitionFilters in the
    // scan, zero non-matching files opened) — the object-store layout
    // trick behind every time/tenant-partitioned lake table, surfaced as
    // an oracle-checked query instead of only a spec.
    "partitioned_scan_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "part/orders")
      graft.sinks.TableSink.writePartitioned(
        Tables.load(s, dir, "orders"), scratch, Seq("o_orderstatus"))
      s.read.parquet(scratch)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ---- range-layout pruned scan: sort order as an operator ---------------
    // Writes orders range-partitioned + sorted on the date key
    // (TableSink.writeRangeLayout — the lakehouse "cluster by" layout),
    // then aggregates a one-year slice: with each file covering a tight
    // min/max date range, the filter prunes most files from the scan via
    // parquet row-group statistics. The AGGREGATE itself is
    // layout-invariant, so the oracle runs on the RAW table — hash parity
    // proves the layout round trip loses nothing while the spec asserts
    // the pruning (RelationalSpec checks the scan reads a strict subset
    // of files).
    "range_layout_scan_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "range/orders")
      graft.sinks.TableSink.writeRangeLayout(
        Tables.load(s, dir, "orders")
          .withColumn("o_orderdate", col("o_orderdate").cast("date")),
        scratch, "o_orderdate", 8)
      s.read.parquet(scratch)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .as("revenue_cents"))
        .orderBy("o_orderpriority")
    }),

    // ---- bucketed co-located join: layout kills the join exchange ----------
    // Writes BOTH join sides hash-bucketed + sorted on the join key
    // (TableSink.writeBucketed), then merge-joins them: the bucket layout
    // satisfies the join's distribution AND ordering requirements, so the
    // plan has NO exchange and NO sort under the join — the only shuffle
    // left is the tiny partial-agg on priority (asserted down to one
    // Exchange in RelationalSpec). This is the write-once/join-many
    // contract that co-locates every repeated 100 TB fact-fact join; the
    // merge hint pins the shape at test SF where the optimizer would
    // otherwise broadcast the small side.
    "bucketed_join_agg" -> ((s, dir) => {
      // External tables rooted in the per-app scratch dir: the DATA lives
      // under Tables.scratchDir, whose shutdown hook reclaims it —
      // repeated bench/verify runs don't accumulate copies in
      // spark-warehouse. Names carry the applicationId so two runs
      // sharing a persistent metastore (or two sessions on one context —
      // the catalog hangs off SharedState, not the session) can never
      // drop or read each other's entries; the DROP below only ever
      // matches this app's own re-run.
      val tag = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val liT = s"graft_li_bkt_$tag"
      val oT = s"graft_o_bkt_$tag"
      Seq(liT, oT).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      // Bucket count = the session's parallelism, NOT a constant: the
      // exchange-free merge join runs exactly bucket-count-wide, so 8
      // buckets capped the join at 8 tasks on a 32-core session (the
      // round-11 cores report caught it as a 1.39× 4→32 speedup). At lake
      // scale the same rule holds — size buckets to the cluster's target
      // join parallelism, since the layout freezes it at write time.
      val nBkt = s.sparkContext.defaultParallelism
      graft.sinks.TableSink.writeBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        liT, "l_orderkey", nBkt, Some("l_orderkey"),
        path = Some(scratchDir(s, "bkt/lineitem")))
      graft.sinks.TableSink.writeBucketed(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
        oT, "o_orderkey", nBkt, Some("o_orderkey"),
        path = Some(scratchDir(s, "bkt/orders")))
      s.table(liT).hint("merge")
        .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // ---- PageRank: fixed-point integer iteration on a co-occurrence graph --
    // See [[pageRankParts]] — the registered query is the default
    // (broadcast-ranks) mode on a memoized edge/degree working set.
    "pagerank_parts" -> ((s, dir) => pageRankParts(s, dir)),

    // ---- community detection: synchronous label propagation ----------------
    // See [[labelPropagation]] — deterministic sync LP over the shared
    // memoized co-occurrence graph; top-20 communities.
    "community_labelprop" -> ((s, dir) => labelPropagation(s, dir)),

    // ---- triangle counting: degree-oriented wedge closure ------------------
    // See [[triangleCounts]] — top-20 parts by triangle participation in
    // the co-occurrence graph, with local clustering coefficients.
    "graph_triangle_counts" -> ((s, dir) => triangleCounts(s, dir)),

    // ---- k-core peeling profile: see [[kcoreProfile]] ----------------------
    "kcore_profile" -> ((s, dir) => kcoreProfile(s, dir)),

    // ---- degree assortativity of the co-occurrence graph -------------------
    // Newman's assortativity coefficient: the Pearson correlation of
    // endpoint degrees over the edge list — do high-degree parts co-occur
    // with other hubs (r > 0) or with the long tail (r < 0)? Every sum is
    // an exact int64 over the memoized adjacency (degree ≤ nodes, squares
    // well under 2^63 at any plausible catalog); the oracle mirrors the
    // one final double formula. One shuffle: the dst-side degree join;
    // src degrees ride the adjacency rows for free.
    "graph_degree_assortativity" -> ((s, dir) => {
      val adj = pageRankGraph(s, dir)
      val e = adj.select(col("src"), col("d").as("dx"),
          explode(col("adj")).as("dst"))
        .join(adj.select(col("src").as("dst"), col("d").as("dy")), "dst")
      e.agg(count(lit(1)).as("n_edges"),
          sum(col("dx")).cast("double").as("sx"),
          sum(col("dy")).cast("double").as("sy"),
          sum(col("dx") * col("dy")).cast("double").as("sxy"),
          sum(col("dx") * col("dx")).cast("double").as("sxx"),
          sum(col("dy") * col("dy")).cast("double").as("syy"))
        .select(col("n_edges"),
          ((col("n_edges").cast("double") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n_edges").cast("double") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n_edges").cast("double") * col("syy") - col("sy") * col("sy"))))
            .as("assortativity"))
    }),

    // ---- sliding distinct: trailing-7-day unique users per day -------------
    // COUNT(DISTINCT) over a sliding time frame — not expressible as a
    // window frame (distinct is not running-decomposable), so the exact
    // form is a compact day-dimension BROADCAST nested-loop ranged against
    // the event stream (the day table is O(days), tiny at any corpus
    // size), then one distinct-aggregate shuffle on (day, user). The
    // 100 TB path replaces exactness with mergeable HLL sketches — one
    // sketch per day, unioned across each 7-day window (hllSlidingDistinct
    // below; RelationalSpec bounds its error against this exact version).
    "sliding_distinct_users" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(unix_date(col("ts").cast("date")).cast("long").as("de"),
          col("user_id"))
      val days = ev.select(col("de").as("day")).distinct()
      broadcast(days).join(ev, col("de").between(col("day") - 6, col("day")))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("u7"))
        .select(date_format(
          date_add(lit("1970-01-01").cast("date"), col("day").cast("int")),
          "yyyy-MM-dd").as("d"), col("u7"))
        .orderBy("d")
    }),

    // ---- sliding distinct, sketch path: HLL-vs-exact audit -----------------
    // [[hllSlidingDistinct]] is the 100 TB path for sliding_distinct_users
    // (one mergeable HLL sketch per day, window-unioned across the trailing
    // week — the raw (day, user) pairs never shuffle). Registered under the
    // driver gate with the approx_sketches contract: the exact count is a
    // value-exact column and the sketch estimate comes back as a
    // within-tolerance flag that must be literal TRUE (DataSketches HLL and
    // any oracle approximation disagree on raw estimates by design).
    "hll_sliding_distinct_users" -> ((s, dir) => {
      val exact = queries("sliding_distinct_users")(s, dir)
      val approx = hllSlidingDistinct(Tables.events(s, dir))
      exact.join(approx, "d")
        .select(col("d"), col("u7"),
          (abs(col("u7_approx") - col("u7").cast("double")) <=
            col("u7").cast("double") * (HllSlidingTolPct / 100.0))
            .as("hll_ok"))
        .orderBy("d")
    }),

    // ---- month-over-month revenue growth ------------------------------------
    // Calendar rollup + lag ratio. The unpartitioned lag window is safe
    // here BY CONSTRUCTION: it runs over the aggregated month table
    // (O(months) rows at any corpus size), never the fact table. Growth is
    // row-wise IEEE arithmetic on decimal-exact monthly sums — hash-exact.
    "revenue_mom_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("prev", lag(col("revenue"), 1).over(Window.orderBy("month")))
        .select(col("month"), col("revenue"),
          ((col("revenue") - col("prev")) / col("prev")).as("growth"))
        .orderBy("month")
    }),

    // ---- Z-order key derivation --------------------------------------------
    // The bit-interleave behind writeZOrderLayout, exposed as a query so the
    // oracle proves the key function itself (the layout's skipping effect is
    // asserted in TableSinkSpec). Narrow, codegen'd, shift/and/or builtins
    // only — the scan is the whole cost.
    "zorder_keys" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("d_epoch"))
        .select(col("o_orderkey"),
          graft.sinks.TableSink.zorderKey(col("o_custkey"), col("d_epoch"))
            .as("z"))
        .orderBy("o_orderkey")),

    // ---- ANALYZE-style column statistics catalog ---------------------------
    // Per-column (rows, nulls, exact NDV, min, max) across the three fact/
    // dim tables — the statistics a cost-based optimizer consumes, as a
    // queryable catalog. ONE aggregation pass per table computes every
    // column's stats together (the multi-count-distinct Expand shape:
    // #cols × the scan, all map-side partials — the standard exact-ANALYZE
    // cost); the per-column stacking unions project from that single
    // 1-row frame, not from re-scans. min/max aggregate on the NATIVE type
    // (lexicographic string min would mis-order numerics) and format after.
    // At 100 TB cadence, swap countDistinct for approx_count_distinct and
    // the pass is a plain narrow aggregate; exact NDV is what the oracle
    // can check.
    "table_stats_catalog" -> ((s, dir) => {
      def tstats(t: String, df: DataFrame,
                 numCols: Seq[String], strCols: Seq[String],
                 dateCols: Seq[String]): DataFrame = {
        val all = numCols ++ strCols ++ dateCols
        val aggs = Seq(count(lit(1)).as("n_rows")) ++ all.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"ndv_$c"),
          min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
        val one = df.agg(aggs.head, aggs.tail: _*)
        // The per-column stacking below is a #cols-way union of selects
        // from `one`; column pruning specializes each branch into its own
        // single-column scan + single-distinct aggregate. That is the
        // MEASURED winner, not an accident (round-15 A/B): each branch
        // reads exactly one parquet column and its single countDistinct
        // plans WITHOUT Expand, so total bytes = every column read once
        // and the ~30 small stages overlap under AQE (2.1 s in-suite at
        // sf0.1). Fusing all columns into the one `stack()`-unpivoted
        // multi-distinct aggregate — the "one pass per table" shape —
        // Expands every row (1 + #distinct-cols)× at scan width: 12.2 s
        // CPU in a 3-task stage, 14.3 s cold vs 2.7 s for this shape at
        // sf0.1. The stage-count flag in the round-14 cores report is
        // job-DAG latency, not a duplicated scan; closed as adjudicated.
        def fmt(c: String)(v: Column): Column =
          if (dateCols.contains(c)) date_format(v, "yyyy-MM-dd")
          else v.cast("string")
        all.map { c =>
          one.select(lit(t).as("table_name"), lit(c).as("column_name"),
            col("n_rows"),
            (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
            col(s"ndv_$c").as("ndv"),
            fmt(c)(col(s"mn_$c")).as("min_val"),
            fmt(c)(col(s"mx_$c")).as("max_val"))
        }.reduce(_ unionByName _)
      }
      tstats("orders", Tables.load(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey"),
          Seq("o_orderstatus", "o_orderpriority"), Seq("o_orderdate"))
        .unionByName(tstats("lineitem", Tables.load(s, dir, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
          Seq("l_returnflag", "l_linestatus"), Seq("l_shipdate")))
        .unionByName(tstats("customer", Tables.load(s, dir, "customer"),
          Seq("c_custkey", "c_nationkey"), Seq("c_mktsegment"), Seq.empty))
        .orderBy("table_name", "column_name")
    }),

    // ---- equi-depth histogram boundaries (CBO histograms) ------------------
    // B-bucket equi-depth boundaries of l_extendedprice (integer cents):
    // boundary b is the smallest value whose cumulative row count reaches
    // ⌈n·b/B⌉ — exact order statistics, not a sketch. Shape: one map-side-
    // combined groupBy onto the O(distinct values) frame, the two-level
    // bucketed prefix sum ([[Stats.bucketedCumsum]] — no unpartitioned
    // window over the value table), then the B targets broadcast against
    // the cum frame and min-reduced. Fact rows are touched exactly once.
    "histogram_equidepth" -> ((s, dir) => {
      val cum = Stats.bucketedCumsum(
        Tables.load(s, dir, "lineitem")
          .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt")),
        "v", 1000000L, Seq("cnt"))
      // n from a count-only scan (ReadSchema empty — the vectorized
      // reader returns batch row counts without decoding a column), NOT
      // from cum.agg(sum(cnt)): that branch re-derived the whole
      // prefix-sum pipeline (join + window + both aggregates) just to
      // total it (round-15 stage table: two extra pipeline copies), and
      // the oracle's own n is literally count(*) of the fact rows.
      val n = Tables.load(s, dir, "lineitem").agg(count(lit(1)).as("n"))
      val targets = n.select(explode(sequence(lit(1L), lit(HistBuckets)))
          .as("bucket"), col("n"))
        .select(col("bucket"),
          // ⌈n·b/B⌉ as integer arithmetic — Column./ would go double
          expr(s"(n * bucket + ${HistBuckets - 1}) div $HistBuckets")
            .as("target_rank"))
      cum.join(broadcast(targets), cum("cnt_cum") >= targets("target_rank"))
        .groupBy(col("bucket"), col("target_rank"))
        .agg(min(col("v")).as("upper_cents"))
        .orderBy("bucket")
    }),

    // ---- small-files compaction plan ---------------------------------------
    // The lakehouse maintenance planner: chunks (per-day event batches —
    // the ingest granularity) are coalesced in day order into target-sized
    // output bins, `bin = floor(cum_before / target)` — the closed-form
    // size-coalescing policy (same family as Spark's AQE partition
    // coalescing, made deterministic and queryable). The plan runs on the
    // O(calendar days) chunk table: one map-side-combined groupBy from
    // facts, one rollup-scale ordered window, one tiny self-aggregation
    // for per-bin totals. Fact bytes are never moved by planning — only
    // the executor of the plan rewrites them, bin by bin.
    "compaction_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val chunks = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_rows"))
      val w = Window.orderBy("day")
      val planned = chunks
        .withColumn("cum_before", sum(col("n_rows")).over(w) - col("n_rows"))
        .withColumn("bin", expr(s"cum_before div $CompactTargetRows"))
      planned
        .join(planned.groupBy(col("bin")).agg(sum(col("n_rows")).as("bin_rows")),
          "bin")
        .select(col("day"), col("n_rows"), col("bin"), col("bin_rows"))
        .orderBy("day")
    }),

    // ---- window-frame semantics audit --------------------------------------
    // Pins the full frame-specification surface against DuckDB on one
    // per-customer pass: running first_value, whole-partition last_value
    // and nth_value(2), a detached trailing frame (2 PRECEDING..1
    // PRECEDING — empty on the first row, so the null→0 coalesce is part
    // of the contract), and a forward-looking count. ONE shuffle on the
    // partition key serves all five frames; the (date, orderkey) order is
    // total, so every frame content — and therefore the hash — is
    // deterministic. Integer cents only.
    "window_frame_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("de"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("c"))
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("de"), col("o_orderkey"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val trail = ord.rowsBetween(-2, -1)
      val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      base.select(col("o_custkey"), col("o_orderkey"),
          first(col("c")).over(run).as("first_c"),
          last(col("c")).over(full).as("last_c"),
          nth_value(col("c"), 2).over(full).as("second_c"),
          coalesce(sum(col("c")).over(trail), lit(0L)).as("prev2_sum"),
          count(lit(1)).over(fwd).as("n_from_here"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- SCD2 interval construction ----------------------------------------
    // Slowly-changing-dimension type-2 view of each customer's order
    // history: every order's validity interval runs until the customer's
    // NEXT order (open-ended sentinel for the latest). One lead() window
    // per customer partition — a single shuffle on the key, no self-join
    // (the naive FROM o a JOIN o b ON a.custkey = b.custkey AND b.date >
    // a.date ... formulation is quadratic per customer).
    "orders_scd2_intervals" -> ((s, dir) =>
      scd2Intervals(Tables.load(s, dir, "orders"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")),

    // ---- activity heatmap: day-of-week x hour ------------------------------
    // The operational-dashboard matrix (when does traffic happen): one
    // partial-agg'd groupBy over derived calendar keys, 168 output cells
    // regardless of corpus size. ISO day numbering (1 = Monday) matches
    // DuckDB's isodow directly.
    "events_hourly_heatmap" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(dayofweek(col("ts")).as("dow_raw"), hour(col("ts")).as("hh"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        // Spark dayofweek: 1 = Sunday; shift to ISO 1 = Monday
        .select((pmod(col("dow_raw") + 5, lit(7)) + 1).cast("long").as("dow"),
          col("hh").cast("long").as("hh"), col("n_events"), col("total_value"))
        .orderBy("dow", "hh")),

    // ---- chi-square independence test --------------------------------------
    // Statistical testing as a first-class op: status x priority
    // contingency table, chi2 = sum (o-e)^2/e with e = rowT*colT/N. The
    // integer difference (o*N - rt*ct) is cast to DOUBLE BEFORE squaring:
    // an int64 square silently wraps in Spark's non-ANSI mode once the
    // difference exceeds ~3.03e9 (reachable when the table deviates hard
    // from independence), while the double square rounds identically in
    // both engines (and is bit-equal to the int64 path whenever |diff| <
    // 2^26.5, i.e. at every test SF). Division runs in a fixed mirrored
    // order; the 15 per-cell terms then fold IN KEY ORDER through a
    // sorted-array aggregate — a plain sum(double) folds in partition
    // order and is not reproducible in the last ulp. All inputs are
    // O(cells) after one aggregate pass over the fact table.
    "chisq_status_priority" -> ((s, dir) => {
      val obs = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
        .agg(count(lit(1)).as("o"))
      val rowT = obs.groupBy(col("st")).agg(sum(col("o")).as("rt"))
      val colT = obs.groupBy(col("pr")).agg(sum(col("o")).as("ct"))
      val tot = obs.agg(sum(col("o")).as("n"),
        (countDistinct(col("st")) - 1).as("dr"),
        (countDistinct(col("pr")) - 1).as("dc"))
      val cells = obs.join(broadcast(rowT), "st").join(broadcast(colT), "pr")
        .crossJoin(broadcast(tot))
        .select(concat(col("st"), lit("|"), col("pr")).as("k"),
          ((col("o") * col("n") - col("rt") * col("ct")).cast("double") *
            (col("o") * col("n") - col("rt") * col("ct")).cast("double") /
            (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
            .as("term"),
          col("n"), (col("dr") * col("dc")).as("dof"))
      cells.groupBy(col("n"), col("dof"))
        .agg(collect_list(struct(col("k"), col("term"))).as("terms"))
        .select(
          aggregate(array_sort(col("terms")), lit(0.0),
            (acc, x) => acc + x("term")).as("chi2"),
          col("dof"), col("n"))
    }),

    // ---- event transition matrix -------------------------------------------
    // Markov-style transition counts between consecutive events per user:
    // lag over (user, time) — one shuffle on user_id, the same partition
    // feeding the window and the aggregate — then a count matrix over the
    // 25 (from, to) type pairs. Transition probability is an exact integer
    // ratio (pair count / from-row count) in one double division.
    "event_transition_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(seq).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTotals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("from_n"))
      pairs.join(broadcast(fromTotals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("from_n").cast("double")).as("p"))
        .orderBy("from_type", "to_type")
    }),

    // ---- Markov stationary distribution ------------------------------------
    // The long-run state occupancy of the event-transition chain: power
    // iteration pi_{k+1}(j) = sum_i pi_k(i)·n_ij / n_i, MarkovIters
    // rounds, in int64 FIXED POINT (unit 1e-9) with integer-div
    // truncation — the pagerank discipline, so the oracle's identically
    // unrolled CTE rounds are hash-exact with zero float tolerance. One
    // events shuffle builds the transition counts (shared shape with
    // event_transition_matrix); everything after runs on the
    // states²-sized matrix (dimension-scale at any corpus size), and the
    // MarkovIters joins chain into ONE action — no per-round collect or
    // checkpoint. int64 bound: pi·n <= 1e9·n_ij, safe past 1e9 events
    // per transition cell; DECIMAL/HUGEINT at true warehouse scale.
    "markov_stationary" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("to_type"),
          lag(col("event_type"), 1).over(seq).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val trans = pairs.join(
        pairs.groupBy(col("from_type")).agg(sum(col("n")).as("from_n")),
        "from_type")
      val states = Tables.events(s, dir)
        .select(col("event_type").as("st")).distinct()
      val m = states.agg(count(lit(1)).as("m"))
      var pi = states.crossJoin(broadcast(m))
        .select(col("st"), expr(s"${MarkovFp}L div m").as("v"))
      for (_ <- 1 to MarkovIters) {
        val contrib = trans
          .join(broadcast(pi), trans("from_type") === pi("st"))
          .select(col("to_type").as("cst"),
            expr("(v * n) div from_n").as("cv"))
          .groupBy(col("cst")).agg(sum(col("cv")).as("cv"))
        pi = states.join(contrib, states("st") === contrib("cst"), "left")
          .select(col("st"), coalesce(col("cv"), lit(0L)).as("v"))
      }
      pi.select(col("st").as("event_type"), col("v").as("pi_fp"),
          (col("v").cast("double") / lit(MarkovFp.toDouble)).as("pi"))
        .orderBy("event_type")
    }),

    // ---- median imputation --------------------------------------------------
    // Null repair by group statistic: every 13th order's price is masked
    // (deterministic synthesis — the corpus ships complete) and refilled
    // with its priority group's median over the SURVIVING values. The
    // exact interpolated median is the verification-scale path (same
    // contract as histogram_equidepth_price: swap percentile_approx at
    // 100 TB); group medians broadcast back onto the stream, so the
    // repair pass itself is narrow.
    "impute_missing_prices" -> ((s, dir) => {
      val masked = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(pmod(col("o_orderkey"), lit(13)) === 0, lit(null).cast("double"))
            .otherwise(col("o_totalprice")).as("price"))
      val med = masked.filter(col("price").isNotNull)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(price, 0.5)").as("group_median"))
      masked.join(broadcast(med), "o_orderpriority")
        .select(col("o_orderkey"),
          col("price").isNull.cast("int").as("imputed"),
          coalesce(col("price"), col("group_median")).as("price"))
        .orderBy("o_orderkey")
    }),

    // ---- market-basket affinity: support + lift ----------------------------
    // Frequent part pairs with lift, on one ship-year of baskets. The pair
    // count reuses the co-occurrence self-join shape (co-partitioned SHJ,
    // never broadcast-a-fact); item supports broadcast back onto the pair
    // table; the order total rides a 1-row cross join (no driver collect).
    // Lift is an exact integer ratio evaluated in one double division —
    // (pair_n * n_orders) and (n_a * n_b) both stay far under 2^53 — so
    // ranking ties cannot drift between engines.
    "part_affinity_lift" -> ((s, dir) => {
      val cores = s.sparkContext.defaultParallelism
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(cores, col("l_orderkey")).distinct()
      val pairs = li.as("a").hint("shuffle_hash")
        .join(li.as("b").hint("shuffle_hash"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= 2)
      val items = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("item_n"))
      val total = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(items.select(col("l_partkey").as("pa"), col("item_n").as("na"))), "pa")
        .join(broadcast(items.select(col("l_partkey").as("pb"), col("item_n").as("nb"))), "pb")
        .crossJoin(broadcast(total))
        .select(col("pa"), col("pb"), col("pair_n"),
          ((col("pair_n") * col("n_orders")).cast("double") /
            (col("na") * col("nb")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(50)
    }),

    // ---- trailing-window anomaly detection ---------------------------------
    // Daily revenue z-scored against its OWN trailing 7-day window. The
    // windows run over the aggregated daily table (O(days) rows at any
    // corpus size), and mean/std come from DECIMAL window sums (sum and
    // sum-of-squares in exact cents), so the flag is deterministic under
    // any partitioning — builtin windowed stddev folds doubles in
    // partition order and can flip a borderline flag between runs.
    "anomaly_daily_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(cents).as("c"))
        .withColumn("n7", count(lit(1)).over(w))
        .withColumn("s7", sum(col("c")).over(w))
        // square in DECIMAL, not Long: daily cents can exceed 3e9 one SF
        // step up, and a Long*Long square wraps silently — the oracle
        // mirrors this exactly (DECIMAL(15,0) operands BEFORE the
        // multiply; a cast applied after a 64-bit multiply would inherit
        // the wrap)
        .withColumn("ss7", sum(col("c").cast("decimal(15,0)") *
          col("c").cast("decimal(15,0)")).over(w))
        .filter(col("n7") === 7)
        // all-double from here (each decimal casts once, correctly
        // rounded, identically in both engines — no decimal division,
        // whose result scale is engine-specific)
        .select(col("day"),
          (col("c").cast("double") / 100.0).as("revenue"),
          col("c").cast("double").as("cd"), col("s7").cast("double").as("sd"),
          col("ss7").cast("double").as("ssd"), col("n7").cast("double").as("nd"))
        .select(col("day"), col("revenue"),
          ((col("cd") - col("sd") / col("nd")) /
            sqrt((col("ssd") - col("sd") * col("sd") / col("nd")) /
              (col("nd") - 1.0))).as("z"))
        .filter(abs(col("z")) > 2.0)
        .orderBy("day")
    }),

    // ---- least-squares trend lines -----------------------------------------
    // Closed-form linear regression of daily revenue (cents) on the epoch
    // day, per priority: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Every
    // SUM is integer/decimal-exact (Σxy in DECIMAL operands BEFORE the
    // multiply — the anomaly-detector recipe; x < 2·10⁴ forever, so Σx²
    // stays in int64 at any corpus size), and only the final formula runs
    // in doubles, each exact sum cast once and the op order mirrored in
    // the oracle — regression coefficients with zero float-fold drift.
    // Two map-side-combined aggregates over the fact table; O(priorities)
    // output.
    "trend_daily_revenue" -> ((s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val dec15 = (c: Column) => c.cast("decimal(15,0)")
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("x"))
        .agg(sum(cents).as("y"))
      daily.groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dec15(col("x")) * dec15(col("y"))).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("priority"), col("n"),
          col("n").cast("double").as("nd"), col("sx").cast("double").as("sxd"),
          col("sy").cast("double").as("syd"),
          col("sxy").cast("double").as("sxyd"),
          col("sxx").cast("double").as("sxxd"))
        .select(col("priority"), col("n"), col("nd"), col("sxd"), col("syd"),
          ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
            .as("slope_cents_per_day"))
        .select(col("priority"), col("n"), col("slope_cents_per_day"),
          ((col("syd") - col("slope_cents_per_day") * col("sxd")) / col("nd"))
            .as("intercept_cents"))
        .orderBy("priority")
    }),

    // ---- double-correlated EXISTS / NOT EXISTS (decorrelated) --------------
    // TPC-H Q21's shape on this schema: suppliers whose lineitems were
    // the ONLY returned ('R') items in orders that involved other
    // suppliers — one correlated EXISTS (another supplier present) and
    // one correlated NOT EXISTS (no other supplier returned). The Spark
    // side ships the DECORRELATED form: one map-side-combined per-order
    // aggregate (distinct suppliers, distinct returned suppliers)
    // replaces both correlated probes, then one join on l_orderkey —
    // two fact-table passes and a fact self-join become one aggregate
    // pass + one co-partitioned join (AQE broadcasts the O(orders)
    // aggregate at test SF). The ORACLE deliberately keeps the literal
    // EXISTS/NOT-EXISTS formulation: two independently derived query
    // shapes must hash-match, which checks the decorrelation itself.
    // Equivalence: l1 is 'R', so "another supplier exists" = n_supp >= 2
    // and "no other returned supplier" = n_bad = 1 (l1's supplier is
    // always counted in n_bad). Top-k is TakeOrderedAndProject.
    "sql_sole_problem_supplier" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val per = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_bad"))
      li.filter(col("l_returnflag") === "R")
        .join(per, "l_orderkey")
        .filter(col("n_supp") >= 2 && col("n_bad") === 1)
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }),

    // ---- rolling median (exact order statistic over a sliding frame) -------
    // The robust companion to the z-score window: median of the trailing
    // 7 daily revenues. No engine exposes median as a running-decomposable
    // window aggregate, so the frame is collected per row — O(7) values,
    // bounded by the frame, never by the corpus — sorted, and the middle
    // element SELECTED. Selection creates no new floats (vs mean/std,
    // which must round), so parity is value-exact by construction; the
    // oracle mirrors the same sorted-frame pick rather than calling
    // DuckDB's median() (same value for odd frames, but the mirrored form
    // stays exact if the frame ever goes even/interpolating). Runs over
    // the aggregated daily table (O(days) rows at any corpus size).
    "rolling_median_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("frame", collect_list(col("revenue")).over(w))
        .filter(size(col("frame")) === 7)
        .select(col("day"), col("revenue"),
          element_at(array_sort(col("frame")), 4).as("med7"))
        .orderBy("day")
    }),

    // ---- exponential smoothing (EWMA) --------------------------------------
    // The forecasting/monitoring companion to the z-score detector above:
    // y_t = 0.75·y_{t-1} + 0.25·x_t (y_0 = x_0) over one year of daily
    // revenue per priority. A recurrence has NO windowed-sum form, and a
    // closed-form power expansion rounds differently than the recurrence —
    // so each day's value is computed by folding the day-ordered prefix
    // with the exact same multiply-add sequence in both engines (prefix
    // re-folds are O(days²) per key — trivial against a bounded calendar;
    // the state-ordered fold is the same discipline as chisq/BM25). The
    // fold runs over the AGGREGATED daily table — O(days·priorities) rows
    // at any corpus size — never the fact stream; gaps stay gaps
    // (compose timeseries_gapfill upstream for a dense calendar). Alpha
    // 0.25 and its complement are binary-exact literals.
    "ewma_daily_revenue" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      daily.groupBy(col("priority"))
        .agg(array_sort(collect_list(struct(col("d"), col("rev")))).as("xs"))
        .select(col("priority"),
          explode(transform(sequence(lit(1), size(col("xs"))), t => struct(
            element_at(col("xs"), t)("d").as("d"),
            element_at(col("xs"), t)("rev").as("revenue"),
            aggregate(slice(col("xs"), lit(2), t - 1),
              element_at(col("xs"), lit(1))("rev"),
              (a, x) => a * lit(0.75) + x("rev") * lit(0.25)).as("ewma"))))
            .as("r"))
        .select(col("priority"), col("r")("d").as("d"),
          col("r")("revenue").as("revenue"), col("r")("ewma").as("ewma"))
        .orderBy("priority", "d")
    }),

    // ---- Holt double exponential smoothing (level + trend) -----------------
    // The second-order recurrence the EWMA query can't express: coupled
    // level/trend state l_t = a*x_t + (1-a)(l+b), b_t = g(l_t - l) +
    // (1-g)b, initialized l_1 = x_1, b_1 = x_2 - x_1. The state is
    // carried as a 2-element DOUBLE ARRAY through a sequential prefix
    // fold with an identical multiply-add sequence in both engines —
    // NOT a struct accumulator: DuckDB's list_reduce evaluates
    // struct_pack fields sequentially, rebinding acc.l to the new level
    // inside the trend expression (measured), so a struct state silently
    // diverges; array state indexes the ORIGINAL accumulator in both
    // engines. a = 0.5, g = 0.25 are exact binary fractions. Scale
    // shape: identical to ewma_daily_revenue — O(days^2) fold work per
    // group on O(days) rows, after the one daily-rollup shuffle.
    "holt_daily_revenue" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val lvl = (acc: Column, x: Column) =>
        lit(0.5) * x("rev") + lit(0.5) * (element_at(acc, 1) + element_at(acc, 2))
      daily.groupBy(col("priority"))
        .agg(array_sort(collect_list(struct(col("d"), col("rev")))).as("xs"))
        .select(col("priority"),
          explode(transform(sequence(lit(1), size(col("xs"))), t => struct(
            element_at(col("xs"), t)("d").as("d"),
            element_at(col("xs"), t)("rev").as("revenue"),
            aggregate(slice(col("xs"), lit(2), t - 1),
              array(element_at(col("xs"), lit(1))("rev"),
                element_at(col("xs"), lit(2))("rev") -
                  element_at(col("xs"), lit(1))("rev")),
              (acc, x) => array(
                lvl(acc, x),
                lit(0.25) * (lvl(acc, x) - element_at(acc, 1)) +
                  lit(0.75) * element_at(acc, 2))).as("hb"))))
            .as("r"))
        .select(col("priority"), col("r")("d").as("d"),
          col("r")("revenue").as("revenue"),
          element_at(col("r")("hb"), 1).as("level"),
          element_at(col("r")("hb"), 2).as("trend"),
          (element_at(col("r")("hb"), 1) + element_at(col("r")("hb"), 2))
            .as("forecast_next"))
        .orderBy("priority", "d")
    }),

    // ---- Holt-Winters triple exponential smoothing (additive, period 7) ----
    // The seasonal extension of holt_daily_revenue: coupled level/trend/
    // seasonal state l_t = α(x_t - s_{t-7}) + (1-α)(l+b), b_t = γ(l_t-l)
    // + (1-γ)b, s_t = δ(x_t - l_t) + (1-δ)s_{t-7}, α=0.5, γ=δ=0.25 (exact
    // binary fractions). State = a 10-element DOUBLE ARRAY [l, b, s₀..s₆,
    // t] — the seasonal ring indexed by t mod 7 INSIDE the fold via a
    // computed element_at, the step counter carried as state (array state,
    // never struct — see the holt_daily_revenue note on DuckDB's
    // struct_pack rebinding). Same O(days²)-fold-on-O(days)-rows scale
    // shape as Holt/EWMA, per-priority groups fold in parallel.
    "holt_winters_daily" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val sidx = (acc: Column) =>
        (element_at(acc, 10).cast("long") % 7).cast("int") + lit(3)
      val lvl = (acc: Column, x: Column) =>
        lit(0.5) * (x("rev") - element_at(acc, sidx(acc))) +
          lit(0.5) * (element_at(acc, 1) + element_at(acc, 2))
      val step = (acc: Column, x: Column) => {
        val es = (0 until 7).map(k =>
          when(element_at(acc, 10).cast("long") % 7 === k,
            lit(0.25) * (x("rev") - lvl(acc, x)) +
              lit(0.75) * element_at(acc, k + 3))
            .otherwise(element_at(acc, k + 3)))
        array(Seq(
          lvl(acc, x),
          lit(0.25) * (lvl(acc, x) - element_at(acc, 1)) +
            lit(0.75) * element_at(acc, 2)) ++ es :+
          (element_at(acc, 10) + lit(1.0)): _*)
      }
      daily.groupBy(col("priority"))
        .agg(array_sort(collect_list(struct(col("d"), col("rev")))).as("xs"))
        .select(col("priority"),
          explode(transform(sequence(lit(1), size(col("xs"))), t => struct(
            element_at(col("xs"), t)("d").as("d"),
            element_at(col("xs"), t)("rev").as("revenue"),
            aggregate(slice(col("xs"), lit(2), t - 1),
              array((Seq(
                element_at(col("xs"), lit(1))("rev"),
                element_at(col("xs"), lit(2))("rev") -
                  element_at(col("xs"), lit(1))("rev")) ++
                Seq.fill(7)(lit(0.0)) :+ lit(1.0)): _*),
              step).as("hb"),
            t.as("t"))))
            .as("r"))
        .select(col("priority"), col("r")("d").as("d"),
          col("r")("revenue").as("revenue"),
          element_at(col("r")("hb"), 1).as("level"),
          element_at(col("r")("hb"), 2).as("trend"),
          element_at(col("r")("hb"),
            ((col("r")("t") - 1) % 7).cast("int") + lit(3)).as("seasonal"),
          (element_at(col("r")("hb"), 1) + element_at(col("r")("hb"), 2) +
            element_at(col("r")("hb"),
              (col("r")("t") % 7).cast("int") + lit(3))).as("forecast_next"))
        .orderBy("priority", "d")
    }),

    // ---- rolling 28-day revenue/volume correlation -------------------------
    // Windowed Pearson correlation between daily revenue and daily order
    // count — the co-movement diagnostic behind "is revenue growth just
    // volume?". All five window sums are EXACT (cents int64; squares as
    // DECIMAL(19,0)×DECIMAL(19,0) products — a daily total squared
    // overflows int64 from sf0.1 up); one mirrored double formula per
    // emitted day, full 28-row windows only. The serial window runs on
    // the O(days) rollup (bucketable by the [[graft.ops.Stats]] prefix-sum
    // recipe if days ever outgrew one partition).
    "rolling_corr_daily" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val daily = Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(sum(cents).as("x"), count(lit(1)).as("y"))
      val w = Window.orderBy(col("d")).rowsBetween(-27, 0)
      val d19 = (c: Column) => c.cast("decimal(19,0)")
      val nd = (c: Column) => c.cast("double")
      daily.select(col("d"), col("x"), col("y"),
          count(lit(1)).over(w).as("nw"),
          sum(col("x")).over(w).as("sx"),
          sum(col("y")).over(w).as("sy"),
          sum(d19(col("x")) * d19(col("x"))).over(w).as("sxx"),
          sum(d19(col("y")) * d19(col("y"))).over(w).as("syy"),
          sum(d19(col("x")) * d19(col("y"))).over(w).as("sxy"))
        .filter(col("nw") === 28)
        .select(col("d"), col("x"), col("y"),
          ((nd(col("nw")) * nd(col("sxy")) - nd(col("sx")) * nd(col("sy"))) /
            (sqrt(nd(col("nw")) * nd(col("sxx")) - nd(col("sx")) * nd(col("sx"))) *
             sqrt(nd(col("nw")) * nd(col("syy")) - nd(col("sy")) * nd(col("sy")))))
            .as("corr28"))
        .orderBy("d")
    }),

    // ---- incremental JOIN maintenance audit --------------------------------
    // Delta-maintenance of a join aggregate: with lineitem static and the
    // orders delta Δ, Δ(orders ⋈ lineitem) = Δorders ⋈ lineitem — so the
    // refreshed aggregate is base(pre-cut) ⊎ delta(post-cut), and the
    // audit proves it equals the full recompute per group, exact-cents.
    // This is how a 100 TB daily pipeline avoids re-joining history:
    // the delta join touches only new orders (partition-pruned by date),
    // the base aggregate is a materialized k-row table, and the merge is
    // a k-row full-outer fold.
    "join_incremental_refresh" -> ((s, dir) => {
      val cut = Curation.RefreshCut
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      def agg(odf: DataFrame) =
        odf.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("rev"))
      val base = agg(o.filter(col("o_orderdate") < lit(cut).cast("timestamp")))
        .select(col("o_orderpriority"), col("n").as("n_b"), col("rev").as("rev_b"))
      val delta = agg(o.filter(col("o_orderdate") >= lit(cut).cast("timestamp")))
        .select(col("o_orderpriority"), col("n").as("n_d"), col("rev").as("rev_d"))
      val refreshed = base.join(delta, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          coalesce(col("n_d"), lit(0L)).as("n_delta"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_refreshed"),
          (coalesce(col("rev_b"), lit(0L)) + coalesce(col("rev_d"), lit(0L)))
            .as("rev_refreshed"))
      val full = agg(o)
        .select(col("o_orderpriority"), col("n").as("n_full"),
          col("rev").as("rev_full"))
      refreshed.join(full, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"), col("n_delta"), col("n_refreshed"),
          col("n_full"), col("rev_refreshed"), col("rev_full"),
          (col("n_refreshed") === col("n_full") &&
            col("rev_refreshed") === col("rev_full")).as("consistent"))
        .orderBy("o_orderpriority")
    }),

    // ---- cohort retention ---------------------------------------------------
    // Users bucketed by signup week, activity tracked by week offset — the
    // (cohort, offset) -> distinct-user matrix every product warehouse
    // maintains. Two aggregates and one equi join, all keyed on user_id /
    // the tiny cohort table; the distinct shuffle carries (cohort, offset,
    // user) which partial aggregation thins map-side.
    "cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val week = (c: Column) => floor(unix_date(c.cast("date")) / 7).cast("long")
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(week(col("ts"))).as("cohort_week"))
      ev.select(col("user_id"), week(col("ts")).as("wk"))
        .join(cohorts, "user_id")
        .filter(col("wk") >= col("cohort_week"))
        .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ---- SCD2 point-in-time lookup -----------------------------------------
    // The consumer side of orders_scd2_intervals: each event resolves the
    // order version VALID AT its timestamp — equi join on the user key
    // carries the shuffle, the [valid_from, valid_to) interval evaluates
    // as a residual predicate (never a nested loop), and at most one
    // interval matches per event by construction (intervals partition the
    // timeline), so no dedup pass is needed. LEFT join: events before a
    // user's first order keep a null version — the honest temporal-join
    // contract.
    "scd2_point_lookup" -> ((s, dir) => {
      val iv = scd2Intervals(Tables.load(s, dir, "orders"))
        .drop("is_current")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .join(iv, col("user_id") === col("o_custkey") &&
          col("d") >= col("valid_from") && col("d") < col("valid_to"), "left")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("active_order"))
        .orderBy("event_id")
    }),

    // ---- snapshot diff: derive the changelog between two table versions ----
    // CDC the lake way: full outer join of old and new snapshots on the
    // key, rows classified insert/update/delete by side-presence and
    // value comparison. The "new" snapshot is synthesized deterministically
    // from orders (every 97th key deleted, every 31st price bumped, every
    // 53rd re-inserted under a fresh key) and the oracle replays the same
    // synthesis — so the hash gate proves diff(old, new) reconstructs the
    // edit script exactly. One shuffle on the key; unchanged rows drop
    // before the sort.
    "snapshot_diff_orders" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("key"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      val newSnap = base.filter(pmod(col("key"), lit(97)) =!= 0)
        .select(col("key"),
          when(pmod(col("key"), lit(31)) === 0, col("price") + lit(1).cast("decimal(18,2)"))
            .otherwise(col("price")).as("price"))
        .unionByName(base.filter(pmod(col("key"), lit(53)) === 0)
          .select((col("key") + 1000000000000L).as("key"), col("price")))
      base.as("o").join(newSnap.as("n"), Seq("key"), "full_outer")
        .withColumn("op",
          when(col("o.price").isNull, "insert")
            .when(col("n.price").isNull, "delete")
            .when(col("o.price") =!= col("n.price"), "update"))
        .filter(col("op").isNotNull)
        .select(col("key"), col("op"),
          col("o.price").cast("double").as("old_price"),
          col("n.price").cast("double").as("new_price"))
        .orderBy("key", "op")
    }),

    // ---- distinct + count distinct -----------------------------------------
    "distinct_event_types" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_type")).distinct().orderBy("event_type")),

    "count_distinct_lineitem" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))),

    // ---- set op: EXCEPT (hours with clicks but no errors) ------------------
    "set_except_hours" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("h", date_format(col("ts"), "yyyy-MM-dd HH"))
      ev.filter(col("event_type") === "click").select(col("h"))
        .except(ev.filter(col("event_type") === "error").select(col("h")))
        .orderBy("h")
    }),

    // ---- set op: INTERSECT (hours with both clicks and errors) -------------
    "set_intersect_hours" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("h", date_format(col("ts"), "yyyy-MM-dd HH"))
      ev.filter(col("event_type") === "click").select(col("h"))
        .intersect(ev.filter(col("event_type") === "error").select(col("h")))
        .orderBy("h")
    }),

    // ---- raw SQL surface: TPC-H Q3 shape through spark.sql -----------------
    // The engine's third API (DataFrame, Dataset, SQL text): temp views +
    // one multi-join analytical statement, decimal-exact revenue.
    "sql_shipping_priority" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("v_orders")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT o_orderkey,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          |       date_format(o_orderdate, 'yyyy-MM-dd') AS order_date, o_orderpriority
          |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
          |JOIN v_lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          |GROUP BY o_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin)
    }),

    // ---- disjunctive join predicate (TPC-H Q19 shape) ----------------------
    // OR-of-ANDs spanning both join sides: Catalyst extracts the
    // per-side conjuncts common to every disjunct (the brand IN-list and
    // size/quantity bounds) and pushes them below the join into BOTH
    // parquet scans, leaving only the cross-side residual on the join —
    // the classic "discounted revenue" plan. At 100 TB the part side
    // stays dimension-sized after pruning, so the broadcast join holds.
    "sql_disjunctive_revenue" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      Tables.load(s, dir, "part").createOrReplaceTempView("v_part")
      s.sql(
        """SELECT p_brand,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
          |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
          |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin)
    }),

    // ---- correlated scalar subquery (TPC-H Q17 shape) ----------------------
    // The Spark side keeps the CORRELATED form — Catalyst's
    // RewriteCorrelatedScalarSubquery decorrelates it into the per-part
    // aggregate + join below; the oracle is decorrelated BY HAND, so the
    // hash gate checks the rewrite itself (the sql_sole_problem_supplier
    // discipline). l_quantity values are small integers stored as
    // doubles, so avg() is exact in any fold order; the 0.2 multiplier is
    // the same literal in both engines, making the threshold compare
    // bit-identical. Revenue is one decimal-exact sum and ONE double
    // division.
    "sql_small_qty_revenue" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("v_lineitem")
      Tables.load(s, dir, "part").createOrReplaceTempView("v_part")
      s.sql(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
          |       count(*) AS n_items
          |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#3'
          |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
          |                    FROM v_lineitem l2
          |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),

    // ---- anti join: customers with no big open order -----------------------
    "anti_join_customers" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // ---- semi join: customers with at least one big order ------------------
    "semi_join_big_spenders" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- bloom-pruned semi join (identical result, pruned-at-scan plan) ----
    "bloom_semi_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val big = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
      bloomSemiJoin(c, "c_custkey", big, "o_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("acctbal"))
        .orderBy("c_mktsegment")
    }),

    // ---- rollup: hierarchical subtotals (region > nation) ------------------
    "agg_rollup_region_nation" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("acctbal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
          coalesce(col("n_name"), lit("ALL")).as("n_name"),
          col("n_cust"), col("acctbal"))
        .orderBy("r_name", "n_name")
    }),

    // ---- cube: all grouping-set combinations of (status, priority) ---------
    "agg_cube_status_priority" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // ---- explicit grouping sets: independent marginals in one pass ---------
    // (the generalization rollup/cube compile to — one Expand + one
    // aggregation instead of a UNION of three scans)
    "agg_grouping_sets" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // ---- pivot: status categories to columns (static schema, exact) --------
    "pivot_status_by_priority" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"))
        .orderBy("o_orderpriority")),

    // ---- ratio-to-report: share of total over the aggregated table ---------
    // Each nation's revenue share: the unpartitioned window runs over the
    // AGGREGATED O(nations) table (safe by construction at any corpus
    // size), and the denominator is a DECIMAL window sum — exact, so the
    // one IEEE division per row is deterministic under any partitioning.
    "revenue_share_by_nation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "orders")
        .join(broadcast(Tables.load(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_d"))
        .withColumn("total_d", sum(col("rev_d")).over(Window.partitionBy()))
        .select(col("n_name"), col("rev_d").cast("double").as("revenue"),
          (col("rev_d").cast("double") / col("total_d").cast("double")).as("share"))
        .orderBy("n_name")
    }),

    // ---- unpivot (melt): the native wide -> tall API -----------------------
    // Round-trips the pivoted table back to tall form through
    // Dataset.unpivot (Spark's melt operator): proof that the engine's
    // reshape surface is closed under inversion. The pivot aggregates into
    // a bounded-width row per priority (one exchange), the unpivot is a
    // NARROW per-row expansion (an Expand node — no shuffle), and dropping
    // the synthetic zero cells restores exactly the sparse groupBy the
    // oracle computes directly.
    "unpivot_status_by_priority" -> ((s, dir) => {
      val wide = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("O"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("F"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("P"))
      wide.unpivot(Array(col("o_orderpriority")), Array(col("O"), col("F"), col("P")),
          "o_orderstatus", "n_orders")
        .filter(col("n_orders") > 0)
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // ---- top-k by global sort + limit --------------------------------------
    "topk_orders" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // ---- interval (range) join: clicks within 30 min before each error ----
    // The funnel/attribution shape. The EQUI key (user_id) carries the
    // join — Catalyst plans a hash/sort-merge join on user and evaluates
    // the time-range predicate as a residual — so there is no range-join
    // row explosion; cost is bounded by per-user event counts, and a hot
    // user is AQE skew-split. (A pure range join with no equi key would be
    // a broadcast-nested-loop — avoid that shape at scale.)
    "range_join_click_error" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("t"))
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("t").as("t_err"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t").as("t_clk"))
      err.join(clk,
          err("user_id") === clk("user_id") &&
            col("t_clk") >= col("t_err") - lit(30L * 60 * 1000000) &&
            col("t_clk") < col("t_err"), "left")
        .groupBy(col("err_id"))
        .agg(count(col("t_clk")).as("n_clicks_before"))
        .orderBy("err_id")
    }),

    // ---- full outer join: daily order activity vs daily event activity ----
    // (the ranges don't overlap, so both null sides are exercised)
    "full_outer_daily_activity" -> ((s, dir) => {
      val od = Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val ed = Tables.events(s, dir)
        .groupBy(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("n_events"))
      od.join(ed, Seq("d"), "full_outer")
        .select(col("d"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("d")
    }),

    // ---- exact percentiles per group (linear-interpolation definition) ----
    // Exact `percentile` needs per-group sorted values — right for grouped
    // analytics; for a single global quantile at 100 TB use the KLL sketch
    // (approx_sketches) instead of a one-partition sort.
    // ---- equi-depth histogram WITHOUT a global sort ------------------------
    // The ntile() formulation is a single-partition window (global sort) —
    // scale-hostile. Instead: exact quartile cutpoints in one aggregation
    // (percentile ↔ quantile_cont parity is dyadic-exact, proven by
    // agg_percentiles), broadcast the one-row cuts, and bucket assignment
    // becomes a narrow projection feeding a 4-group aggregate. At 100 TB
    // the only change is percentile → percentile_approx for the cuts.
    "histogram_equidepth_price" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      // exact Percentile is an object aggregate (boxed per-value hashmap):
      // on a single-row-group scan its partial phase runs in ONE task —
      // repartition the 8-byte column so the heavy partials spread across
      // cores and only tiny count-maps merge (2.2 s -> sub-second warm)
      val cuts = Tables.parallelized(o.select(col("o_totalprice"))).agg(
        percentile(col("o_totalprice"), lit(0.25)).as("q1"),
        percentile(col("o_totalprice"), lit(0.5)).as("q2"),
        percentile(col("o_totalprice"), lit(0.75)).as("q3"))
      val bucket = when(col("o_totalprice") <= col("q1"), 0)
        .when(col("o_totalprice") <= col("q2"), 1)
        .when(col("o_totalprice") <= col("q3"), 2).otherwise(3)
      o.crossJoin(broadcast(cuts))
        .groupBy(bucket.cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"), dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    }),

    "agg_percentiles" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // ---- distributed exact moments: stddev + corr without stddev()/corr() -
    // Double-summation aggregates are ORDER-DEPENDENT (floating addition
    // does not associate), so built-in stddev/corr are not reproducible
    // across partitionings. Summing the moments as decimals is exact and
    // associative — any partitioning, any engine, the same bits — and the
    // final double formula is one deterministic row-wise expression.
    "agg_stats_moments" -> ((s, dir) => {
      // Moments in SCALED INTEGERS: the 2-dp columns become exact cents
      // (one compact decimal cast each), so the per-row squares/cross
      // products are LONG multiplies, not BigDecimal ops — measured ~2.5x
      // on this query (the all-decimal form spent ~5 s at sf0.1 in per-row
      // decimal(30,4) multiplication). Only the SUM BUFFERS stay decimal:
      // sum(y_cents^2) reaches ~6e19 at sf0.1 and would wrap int64, and a
      // decimal sum of long inputs rides the compact representation until
      // it genuinely outgrows it. The oracle MIRRORS the cast-then-divide
      // (sum -> double -> /scale) step for step: once a sum exceeds 2^53
      // the two roundings differ from a single decimal->double rounding
      // in the last ulp, so determinism comes from both engines doing the
      // IDENTICAL correctly-rounded ops, not from pretending the double
      // rounding away.
      val xc = (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
      val yc = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
      val n = col("n").cast("double")
      val sx = col("sx").cast("double") / 100.0
      val sy = col("sy").cast("double") / 100.0
      val sxx = col("sxx").cast("double") / 10000.0
      val syy = col("syy").cast("double") / 10000.0
      val sxy = col("sxy").cast("double") / 10000.0
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(xc).as("sx"), sum(yc).as("sy"),
          sum((xc * xc).cast("decimal(30,0)")).as("sxx"),
          sum((yc * yc).cast("decimal(30,0)")).as("syy"),
          sum((xc * yc).cast("decimal(30,0)")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          (sx / n).as("mean_qty"),
          sqrt((sxx - sx * sx / n) / (n - 1)).as("stddev_qty"),
          ((sxy - sx * sy / n) /
            sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // ---- window variants: lag delta, lead, ntile quartiles per customer ----
    "window_lag_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice").cast("decimal(18,2)") -
            coalesce(lag(col("o_totalprice"), 1).over(seq).cast("decimal(18,2)"),
              lit(0).cast("decimal(18,2)"))).cast("double").as("delta_prev"),
          lead(col("o_orderkey"), 1).over(seq).as("next_orderkey"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy("o_orderkey")
    }),

    // ---- cumulative window distributions -----------------------------------
    // percent_rank / cume_dist / nth_value over the per-priority price
    // order — as DISTRIBUTED rank arithmetic, not a per-priority window.
    // `Window.partitionBy(o_orderpriority)` caps the sort at 5 tasks
    // forever (the round-14 4-vs-32-core report flagged the 1.35×
    // speedup): at 100 TB each task would sort 20 TB. With a unique
    // tie-break (c, o_orderkey) the three window functions are pure rank
    // arithmetic — pr = (rn-1)/(n-1), cd = rn/n, nth_value(c,2) = the
    // group's 2nd-smallest c (null at rn=1, its 1-row RANGE frame) — and
    // rn decomposes bucket-wise exactly as in Stats.bucketedCumsum:
    // rn = (rows of the priority in EARLIER value-buckets) + row_number
    // within (priority, bucket). The serial level is the O(groups ×
    // value-domain/width) bucket histogram; the per-row sort partitions
    // by (priority, bucket) — width tunable via the bucket width, never
    // capped by the 5-value group key. Same doubles: rank arithmetic is
    // exact in any engine.
    "window_cume_dist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val nPart = s.sessionState.conf.numShufflePartitions
      val bw = Stats.KsBucketWidth
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .withColumn("bk", expr(s"c div $bw"))
      // bucket histogram per priority — O(groups × domain/width) rows,
      // data-size-independent; feeds only the broadcast offsets side, so
      // it needs no lineage break (the round-14 first cut checkpointed it
      // because a bucket-probe branch read it twice — that branch is gone,
      // and the checkpoint was a serial materialization on the construct
      // path). Prefix offsets + totals are the only unpartitioned-by-row
      // windows; both are O(#buckets) per group.
      val wOff = Window.partitionBy(col("o_orderpriority")).orderBy(col("bk"))
      val wTot = Window.partitionBy(col("o_orderpriority"))
      val off = o.groupBy(col("o_orderpriority"), col("bk"))
        .agg(count(lit(1)).as("bcnt"))
        .select(col("o_orderpriority"), col("bk"), col("bcnt"),
          (sum(col("bcnt")).over(wOff) - col("bcnt")).as("boff"),
          sum(col("bcnt")).over(wTot).as("n_p"))
      // 2nd-lowest (c, o_orderkey) row per priority — a rank-2 top-k the
      // optimizer rewrites to WindowGroupLimit: every scan partition keeps
      // only its own 2 smallest rows BEFORE the exchange, so the
      // priority-only window sorts ≤ 2·partitions rows, never the fact
      // table (the first cut probed the rank-2 bucket via the checkpointed
      // histogram instead: one more scan of orders, a broadcast join, and
      // a filtered window — 3 plan nodes doing what the group-limit does
      // in one).
      val wCand = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("c"), col("o_orderkey"))
      val slTbl = o.withColumn("rnc", row_number().over(wCand))
        .filter(col("rnc") === 2)
        .select(col("o_orderpriority"), col("c").as("sl"))
      // fold the 5-row second-lowest table into the histogram broadcast:
      // one BroadcastExchange + one join on the fact path instead of two
      val offSl = off.join(slTbl, Seq("o_orderpriority"), "left")
      // main pass: explicit fixed-width repartition on (priority, bucket)
      // — the bucketedCumsum discipline: AQE's bytes-based coalescing
      // would fold the per-row sort into 2 tasks (bytes are the wrong
      // signal for per-row-expensive work); an explicit-width repartition
      // is exempt. This is the fact table's only hash exchange; both
      // joins are broadcasts, so the window adds no exchange.
      val wTie = Window.partitionBy(col("o_orderpriority"), col("bk"))
        .orderBy(col("c"), col("o_orderkey"))
      o.repartition(nPart, col("o_orderpriority"), col("bk"))
        .join(broadcast(offSl), Seq("o_orderpriority", "bk"))
        .withColumn("rn", col("boff") + row_number().over(wTie))
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("n_p") === 1, lit(0.0)).otherwise(
            (col("rn") - 1).cast("double") / (col("n_p") - 1).cast("double"))
            .as("pr"),
          (col("rn").cast("double") / col("n_p").cast("double")).as("cd"),
          when(col("rn") === 1, lit(null).cast("long"))
            .otherwise(col("sl")).as("second_lowest"))
        .orderBy("o_orderkey")
    }),

    // ---- null-semantics audit ----------------------------------------------
    // The SQL null corner cases a migrating user trips on, proven
    // hash-identical between engines on one frame with injected nulls:
    // COUNT(*) vs COUNT(col), null-skipping aggregates, COUNT(DISTINCT)
    // ignoring nulls, COALESCE arithmetic, and the NULL GROUP row
    // (grouped and ordered NULLS FIRST in both engines).
    "null_semantics_audit" -> ((s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("st"),
        when(col("o_orderkey") % 7 =!= 0, cents).as("c"))
      o.groupBy(col("st"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("c")).as("n_price"),
          sum(col("c")).as("sum_cents"),
          min(col("c")).as("min_cents"),
          countDistinct(col("c")).as("ndv_price"),
          sum(coalesce(col("c"), lit(0L))).as("sum_coalesced"),
          sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_null_price"))
        .withColumn("avg_cents",
          col("sum_cents").cast("double") / col("n_price").cast("double"))
        .orderBy(col("st").asc_nulls_first)
    }),

    // ---- date/time function audit ------------------------------------------
    // Calendar extraction parity on the engine-portable subset (year /
    // quarter / month, epoch-day arithmetic, last_day) — weekday and week
    // numbering are deliberately excluded (engines disagree on both; the
    // portable dow is the (epoch_day+4)%7 arithmetic used elsewhere).
    "date_functions_audit" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      Tables.load(s, dir, "orders")
        .groupBy(date_format(date_trunc("month", d), "yyyy-MM-dd").as("month_start"))
        .agg(count(lit(1)).as("n"),
          min(year(d)).as("yr"),
          min(quarter(d)).as("qtr"),
          min(unix_date(d).cast("long")).as("first_epoch_day"),
          max(dayofmonth(d)).cast("long").as("max_dom"),
          max(date_format(last_day(d), "yyyy-MM-dd")).as("month_end"))
        .orderBy("month_start")
    }),

    // ---- string function audit ---------------------------------------------
    // The portable string surface (upper/lower, length, substr, replace,
    // translate, 1-based instr/strpos, split_part, reverse, trim) proven
    // value-identical per brand group — the everyday migration surface,
    // hash-checked once instead of discovered bug by bug.
    "string_functions_audit" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .select(col("p_brand"), col("p_name"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          min(upper(col("p_name"))).as("min_upper"),
          max(reverse(col("p_name"))).as("max_rev"),
          sum(length(col("p_name")).cast("long")).as("sum_len"),
          sum(instr(col("p_name"), "e").cast("long")).as("sum_epos"),
          min(substring(col("p_name"), 1, 8)).as("min_prefix"),
          max(translate(col("p_name"), " ", "_")).as("max_snake"),
          min(element_at(split(col("p_name"), " "), -1)).as("min_last_tok"))
        .orderBy("p_brand")
    }),

    // ---- higher-order array-function audit ---------------------------------
    // Engine-parity sweep over the lambda/array surface (transform,
    // filter, aggregate-fold, zip_with, slice, distinct, contains) — the
    // building blocks the embedding/dedup kernels compose, pinned here on
    // small per-ORDER arrays (≤7 lineitem quantities, so the arrays stay
    // row-local and codegen-friendly; collect_list is made deterministic
    // by array_sort). All-integer folds make the audit hash-exact against
    // DuckDB's list_* equivalents.
    "array_functions_audit" -> ((s, dir) => {
      val arrs = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(col("q"))).as("arr"))
      val per = arrs.select(col("l_orderkey"),
        aggregate(transform(col("arr"), x => x * 2 + 1), lit(0L),
          (a, x) => a + x).as("t1"),
        size(filter(col("arr"), x => x > 25)).cast("long").as("n_gt"),
        aggregate(slice(col("arr"), 1, 5), lit(0L), (a, x) => a + x)
          .as("s5"),
        size(array_distinct(col("arr"))).cast("long").as("nd"),
        when(array_contains(col("arr"), 30L), 1L).otherwise(0L).as("has30"),
        aggregate(zip_with(col("arr"), reverse(col("arr")),
          (a, b) => a * b), lit(0L), (a, x) => a + x).as("dotrev"))
      per.groupBy((col("l_orderkey") % 8).as("g"))
        .agg(count(lit(1)).as("n_orders"), sum(col("t1")).as("sum_t1"),
          sum(col("n_gt")).as("sum_gt"), sum(col("s5")).as("sum_first5"),
          sum(col("nd")).as("sum_distinct"), sum(col("has30")).as("n_has30"),
          sum(col("dotrev")).as("sum_dotrev"))
        .orderBy("g")
    }),

    // ---- small-file compaction round trip ----------------------------------
    // The table-maintenance op streaming ingest eventually needs: a
    // deliberately fragmented copy of events (64 micro-files) is
    // compacted by TableSink.compact (size-targeted rewrite + atomic
    // directory swap), and the post-compaction scan must aggregate
    // hash-identically to the RAW table — the oracle never sees the
    // layout, so parity proves the maintenance op is lossless.
    // RelationalSpec asserts the file count actually shrank. Scratch I/O
    // per run, not a hot path.
    "compact_small_files_agg" -> ((s, dir) => {
      val scratch = scratchDir(s, "compact/events")
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(64)
        .write.mode("overwrite").parquet(scratch)
      graft.sinks.TableSink.compact(s, scratch, targetBytes = 8L * 1024 * 1024)
      s.read.parquet(scratch)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          dsum(col("value")).as("total_value"))
        .orderBy("event_type")
    }),

    // ---- deterministic hash sampling (reproducible; engine-portable) -------
    // TABLESAMPLE/rand() draws differ per run and per engine; hashing the
    // key gives the same sample on any cluster size, any engine, forever —
    // the only sampling that belongs in a training-data pipeline. The
    // stratified variant keys the rate on a column (per-language quotas).
    "sample_hash_docs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(pmod(graft.text.TextOps.polyHash(col("doc_id").cast("string")),
          lit(20)) === 7)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    "sample_stratified_docs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket",
          pmod(graft.text.TextOps.polyHash(col("doc_id").cast("string")), lit(100)))
        .filter(col("bucket") <
          when(col("lang") === "en", 50).when(col("lang") === "de", 25).otherwise(10))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")),

    // ---- map scalar functions: JSON props -> MapType -> aggregate ----------
    // from_json to a map, element_at/map_keys on it — the semi-structured
    // column path (SURVEY §2.9 "map scalar functions"), mirrored by
    // DuckDB's json_extract/json_keys.
    "map_props_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)))
        .select(col("event_type"), element_at(col("m"), "k").as("k"),
          size(map_keys(col("m"))).as("nk"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), max(col("nk")).cast("long").as("max_keys"))
        .orderBy("event_type")),

    // ---- raw SQL: scalar subquery + IN subquery ----------------------------
    // Catalyst decorrelates/rewrites both into joins — registered to prove
    // the subquery surface, with the average computed through exact
    // decimal sums so the threshold is engine-identical.
    "sql_subquery_spenders" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT c_custkey, c_name FROM v_customer
          |WHERE c_custkey IN (
          |  SELECT o_custkey FROM v_orders
          |  WHERE o_totalprice > (
          |    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |    FROM v_orders))
          |ORDER BY c_custkey""".stripMargin)
    }),

    // ---- SQL surface: WITH RECURSIVE (gapless month spine) -----------------
    // A recursive CTE generates every month index between the first and
    // last order month — including months with no orders, which a plain
    // GROUP BY can never emit — then a left join attaches the per-month
    // counts. Recursion runs over ONE integer per month (y*12+m), so the
    // recursive part is calendar-bounded (~84 iterations of a 1-row
    // frame) while the fact scan stays a single combinable aggregation.
    // Two recursion lessons are baked in (both measured): the bounds RIDE
    // the recursive rows — a per-step `(SELECT hi FROM bounds)` scalar
    // subquery re-ran the min/max fact scan every iteration (25.8 s at
    // sf0.01, 84 scans) — and the recursion steps by YEAR with a 12-way
    // month expansion, because each Spark UnionLoop iteration pays a
    // scheduled job + codegen (~0.3 s floor): 84 month-steps cost ~4 s
    // of pure per-step overhead vs ~2 s for 7 year-steps. The remaining
    // cost is SF-INDEPENDENT (calendar-bounded) — at 100 TB the fact
    // side is still one combinable aggregation.
    // Spark 4 executes this as UnionLoop; DuckDB as recurring CTE — the
    // same ANSI SQL text modulo view names runs on both.
    "sql_recursive_months" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """WITH RECURSIVE bounds AS (
          |  SELECT min(year(CAST(o_orderdate AS DATE)) * 12 +
          |             month(CAST(o_orderdate AS DATE)) - 1) AS lo,
          |         max(year(CAST(o_orderdate AS DATE)) * 12 +
          |             month(CAST(o_orderdate AS DATE)) - 1) AS hi
          |  FROM v_orders
          |), years(yr, lo, hi) AS (
          |  SELECT lo DIV 12, lo, hi FROM bounds
          |  UNION ALL
          |  SELECT yr + 1, lo, hi FROM years WHERE yr < hi DIV 12
          |), months AS (
          |  SELECT yr * 12 + o.off AS mi
          |  FROM years,
          |       (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9),
          |               (10), (11)) o(off)
          |  WHERE yr * 12 + o.off BETWEEN lo AND hi
          |), per_month AS (
          |  SELECT year(CAST(o_orderdate AS DATE)) * 12 +
          |         month(CAST(o_orderdate AS DATE)) - 1 AS mi,
          |         CAST(count(*) AS BIGINT) AS n_orders,
          |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          |                       AS BIGINT)) AS BIGINT) AS revenue_cents
          |  FROM v_orders GROUP BY 1
          |)
          |SELECT m.mi AS month_idx, CAST(m.mi DIV 12 AS INT) AS yr,
          |       CAST(m.mi % 12 + 1 AS INT) AS mon,
          |       coalesce(p.n_orders, 0) AS n_orders,
          |       coalesce(p.revenue_cents, 0) AS revenue_cents
          |FROM months m LEFT JOIN per_month p ON m.mi = p.mi
          |ORDER BY month_idx""".stripMargin)
    }),

    // ---- SQL surface: LATERAL correlated top-k per dimension row -----------
    // The LATERAL join shape (a correlated subquery with its own ORDER
    // BY/LIMIT per outer row): top-3 orders per market segment.
    // Catalyst decorrelates this into a DomainJoin and executes it as a
    // ranked window over the one fact scan — proof the declarative form
    // costs nothing vs the hand-written row_number variant
    // (window_topk_per_customer) while matching DuckDB's semantics
    // exactly. Deterministic tie-break on (price DESC, orderkey).
    "sql_lateral_topk" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("v_customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT seg.c_mktsegment, t.o_orderkey,
          |       t.price_cents
          |FROM (SELECT DISTINCT c_mktsegment FROM v_customer) seg,
          |LATERAL (
          |  SELECT o.o_orderkey,
          |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
          |              AS BIGINT) AS price_cents
          |  FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
          |  WHERE c.c_mktsegment = seg.c_mktsegment
          |  ORDER BY price_cents DESC, o.o_orderkey LIMIT 3
          |) t
          |ORDER BY seg.c_mktsegment, t.price_cents DESC, t.o_orderkey"""
          .stripMargin)
    }),

    // ---- window: RANGE frame (time-based trailing aggregate) ---------------
    // rangeBetween on epoch-days: the frame is VALUE-bounded, so all orders
    // in the trailing week enter the sum regardless of row order — rows on
    // the same day are frame-equal (deterministic without a tiebreak,
    // unlike rowsBetween). Decimal sum keeps the frame total exact.
    "window_trailing_7d" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("d_epoch"))
        .rangeBetween(-6, 0)
      Tables.load(s, dir, "orders")
        .withColumn("d_epoch", unix_date(col("o_orderdate").cast("date")))
        .withColumn("rev7",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"), col("rev7"))
        .orderBy("o_orderkey")
    }),

    // ---- typed Dataset[T] surface: case-class rows + groupByKey ------------
    // The third API next to DataFrame and SQL: compile-time row types with
    // per-group imperative logic. Exactness rule carried into the typed
    // world as integer cents. mapGroups forfeits partial aggregation
    // (every row shuffles) — right when per-group logic is genuinely
    // imperative; for plain aggregates the DataFrame path above is the
    // scale path.
    "typed_priority_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .as[(Long, Double, String)]
        .groupByKey(_._3)
        .mapGroups { (priority, rows) =>
          var n = 0L; var cents = 0L; var maxKey = Long.MinValue
          rows.foreach { case (k, price, _) =>
            n += 1; cents += math.round(price * 100); maxKey = math.max(maxKey, k)
          }
          (priority, n, cents / 100.0, maxKey)
        }
        .toDF("o_orderpriority", "n_orders", "total", "max_orderkey")
        .orderBy("o_orderpriority")
    }),

    // ---- typed flatMapGroups: per-group imperative scan --------------------
    // Inter-arrival statistics per user — the shape that genuinely wants an
    // imperative per-group pass (sorted gap array, order statistics). The
    // buffer is ONE USER's events (bounded by the hottest key, never the
    // partition), groups stream through a single shuffle on user_id, and
    // single-event users drop out inside the group function. The exact
    // median (interpolated at even counts) mirrors the oracle's median()
    // bit for bit because both average the same two longs.
    "user_event_gaps" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (user, rows) =>
          val ts = rows.map(_._2).toArray
          if (ts.length < 2) Iterator.empty
          else {
            java.util.Arrays.sort(ts)
            val gaps = Array.tabulate(ts.length - 1)(i => ts(i + 1) - ts(i))
            java.util.Arrays.sort(gaps)
            val n = gaps.length
            val med = if (n % 2 == 1) gaps(n / 2).toDouble
              else (gaps(n / 2 - 1) + gaps(n / 2)) / 2.0
            Iterator((user, ts.length.toLong, gaps(n - 1), med))
          }
        }
        .toDF("user_id", "n_events", "max_gap_us", "median_gap_us")
        .orderBy("user_id")
    }),

    // ---- column profiler: one row per column, two narrow passes ------------
    // Exact NDV here because the oracle demands it — at 100 TB swap in
    // approx_count_distinct (see approx_sketches for the HLL path).
    // The NDVs and the min/max/counts are computed in SEPARATE aggregates
    // on purpose: string min/max buffers are not HashAggregate-compatible,
    // and putting them in the same Aggregate as the count-distincts makes
    // the whole x6 Expand go through Sort + SortAggregate on all distinct
    // keys (measured 2.8s warm; split form ~0.5s). Separated, the Expand
    // path keeps long-only buffers (HashAggregate) and the scalar pass is
    // grouping-free (SortAggregate without a Sort). Both are 1-row
    // results, recombined with a free cross join.
    "profile_orders" -> ((s, dir) => {
      val spec = Seq( // (column, is numeric)
        ("o_orderkey", true), ("o_custkey", true), ("o_totalprice", true),
        ("o_orderstatus", false), ("o_orderpriority", false))
      val orders = Tables.load(s, dir, "orders")
      val ndvAggs = spec.map { case (c, _) => countDistinct(col(c)).as(s"${c}__ndv") }
      val scalarAggs = spec.flatMap { case (c, num) =>
        count(col(c)).as(s"${c}__cnt") +:
          (if (num) Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"))
          else Seq(min(col(c)).as(s"${c}__mins"), max(col(c)).as(s"${c}__maxs")))
      }
      val g = orders.agg(count(lit(1)).as("n_rows"), scalarAggs: _*)
        .crossJoin(orders.agg(ndvAggs.head, ndvAggs.tail: _*))
      val rows = spec.map { case (c, num) =>
        struct(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col(s"${c}__cnt")).as("n_nulls"),
          col(s"${c}__ndv").as("n_distinct"),
          (if (num) col(s"${c}__min") else lit(null).cast("double")).as("min_num"),
          (if (num) col(s"${c}__max") else lit(null).cast("double")).as("max_num"),
          (if (num) lit(null).cast("string") else col(s"${c}__mins")).as("min_str"),
          (if (num) lit(null).cast("string") else col(s"${c}__maxs")).as("max_str"))
      }
      g.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
        .orderBy("col_name")
    }),

    // ---- K5: idempotent catalog DDL + load + read-back -------------------
    // CREATE TABLE IF NOT EXISTS (external, scratch-rooted) -> INSERT
    // OVERWRITE -> second CREATE IF NOT EXISTS (must no-op) -> aggregate
    // through the catalog table. The created_first/created_second flags
    // put the DDL contract itself under the hash gate: first call creates
    // (true), second finds it (false). Mirrors the reference's
    // create-then-replace bootstrap (sql_to_kafka.py:69-105 + :130).
    "ddl_create_insert_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      // applicationId-tagged for the same shared-metastore reason as
      // bucketed_join_agg's tables
      val t = "graft_ddl_orders_" +
        s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      s.sql(s"DROP TABLE IF EXISTS $t")
      val schema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType)))
      val scratch = scratchDir(s, "ddl/orders")
      new java.io.File(scratch).mkdirs() // pre-create: CREATE on a missing
      // external path works but logs a noisy FileNotFound WARN per lookup
      val opts = Map("path" -> scratch)
      val first = graft.sinks.TableSink.createIfNotExists(s, t, schema,
        options = opts)
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").insertInto(t)
      val second = graft.sinks.TableSink.createIfNotExists(s, t, schema,
        options = opts)
      s.table(t)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .withColumn("created_first", lit(first))
        .withColumn("created_second", lit(second))
        .orderBy("o_orderstatus")
    }),

    // ---- KMV distinct sketch: approx NDV with an oracle-exact estimate ----
    // k-minimum-values over a fixed universal hash: keep the k smallest
    // DISTINCT hash values; est = (k_used-1) * P / kth_min. Deterministic
    // end to end (the hash is data-derived, no RNG), so unlike HLL the
    // ESTIMATE itself sits under the DuckDB hash gate, exact-NDV column
    // alongside for the error story. Scale shape: distinct-of-hashes is
    // a map-side-combined shuffle on the hash, and the k-row head is
    // TakeOrdered (per-partition top-k, driver merge of k*partitions
    // rows) — no global sort materializes.
    "kmv_distinct_users" -> ((s, dir) => {
      val k = 256
      val P = graft.text.TextOps.P
      val A = graft.text.TextOps.MIX % P
      val B = (3 * A) % P
      val ev = Tables.events(s, dir)
      val h = ((col("user_id") * lit(A) + lit(B)) % P + P) % P
      val sketch = ev.where(col("user_id").isNotNull)
        .select(h.as("h")).distinct()
        .orderBy("h").limit(k)
        .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
      sketch.crossJoin(
          ev.agg(countDistinct(col("user_id")).as("exact_ndv")))
        .select(col("k_used"), col("kth_min"),
          ((col("k_used") - lit(1L)).cast("double") * lit(P.toDouble)
            / col("kth_min").cast("double")).as("est_ndv"),
          col("exact_ndv"))
    }),

    // ---- KMV mergeability audit: distributed sketches ARE the global one ---
    // The property that makes sketch architectures work at 100 TB: union
    // the per-shard bottom-k sets, re-take bottom-k, and you get EXACTLY
    // the global sketch (no approximation in the merge itself). Shards
    // here are the 7 epoch-weekday groups of events; the audit emits the
    // global and merged kth-mins side by side with an equality flag the
    // oracle hash-checks. Per-shard bottom-k is a partition-local window
    // over distinct hashes; nothing fact-scale crosses the wire.
    "kmv_merge_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val P = graft.text.TextOps.P
      val A = graft.text.TextOps.MIX % P
      val B = (3 * A) % P
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val h = ((col("user_id") * lit(A) + lit(B)) % P + P) % P
      val hashed = ev.select(
        pmod(unix_date(col("ts").cast("date")).cast("long"), lit(7)).as("g"),
        h.as("h"))
      val perShard = hashed.distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("h"))))
        .filter(col("rn") <= k)
      val merged = perShard.select(col("h")).distinct()
        .orderBy("h").limit(k)
        .agg(count(lit(1)).as("k_merged"), max(col("h")).as("kth_merged"))
      val global = ev.select(h.as("h")).distinct()
        .orderBy("h").limit(k)
        .agg(count(lit(1)).as("k_global"), max(col("h")).as("kth_global"))
      global.crossJoin(merged)
        .crossJoin(ev.agg(countDistinct(col("user_id")).as("exact_ndv")))
        .select(col("k_global"), col("kth_global"), col("k_merged"),
          col("kth_merged"),
          (col("kth_global") === col("kth_merged") &&
            col("k_global") === col("k_merged")).as("merge_lossless"),
          ((col("k_global") - lit(1L)).cast("double") * lit(P.toDouble)
            / col("kth_global").cast("double")).as("est_ndv"),
          col("exact_ndv"))
    }),

    // ---- theta-sketch set intersection: estimated audience overlap --------
    // The theta-sketch composition rule (Dasgupta et al., "A framework
    // for estimating stream expression cardinalities"): each side keeps
    // its bottom-k distinct hashes; θ = min of the two sketch thresholds
    // (a sketch that retained EVERYTHING — k_used < k — has θ = P);
    // the intersection estimate is |common retained hashes below θ|·P/θ.
    // Same deterministic universal hash as kmv_distinct_users, so the
    // estimate itself is oracle-hash-exact; the exact intersection rides
    // alongside for the error story. Scale shape: two TakeOrdered
    // bottom-k passes + a k-row join — set-expression cardinalities over
    // any number of 100 TB streams compose from KB-sized sketches
    // without ever joining the raw streams.
    "theta_intersect_users" -> ((s, dir) => {
      val k = 256
      val P = graft.text.TextOps.P
      val A = graft.text.TextOps.MIX % P
      val B = (3 * A) % P
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val h = ((col("user_id") * lit(A) + lit(B)) % P + P) % P
      def bottomK(t: String) = ev.filter(col("event_type") === t)
        .select(h.as("h")).distinct().orderBy("h").limit(k)
      val sa = bottomK("click")
      val sb = bottomK("purchase")
      val ta = sa.agg(count(lit(1)).as("k_a"), max(col("h")).as("kth_a"))
        .select(col("k_a"), col("kth_a"),
          when(col("k_a") < k, lit(P)).otherwise(col("kth_a")).as("theta_a"))
      val tb = sb.agg(count(lit(1)).as("k_b"), max(col("h")).as("kth_b"))
        .select(col("k_b"), col("kth_b"),
          when(col("k_b") < k, lit(P)).otherwise(col("kth_b")).as("theta_b"))
      val thetas = ta.crossJoin(tb)
        .withColumn("theta", least(col("theta_a"), col("theta_b")))
      val nCommon = sa.join(sb, "h")
        .crossJoin(thetas.select(col("theta").as("th")))
        .filter(col("h") < col("th"))
        .agg(count(lit(1)).as("n_common"))
      val exact = ev.filter(col("event_type") === "click")
        .select(col("user_id")).distinct()
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct(), "user_id")
        .agg(count(lit(1)).as("exact_intersection"))
      thetas.crossJoin(nCommon).crossJoin(exact)
        .select(col("k_a"), col("kth_a"), col("k_b"), col("kth_b"),
          col("theta"), col("n_common"),
          (col("n_common").cast("double") * lit(P.toDouble) /
            col("theta").cast("double")).as("est_intersection"),
          col("exact_intersection"))
    }),

    // ---- bitmap-index audience intersection (EXACT, vs the theta sketch) ---
    // The warehouse bitmap-index pattern: per audience, a presence bitmap
    // as (word = id div 63, bits = OR of 1<<id%63) rows; intersection
    // cardinality = Σ popcount(wa AND wb) over the word-equi-join. All
    // bitwise int64, 63 ids per word — bit 63 would trip DuckDB's
    // overflow-checked left shift, and one bit of density is a cheap
    // price for a portable mask (the binarySignCode precedent). At
    // scale: bitmaps are ~64× denser than id lists, the AND join shuffles
    // only word-keyed rows, and any number of audiences compose by more
    // AND/OR joins — this is the exact complement of theta_intersect_users
    // (sketch = sublinear estimate; bitmap = compressed exact).
    "bitmap_intersect_users" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      def bm(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id")).distinct()
        .select(expr("user_id div 63").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").as("bit"))
        .groupBy(col("word")).agg(bit_or(col("bit")).as("bits"))
      val a = bm("click").select(col("word"), col("bits").as("wa"))
      val b = bm("purchase").select(col("word"), col("bits").as("wb"))
      val na = a.agg(sum(bit_count(col("wa"))).as("n_click"),
        count(lit(1)).as("words_click"))
      val nb = b.agg(sum(bit_count(col("wb"))).as("n_purchase"),
        count(lit(1)).as("words_purchase"))
      val both = a.join(b, "word")
        .agg(coalesce(sum(bit_count(col("wa").bitwiseAND(col("wb")))), lit(0L))
          .as("n_both"))
      val exact = ev.filter(col("event_type") === "click")
        .select(col("user_id")).distinct()
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct(), "user_id")
        .agg(count(lit(1)).as("exact_intersection"))
      na.crossJoin(nb).crossJoin(both).crossJoin(exact)
        .select(col("n_click"), col("words_click"), col("n_purchase"),
          col("words_purchase"), col("n_both"), col("exact_intersection"),
          (col("n_both") === col("exact_intersection")).as("bitmap_exact"))
    }),

    // ---- GDPR deletion cascade audit ---------------------------------------
    // Right-to-erasure across the referential chain: a deleted-customer
    // list anti-joins customers directly, orders by custkey, and
    // lineitems through the deleted orders' keys (depth-2 cascade). The
    // audit reports per-table (total, removed, after) plus a `clean`
    // proof that a semi-join of the survivors against the deletion set
    // is EMPTY — the shape a compliance job runs after every purge.
    // Anti/semi joins broadcast the (small) deletion set; fact tables
    // are scanned once each.
    "gdpr_delete_cascade" -> ((s, dir) => {
      val mod = 97
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val del = cust.filter(col("c_custkey") % mod === 0)
        .select(col("c_custkey").as("k"))
      val delOrders = orders.join(broadcast(del), col("o_custkey") === col("k"))
        .select(col("o_orderkey").as("ok"))
      val cAfter = cust.join(broadcast(del), col("c_custkey") === col("k"), "left_anti")
      val oAfter = orders.join(broadcast(del), col("o_custkey") === col("k"), "left_anti")
      val lAfter = li.join(delOrders, col("l_orderkey") === col("ok"), "left_anti")
      def row(name: String, total: DataFrame, after: DataFrame,
              leaked: DataFrame) =
        total.agg(count(lit(1)).as("n_total"))
          .crossJoin(after.agg(count(lit(1)).as("n_after")))
          .crossJoin(leaked.agg(count(lit(1)).as("n_leaked")))
          .select(lit(name).as("table_name"), col("n_total"),
            (col("n_total") - col("n_after")).as("n_removed"), col("n_after"),
            (col("n_leaked") === 0L).as("clean"))
      row("customer", cust, cAfter,
          cAfter.join(broadcast(del), col("c_custkey") === col("k"), "left_semi"))
        .unionByName(row("orders", orders, oAfter,
          oAfter.join(broadcast(del), col("o_custkey") === col("k"), "left_semi")))
        .unionByName(row("lineitem", li, lAfter,
          lAfter.join(delOrders, col("l_orderkey") === col("ok"), "left_semi")))
        .orderBy("table_name")
    }),

    // ---- multiset (ALL) set-operation audit --------------------------------
    // EXCEPT ALL / INTERSECT ALL semantics over the click/purchase
    // user-id MULTISETS (per-user multiplicities preserved), alongside
    // the distinct counts and the partition identity
    // |A| = |A EXCEPT ALL B| + |A INTERSECT ALL B| that distinguishes
    // bag from set semantics — engine-parity surface for the ALL
    // variants the set/reshape family didn't yet pin.
    "set_multiset_audit" -> ((s, dir) => {
      val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
      val a = ev.filter(col("event_type") === "click").select(col("user_id"))
      val b = ev.filter(col("event_type") === "purchase").select(col("user_id"))
      a.agg(count(lit(1)).as("n_a"))
        .crossJoin(b.agg(count(lit(1)).as("n_b")))
        .crossJoin(a.exceptAll(b).agg(count(lit(1)).as("n_except_all")))
        .crossJoin(a.intersectAll(b).agg(count(lit(1)).as("n_intersect_all")))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_except_distinct")))
        .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_intersect_distinct")))
        .select(col("n_a"), col("n_b"), col("n_except_all"),
          col("n_intersect_all"), col("n_except_distinct"),
          col("n_intersect_distinct"),
          (col("n_a") === col("n_except_all") + col("n_intersect_all"))
            .as("bag_identity"))
    }),

    // ---- Gini coefficient of customer revenue per nation ------------------
    // Inequality metric over the sorted revenue distribution:
    // G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x sorted asc.
    // All sums are exact int64 CENTS (rank * cents stays in BIGINT,
    // sidestepping both engines' decimal-width caps); ONE double cast
    // per term at the end — no float reassociation anywhere. The rank
    // window partitions by nation, so no single-partition collapse; ties
    // broken by custkey for a total order.
    "gini_revenue_by_nation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val custRev = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("rev_c"))
      val withNation = custRev
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey"), col("rev_c"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("rev_c"), col("o_custkey"))
      withNation.withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("rev_c")).as("total_c"),
          sum(col("rev_c") * col("rn")).as("weighted_c"))
        .select(col("n_name"), col("n_cust"), col("total_c"),
          ((lit(2.0) * col("weighted_c").cast("double")
            - (col("n_cust") + lit(1L)).cast("double") * col("total_c").cast("double"))
            / (col("n_cust").cast("double") * col("total_c").cast("double"))).as("gini"))
        .orderBy("n_name")
    }),

    // ---- RFM segmentation: quartile scores over recency/frequency/monetary
    // Classic customer scoring: per customer last order date, order count,
    // revenue; ntile(4) on each axis (ties broken by custkey for a total
    // order); segment counts + revenue per cell. ntile here is a global
    // window — right up to ~10^7 customers on one executor; past that,
    // swap the score columns for rank arithmetic over a distributed sort
    // (percent_rank bucketing), which changes no downstream shape.
    "rfm_segments" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perCust = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("mon"))
      def score(c: Column, desc0: Boolean): Column = {
        val ord = if (desc0) Seq(c.desc, col("o_custkey").asc)
        else Seq(c.asc, col("o_custkey").asc)
        ntile(4).over(Window.orderBy(ord: _*)).cast("long")
      }
      perCust
        .withColumn("r_score", score(col("last_order"), desc0 = true))
        .withColumn("f_score", score(col("freq"), desc0 = true))
        .withColumn("m_score", score(col("mon"), desc0 = true))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("mon")).cast("double").as("segment_revenue"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // ---- BFS: 2-hop reachability over the part co-occurrence graph -------
    // Frontier expansion, the iterative-join shape of distributed BFS:
    // per hop, join the frontier to the edge list, distinct the
    // neighbors, subtract visited. One row per hop with frontier/visited
    // sizes. Edges come from the MEMOIZED checkpointed adjacency
    // ([[pageRankGraph]] — one build per session/dir, shared with
    // pagerank/kcore/labelprop/triangles; identical distinct directed
    // edge set to the lineitem self-join the oracle states). Frontier and
    // visited checkpoint eagerly per hop: the unrolled hop-2 plan
    // otherwise re-derives the hop-1 subtree once per reference (frontier
    // join, except, and both count branches — measured 5.3 s of pure
    // re-derivation at sf0.1 vs ~1 s checkpointed). Bounded hops, same
    // discipline as pagerank_parts; unbounded closure would move to the
    // large-star/small-star CC machinery in Dedup.
    "bfs_reachable_parts" -> ((s, dir) => {
      val edges = pageRankGraph(s, dir)
        .select(col("src"), explode(col("adj")).as("dst"))
      val seeds = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("v"))
        .filter(col("v") % 97 === 0).distinct()
        .localCheckpoint(eager = true)
      var visited = seeds
      var frontier = seeds
      var out = Seq(seeds.agg(count(lit(1)).as("frontier_size"))
        .select(lit(0L).as("hop"), col("frontier_size"),
          col("frontier_size").as("visited_size")))
      for (hop <- 1 to 2) {
        frontier = edges.join(frontier, edges("src") === frontier("v"))
          .select(col("dst").as("v")).distinct()
          .except(visited)
          .localCheckpoint(eager = true)
        visited = visited.union(frontier).distinct()
          .localCheckpoint(eager = true)
        out = out :+ frontier.agg(count(lit(1)).as("frontier_size"))
          .crossJoin(visited.agg(count(lit(1)).as("visited_size")))
          .select(lit(hop.toLong).as("hop"), col("frontier_size"),
            col("visited_size"))
      }
      out.reduce(_ union _).orderBy("hop")
    })
  )

  def oracle: Map[String, String] = Map(
    "recent_created_orders" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS ready_date, o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |WHERE o_orderstatus = 'O' AND strftime(o_orderdate, '%Y-%m-%d') >= '1998-01-01'
        |ORDER BY ready_date DESC, o_orderkey, o_custkey""".stripMargin,
    "recent_created_orders_typed" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS ready_date, o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY ready_date DESC, o_orderkey, o_custkey""".stripMargin,
    "filter_eq_events" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'signup' ORDER BY event_id""".stripMargin,
    "filter_range_isostring" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS o_iso
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') >= '2000-06-15'
        |ORDER BY o_orderkey""".stripMargin,
    "project_shape_docs" ->
      """SELECT doc_id, upper(lang) AS lang_uc,
        |       lang || '_' || source AS tag,
        |       list_extract(string_split(source, 'c'), -1) AS src_num,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "json_encode_events" ->
      """SELECT event_id,
        |       CAST(to_json(struct_pack(event_id := event_id, user_id := user_id,
        |                                event_type := event_type)) AS VARCHAR) AS js
        |FROM events ORDER BY event_id""".stripMargin,
    "count_lineitem" ->
      "SELECT count(*) AS n FROM lineitem",
    "pipeline_summary" ->
      """SELECT count(*) AS products_processed,
        |       min(strftime(o_orderdate, '%Y-%m-%d')) AS min_date,
        |       max(strftime(o_orderdate, '%Y-%m-%d')) AS max_date,
        |       count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders""".stripMargin,
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_star_region_rev" ->
      """SELECT r_name, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_local_supplier_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "promo_revenue_parts" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |       CAST(sum(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,
    "join_lineitem_orders" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "window_topk_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running_value" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "distinct_event_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "count_distinct_lineitem" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "set_except_hours" ->
      """SELECT h FROM (
        |  SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS h FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS h FROM events WHERE event_type = 'error')
        |ORDER BY h""".stripMargin,
    "set_intersect_hours" ->
      """SELECT h FROM (
        |  SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS h FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT strftime(ts, '%Y-%m-%d %H') AS h FROM events WHERE event_type = 'error')
        |ORDER BY h""".stripMargin,
    "sql_shipping_priority" ->
      """SELECT o_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "sql_disjunctive_revenue" ->
      """SELECT p_brand,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    // hand-decorrelated twin of the Spark side's correlated subquery — the
    // hash gate checks Catalyst's RewriteCorrelatedScalarSubquery itself
    "sql_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pa ON pa.l_partkey = lineitem.l_partkey
        |WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * aq""".stripMargin,
    "anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderstatus = 'O' AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "semi_join_big_spenders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    // the bloom pre-filter is result-transparent (no false negatives; false
    // positives die in the exact join), so the oracle is the plain semi join
    "bloom_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "sessionize_batch" ->
      """WITH ev AS (
        |  SELECT user_id, ts, epoch_us(ts) AS t, value FROM events
        |), flagged AS (
        |  SELECT user_id, ts, t, value,
        |         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
        |              OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |), numbered AS (
        |  SELECT user_id, ts, t, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY t
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |       max(t) - min(t) AS duration_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM numbered GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "funnel_latency_quartiles" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |  WHERE user_id IS NOT NULL
        |), v AS (
        |  SELECT user_id, min(t) AS tv FROM ev WHERE event_type = 'view'
        |  GROUP BY user_id
        |), lat AS (
        |  SELECT CAST(min(p.t) - v.tv AS BIGINT) AS lat
        |  FROM v JOIN ev p ON v.user_id = p.user_id
        |  WHERE p.event_type = 'purchase' AND p.t >= v.tv
        |  GROUP BY v.user_id, v.tv
        |), g AS (
        |  SELECT lat, CAST(count(*) AS BIGINT) AS cnt FROM lat GROUP BY lat
        |), cum AS (
        |  SELECT lat, cnt, CAST(sum(cnt) OVER (ORDER BY lat) AS BIGINT) AS cw
        |  FROM g
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(lat) AS BIGINT) AS sum_lat
        |  FROM lat
        |)
        |SELECT n AS n_converted,
        |       min(CASE WHEN cw >= (n + 3) // 4 THEN lat END) AS q1_us,
        |       min(CASE WHEN cw >= (n + 1) // 2 THEN lat END) AS med_us,
        |       min(CASE WHEN cw >= (n * 3 + 3) // 4 THEN lat END) AS q3_us,
        |       CAST(sum_lat AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |         AS mean_seconds
        |FROM cum, tot GROUP BY n, sum_lat""".stripMargin,

    "join_null_safe_audit" ->
      """WITH em AS (
        |  SELECT event_type,
        |         CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END AS uid
        |  FROM events
        |), a AS (
        |  SELECT uid AS ka, CAST(count(*) AS BIGINT) AS ca FROM em
        |  WHERE event_type = 'click' GROUP BY uid
        |), b AS (
        |  SELECT uid AS kb, CAST(count(*) AS BIGINT) AS cb FROM em
        |  WHERE event_type = 'error' GROUP BY uid
        |), eq AS (
        |  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS n_eq_join
        |  FROM a JOIN b ON ka = kb
        |), ns AS (
        |  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS n_nullsafe_join
        |  FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
        |), nl AS (
        |  SELECT CAST(coalesce((SELECT sum(ca) FROM a WHERE ka IS NULL), 0) *
        |         coalesce((SELECT sum(cb) FROM b WHERE kb IS NULL), 0) AS BIGINT)
        |           AS n_null_pairs
        |)
        |SELECT n_eq_join, n_nullsafe_join, n_null_pairs,
        |       n_nullsafe_join = n_eq_join + n_null_pairs AS identity_holds
        |FROM eq, ns, nl""".stripMargin,

    "funnel_view_click_purchase" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
        |)
        |SELECT step, users FROM (
        |  SELECT '1_view' AS step, count(*) AS users FROM v
        |  UNION ALL SELECT '2_click', count(*) FROM c
        |  UNION ALL SELECT '3_purchase', count(*) FROM p
        |) ORDER BY step""".stripMargin,
    "events_latest_state" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events
        |)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       value AS last_value, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       n_events
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "range_join_click_error" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events
        |), err AS (
        |  SELECT event_id AS err_id, user_id, t AS t_err FROM ev WHERE event_type = 'error'
        |), clk AS (
        |  SELECT user_id, t AS t_clk FROM ev WHERE event_type = 'click'
        |)
        |SELECT err_id, count(t_clk) AS n_clicks_before
        |FROM err LEFT JOIN clk ON err.user_id = clk.user_id
        |  AND clk.t_clk >= err.t_err - 30 * 60 * 1000000
        |  AND clk.t_clk < err.t_err
        |GROUP BY err_id ORDER BY err_id""".stripMargin,
    "full_outer_daily_activity" ->
      """WITH od AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS n_orders
        |  FROM orders GROUP BY 1
        |), ed AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS d, count(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT COALESCE(od.d, ed.d) AS d,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       COALESCE(n_events, 0) AS n_events
        |FROM od FULL OUTER JOIN ed ON od.d = ed.d ORDER BY d""".stripMargin,
    "timeseries_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), grid AS (
        |  SELECT user_id,
        |         CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
        |                                     CAST(d1 AS TIMESTAMP),
        |                                     INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS d,
        |       COALESCE(dd.n_events, 0) AS n_events,
        |       last_value(dd.day_value IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN daily dd
        |  ON g.user_id = dd.user_id AND g.day = dd.day
        |ORDER BY g.user_id, d""".stripMargin,
    "merge_upsert_orders" ->
      """WITH batch AS (
        |  SELECT o_orderkey AS k, 'X' AS status, o_totalprice * 1.1 AS price
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3
        |)
        |SELECT COALESCE(t.o_orderkey, b.k) AS o_orderkey,
        |       CASE WHEN b.k IS NULL THEN t.o_orderstatus ELSE b.status END
        |         AS o_orderstatus,
        |       CASE WHEN b.k IS NULL THEN t.o_totalprice ELSE b.price END
        |         AS o_totalprice,
        |       CASE WHEN t.o_orderkey IS NULL THEN 'insert'
        |            WHEN b.k IS NULL THEN 'keep' ELSE 'update' END AS action
        |FROM orders t FULL OUTER JOIN batch b ON t.o_orderkey = b.k
        |ORDER BY o_orderkey""".stripMargin,
    // identical feed synthesis + last-writer-wins compaction + tombstone
    // filter
    "cdc_apply_orders" ->
      """WITH ops AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'upsert' AS op, 'U' AS status,
        |         o_totalprice * 1.2 AS price
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'delete', NULL, NULL
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'upsert', 'R', o_totalprice * 1.3
        |  FROM orders WHERE o_orderkey % 20 = 0
        |), last AS (
        |  SELECT k, op, status, price FROM (
        |    SELECT k, op, status, price,
        |           row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |    FROM ops
        |  ) WHERE rn = 1
        |)
        |SELECT COALESCE(t.o_orderkey, l.k) AS o_orderkey,
        |       CASE WHEN l.op IS NULL THEN t.o_orderstatus ELSE l.status END
        |         AS o_orderstatus,
        |       CASE WHEN l.op IS NULL THEN t.o_totalprice ELSE l.price END
        |         AS o_totalprice,
        |       CASE WHEN l.op IS NULL THEN 'keep' ELSE 'upsert' END AS action
        |FROM orders t FULL OUTER JOIN last l ON t.o_orderkey = l.k
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_diff_rollup" ->
      """WITH ops AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'upsert' AS op, 'U' AS status,
        |         o_totalprice * 1.2 AS price
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'delete', NULL, NULL
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'upsert', 'R', o_totalprice * 1.3
        |  FROM orders WHERE o_orderkey % 20 = 0
        |), last AS (
        |  SELECT k, op, status, price FROM (
        |    SELECT k, op, status, price,
        |           row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |    FROM ops
        |  ) WHERE rn = 1
        |), snap AS (
        |  SELECT COALESCE(t.o_orderkey, l.k) AS k2,
        |         CASE WHEN l.op IS NULL THEN t.o_orderstatus ELSE l.status END
        |           AS st,
        |         CASE WHEN l.op IS NULL THEN t.o_totalprice ELSE l.price END
        |           AS pr
        |  FROM orders t FULL OUTER JOIN last l ON t.o_orderkey = l.k
        |  WHERE l.op IS NULL OR l.op <> 'delete'
        |)
        |SELECT CASE WHEN s.k2 IS NULL THEN 'deleted'
        |            WHEN s.st <> o.o_orderstatus OR s.pr <> o.o_totalprice
        |              THEN 'updated'
        |            ELSE 'unchanged' END AS change,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue_base
        |FROM orders o LEFT JOIN snap s ON o.o_orderkey = s.k2
        |GROUP BY 1 ORDER BY change""".stripMargin,
    "dq_constraint_checks" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         count(o_custkey) AS custkey_nonnull,
        |         min(o_totalprice) AS min_price,
        |         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |             THEN 1 ELSE 0 END) AS bad_status,
        |         sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-01-01'
        |                    OR CAST(o_orderdate AS DATE) > DATE '2001-12-31'
        |             THEN 1 ELSE 0 END) AS bad_date,
        |         count(DISTINCT o_orderkey) AS key_ndv
        |  FROM orders
        |)
        |SELECT * FROM (
        |  SELECT 'orderdate_in_range' AS check_name,
        |         CAST(bad_date AS DOUBLE) AS value, bad_date = 0 AS passed FROM s
        |  UNION ALL SELECT 'orderkey_unique',
        |         CAST(key_ndv AS DOUBLE) / n_rows, key_ndv = n_rows FROM s
        |  UNION ALL SELECT 'orderstatus_in_domain',
        |         CAST(bad_status AS DOUBLE), bad_status = 0 FROM s
        |  UNION ALL SELECT 'custkey_complete',
        |         CAST(custkey_nonnull AS DOUBLE) / n_rows,
        |         custkey_nonnull = n_rows FROM s
        |  UNION ALL SELECT 'row_count_positive',
        |         CAST(n_rows AS DOUBLE), n_rows > 0 FROM s
        |  UNION ALL SELECT 'totalprice_non_negative',
        |         min_price, min_price >= 0.0 FROM s
        |) ORDER BY check_name""".stripMargin,
    "pagerank_parts" -> {
      val one = 1000000000000L
      val base = 15L * one / 100
      def iter(prev: String, i: Int): String =
        s"""c$i AS (
           |  SELECT e.dst AS node, sum($prev.r // deg.d) AS s
           |  FROM e JOIN $prev ON e.src = $prev.node
           |         JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst
           |), r$i AS (
           |  SELECT node, CAST($base + (85 * s) // 100 AS BIGINT) AS r FROM c$i
           |)""".stripMargin
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |),
         |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         |r0 AS (SELECT src AS node, CAST($one AS BIGINT) AS r FROM deg),
         |${iter("r0", 1)},
         |${iter("r1", 2)},
         |${iter("r2", 3)}
         |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 20""".stripMargin
    },
    // same edge build; LpRounds unrolled sync rounds with the identical
    // (count DESC, label ASC) deterministic argmax
    "community_labelprop" -> {
      def round(prev: String, i: Int): String =
        s"""n$i AS (
           |  SELECT e.src, $prev.lbl, count(*) AS c
           |  FROM e JOIN $prev ON e.dst = $prev.node GROUP BY e.src, $prev.lbl
           |), l$i AS (
           |  SELECT src AS node, lbl FROM (
           |    SELECT src, lbl,
           |           row_number() OVER (PARTITION BY src
           |                              ORDER BY c DESC, lbl) AS rn
           |    FROM n$i
           |  ) WHERE rn = 1
           |)""".stripMargin
      val rounds = (1 to LpRounds)
        .map(i => round(s"l${i - 1}", i)).mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (
         |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |$rounds
         |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size,
         |       min(node) AS min_node
         |FROM l$LpRounds GROUP BY lbl
         |ORDER BY size DESC, community LIMIT 20""".stripMargin
    },
    // endpoint-degree Pearson over the same DISTINCT symmetric edge list
    "graph_degree_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        |        FROM e GROUP BY src),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |         CAST(sum(dx.d) AS DOUBLE) AS sx,
        |         CAST(sum(dy.d) AS DOUBLE) AS sy,
        |         CAST(sum(dx.d * dy.d) AS DOUBLE) AS sxy,
        |         CAST(sum(dx.d * dx.d) AS DOUBLE) AS sxx,
        |         CAST(sum(dy.d * dy.d) AS DOUBLE) AS syy
        |  FROM e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node
        |)
        |SELECT n_edges,
        |       (CAST(n_edges AS DOUBLE) * sxy - sx * sy) /
        |         (sqrt(CAST(n_edges AS DOUBLE) * sxx - sx * sx) *
        |          sqrt(CAST(n_edges AS DOUBLE) * syy - sy * sy))
        |         AS assortativity
        |FROM m""".stripMargin,
    // same synchronous peel unrolled as one CTE per round; the k CTE and
    // every per-round degree check are pure integer counts
    "kcore_profile" -> {
      val edgesCte =
        """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (
          |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          |  FROM li a JOIN li b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          |),
          |kv AS (
          |  SELECT CAST(max(d) // 2 AS BIGINT) AS k
          |  FROM (SELECT count(*) AS d FROM e GROUP BY src)
          |),
          |n0 AS (SELECT DISTINCT src AS node FROM e)""".stripMargin
      val rounds = (1 to KcoreRounds).map { r =>
        s"""n$r AS (
           |  SELECT e.src AS node FROM e, kv
           |  WHERE e.src IN (SELECT node FROM n${r - 1})
           |    AND e.dst IN (SELECT node FROM n${r - 1})
           |  GROUP BY e.src, kv.k HAVING count(*) >= kv.k
           |)""".stripMargin
      }.mkString(",\n")
      val sums = (0 to KcoreRounds).map { r =>
        s"""SELECT $r AS round, (SELECT k FROM kv) AS k,
           |  (SELECT CAST(count(*) AS BIGINT) FROM n$r) AS survivors,
           |  (SELECT CAST(count(*) AS BIGINT) FROM e
           |   WHERE src IN (SELECT node FROM n$r)
           |     AND dst IN (SELECT node FROM n$r)) AS edges_directed"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $edgesCte,\n$rounds\n$sums\nORDER BY round"
    },
    // identical orientation rule ((deg, node) strictly increasing) and the
    // same wedge-closure counting; integer counts + one double division
    "graph_triangle_counts" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |),
        |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
        |o AS (
        |  SELECT e.src, e.dst FROM e
        |  JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
        |  WHERE ds.d < dd.d OR (ds.d = dd.d AND e.src < e.dst)
        |),
        |tri AS (
        |  SELECT a.src AS u, a.dst AS v, b.dst AS w
        |  FROM o a JOIN o b ON a.src = b.src AND a.dst <> b.dst
        |  JOIN o c ON c.src = a.dst AND c.dst = b.dst
        |),
        |pern AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT u AS node FROM tri
        |    UNION ALL SELECT v FROM tri
        |    UNION ALL SELECT w FROM tri
        |  ) GROUP BY node
        |)
        |SELECT p.node, p.n_tri, g.d,
        |       CAST(2 * p.n_tri AS DOUBLE) / CAST(g.d * (g.d - 1) AS DOUBLE)
        |         AS local_cc
        |FROM pern p JOIN deg g ON p.node = g.node
        |ORDER BY p.n_tri DESC, p.node LIMIT 20""".stripMargin,
    "sliding_distinct_users" ->
      """WITH ev AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS de,
        |         user_id
        |  FROM events
        |), days AS (SELECT DISTINCT de AS day FROM ev)
        |SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS d,
        |       count(DISTINCT user_id) AS u7
        |FROM days JOIN ev ON ev.de BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY d""".stripMargin,
    // exact column mirrored value-exact; the sketch flag must be TRUE
    "hll_sliding_distinct_users" ->
      """WITH ev AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS de,
        |         user_id
        |  FROM events
        |), days AS (SELECT DISTINCT de AS day FROM ev)
        |SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS d,
        |       count(DISTINCT user_id) AS u7,
        |       TRUE AS hll_ok
        |FROM days JOIN ev ON ev.de BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY d""".stripMargin,
    "revenue_mom_growth" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, revenue, (revenue - prev) / prev AS growth
        |FROM (SELECT month, revenue,
        |             lag(revenue) OVER (ORDER BY month) AS prev FROM m)
        |ORDER BY month""".stripMargin,
    "zorder_keys" -> {
      val terms = (0 until 16).map(i =>
        s"(((o_custkey >> $i) & 1) << ${2 * i + 1}) | " +
          s"(((d_epoch >> $i) & 1) << ${2 * i})")
      s"""WITH t AS (
         |  SELECT o_orderkey, o_custkey,
         |         CAST(date_diff('day', DATE '1970-01-01',
         |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS d_epoch
         |  FROM orders
         |)
         |SELECT o_orderkey, CAST(${terms.mkString(" | ")} AS BIGINT) AS z
         |FROM t ORDER BY o_orderkey""".stripMargin
    },
    "table_stats_catalog" -> {
      // generated from the same (table, column, kind) lists as the engine
      // side so the two surfaces cannot drift
      def block(t: String, cols: Seq[(String, String)]): Seq[String] =
        cols.map { case (c, kind) =>
          val (mn, mx) =
            if (kind == "date")
              (s"strftime(min($c), '%Y-%m-%d')", s"strftime(max($c), '%Y-%m-%d')")
            else (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
          s"""SELECT '$t' AS table_name, '$c' AS column_name,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |  $mn AS min_val, $mx AS max_val
             |FROM $t""".stripMargin
        }
      (block("orders", Seq("o_orderkey" -> "num", "o_custkey" -> "num",
          "o_orderstatus" -> "str", "o_orderpriority" -> "str",
          "o_orderdate" -> "date")) ++
        block("lineitem", Seq("l_orderkey" -> "num", "l_partkey" -> "num",
          "l_suppkey" -> "num", "l_linenumber" -> "num",
          "l_returnflag" -> "str", "l_linestatus" -> "str",
          "l_shipdate" -> "date")) ++
        block("customer", Seq("c_custkey" -> "num", "c_nationkey" -> "num",
          "c_mktsegment" -> "str")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
    },
    "histogram_equidepth" ->
      s"""WITH v AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS v FROM lineitem
         |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         |g AS (SELECT v, count(*) AS cnt FROM v GROUP BY v),
         |c AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM g),
         |t AS (
         |  SELECT CAST(b AS BIGINT) AS bucket,
         |         CAST((n * b + ${HistBuckets - 1}) // $HistBuckets AS BIGINT)
         |           AS target_rank
         |  FROM range(1, ${HistBuckets + 1}) tt(b) CROSS JOIN n
         |)
         |SELECT bucket, target_rank,
         |       (SELECT min(v) FROM c WHERE cum >= target_rank) AS upper_cents
         |FROM t ORDER BY bucket""".stripMargin,
    "compaction_plan" ->
      s"""WITH ch AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS day,
         |         CAST(count(*) AS BIGINT) AS n_rows
         |  FROM events GROUP BY 1
         |), p AS (
         |  SELECT day, n_rows,
         |         CAST((sum(n_rows) OVER (ORDER BY day) - n_rows)
         |              // $CompactTargetRows AS BIGINT) AS bin
         |  FROM ch
         |), b AS (SELECT bin, CAST(sum(n_rows) AS BIGINT) AS bin_rows
         |         FROM p GROUP BY bin)
         |SELECT p.day, p.n_rows, p.bin, b.bin_rows
         |FROM p JOIN b USING (bin) ORDER BY day""".stripMargin,
    "csv_roundtrip_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "partitioned_scan_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // plain join-agg over the original tables — the bucketed layout must
    // be a pure plan optimization, invisible in the result
    "bucketed_join_agg" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "schema_evolution_agg" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>'
        |            ELSE o_orderstatus END AS status,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "orc_roundtrip_agg" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "events_hourly_heatmap" ->
      """SELECT CAST(isodow(ts) AS BIGINT) AS dow,
        |       CAST(hour(ts) AS BIGINT) AS hh,
        |       count(*) AS n_events,
        |       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY dow, hh ORDER BY dow, hh""".stripMargin,
    "chisq_status_priority" ->
      """WITH obs AS (
        |  SELECT o_orderstatus AS st, o_orderpriority AS pr, count(*) AS o
        |  FROM orders GROUP BY st, pr
        |), rt AS (SELECT st, sum(o) AS rt FROM obs GROUP BY st),
        |ct AS (SELECT pr, sum(o) AS ct FROM obs GROUP BY pr),
        |tot AS (SELECT sum(o) AS n,
        |               count(DISTINCT st) - 1 AS dr,
        |               count(DISTINCT pr) - 1 AS dc FROM obs),
        |cells AS (
        |  SELECT obs.st || '|' || obs.pr AS k,
        |         CAST(obs.o * n - rt.rt * ct.ct AS DOUBLE)
        |           * CAST(obs.o * n - rt.rt * ct.ct AS DOUBLE)
        |           / CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n AS DOUBLE) AS term,
        |         n, dr * dc AS dof
        |  FROM obs JOIN rt USING (st) JOIN ct USING (pr) CROSS JOIN tot
        |)
        |SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list(term ORDER BY k)), (a, b) -> a + b) AS chi2,
        |       CAST(dof AS BIGINT) AS dof, CAST(n AS BIGINT) AS n
        |FROM cells GROUP BY dof, n""".stripMargin,
    "event_transition_matrix" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS to_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS from_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*) AS n FROM seq
        |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type
        |), totals AS (
        |  SELECT from_type, sum(n) AS from_n FROM pairs GROUP BY from_type
        |)
        |SELECT p.from_type, p.to_type, p.n,
        |       CAST(p.n AS DOUBLE) / CAST(t.from_n AS DOUBLE) AS p
        |FROM pairs p JOIN totals t ON p.from_type = t.from_type
        |ORDER BY p.from_type, to_type""".stripMargin,
    "markov_stationary" -> {
      // the power iteration unrolled: c_k sums this round's truncated
      // integer contributions, pi_k densifies back onto the state list.
      val rounds = (1 to MarkovIters).map { k =>
        s"""c$k AS (
           |  SELECT tr.to_type AS st,
           |         CAST(sum((p.v * tr.n) // tr.from_n) AS BIGINT) AS cv
           |  FROM trans tr JOIN pi${k - 1} p ON p.st = tr.from_type
           |  GROUP BY 1
           |),
           |pi$k AS (
           |  SELECT s.st, CAST(COALESCE(c.cv, 0) AS BIGINT) AS v
           |  FROM states s LEFT JOIN c$k c ON c.st = s.st
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT user_id, event_type AS to_type,
         |         lag(event_type) OVER (PARTITION BY user_id
         |                               ORDER BY ts, event_id) AS from_type
         |  FROM events
         |), pairs AS (
         |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM seq
         |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type
         |), trans AS (
         |  SELECT p.from_type, p.to_type, p.n, t.from_n
         |  FROM pairs p JOIN (
         |    SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n
         |    FROM pairs GROUP BY 1) t ON p.from_type = t.from_type
         |), states AS (
         |  SELECT DISTINCT event_type AS st FROM events
         |), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM states),
         |pi0 AS (
         |  SELECT st, CAST($MarkovFp // m AS BIGINT) AS v FROM states, mm
         |),
         |$rounds
         |SELECT st AS event_type, v AS pi_fp,
         |       CAST(v AS DOUBLE) / CAST($MarkovFp AS DOUBLE) AS pi
         |FROM pi$MarkovIters ORDER BY event_type""".stripMargin
    },
    "impute_missing_prices" ->
      """WITH masked AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |              ELSE o_totalprice END AS price
        |  FROM orders
        |), med AS (
        |  SELECT o_orderpriority, median(price) AS group_median
        |  FROM masked WHERE price IS NOT NULL GROUP BY o_orderpriority
        |)
        |SELECT o_orderkey,
        |       CAST(price IS NULL AS INT) AS imputed,
        |       coalesce(price, group_median) AS price
        |FROM masked JOIN med USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    "part_affinity_lift" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |), pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_n
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), items AS (
        |  SELECT l_partkey, count(*) AS item_n FROM li GROUP BY 1
        |), total AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
        |)
        |SELECT pa, pb, pair_n,
        |       CAST(pair_n * n_orders AS DOUBLE) /
        |       CAST(na.item_n * nb.item_n AS DOUBLE) AS lift
        |FROM pairs
        |JOIN items na ON pairs.pa = na.l_partkey
        |JOIN items nb ON pairs.pb = nb.l_partkey
        |CROSS JOIN total
        |ORDER BY lift DESC, pa, pb LIMIT 50""".stripMargin,
    "anomaly_daily_revenue" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
        |  FROM orders GROUP BY 1
        |), win AS (
        |  SELECT day, c,
        |         count(*) OVER w AS n7,
        |         sum(c) OVER w AS s7,
        |         sum(CAST(c AS DECIMAL(15,0)) * CAST(c AS DECIMAL(15,0))) OVER w AS ss7
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |), z AS (
        |  SELECT day, CAST(c AS DOUBLE) / 100.0 AS revenue,
        |         (CAST(c AS DOUBLE) - CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE)) /
        |         sqrt((CAST(ss7 AS DOUBLE) -
        |               CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE)) /
        |              (CAST(n7 AS DOUBLE) - 1.0)) AS z
        |  FROM win WHERE n7 = 7
        |)
        |SELECT day, revenue, z FROM z WHERE abs(z) > 2.0 ORDER BY day""".stripMargin,
    // exact integer/decimal sums (HUGEINT re-cast; Σxy squares DECIMAL
    // operands before multiplying), then the identical double formula
    "trend_daily_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS x,
        |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           AS y
        |  FROM orders GROUP BY 1, 2
        |), sums AS (
        |  SELECT priority, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS DECIMAL(15,0)) * CAST(y AS DECIMAL(15,0))) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY priority
        |), d AS (
        |  SELECT priority, n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |         CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |         CAST(sxx AS DOUBLE) AS sxxd
        |  FROM sums
        |), sl AS (
        |  SELECT priority, n, nd, sxd, syd,
        |         (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
        |           AS slope_cents_per_day
        |  FROM d
        |)
        |SELECT priority, n, slope_cents_per_day,
        |       (syd - slope_cents_per_day * sxd) / nd AS intercept_cents
        |FROM sl ORDER BY priority""".stripMargin,
    // the literal correlated form — independent derivation from the
    // decorrelated Spark plan; hash equality checks the rewrite
    "sql_sole_problem_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    // same sorted-frame middle-element pick (not median(): the mirrored
    // selection stays exact even for interpolating frames)
    "rolling_median_revenue" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1
        |), win AS (
        |  SELECT day, revenue, list(revenue) OVER
        |           (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |           AS frame
        |  FROM daily
        |)
        |SELECT day, revenue, list_sort(frame)[4] AS med7
        |FROM win WHERE len(frame) = 7 ORDER BY day""".stripMargin,
    // identical recurrence via per-day prefix folds: list_reduce seeds the
    // accumulator with the first element (= y_0 = x_0), matching the
    // Spark aggregate's element_at(xs, 1) init; identical multiply-add
    // order gives bit-equal doubles
    "ewma_daily_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         strftime(o_orderdate, '%Y-%m-%d') AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2
        |), series AS (
        |  SELECT priority, list(d ORDER BY d) AS ds, list(rev ORDER BY d) AS xs
        |  FROM daily GROUP BY priority
        |)
        |SELECT priority, UNNEST(ds) AS d, UNNEST(xs) AS revenue,
        |       UNNEST(list_transform(range(1, len(xs) + 1), t ->
        |         list_reduce(list_slice(xs, 1, t),
        |           (a, x) -> a * CAST(0.75 AS DOUBLE)
        |                       + x * CAST(0.25 AS DOUBLE)))) AS ewma
        |FROM series ORDER BY priority, d""".stripMargin,
    // array-encoded (level, trend) state — see the Spark-side comment on
    // why the accumulator must NOT be a struct in DuckDB's list_reduce
    "holt_daily_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         strftime(o_orderdate, '%Y-%m-%d') AS d,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2
        |), series AS (
        |  SELECT priority, list(d ORDER BY d) AS ds, list(rev ORDER BY d) AS xs
        |  FROM daily GROUP BY priority
        |), folded AS (
        |  SELECT priority, ds, xs,
        |         list_transform(range(1, len(xs) + 1), t ->
        |           list_reduce(
        |             list_prepend([xs[1], xs[2] - xs[1]],
        |                          list_transform(xs[2:t], v -> [v, CAST(0.0 AS DOUBLE)])),
        |             (acc, x) ->
        |               [0.5*x[1] + 0.5*(acc[1] + acc[2]),
        |                0.25*((0.5*x[1] + 0.5*(acc[1] + acc[2])) - acc[1])
        |                  + 0.75*acc[2]])) AS hb
        |  FROM series
        |)
        |SELECT priority, UNNEST(ds) AS d, UNNEST(xs) AS revenue,
        |       UNNEST(list_transform(hb, h -> h[1])) AS level,
        |       UNNEST(list_transform(hb, h -> h[2])) AS trend,
        |       UNNEST(list_transform(hb, h -> h[1] + h[2])) AS forecast_next
        |FROM folded ORDER BY priority, d""".stripMargin,
    "holt_winters_daily" -> {
      val L = "0.5*(x[1] - acc[CAST(acc[10] AS BIGINT) % 7 + 3]) + 0.5*(acc[1] + acc[2])"
      val sk = (0 until 7).map(k =>
        s"CASE WHEN CAST(acc[10] AS BIGINT) % 7 = $k THEN 0.25*(x[1] - ($L)) + 0.75*acc[${k + 3}] ELSE acc[${k + 3}] END")
        .mkString(",\n        |             ")
      s"""WITH daily AS (
         |  SELECT o_orderpriority AS priority,
         |         strftime(o_orderdate, '%Y-%m-%d') AS d,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |  GROUP BY 1, 2
         |), series AS (
         |  SELECT priority, list(d ORDER BY d) AS ds, list(rev ORDER BY d) AS xs
         |  FROM daily GROUP BY priority
         |), folded AS (
         |  SELECT priority, ds, xs,
         |    list_transform(range(1, len(xs) + 1), t ->
         |      list_reduce(
         |        list_prepend([xs[1], xs[2] - xs[1],
         |                      0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
         |          list_transform(xs[2:t], v ->
         |            [v, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
         |        (acc, x) -> [
         |             $L,
         |             0.25*(($L) - acc[1]) + 0.75*acc[2],
         |             $sk,
         |             acc[10] + 1.0])) AS hb
         |  FROM series
         |)
         |SELECT priority, UNNEST(ds) AS d, UNNEST(xs) AS revenue,
         |       UNNEST(list_transform(hb, h -> h[1])) AS level,
         |       UNNEST(list_transform(hb, h -> h[2])) AS trend,
         |       UNNEST(list_transform(range(1, len(hb) + 1), t ->
         |         hb[t][(t - 1) % 7 + 3])) AS seasonal,
         |       UNNEST(list_transform(range(1, len(hb) + 1), t ->
         |         hb[t][1] + hb[t][2] + hb[t][t % 7 + 3])) AS forecast_next
         |FROM folded ORDER BY priority, d""".stripMargin
    },
    "rolling_corr_daily" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), w AS (
        |  SELECT d, x, y,
        |         CAST(count(*) OVER win AS BIGINT) AS nw,
        |         CAST(sum(x) OVER win AS BIGINT) AS sx,
        |         CAST(sum(y) OVER win AS BIGINT) AS sy,
        |         sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) OVER win AS sxx,
        |         sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER win AS syy,
        |         sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER win AS sxy
        |  FROM daily
        |  WINDOW win AS (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
        |)
        |SELECT d, x, y,
        |       (CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |         (sqrt(CAST(nw AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |          sqrt(CAST(nw AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr28
        |FROM w WHERE nw = 28 ORDER BY d""".stripMargin,

    "join_incremental_refresh" ->
      s"""WITH li AS (
         |  SELECT l_orderkey,
         |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM lineitem
         |), base AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_b,
         |         CAST(sum(c) AS BIGINT) AS rev_b
         |  FROM orders JOIN li ON o_orderkey = l_orderkey
         |  WHERE o_orderdate < TIMESTAMP '${Curation.RefreshCut}'
         |  GROUP BY o_orderpriority
         |), delta AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_d,
         |         CAST(sum(c) AS BIGINT) AS rev_d
         |  FROM orders JOIN li ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '${Curation.RefreshCut}'
         |  GROUP BY o_orderpriority
         |), refreshed AS (
         |  SELECT o_orderpriority,
         |         coalesce(n_d, 0) AS n_delta,
         |         coalesce(n_b, 0) + coalesce(n_d, 0) AS n_refreshed,
         |         coalesce(rev_b, 0) + coalesce(rev_d, 0) AS rev_refreshed
         |  FROM base FULL OUTER JOIN delta USING (o_orderpriority)
         |), fullr AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_full,
         |         CAST(sum(c) AS BIGINT) AS rev_full
         |  FROM orders JOIN li ON o_orderkey = l_orderkey
         |  GROUP BY o_orderpriority
         |)
         |SELECT o_orderpriority, CAST(n_delta AS BIGINT) AS n_delta,
         |       CAST(n_refreshed AS BIGINT) AS n_refreshed, n_full,
         |       CAST(rev_refreshed AS BIGINT) AS rev_refreshed, rev_full,
         |       n_refreshed = n_full AND rev_refreshed = rev_full AS consistent
         |FROM refreshed FULL OUTER JOIN fullr USING (o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin,

    "cohort_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id,
        |         min((CAST(ts AS DATE) - DATE '1970-01-01') // 7) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), act AS (
        |  SELECT e.user_id, c.cohort_week,
        |         (CAST(e.ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        |  FROM events e JOIN cohorts c ON e.user_id = c.user_id
        |)
        |SELECT cohort_week, wk - cohort_week AS week_offset,
        |       count(DISTINCT user_id) AS active_users
        |FROM act WHERE wk >= cohort_week
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "scd2_point_lookup" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |         coalesce(lead(strftime(o_orderdate, '%Y-%m-%d'))
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey), '9999-12-31') AS valid_to
        |  FROM orders
        |)
        |SELECT e.event_id, e.user_id, iv.o_orderkey AS active_order
        |FROM (SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS d FROM events) e
        |LEFT JOIN seq iv ON e.user_id = iv.o_custkey
        |  AND e.d >= iv.valid_from AND e.d < iv.valid_to
        |ORDER BY event_id""".stripMargin,
    "snapshot_diff_orders" ->
      """WITH base AS (
        |  SELECT o_orderkey AS key, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders
        |), newsnap AS (
        |  SELECT key,
        |         CASE WHEN key % 31 = 0 THEN price + CAST(1 AS DECIMAL(18,2))
        |              ELSE price END AS price
        |  FROM base WHERE key % 97 <> 0
        |  UNION ALL
        |  SELECT key + 1000000000000, price FROM base WHERE key % 53 = 0
        |)
        |SELECT coalesce(o.key, n.key) AS key,
        |       CASE WHEN o.key IS NULL THEN 'insert'
        |            WHEN n.key IS NULL THEN 'delete'
        |            WHEN o.price <> n.price THEN 'update' END AS op,
        |       CAST(o.price AS DOUBLE) AS old_price,
        |       CAST(n.price AS DOUBLE) AS new_price
        |FROM base o FULL OUTER JOIN newsnap n ON o.key = n.key
        |WHERE (o.key IS NULL OR n.key IS NULL OR o.price <> n.price)
        |ORDER BY key, op""".stripMargin,
    "orders_scd2_intervals" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderkey,
        |         strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |         lead(strftime(o_orderdate, '%Y-%m-%d'))
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey) AS next_from,
        |         lead(o_orderkey)
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey) AS next_key
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, valid_from,
        |       coalesce(next_from, '9999-12-31') AS valid_to,
        |       CAST(next_key IS NULL AS INT) AS is_current
        |FROM seq ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "histogram_equidepth_price" ->
      """WITH cuts AS (
        |  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
        |         quantile_cont(o_totalprice, 0.5) AS q2,
        |         quantile_cont(o_totalprice, 0.75) AS q3
        |  FROM orders
        |)
        |SELECT CAST(CASE WHEN o_totalprice <= q1 THEN 0
        |                 WHEN o_totalprice <= q2 THEN 1
        |                 WHEN o_totalprice <= q3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
        |       count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders, cuts
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 AS sx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 AS sy,
        |    CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |                  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sxx,
        |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS syy,
        |    CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |       sx / CAST(n AS DOUBLE) AS mean_qty,
        |       sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_qty,
        |       (sxy - sx * sy / CAST(n AS DOUBLE)) /
        |         sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) * (syy - sy * sy / CAST(n AS DOUBLE))) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "window_lag_ntile" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
        |       COALESCE(CAST(lag(o_totalprice, 1) OVER seq AS DECIMAL(18,2)),
        |                CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS delta_prev,
        |  lead(o_orderkey, 1) OVER seq AS next_orderkey,
        |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
        |FROM orders
        |WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // layout-invariant aggregate: the oracle reads the RAW table — equality
    // proves the range-layout write/read round trip is lossless
    "range_layout_scan_agg" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |         AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "window_cume_dist" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS c
        |  FROM orders
        |)
        |SELECT o_orderkey, o_orderpriority,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(c, 2) OVER w AS second_lowest
        |FROM o
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY c, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "null_semantics_audit" ->
      """WITH o AS (
        |  SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
        |         CASE WHEN o_orderkey % 7 <> 0 THEN
        |           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         END AS c
        |  FROM orders
        |)
        |SELECT st, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(c) AS BIGINT) AS n_price,
        |       CAST(sum(c) AS BIGINT) AS sum_cents,
        |       min(c) AS min_cents,
        |       CAST(count(DISTINCT c) AS BIGINT) AS ndv_price,
        |       CAST(sum(coalesce(c, 0)) AS BIGINT) AS sum_coalesced,
        |       CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null_price,
        |       CAST(sum(c) AS DOUBLE) / CAST(count(c) AS DOUBLE) AS avg_cents
        |FROM o GROUP BY st ORDER BY st NULLS FIRST""".stripMargin,
    "date_functions_audit" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT strftime(date_trunc('month', d), '%Y-%m-%d') AS month_start,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(year(d)) AS INT) AS yr,
        |       CAST(min(quarter(d)) AS INT) AS qtr,
        |       CAST(min(d - DATE '1970-01-01') AS BIGINT) AS first_epoch_day,
        |       CAST(max(day(d)) AS BIGINT) AS max_dom,
        |       max(strftime(last_day(d), '%Y-%m-%d')) AS month_end
        |FROM o GROUP BY 1 ORDER BY month_start""".stripMargin,
    "string_functions_audit" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |       min(upper(p_name)) AS min_upper,
        |       max(reverse(p_name)) AS max_rev,
        |       CAST(sum(length(p_name)) AS BIGINT) AS sum_len,
        |       CAST(sum(strpos(p_name, 'e')) AS BIGINT) AS sum_epos,
        |       min(substr(p_name, 1, 8)) AS min_prefix,
        |       max(translate(p_name, ' ', '_')) AS max_snake,
        |       min(split_part(p_name, ' ', -1)) AS min_last_tok
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "array_functions_audit" ->
      """WITH a AS (
        |  SELECT l_orderkey,
        |         list_sort(list(CAST(l_quantity AS BIGINT))) AS arr
        |  FROM lineitem GROUP BY l_orderkey
        |), per AS (
        |  SELECT l_orderkey,
        |    CAST(list_sum(list_transform(arr, x -> x * 2 + 1)) AS BIGINT)
        |      AS t1,
        |    CAST(len(list_filter(arr, x -> x > 25)) AS BIGINT) AS n_gt,
        |    CAST(list_sum(arr[1:5]) AS BIGINT) AS s5,
        |    CAST(len(list_distinct(arr)) AS BIGINT) AS nd,
        |    CASE WHEN list_contains(arr, 30) THEN 1 ELSE 0 END AS has30,
        |    CAST(list_sum(list_transform(list_zip(arr, list_reverse(arr)),
        |      x -> x[1] * x[2])) AS BIGINT) AS dotrev
        |  FROM a
        |)
        |SELECT l_orderkey % 8 AS g, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(t1) AS BIGINT) AS sum_t1,
        |       CAST(sum(n_gt) AS BIGINT) AS sum_gt,
        |       CAST(sum(s5) AS BIGINT) AS sum_first5,
        |       CAST(sum(nd) AS BIGINT) AS sum_distinct,
        |       CAST(sum(has30) AS BIGINT) AS n_has30,
        |       CAST(sum(dotrev) AS BIGINT) AS sum_dotrev
        |FROM per GROUP BY 1 ORDER BY g""".stripMargin,

    "compact_small_files_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "map_props_agg" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
        |       CAST(max(len(json_keys(props))) AS BIGINT) AS max_keys
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sql_subquery_spenders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_totalprice > (
        |    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM orders))
        |ORDER BY c_custkey""".stripMargin,

    "sql_recursive_months" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT min(year(CAST(o_orderdate AS DATE)) * 12 +
        |             month(CAST(o_orderdate AS DATE)) - 1) AS lo,
        |         max(year(CAST(o_orderdate AS DATE)) * 12 +
        |             month(CAST(o_orderdate AS DATE)) - 1) AS hi
        |  FROM orders
        |), years(yr, lo, hi) AS (
        |  SELECT lo // 12, lo, hi FROM bounds
        |  UNION ALL
        |  SELECT yr + 1, lo, hi FROM years WHERE yr < hi // 12
        |), months AS (
        |  SELECT yr * 12 + o.off AS mi
        |  FROM years,
        |       (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9),
        |               (10), (11)) o(off)
        |  WHERE yr * 12 + o.off BETWEEN lo AND hi
        |), per_month AS (
        |  SELECT year(CAST(o_orderdate AS DATE)) * 12 +
        |         month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT m.mi AS month_idx, CAST(m.mi // 12 AS INT) AS yr,
        |       CAST(m.mi % 12 + 1 AS INT) AS mon,
        |       coalesce(p.n_orders, 0) AS n_orders,
        |       coalesce(p.revenue_cents, 0) AS revenue_cents
        |FROM months m LEFT JOIN per_month p ON m.mi = p.mi
        |ORDER BY month_idx""".stripMargin,

    "sql_lateral_topk" ->
      """SELECT seg.c_mktsegment, t.o_orderkey, t.price_cents
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
        |LATERAL (
        |  SELECT o.o_orderkey,
        |         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS price_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment = seg.c_mktsegment
        |  ORDER BY price_cents DESC, o.o_orderkey LIMIT 3
        |) t
        |ORDER BY seg.c_mktsegment, t.price_cents DESC, t.o_orderkey"""
        .stripMargin,
    "window_trailing_7d" ->
      """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) // 86400 AS BIGINT)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev7
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "user_event_gaps" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS t FROM events
        |), d AS (
        |  SELECT user_id, t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
        |  FROM t
        |)
        |SELECT user_id,
        |       count(*) + 1 AS n_events,
        |       max(gap) AS max_gap_us,
        |       CAST(median(gap) AS DOUBLE) AS median_gap_us
        |FROM d WHERE gap IS NOT NULL
        |GROUP BY user_id HAVING count(*) >= 1
        |ORDER BY user_id""".stripMargin,
    "typed_priority_stats" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total,
        |       max(o_orderkey) AS max_orderkey
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sample_hash_docs" -> {
      val h = graft.text.TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ($h) % 20 = 7 ORDER BY doc_id""".stripMargin
    },
    "sample_stratified_docs" -> {
      val h = graft.text.TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, lang, ($h) % 100 AS bucket FROM documents
         |WHERE ($h) % 100 <
         |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 25 ELSE 10 END
         |ORDER BY doc_id""".stripMargin
    },
    "profile_orders" -> {
      def block(c: String, num: Boolean): String = {
        val minmax =
          if (num) s"CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num, " +
            "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
          else "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
            s"min($c) AS min_str, max($c) AS max_str"
        s"SELECT '$c' AS col_name, count(*) AS n_rows, count(*) - count($c) AS n_nulls, " +
          s"count(DISTINCT $c) AS n_distinct, $minmax FROM orders"
      }
      Seq(("o_orderkey", true), ("o_custkey", true), ("o_totalprice", true),
        ("o_orderstatus", false), ("o_orderpriority", false))
        .map { case (c, n) => block(c, n) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "agg_rollup_region_nation" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY coalesce(r_name, 'ALL'), coalesce(n_name, 'ALL')""".stripMargin,
    "agg_cube_status_priority" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY coalesce(o_orderstatus, 'ALL'), coalesce(o_orderpriority, 'ALL')""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY coalesce(o_orderstatus, 'ALL'), coalesce(o_orderpriority, 'ALL')""".stripMargin,
    "revenue_share_by_nation" ->
      """WITH rev AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, CAST(rev_d AS DOUBLE) AS revenue,
        |       CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE) AS share
        |FROM rev ORDER BY n_name""".stripMargin,
    "unpivot_status_by_priority" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "pivot_status_by_priority" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the catalog round trip must be invisible in the data; the DDL
    // contract flags are constants the engine must reproduce
    "ddl_create_insert_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       true AS created_first, false AS created_second
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "window_frame_audit" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |              AS BIGINT) AS de,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS c
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey,
        |  first_value(c) OVER (PARTITION BY o_custkey ORDER BY de, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_c,
        |  last_value(c) OVER (PARTITION BY o_custkey ORDER BY de, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_c,
        |  nth_value(c, 2) OVER (PARTITION BY o_custkey ORDER BY de, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_c,
        |  CAST(coalesce(sum(c) OVER (PARTITION BY o_custkey
        |    ORDER BY de, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS prev2_sum,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY de, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |    AS n_from_here
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin,

    "kmv_merge_audit" -> {
      val p = graft.text.TextOps.P
      val a = graft.text.TextOps.MIX % p
      val b = (3 * a) % p
      s"""WITH hashed AS (
         |  SELECT DISTINCT
         |    (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7) AS g,
         |    ((user_id * $a + $b) % $p + $p) % $p AS h
         |  FROM events WHERE user_id IS NOT NULL
         |), per_shard AS (
         |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
         |  FROM hashed
         |), merged_k AS (
         |  SELECT DISTINCT h FROM per_shard WHERE rn <= 64
         |  ORDER BY h LIMIT 64
         |), m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k_merged, max(h) AS kth_merged
         |  FROM merged_k
         |), global_k AS (
         |  SELECT DISTINCT ((user_id * $a + $b) % $p + $p) % $p AS h
         |  FROM events WHERE user_id IS NOT NULL ORDER BY h LIMIT 64
         |), g AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k_global, max(h) AS kth_global
         |  FROM global_k
         |), e AS (
         |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_ndv
         |  FROM events WHERE user_id IS NOT NULL
         |)
         |SELECT k_global, kth_global, k_merged, kth_merged,
         |       kth_global = kth_merged AND k_global = k_merged
         |         AS merge_lossless,
         |       CAST(k_global - 1 AS DOUBLE) * CAST($p AS DOUBLE)
         |         / CAST(kth_global AS DOUBLE) AS est_ndv,
         |       exact_ndv
         |FROM g, m, e""".stripMargin
    },

    "kmv_distinct_users" -> {
      val p = graft.text.TextOps.P
      val a = graft.text.TextOps.MIX % p
      val b = (3 * a) % p
      s"""WITH h AS (
         |  SELECT DISTINCT ((user_id * $a + $b) % $p + $p) % $p AS h
         |  FROM events WHERE user_id IS NOT NULL
         |), topk AS (SELECT h FROM h ORDER BY h LIMIT 256),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_min FROM topk),
         |e AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_ndv FROM events)
         |SELECT k_used, kth_min,
         |       CAST(k_used - 1 AS DOUBLE) * CAST($p AS DOUBLE)
         |         / CAST(kth_min AS DOUBLE) AS est_ndv,
         |       exact_ndv
         |FROM s, e""".stripMargin
    },
    "theta_intersect_users" -> {
      val p = graft.text.TextOps.P
      val a = graft.text.TextOps.MIX % p
      val b = (3 * a) % p
      s"""WITH ev AS (
         |  SELECT user_id, event_type FROM events WHERE user_id IS NOT NULL
         |), hh AS (
         |  SELECT event_type, ((user_id * $a + $b) % $p + $p) % $p AS h FROM ev
         |), sa AS (
         |  SELECT h FROM (SELECT DISTINCT h FROM hh WHERE event_type = 'click')
         |  ORDER BY h LIMIT 256
         |), sb AS (
         |  SELECT h FROM (SELECT DISTINCT h FROM hh WHERE event_type = 'purchase')
         |  ORDER BY h LIMIT 256
         |), ta AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k_a, max(h) AS kth_a,
         |         CAST(CASE WHEN count(*) < 256 THEN $p ELSE max(h) END AS BIGINT)
         |           AS theta_a
         |  FROM sa
         |), tb AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k_b, max(h) AS kth_b,
         |         CAST(CASE WHEN count(*) < 256 THEN $p ELSE max(h) END AS BIGINT)
         |           AS theta_b
         |  FROM sb
         |), th AS (
         |  SELECT k_a, kth_a, k_b, kth_b, least(theta_a, theta_b) AS theta
         |  FROM ta, tb
         |), com AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_common
         |  FROM sa JOIN sb ON sa.h = sb.h, th WHERE sa.h < th.theta
         |), ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_intersection
         |  FROM (SELECT DISTINCT user_id FROM ev WHERE event_type = 'click') x
         |  JOIN (SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase') y
         |    ON x.user_id = y.user_id
         |)
         |SELECT k_a, kth_a, k_b, kth_b, theta, n_common,
         |       CAST(n_common AS DOUBLE) * CAST($p AS DOUBLE)
         |         / CAST(theta AS DOUBLE) AS est_intersection,
         |       exact_intersection
         |FROM th, com, ex""".stripMargin
    },
    "bitmap_intersect_users" ->
      """WITH ev AS (
        |  SELECT user_id, event_type FROM events WHERE user_id IS NOT NULL
        |), ca AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'click'),
        |cb AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase'),
        |wa AS (
        |  SELECT user_id // 63 AS word,
        |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
        |  FROM ca GROUP BY 1
        |), wb AS (
        |  SELECT user_id // 63 AS word,
        |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
        |  FROM cb GROUP BY 1
        |), na AS (
        |  SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS n_click,
        |         CAST(count(*) AS BIGINT) AS words_click FROM wa
        |), nb AS (
        |  SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS n_purchase,
        |         CAST(count(*) AS BIGINT) AS words_purchase FROM wb
        |), bo AS (
        |  SELECT CAST(coalesce(sum(bit_count(wa.bits & wb.bits)), 0) AS BIGINT)
        |           AS n_both
        |  FROM wa JOIN wb ON wa.word = wb.word
        |), ex AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_intersection
        |  FROM ca JOIN cb ON ca.user_id = cb.user_id
        |)
        |SELECT n_click, words_click, n_purchase, words_purchase, n_both,
        |       exact_intersection, n_both = exact_intersection AS bitmap_exact
        |FROM na, nb, bo, ex""".stripMargin,

    "gdpr_delete_cascade" ->
      """WITH del AS (
        |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
        |), delo AS (
        |  SELECT o_orderkey AS ok FROM orders JOIN del ON o_custkey = k
        |), rows0 AS (
        |  SELECT 'customer' AS table_name,
        |         CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total,
        |         CAST((SELECT count(*) FROM customer
        |               WHERE c_custkey IN (SELECT k FROM del)) AS BIGINT) AS n_removed
        |  UNION ALL
        |  SELECT 'orders',
        |         CAST((SELECT count(*) FROM orders) AS BIGINT),
        |         CAST((SELECT count(*) FROM orders
        |               WHERE o_custkey IN (SELECT k FROM del)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem',
        |         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |         CAST((SELECT count(*) FROM lineitem
        |               WHERE l_orderkey IN (SELECT ok FROM delo)) AS BIGINT)
        |)
        |SELECT table_name, n_total, n_removed,
        |       n_total - n_removed AS n_after, TRUE AS clean
        |FROM rows0 ORDER BY table_name""".stripMargin,

    "set_multiset_audit" ->
      """WITH ev AS (
        |  SELECT user_id, event_type FROM events WHERE user_id IS NOT NULL
        |), a AS (SELECT user_id FROM ev WHERE event_type = 'click'),
        |b AS (SELECT user_id FROM ev WHERE event_type = 'purchase')
        |SELECT
        |  CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
        |  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
        |  CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        |       AS BIGINT) AS n_except_all,
        |  CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
        |       AS BIGINT) AS n_intersect_all,
        |  CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |       AS BIGINT) AS n_except_distinct,
        |  CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        |       AS BIGINT) AS n_intersect_distinct,
        |  CAST((SELECT count(*) FROM a) AS BIGINT) =
        |    CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        |         AS BIGINT) +
        |    CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
        |         AS BIGINT) AS bag_identity""".stripMargin,

    "gini_revenue_by_nation" ->
      """WITH cr AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT n_name, o_custkey, rev_c,
        |         CAST(row_number() OVER (PARTITION BY n_name
        |                                 ORDER BY rev_c, o_custkey) AS BIGINT) AS rn
        |  FROM cr
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |), g AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |         CAST(sum(rev_c) AS BIGINT) AS total_c,
        |         CAST(sum(rev_c * rn) AS BIGINT) AS weighted_c
        |  FROM ranked GROUP BY n_name
        |)
        |SELECT n_name, n_cust, total_c,
        |       (CAST(2.0 AS DOUBLE) * CAST(weighted_c AS DOUBLE)
        |         - CAST(n_cust + 1 AS DOUBLE) * CAST(total_c AS DOUBLE))
        |        / (CAST(n_cust AS DOUBLE) * CAST(total_c AS DOUBLE)) AS gini
        |FROM g ORDER BY n_name""".stripMargin,
    "rfm_segments" ->
      """WITH pc AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |         count(*) AS freq,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        |  FROM orders GROUP BY o_custkey
        |), scored AS (
        |  SELECT CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r_score,
        |         CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_score,
        |         CAST(ntile(4) OVER (ORDER BY mon DESC, o_custkey) AS BIGINT) AS m_score,
        |         mon
        |  FROM pc
        |)
        |SELECT r_score, f_score, m_score,
        |       count(*) AS n_customers,
        |       CAST(sum(mon) AS DOUBLE) AS segment_revenue
        |FROM scored GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "bfs_reachable_parts" ->
      """WITH edges AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey
        |), seeds AS (
        |  SELECT DISTINCT p_partkey AS v FROM part WHERE p_partkey % 97 = 0
        |), f1 AS (
        |  SELECT DISTINCT e.dst AS v FROM edges e JOIN seeds s ON e.src = s.v
        |  EXCEPT SELECT v FROM seeds
        |), v1 AS (SELECT v FROM seeds UNION SELECT v FROM f1),
        |f2 AS (
        |  SELECT DISTINCT e.dst AS v FROM edges e JOIN f1 ON e.src = f1.v
        |  EXCEPT SELECT v FROM v1
        |), v2 AS (SELECT v FROM v1 UNION SELECT v FROM f2)
        |SELECT CAST(0 AS BIGINT) AS hop,
        |       (SELECT count(*) FROM seeds) AS frontier_size,
        |       (SELECT count(*) FROM seeds) AS visited_size
        |UNION ALL
        |SELECT 1, (SELECT count(*) FROM f1), (SELECT count(*) FROM v1)
        |UNION ALL
        |SELECT 2, (SELECT count(*) FROM f2), (SELECT count(*) FROM v2)
        |ORDER BY hop""".stripMargin
  )
}
