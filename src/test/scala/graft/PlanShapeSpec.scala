package graft

/** Executable plan-shape assertions: the scale claims PLANS.md makes in
  * prose ("filter reaches the scan", "dims broadcast", "hot paths stay in
  * whole-stage codegen") pinned as tests, so an innocent refactor that
  * silently un-pushes a predicate or un-broadcasts a dimension fails CI
  * instead of surfacing as a 100 TB regression. Companion of
  * [[DeterminismSpec]]'s cartesian sweep: that one guards the whole
  * registry against the catastrophic shape, these guard flagship queries
  * for the shapes we *promise*.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("equality filter is pushed down to the events parquet scan") {
    val p = plan("filter_eq_events")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("IsNotNull") || p.contains("EqualTo"), p.take(2000))
  }

  test("ISO-string range filter is pushed down to the orders scan") {
    val p = plan("recent_created_orders")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("GreaterThan") || p.contains("LessThan") ||
      p.contains("EqualTo"), p.take(2000))
  }

  test("star join broadcasts the dimension side") {
    assert(plan("join_star_region_rev").contains("BroadcastHashJoin"))
  }

  test("aggregation pipeline runs inside whole-stage codegen") {
    // AQE prints codegen spans only in the FINAL adaptive plan, and only
    // for the df's OWN QueryExecution (a write wraps a fresh one) — so
    // collect() first, then assert on the materialized plan's "*(n)"
    // codegen markers
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(500))
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(2000))
  }

  test("grid kNN join: equi-join candidates, rank bound compiles to " +
      "WindowGroupLimit, no cartesian product") {
    // the density-adaptive two-phase plan's promises: candidate
    // generation stays a partitionable equi-join (hash/sort-merge, never
    // a nested-loop/cartesian), and the per-point top-k prunes map-side
    val p = plan("grid_knn_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("sorted-neighborhood checkpoint is pinned to session width") {
    // round-11 cores-report fix: the ranked frame's localCheckpoint
    // freezes whatever partitioning the plan produced, and AQE's
    // byte-coalescing left the small bk exchange at 4-8 partitions — the
    // checkpoint must therefore be explicitly repartitioned to session
    // width, or every downstream scan (the w-1 pair join and the per-pair
    // intersect kernel, the query's CPU) runs narrow forever
    val docs = Tables.load(spark, sfDir, "documents")
    graft.dedup.Dedup.sortedNeighborhoodPairs(docs).queryExecution.analyzed
    val ranked = graft.dedup.Dedup.snmRankedForTest
    assert(ranked != null, "ranked frame hook not populated")
    assert(ranked.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      s"checkpoint width ${ranked.rdd.getNumPartitions} != session width " +
        s"${spark.sparkContext.defaultParallelism}")
  }

  test("grid candidate join keeps its explicit cell-key width") {
    // round-11 cores-report fix: the candidate-pair expansion is CPU-heavy
    // relative to its input bytes, so AQE's byte-based coalescing squeezed
    // the join to 4 tasks at 10x data. The explicit fixed-width
    // repartition on the cell keys must survive into the final physical
    // plan (user-specified numPartitions is exempt from AQE coalescing and
    // satisfies the join's distribution requirement, so no extra exchange)
    val cores = spark.sparkContext.defaultParallelism
    val df = SparkEntry.queries("grid_knn_join")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val pinned = p.linesIterator.filter(l =>
      l.contains("hashpartitioning(pcx") || l.contains("hashpartitioning(cx"))
    val widths = pinned.toSeq
    assert(widths.nonEmpty, "expected explicit cell-key hashpartitioning " +
      "exchanges in the candidate join\n" + p.take(3000))
    assert(widths.forall(_.contains(s", $cores)")),
      s"cell-key exchange not at session width $cores:\n" +
        widths.mkString("\n"))
  }

  test("SNM pair join: only the probe replicas shuffle") {
    // round-12 structure pin: the block join's build side IS the
    // checkpoint (declared hash(blk) layout) — the raw pair frame must
    // show exactly one hashpartitioning exchange (the 2x replica side)
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = graft.dedup.Dedup.sortedNeighborhoodPairs(docs)
    val n = hashExchangeCount(pairs)
    assert(n == 1, s"expected exactly the probe-side exchange ($n):\n" +
      pairs.queryExecution.executedPlan.toString.take(4000))
  }

  test("quantile_sketch_audit: no unpartitioned window over the raw column") {
    // round-13 fix pin: the exact-order-statistics leg previously ran
    // row_number().over(Window.orderBy(v)) — a single-partition sort of
    // the whole fact column. It now goes through Stats.bucketedCumsum, so
    // the ONLY unpartitioned windows allowed in the plan are the
    // O(#buckets) offset scans ordering by the bucket key `bk` or its
    // round-15 stand-in `bk_lo` (min(v) per bucket — same total order,
    // kept so the offsets branch stays canonically equal to the main
    // branch under column pruning; the window input is still the
    // O(#buckets) per-bucket-totals aggregate), or the O(k log n)
    // sketch-sample scan over `sv` — never the raw column `v`.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = SparkEntry.queries("quantile_sketch_audit")(spark, sfDir)
      .queryExecution.optimizedPlan
    val winds = lp.collect { case w: LWindow => w }
    assert(winds.nonEmpty, "expected window nodes in the plan")
    winds.filter(_.partitionSpec.isEmpty).foreach { w =>
      val ordCols = w.orderSpec.flatMap(_.child.references.toSeq).map(_.name)
      assert(ordCols.forall(n => n == "bk" || n == "bk_lo" || n == "sv"),
        s"unpartitioned window ordering by $ordCols — a single-partition " +
          s"sort of a fact-scale column:\n$w")
    }
  }

  test("window_cume_dist: no full-table window keyed only by priority") {
    // round-14 fix pin: the per-priority rank windows previously ran
    // Window.partitionBy(o_orderpriority) over the whole orders table —
    // 5 distinct values cap the sort at 5 tasks at any scale. The rank
    // now decomposes bucket-wise: every window that sees fact-scale rows
    // must partition by (priority, bk); a priority-only window is allowed
    // ONLY when its input is pruned below it — a Filter, an aggregation
    // (the O(#buckets) histogram), or a WindowGroupLimit (the rank-2
    // top-k: each scan partition keeps k rows per group BEFORE the
    // exchange, so the window sorts ≤ k·partitions rows).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Filter => LFilter, LogicalPlan, Window => LWindow, WindowGroupLimit => LWgl}
    val lp = SparkEntry.queries("window_cume_dist")(spark, sfDir)
      .queryExecution.optimizedPlan
    val winds = lp.collect { case w: LWindow => w }
    assert(winds.nonEmpty, "expected window nodes in the plan")
    winds.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.toSeq).map(_.name)
      // a table scan in the subtree (LogicalRelation / DataSourceV2
      // relation) marks a fact-scale input
      val overFact = w.child.collect {
        case r if r.nodeName.contains("Relation") => r
      }.nonEmpty
      // pruned means: EVERY relation leaf under the window has a
      // Filter/Aggregate/WindowGroupLimit on its path to the window — a
      // pruning node on one join branch (e.g. the broadcast histogram's
      // aggregate) must not excuse an unpruned fact scan on the other
      // (round-14 ADVICE: collectFirst accepted any pruning node
      // anywhere in the subtree)
      def prunedToLeaves(p: LogicalPlan): Boolean = p match {
        case _: LFilter | _: LAgg | _: LWgl => true
        case r if r.nodeName.contains("Relation") => false
        case other => other.children.forall(prunedToLeaves)
      }
      val pruned = prunedToLeaves(w.child)
      assert(partCols.contains("bk") || pruned || !overFact,
        s"window partitioned by $partCols over the unpruned fact scan — " +
          s"a 5-task sort at any scale:\n$w")
    }
    // the group-limit itself must be present and in the rank-2 branch:
    // without it the "pruned" window above would be a full 5-task sort
    assert(lp.collect { case g: LWgl => g }.nonEmpty,
      "expected the rank-2 branch to compile to WindowGroupLimit")
  }

  test("column pruning reaches the scan for a narrow projection") {
    // project_shape_docs reads a 2-column shape from documents: the scan's
    // ReadSchema must not include the wide text payload
    val p = plan("project_shape_docs")
    val read = p.linesIterator.find(_.contains("ReadSchema"))
    assert(read.isDefined, p.take(2000))
    assert(!read.get.contains("text"), read.get)
  }
}
