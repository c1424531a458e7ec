package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  /** Deterministic job-id-snapshot barrier for the memoization tests: the
    * status store is fed by the ASYNC listener bus, so a wall-clock sleep
    * is a race under load. `listenerBus` is private[spark]; reach it by
    * reflection and block until every queued event is delivered, falling
    * back to the old sleep if the (stable-since-2.x) internals ever move.
    */
  private def drainListenerBus(): Unit = {
    val sc = spark.sparkContext
    try {
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").get
        .invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .get.invoke(bus)
    } catch { case _: Throwable => Thread.sleep(1000) }
  }

  test("every registered query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query with an oracle has matching column sets are sane") {
    // Each oracle-backed query must exist in the queries map.
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("flagship: status filter + lexicographic date range + DESC order") {
    val df = SparkEntry.queries("recent_created_orders")(spark, sfDir)
    val rows = df.collect()
    assert(rows.forall(_.getString(3) == "O"))
    assert(rows.forall(_.getString(0) >= "1998-01-01"))
    val dates = rows.map(_.getString(0))
    assert(dates.zip(dates.tail).forall { case (a, b) => a >= b }, "not DESC")
  }

  test("recentByStatus keeps threshold-midnight rows (reference F2 subtlety)") {
    // '2020-01-15T08:00:00' >= '2020-01-15' lexicographically — included.
    import spark.implicits._
    val df = Seq(
      ("a", "created", "2020-01-15 08:00:00"),
      ("b", "created", "2020-01-14 23:59:59"),
      ("c", "draft", "2020-01-16 00:00:00")
    ).toDF("id", "st", "d").withColumn("d", to_timestamp($"d"))
    val out = Relational.recentByStatus(df, "st", "d", Seq("id"), "created", "2020-01-15")
    assert(out.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("window top-k emits at most k per partition, deterministically ranked") {
    val df = SparkEntry.queries("window_topk_per_customer")(spark, sfDir)
    val byCust = df.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(byCust <= 3)
  }

  test("pricing summary is decimal-exact (re-run equals itself)") {
    val a = SparkEntry.queries("agg_pricing_summary")(spark, sfDir).collect()
    val b = SparkEntry.queries("agg_pricing_summary")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("star join broadcasts every dimension") {
    val plan = SparkEntry.queries("join_star_region_rev")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("bucketed_join_agg merge-joins with no exchange below the join") {
    val df = SparkEntry.queries("bucketed_join_agg")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("BroadcastExchange"), s"join got broadcast:\n$plan")
    // the bucket layout satisfies the join's distribution requirement:
    // the only shuffle in the whole plan is the post-join partial-agg one
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected exactly one shuffle (the agg), got $shuffles:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("partitioned_scan_agg prunes to one partition directory") {
    val df = SparkEntry.queries("partitioned_scan_agg")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    // the status filter must reach the partition listing, not the data
    assert(scan.contains("o_orderstatus"), s"pruning column missing:\n$scan")
  }

  test("range_layout_scan_agg pushes the date filter into the pruned scan") {
    val df = SparkEntry.queries("range_layout_scan_agg")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    // the date predicates must reach the parquet reader as pushed filters
    // so row-group min/max stats prune the range-sorted files
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date filter not pushed:\n$scan")
    // result parity with the raw table (layout-invariant aggregate)
    val raw = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("revenue_cents"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(df.collect().toSeq == raw)
  }

  test("Q5-shape join plans one fact-fact join plus a broadcast halo") {
    val plan = SparkEntry.queries("join_local_supplier_volume")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"residual condition degenerated a join:\n$plan")
    // all four dimension joins broadcast; lineitem-orders is the only join
    // allowed to shuffle (at sf0.001 AQE may broadcast it too — assert the
    // dimension count, not the fact join's strategy)
    assert(plan.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 4, s"expected 4+ broadcast joins:\n$plan")
  }

  test("interval join keeps every error event and plans an equi join") {
    val df = SparkEntry.queries("range_join_click_error")(spark, sfDir)
    val nErrors = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "error").count()
    assert(df.count() == nErrors)
    // the user_id equi key must carry the join — no nested-loop fallback
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to nested loop:\n$plan")
  }

  test("full outer daily activity exercises both null sides") {
    val rows = SparkEntry.queries("full_outer_daily_activity")(spark, sfDir).collect()
    assert(rows.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0))
    assert(rows.exists(r => r.getLong(1) == 0 && r.getLong(2) > 0))
  }

  test("decimal-moment stddev/corr agree with the builtin estimators") {
    val m = SparkEntry.queries("agg_stats_moments")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val b = graft.Tables.load(spark, sfDir, "lineitem").groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    m.foreach { case (k, (s, c)) =>
      assert(math.abs(s - b(k)._1) < 1e-6, s"stddev $k: $s vs ${b(k)._1}")
      assert(math.abs(c - b(k)._2) < 1e-6, s"corr $k: $c vs ${b(k)._2}")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("ntile quartiles are 1..4 and stratified sampling respects quotas") {
    val q = SparkEntry.queries("window_lag_ntile")(spark, sfDir)
      .select("price_quartile").distinct().collect().map(_.getLong(0)).toSet
    assert(q.subsetOf(Set(1L, 2L, 3L, 4L)) && q.contains(1L))
    val strat = SparkEntry.queries("sample_stratified_docs")(spark, sfDir).collect()
    assert(strat.nonEmpty)
    strat.foreach { r =>
      val cap = r.getString(1) match { case "en" => 50; case "de" => 25; case _ => 10 }
      assert(r.getLong(2) < cap)
    }
    // determinism: identical sample on a re-run
    val again = SparkEntry.queries("sample_stratified_docs")(spark, sfDir).collect()
    assert(strat.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("profiler emits one consistent row per column in a single pass") {
    val p = SparkEntry.queries("profile_orders")(spark, sfDir).collect()
    assert(p.length == 5)
    assert(p.map(_.getLong(1)).toSet.size == 1) // same n_rows everywhere
    p.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) - r.getLong(2)) // ndv <= non-null count
      assert(r.isNullAt(4) != r.isNullAt(6)) // numeric XOR string min
    }
  }

  test("bloomSemiJoin is result-identical to a plain left_semi join") {
    val c = graft.Tables.load(spark, sfDir, "customer")
    val big = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    val bloom = Relational.bloomSemiJoin(c, "c_custkey", big, "o_custkey")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val plain = c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(bloom == plain)
  }

  test("bloom mask is memoized: a second semantically-equal build runs zero jobs") {
    val c = graft.Tables.load(spark, sfDir, "customer")
    val big = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    Relational.bloomSemiJoin(c, "c_custkey", big, "o_custkey") // warm the memo
    val big2 = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    // a memo hit needs NO Spark job (the mask .head() action is skipped) —
    // job-count is load-independent where a wall-clock bound is not
    drainListenerBus() // let the warm-up's jobs reach the status store
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    Relational.bloomSemiJoin(c, "c_custkey", big2, "o_custkey")
    drainListenerBus() // status store is fed by the async listener bus
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    assert(after == before, s"memoized construct ran jobs: ${after -- before}")
  }

  test("bloom pre-filter has no false negatives on a synthetic key set") {
    import spark.implicits._
    val probe = spark.range(0, 2000).toDF("pk")
    val build = spark.range(0, 10).toDF("bk")
    val out = Relational.bloomSemiJoin(probe, "pk", build, "bk")
    assert(out.as[Long].collect().toSet == (0L until 10L).toSet)
  }

  test("sessionize_batch agrees with the stateful streaming sessionizer") {
    val batch = SparkEntry.queries("sessionize_batch")(spark, sfDir)
    val stream = SparkEntry.queries("stream_sessionize")(spark, sfDir)
    assert(batch.count() == stream.count()) // same session boundaries
    val bTot = batch.agg(sum("n_events")).head().getLong(0)
    val sTot = stream.agg(sum("n_events")).head().getLong(0)
    assert(bTot == sTot) // every event in exactly one session on both paths
  }

  test("histogram buckets partition the table with monotone bounds") {
    val h = SparkEntry.queries("histogram_equidepth_price")(spark, sfDir).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val total = graft.Tables.load(spark, sfDir, "orders").count()
    assert(h.map(_.getLong(1)).sum == total)
    // bucket i's hi <= bucket i+1's lo (equi-depth ranges don't overlap)
    val bounds = h.map(r => (r.getDouble(2), r.getDouble(3)))
    bounds.zip(bounds.tail).foreach { case ((_, hi), (lo, _)) => assert(hi <= lo) }
  }

  test("replayed-then-deduped aggregation equals the pristine aggregation") {
    val dedup = SparkEntry.queries("stream_dedup_replay")(spark, sfDir).collect()
    val plain = SparkEntry.queries("stream_tumbling_counts")(spark, sfDir).collect()
    assert(dedup.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("events_latest_state: one row per user, counts cover the whole log") {
    val df = SparkEntry.queries("events_latest_state")(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == graft.Tables.events(spark, sfDir).count())
  }

  test("timeseries_gapfill: dense calendar, forward-filled gaps, one hash exchange") {
    val df = SparkEntry.queries("timeseries_gapfill")(spark, sfDir)
    val rows = df.collect()
    var sawGap = false
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      val d0 = java.time.LocalDate.parse(sorted.head.getString(1))
      val d1 = java.time.LocalDate.parse(sorted.last.getString(1))
      // dense: one row per day of the user's span, no holes
      assert(sorted.length ==
        java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1)
      // forward fill: a zero-event day carries the previous day's value
      var lastVal = Double.NaN
      sorted.foreach { r =>
        if (r.getLong(2) == 0) { sawGap = true; assert(r.getDouble(3) == lastVal) }
        else lastVal = r.getDouble(3)
      }
    }
    assert(sawGap, "test data produced no gap days — assertion vacuous")
    // the explicit user_id repartition must be the ONLY hash exchange:
    // the daily aggregate and the lead() window both reuse it (the
    // adaptive plan string repeats the tree under "== Initial Plan ==" —
    // count only the final section)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected a single hash exchange, got $hashEx:\n$plan")
  }

  test("window frames: replicated per-customer on the raw rows") {
    val rows = SparkEntry.queries("window_frame_audit")(spark, sfDir)
      .collect()
    val byCust = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_date(col("o_orderdate").cast("date")).cast("long").as("de"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(x => (x._3, x._2)).map(x => (x._2, x._4))
      }
    rows.groupBy(_.getLong(0)).foreach { case (cust, got) =>
      val seq = byCust(cust)
      val inOrder = got.sortBy(_.getLong(1))
        .sortBy(r => seq.indexWhere(_._1 == r.getLong(1)))
      inOrder.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == seq.head._2, "first_c")
        assert(r.getLong(3) == seq.last._2, "last_c")
        if (seq.length >= 2) assert(r.getLong(4) == seq(1)._2, "second_c")
        else assert(r.isNullAt(4))
        assert(r.getLong(5) ==
          seq.slice(math.max(0, i - 2), i).map(_._2).sum, "prev2_sum")
        assert(r.getLong(6) == (seq.length - i).toLong, "n_from_here")
      }
    }
  }

  test("KMV merge is lossless: sharded bottom-k reunion equals global") {
    val r = SparkEntry.queries("kmv_merge_audit")(spark, sfDir).head()
    assert(r.getBoolean(4), "bottom-k merge must be exact")
    val est = r.getDouble(5)
    val exact = r.getLong(6).toDouble
    assert(est > 0 && est / exact > 0.2 && est / exact < 5.0,
      s"estimate $est wildly off exact $exact")
  }

  test("theta sketch intersection: exact when both sets fit the sketch, " +
    "theta is the min threshold") {
    val r = SparkEntry.queries("theta_intersect_users")(spark, sfDir).head()
    val (kA, kthA, kB, kthB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val theta = r.getLong(4)
    val nCommon = r.getLong(5)
    val est = r.getDouble(6)
    val exact = r.getLong(7)
    val p = graft.text.TextOps.P
    // theta = min of the two per-sketch thresholds (P when undersubscribed)
    val tA = if (kA < 256) p else kthA
    val tB = if (kB < 256) p else kthB
    assert(theta == math.min(tA, tB))
    // when both sketches retained everything, the "estimate" IS exact
    if (kA < 256 && kB < 256) {
      assert(theta == p && nCommon == exact)
      assert(math.abs(est - exact.toDouble) < 1e-6)
    } else {
      // sketch estimate within a loose multiplicative band of exact
      assert(est >= 0.0)
      if (exact > 0) assert(est / exact > 0.2 && est / exact < 5.0,
        s"estimate $est wildly off exact $exact")
    }
  }

  test("holt_winters_daily matches a sequential scala recomputation") {
    val got = SparkEntry.queries("holt_winters_daily")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(_._2)
      val xs = rows.map(_._3)
      if (xs.length >= 2) {
        var l = xs(0)
        var b = xs(1) - xs(0)
        val sea = Array.fill(7)(0.0)
        // position 1 = init state
        assert(math.abs(rows(0)._4 - l) < 1e-9)
        assert(math.abs(rows(0)._5 - b) < 1e-9)
        assert(rows(0)._6 == 0.0)
        for (t <- 2 to xs.length) {
          val x = xs(t - 1)
          val slot = (t - 1) % 7
          val sOld = sea(slot)
          val l2 = 0.5 * (x - sOld) + 0.5 * (l + b)
          val b2 = 0.25 * (l2 - l) + 0.75 * b
          sea(slot) = 0.25 * (x - l2) + 0.75 * sOld
          l = l2; b = b2
          val row = rows(t - 1)
          assert(math.abs(row._4 - l) < 1e-6 * math.max(1.0, math.abs(l)), s"level t=$t")
          assert(math.abs(row._5 - b) < 1e-6 * math.max(1.0, math.abs(b)), s"trend t=$t")
          assert(math.abs(row._6 - sea(slot)) < 1e-6 * math.max(1.0, math.abs(sea(slot))),
            s"seasonal t=$t")
          val fc = l + b + sea(t % 7)
          assert(math.abs(row._7 - fc) < 1e-6 * math.max(1.0, math.abs(fc)), s"forecast t=$t")
        }
      }
    }
  }

  test("score_auc_langid equals the pairwise-comparison AUC definition") {
    val r = Stats.queries("score_auc_langid")(spark, sfDir).head()
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(x => (x.getString(0), x.getString(1)))
      .map { case (lang, text) =>
        // engine semantics: split(trim(text), "\\s+") yields [""] for an
        // empty text (size 1), so toks is never 0 here
        val toks = text.trim.split("\\s+")
        (lang == "en", toks.distinct.length.toLong * 1000000L / toks.length)
      }
    val pos = docs.filter(_._1).map(_._2)
    val neg = docs.filterNot(_._1).map(_._2)
    var u = 0.0
    for (p0 <- pos; n0 <- neg) {
      if (p0 > n0) u += 1.0 else if (p0 == n0) u += 0.5
    }
    val auc = u / (pos.length.toDouble * neg.length.toDouble)
    assert(r.getLong(0) == pos.length.toLong && r.getLong(1) == neg.length.toLong)
    assert(math.abs(r.getDouble(3) - auc) < 1e-9, s"auc ${r.getDouble(3)} vs $auc")
  }

  test("rolling_corr_daily: full windows only, |corr| <= 1, one window " +
    "matches brute force") {
    val rows = SparkEntry.queries("rolling_corr_daily")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4.isNaN || math.abs(r._4) <= 1.0 + 1e-12))
    val daily = graft.Tables.load(spark, sfDir, "orders")
      .groupBy(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(
        org.apache.spark.sql.functions.sum(
          (org.apache.spark.sql.functions.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("x"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length == daily.length - 27)
    // brute-force the last emitted window
    val win = daily.takeRight(28)
    val n = 28.0
    val sx = win.map(_._2).sum.toDouble
    val sy = win.map(_._3).sum.toDouble
    val sxx = win.map(w => BigInt(w._2) * w._2).sum.toDouble
    val syy = win.map(w => BigInt(w._3) * w._3).sum.toDouble
    val sxy = win.map(w => BigInt(w._2) * w._3).sum.toDouble
    val corr = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rows.last._4 - corr) < 1e-9, s"${rows.last._4} vs $corr")
  }

  test("join_incremental_refresh: delta maintenance equals full recompute") {
    val rows = SparkEntry.queries("join_incremental_refresh")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"inconsistent refresh row: $r")
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) == r.getLong(5))
    }
    // the delta is non-trivial (cut date splits the data)
    assert(rows.map(_.getLong(1)).sum > 0)
    assert(rows.map(r => r.getLong(2) - r.getLong(1)).sum > 0)
  }

  test("funnel latency: quartiles ordered, mean consistent, brute count") {
    val r = SparkEntry.queries("funnel_latency_quartiles")(spark, sfDir).head()
    val (n, q1, med, q3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0)
    assert(q1 <= med && med <= q3)
    assert(q1 >= 0)
    val ev = graft.Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")).as("t"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val lats = ev.filter(_._2 == "view").groupBy(_._1)
      .flatMap { case (u, vs) =>
        val tv = vs.map(_._3).min
        val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= tv)
        if (ps.isEmpty) None else Some(ps.map(_._3).min - tv)
      }.toVector.sorted
    assert(n == lats.length.toLong)
    assert(med == lats((((lats.length + 1) / 2) - 1).max(0)))
    val mean = lats.sum.toDouble / lats.length / 1e6
    assert(math.abs(r.getDouble(4) - mean) < 1e-9 * math.max(1.0, mean))
  }

  test("null-safe join audit: identity holds and the NULL group is exercised") {
    val r = SparkEntry.queries("join_null_safe_audit")(spark, sfDir).head()
    assert(r.getBoolean(3))
    assert(r.getLong(2) > 0, "no NULL pairs — the <=> path is vacuous")
    assert(r.getLong(1) == r.getLong(0) + r.getLong(2))
  }

  test("bitmap intersection is exact and word counts reconcile") {
    val r = SparkEntry.queries("bitmap_intersect_users")(spark, sfDir).head()
    assert(r.getBoolean(6), "bitmap AND must equal the exact intersection")
    val ev = graft.Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("event_type", "user_id").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val clicks = ev.filter(_._1 == "click").map(_._2).toSet
    val buys = ev.filter(_._1 == "purchase").map(_._2).toSet
    assert(r.getLong(0) == clicks.size.toLong)
    assert(r.getLong(2) == buys.size.toLong)
    assert(r.getLong(4) == clicks.intersect(buys).size.toLong)
    assert(r.getLong(1) == clicks.map(_ / 63).size.toLong)
    assert(r.getLong(3) == buys.map(_ / 63).size.toLong)
  }

  test("gdpr cascade: clean flags hold and removals match brute force") {
    val rows = SparkEntry.queries("gdpr_delete_cascade")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    assert(rows.values.forall(_._4), "a survivor still references a deleted key")
    rows.values.foreach { case (total, removed, after, _) =>
      assert(total == removed + after)
    }
    val delCust = graft.Tables.load(spark, sfDir, "customer").collect()
      .map(_.getLong(0)).filter(_ % 97 == 0).toSet
    assert(rows("customer")._2 == delCust.size.toLong)
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delOrders = orders.filter(o => delCust.contains(o._2)).map(_._1).toSet
    assert(rows("orders")._2 == delOrders.size.toLong)
    val delLi = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
      .count(delOrders.contains)
    assert(rows("lineitem")._2 == delLi.toLong)
  }

  test("multiset audit: bag identity and brute-force EXCEPT ALL") {
    val r = SparkEntry.queries("set_multiset_audit")(spark, sfDir).head()
    assert(r.getBoolean(6), "|A| must equal |A EXCEPT ALL B| + |A INTERSECT ALL B|")
    val ev = graft.Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("event_type", "user_id").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    def multi(t: String) = ev.filter(_._1 == t).groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    val ma = multi("click")
    val mb = multi("purchase")
    val exceptAll = ma.map { case (k, n) => math.max(0L, n - mb.getOrElse(k, 0L)) }.sum
    val intersectAll = ma.map { case (k, n) => math.min(n, mb.getOrElse(k, 0L)) }.sum
    assert(r.getLong(2) == exceptAll)
    assert(r.getLong(3) == intersectAll)
    assert(r.getLong(4) == ma.keySet.count(k => !mb.contains(k)).toLong)
    assert(r.getLong(5) == ma.keySet.count(mb.contains).toLong)
  }

  test("merge upsert: updates repriced, inserts re-keyed, keeps untouched") {
    val rows = SparkEntry.queries("merge_upsert_orders")(spark, sfDir).collect()
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val byAction = rows.groupBy(_.getString(3))
    assert(byAction("insert").length == orders.keysIterator.count(_ % 10 == 3))
    assert(byAction("update").length == orders.keysIterator.count(_ % 10 == 0))
    assert(rows.length == orders.size + byAction("insert").length)
    byAction("update").foreach { r =>
      val (_, price) = orders(r.getLong(0))
      assert(r.getString(1) == "X" && r.getDouble(2) == price * 1.1)
    }
    byAction("keep").foreach { r =>
      val (status, price) = orders(r.getLong(0))
      assert(r.getString(1) == status && r.getDouble(2) == price)
    }
  }

  test("label propagation matches an independent in-memory sync replication") {
    val got = SparkEntry.queries("community_labelprop")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val parts = grp.map(_._2).distinct
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val nbrs = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSeq }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to graft.ops.Relational.LpRounds) {
      lbl = nbrs.map { case (n, nb) =>
        val counts = nb.map(lbl).groupBy(identity).map { case (l, v) => (l, v.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.groupBy(_._2).map { case (l, m) =>
      (l, m.size.toLong, m.keys.min)
    }.toSeq.sortBy { case (l, sz, _) => (-sz, l) }.take(20)
    assert(got.toSeq == want)
  }

  test("pagerank matches an independent in-memory fixed-point replication") {
    val got = SparkEntry.queries("pagerank_parts")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // rebuild the graph and iterate with plain Long arithmetic
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val parts = grp.map(_._2).distinct
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val one = 1000000000000L
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> one }
    for (_ <- 1 to 3) {
      val contrib = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = contrib.map { case (n, s) => n -> (15L * one / 100 + 85L * s / 100) }
    }
    val want = rank.toSeq.sortBy { case (n, r) => (-r, n) }.take(20)
    assert(got.toSeq == want, s"spark=$got expected=$want")
  }

  test("pagerank shuffle-join mode is hash-identical to broadcast mode and reuses the memoized graph") {
    val bc = graft.ops.Relational.pageRankParts(spark, sfDir).collect().toSeq
    // second construction must hit the (session, dir) graph memo: the
    // eager-checkpointed edge build is NOT re-run, so plan construction
    // launches no Spark job (job-count is load-independent where a
    // wall-clock bound is not)
    drainListenerBus() // let the warm-up's jobs reach the status store
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    val sh = graft.ops.Relational.pageRankParts(spark, sfDir, broadcastRanks = false)
    drainListenerBus() // status store is fed by the async listener bus
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    assert(after == before, s"memoized construct ran jobs: ${after -- before}")
    assert(sh.collect().toSeq == bc)
  }

  test("triangle counts match an independent in-memory closure") {
    val got = SparkEntry.queries("graph_triangle_counts")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val parts = grp.map(_._2).distinct
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val nbrs = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val want = nbrs.toSeq.map { case (n, nb) =>
      val t = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => nbrs(a).contains(b) }.toLong
      val d = nb.size.toLong
      (n, t, d, 2.0 * t / (d * (d - 1)).toDouble)
    }.filter(_._2 > 0)
      .sortBy { case (n, t, _, _) => (-t, n) }.take(20)
    assert(got.toSeq == want, s"spark=${got.toSeq} expected=$want")
  }

  test("chunked triangle adjacency equals the unchunked form") {
    // chunk=3 forces many slices per hub vertex, exercising slice-pair
    // overlap pruning and the union-of-slice-intersections identity
    val base = graft.ops.Relational.triangleCounts(spark, sfDir, 0)
      .collect().map(_.toString).toSeq
    val chunked = graft.ops.Relational.triangleCounts(spark, sfDir, 3)
      .collect().map(_.toString).toSeq
    assert(chunked == base)
  }

  test("HLL sliding distinct tracks the exact sliding distinct within 5%") {
    val exact = SparkEntry.queries("sliding_distinct_users")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Relational
      .hllSlidingDistinct(graft.Tables.events(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val est = approx(d)
      assert(math.abs(est - n) <= math.max(1L, (0.05 * n).toLong),
        s"day $d: exact=$n hll=$est")
    }
    // Aggregate-bias gate (round-10 ADVICE): per-window tails need the
    // wide 5-8% tolerance, but the MEAN relative error across all windows
    // shrinks ~1/sqrt(windows) for an unbiased estimator — a systematic
    // ~5% estimator bias (wrong union, off-by-constant) passes every
    // per-window gate yet trips this one. The threshold scales with the
    // window count (round-11 ADVICE): at 1-2 windows a legitimate 4-5%
    // single-window error must not trip the mean gate that the per-window
    // gate just allowed, while at 30+ windows the mean of unbiased noise
    // sits well under 4%.
    val meanRelErr = exact.toSeq.map { case (d, n) =>
      math.abs(approx(d) - n).toDouble / math.max(1L, n) }.sum / exact.size
    val gate = math.max(0.04, 0.05 / math.sqrt(exact.size.toDouble))
    assert(meanRelErr <= gate,
      f"mean relative error $meanRelErr%.4f > $gate%.4f (${exact.size} windows)")
  }

  test("cdc apply: last writer wins, tombstones drop, re-inserts survive") {
    val rows = SparkEntry.queries("cdc_apply_orders")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    val keys = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    keys.foreach { k =>
      if (k % 20 == 0)     // update -> delete -> re-insert: last op wins
        assert(rows(k) == ("R", "upsert"), s"k=$k ${rows.get(k)}")
      else if (k % 10 == 0) // update -> delete: tombstone drops the row
        assert(!rows.contains(k), s"k=$k should be deleted")
      else if (k % 5 == 0)  // single update applies
        assert(rows(k) == ("U", "upsert"), s"k=$k ${rows.get(k)}")
      else                  // untouched rows survive unchanged
        assert(rows(k)._2 == "keep", s"k=$k ${rows.get(k)}")
    }
    assert(rows.size == keys.length - keys.count(k => k % 10 == 0 && k % 20 != 0))
  }

  test("trend lines match exact integer sums fed through the same formula") {
    val got = SparkEntry.queries("trend_daily_revenue")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val daily = graft.Tables.load(spark, sfDir, "orders").collect()
      .map { r =>
        val day = r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toLocalDate.toEpochDay
        val cents = BigDecimal(r.getDouble(r.fieldIndex("o_totalprice")))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
        (r.getString(r.fieldIndex("o_orderpriority")), day, cents.toLongExact)
      }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((p, x), rows) => (p, x, rows.map(_._3).sum) }
    val want = daily.groupBy(_._1).toSeq.map { case (p, ds) =>
      val n = ds.length.toLong
      val sx = ds.map(_._2).sum
      val sy = ds.map(_._3).sum
      val sxy = ds.map(d => BigInt(d._2) * BigInt(d._3)).sum
      val sxx = ds.map(d => d._2 * d._2).sum
      val (nd, sxd, syd, sxyd, sxxd) =
        (n.toDouble, sx.toDouble, sy.toDouble, sxy.toDouble, sxx.toDouble)
      val slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
      (p, n, slope, (syd - slope * sxd) / nd)
    }.sortBy(_._1)
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
  }

  test("sole-problem-supplier decorrelation matches the naive correlated scan") {
    val got = SparkEntry.queries("sql_sole_problem_supplier")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val names = graft.Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = li.groupBy(_._1)
    val waiting = li.filter { case (o, s, rf) =>
      rf == "R" &&
        byOrder(o).exists(l2 => l2._2 != s) &&
        !byOrder(o).exists(l3 => l3._2 != s && l3._3 == "R")
    }
    val want = waiting.groupBy(l => names(l._2))
      .map { case (n, ls) => (n, ls.length.toLong) }.toSeq
      .sortBy { case (n, w) => (-w, n) }.take(20)
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
  }

  test("rolling median matches sorted-frame selection in memory") {
    val got = SparkEntry.queries("rolling_median_revenue")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val daily = graft.Tables.load(spark, sfDir, "orders").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toLocalDate.toString,
        // mirror dsum: each double price rounds to cents in decimal(18,2)
        BigDecimal(r.getDouble(r.fieldIndex("o_totalprice")))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).toSeq
      .map { case (d, rows) => d -> rows.map(_._2).sum.toDouble }
      .sortBy(_._1)
    val want = daily.sliding(7).map { frame =>
      (frame.last._1, frame.last._2, frame.map(_._2).sorted.apply(3))
    }.toSeq
    assert(got.toSeq == want, s"first diff: ${
      got.toSeq.zip(want).find { case (a, b) => a != b }}")
  }

  test("ewma matches the sequential recurrence and smooths the series") {
    val got = SparkEntry.queries("ewma_daily_revenue")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val days = rows.sortBy(_._2)
      // y_0 = x_0; y_t = 0.75*y_{t-1} + 0.25*x_t, replayed sequentially
      var y = days.head._3
      assert(days.head._4 == y)
      days.tail.foreach { case (_, _, x, e) =>
        y = y * 0.75 + x * 0.25
        assert(e == y, s"ewma drift at $x: $e != $y")
      }
      // smoothing: the ewma series varies less than the raw series
      def variance(xs: Seq[Double]): Double = {
        val m = xs.sum / xs.size
        xs.map(v => (v - m) * (v - m)).sum / xs.size
      }
      assert(variance(days.map(_._4).toSeq) <= variance(days.map(_._3).toSeq))
    }
  }

  test("dq constraint suite: six checks, all passing on the generated data") {
    val rows = SparkEntry.queries("dq_constraint_checks")(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getBoolean(2)), rows.mkString("; "))
    val m = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("orderkey_unique") == 1.0 && m("custkey_complete") == 1.0)
    assert(m("row_count_positive") > 0.0)
  }

  test("table_stats_catalog: one row per column, stats internally consistent") {
    val rows = SparkEntry.queries("table_stats_catalog")(spark, sfDir).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (n, nulls, ndv) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nulls >= 0 && nulls <= n)
      assert(ndv >= 1 && ndv <= n - nulls, s"${r.getString(1)}: ndv=$ndv")
      assert(r.getString(5) <= r.getString(6) ||
        r.getString(1).endsWith("key") || r.getString(1).endsWith("number"),
        s"${r.getString(1)}: min>max as strings (numeric cols exempt)")
    }
    // a known exact NDV: o_orderstatus has the three TPC-H statuses
    val st = rows.find(r => r.getString(1) == "o_orderstatus").get
    assert(st.getLong(4) == 3 && st.getString(5) == "F" && st.getString(6) == "P")
  }

  test("histogram_equidepth: monotone boundaries hitting exact target ranks") {
    val rows = SparkEntry.queries("histogram_equidepth")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Relational.HistBuckets)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq) // monotone uppers
    // recompute the order statistics directly from the data
    val vals = graft.Tables.load(spark, sfDir, "lineitem")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v")).collect().map(_.getLong(0)).sorted
    rows.foreach { case (_, rank, upper) =>
      assert(vals(rank.toInt - 1) == upper,
        s"boundary at rank $rank: got $upper want ${vals(rank.toInt - 1)}")
    }
    assert(rows.last._3 == vals.last) // last bucket closes at the max
  }

  test("compaction_plan: bins filled in day order, totals near target") {
    val rows = SparkEntry.queries("compaction_plan")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // bin ids are non-decreasing in day order and start at 0
    assert(rows.head._3 == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 >= a._3; case _ => true })
    // per-bin totals agree with the per-day rows they aggregate
    rows.groupBy(_._3).foreach { case (_, ds) =>
      assert(ds.map(_._2).sum == ds.head._4)
    }
    // every non-final bin reached the target before closing (the closed-form
    // policy: a bin only ends once its cumulative start passes the boundary)
    val maxBin = rows.map(_._3).max
    rows.groupBy(_._3).filter(_._1 < maxBin).foreach { case (bin, ds) =>
      assert(ds.head._4 + ds.map(_._2).max > Relational.CompactTargetRows,
        s"bin $bin closed below target")
    }
  }

  test("markov stationary matches a driver-side fixed-point brute force") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .collect()
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var prevUser: Any = null
    var prevType: String = null
    ev.foreach { r =>
      val u = r.get(0)
      val t = r.getString(1)
      if (u == prevUser) {
        val k = (prevType, t)
        pairs(k) = pairs.getOrElse(k, 0L) + 1
      }
      prevUser = u
      prevType = t
    }
    val fromN = pairs.toSeq.groupBy(_._1._1)
      .map { case (f, g) => (f, g.map(_._2).sum) }
    val states = ev.map(_.getString(1)).distinct.sorted
    val m = states.length
    var pi = states.map(st => st -> (Relational.MarkovFp / m)).toMap
    for (_ <- 1 to Relational.MarkovIters) {
      val nxt = scala.collection.mutable.HashMap.empty[String, Long]
      pairs.foreach { case ((f, t), n) =>
        nxt(t) = nxt.getOrElse(t, 0L) + pi(f) * n / fromN(f)
      }
      pi = states.map(st => st -> nxt.getOrElse(st, 0L)).toMap
    }
    val got = SparkEntry.queries("markov_stationary")(spark, sfDir).collect()
    assert(got.length == m)
    got.foreach { r =>
      assert(r.getLong(1) == pi(r.getString(0)),
        s"state ${r.getString(0)}: ${r.getLong(1)} vs ${pi(r.getString(0))}")
      assert(r.getDouble(2) == r.getLong(1).toDouble / Relational.MarkovFp)
    }
    // mass conserved up to integer-div truncation (a few units per round)
    val mass = got.map(_.getLong(1)).sum
    assert(mass <= Relational.MarkovFp)
    assert(mass > Relational.MarkovFp * 9L / 10L)
  }

  test("graph adjacency checkpoint does NOT declare a layout") {
    // round-12 adjudication: re-declaring hash(src) on this checkpoint
    // (Bridge.tagHashPartitioned) was A/B-measured and REVERTED — the
    // elided consumer-side exchanges were AQE's re-plan/materialization
    // points, and losing them regressed triangles 7.9 -> 34 s at sf1
    // (derived-frame recompute + static payload-sort SMJs). This pins
    // the DECISION: the adjacency checkpoint must stay
    // UnknownPartitioning so consumers keep their adaptive exchanges.
    val adj = Relational.pageRankGraph(spark, sfDir)
    adj.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        assert(!lr.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning],
          s"adjacency checkpoint re-tagged (${lr.outputPartitioning}) — " +
            "see the round-12 sf1 A/B before re-introducing this")
      case other => fail(s"expected a checkpointed LogicalRDD, got $other")
    }
  }
}
