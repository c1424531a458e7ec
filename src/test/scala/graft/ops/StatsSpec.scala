package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Ground-truth tests for the [[Stats]] inference family — brute-force
  * recomputation at sf0.001 (engine parity is the DuckDB oracle's job).
  */
class StatsSpec extends SparkSpec {

  private def dailySeries: Vector[(Long, Long)] =
    Tables.load(spark, sfDir, "orders")
      .groupBy(unix_date(col("o_orderdate").cast("date")).cast("long").as("x"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector.sortBy(_._1)

  test("cusum_changepoint: scaled cusum matches the sequential definition") {
    val got = Stats.queries("cusum_changepoint")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toVector
    val d = dailySeries
    val n = d.size.toLong
    val t = d.map(_._2).sum
    var pre = 0L
    val want = d.zipWithIndex.map { case ((x, v), i0) =>
      pre += v
      (x, n * pre - (i0 + 1) * t)
    }
    val mx = want.map(w => math.abs(w._2)).max
    assert(got == want.map { case (x, c) => (x, c, math.abs(c) == mx) })
    // the cusum of the FULL series is zero by construction
    assert(want.last._2 == 0L)
  }

  test("ks_test_price: integer D matches a brute-force ECDF sweep") {
    val r = Stats.queries("ks_test_price")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = o.filter(_._1 == Stats.KsStatusA).map(_._2).sorted
    val b = o.filter(_._1 == Stats.KsStatusB).map(_._2).sorted
    val na = a.length.toLong
    val nb = b.length.toLong
    val thresholds = (a ++ b).distinct.sorted
    val dn = thresholds.map { x =>
      val ca = a.count(_ <= x).toLong
      val cb = b.count(_ <= x).toLong
      math.abs(ca * nb - cb * na)
    }.max
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (na, nb, dn))
    assert(row.getDouble(4) == dn.toDouble / (na.toDouble * nb.toDouble))
  }

  test("theil_sen_trend: lower-median pairwise slope matches brute force") {
    val r = Stats.queries("theil_sen_trend")(spark, sfDir).collect()
    assert(r.length == 1)
    val d = dailySeries
    val slopes = for {
      i <- d.indices
      j <- (i + 1) until d.size
    } yield ((d(j)._2 - d(i)._2).toDouble / (d(j)._1 - d(i)._1).toDouble,
      d(i)._1, d(j)._1)
    val sorted = slopes.sortBy(s => (s._1, s._2, s._3))
    val m = sorted.size
    val want = sorted((m + 1) / 2 - 1)._1
    assert(r.head.getLong(0) == d.size.toLong)
    assert(r.head.getLong(1) == m.toLong)
    assert(r.head.getDouble(2) == want)
  }

  test("theil_sen_trend: distributed selection above the driver-day cap is exact") {
    // force the distributed path (cap below any real calendar) and pin it
    // bit-equal to the driver path — a 100-year corpus must not change the
    // answer, only where the C(n,2) slope array lives
    val driver = Stats.theilSenTrend(spark, sfDir).collect().head
    val dist = Stats.theilSenTrend(spark, sfDir, maxDriverDays = 1)
      .collect().head
    assert(dist.getLong(0) == driver.getLong(0))
    assert(dist.getLong(1) == driver.getLong(1))
    assert(dist.getDouble(2) == driver.getDouble(2))
  }

  test("spearman_qty_price: rho matches brute-force tie-averaged ranks") {
    val r = Stats.queries("spearman_qty_price")(spark, sfDir).collect()
    assert(r.length == 1)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_quantity").cast("decimal(12,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def r2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sortedKeys = cnt.keys.toVector.sorted
      var cum = 0L
      sortedKeys.map { k =>
        cum += cnt(k)
        k -> (2 * cum - cnt(k) + 1)
      }.toMap
    }
    val rq = r2(li.map(_._1).toIndexedSeq)
    val rp = r2(li.map(_._2).toIndexedSeq)
    val xs = li.map(p => rq(p._1))
    val ys = li.map(p => rp(p._2))
    val n = li.length.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
    val syy = ys.map(y => BigInt(y) * BigInt(y)).sum
    val rho = (n * sxy.toDouble - sx * sy) /
      (math.sqrt(n * sxx.toDouble - sx * sx) *
        math.sqrt(n * syy.toDouble - sy * sy))
    assert(math.abs(r.head.getDouble(3) - rho) < 1e-12)
    // the synthetic generator draws price independent of quantity — the
    // point of the spec is the rank math, pinned exactly above; the value
    // itself just needs to be a valid correlation
    assert(math.abs(r.head.getDouble(3)) <= 1.0)
  }

  test("benford_totalprice: shares sum to one, digits complete") {
    val rows = Stats.queries("benford_totalprice")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sfDir, "orders").count())
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // expectations are the shared literals, in digit order
    assert(rows.map(_.getDouble(3)).toSeq ==
      Stats.BenfordShares.map(_._2.toDouble))
  }

  test("link_pred_hub_overlap: counts match a brute-force neighbor check") {
    val rows = Stats.queries("link_pred_hub_overlap")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Stats.LinkTopK)
    // brute force the co-occurrence adjacency
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    byOrder.values.foreach { ps =>
      for (u <- ps; w <- ps if u != w)
        adj(u) = adj.getOrElse(u, Set.empty) + w
    }
    rows.foreach { r =>
      val (u, w) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == adj(u).size.toLong, s"du of $u")
      assert(r.getLong(3) == adj(w).size.toLong, s"dw of $w")
      assert(r.getLong(4) == (adj(u) & adj(w)).size.toLong, s"cn of ($u,$w)")
      assert(r.getBoolean(5) == adj(u).contains(w), s"is_edge of ($u,$w)")
    }
    // ranked by n_common desc
    val cns = rows.map(_.getLong(4)).toSeq
    assert(cns == cns.sortBy(-_))
  }

  test("user_event_diversity: gini-simpson matches brute force") {
    val got = Stats.queries("user_event_diversity")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ev.groupBy(_._1).toVector.sortBy(_._1).map { case (u, es) =>
      val n = es.length.toLong
      val ss = es.groupBy(_._2).values.map(g => g.size.toLong * g.size).sum
      (u, n, es.map(_._2).distinct.length.toLong,
        (n * n - ss).toDouble / (n * n).toDouble)
    }
    assert(got.toVector == want)
  }

  test("mann_whitney_price: U statistics match brute-force rank sums") {
    val r = Stats.queries("mann_whitney_price")(spark, sfDir).collect().head
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .filter(p => p._1 == Stats.KsStatusA || p._1 == Stats.KsStatusB)
    val pooled = o.map(_._2).sorted
    // doubled tie-averaged rank per value
    val r2 = pooled.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2 + 1).map(_.toLong).sum * 2 / xs.length)
    }
    val a = o.filter(_._1 == Stats.KsStatusA).map(_._2)
    val na = a.length.toLong
    val nb = o.length - na
    val r2a = a.map(r2).sum
    val u2a = r2a - na * (na + 1)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (na, nb, u2a))
    assert(r.getLong(3) == na * nb * 2 - u2a) // U_A + U_B = n_A·n_B
  }

  test("stl_decompose_daily: components re-add to the series exactly") {
    val rows = Stats.queries("stl_decompose_daily")(spark, sfDir).collect()
    assert(rows.length == dailySeries.size - 6) // full 7-day windows only
    rows.foreach { r =>
      val v = r.getLong(1).toDouble
      val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(v - recon) < 1e-6, s"day ${r.getLong(0)}")
    }
    // weekday effect table is shared: same dow ⇒ same seasonal
    val byDow = rows.groupBy(r => (r.getLong(0) + 4) % 7)
      .view.mapValues(_.map(_.getDouble(3)).distinct.size)
    assert(byDow.values.forall(_ == 1))
  }

  test("ams_f2_users: estimators are exact given the signs, mostly in bound") {
    val rows = Stats.queries("ams_f2_users")(spark, sfDir).collect()
    assert(rows.length == Stats.AmsK)
    val counts = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .select(col("user_id").cast("string"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val f2 = counts.map(c => c._2 * c._2).sum
    assert(rows.head.getLong(2) == f2)
    val p = graft.text.TextOps.P
    def h(s: String): Long = s.foldLeft(0L)((a, ch) => (a * 31 + ch) % p)
    rows.foreach { r =>
      val j = r.getInt(0)
      val sj = counts.map { case (u, c) =>
        val bit = (h(u) * (1103515245L + 2L * j) + j) % p % 2
        (1 - 2 * bit) * c
      }.sum
      assert(r.getLong(1) == sj * sj, s"estimator $j")
    }
    // the sketch should work: majority of estimators within the 2x bound
    assert(rows.count(_.getBoolean(3)) > Stats.AmsK / 2)
  }

  test("emb_covariance: matches driver-side quantized covariance") {
    val rows = Stats.queries("emb_covariance")(spark, sfDir).collect()
    assert(rows.length == Stats.EmbDim * (Stats.EmbDim + 1) / 2)
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * Stats.EmbQScale + 0.5).toLong))
    val n = vecs.length.toLong
    // spot-check a handful of (i,j) cells incl. diagonal corners
    val probes = Seq((0, 0), (0, 1), (5, 40), (63, 63))
    val byIj = rows.map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    probes.foreach { case (i, j) =>
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val sx = vecs.map(_(i)).sum
      val sy = vecs.map(_(j)).sum
      val r = byIj((i, j))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        (n, sx, sy, sxy), s"cell ($i,$j)")
      val cov = (BigInt(n) * BigInt(sxy) - BigInt(sx) * BigInt(sy)).toDouble /
        (n.toDouble * n.toDouble) / Stats.EmbQScale2
      assert(math.abs(r.getDouble(6) - cov) < 1e-12, s"cov ($i,$j)")
    }
  }

  test("jaro-winkler kernel reproduces the textbook values") {
    import graft.functions.StringKernels.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(jaroWinkler(u("martha"), u("marhta")) == 0.9611111111111111)
    assert(jaroWinkler(u("dwayne"), u("duane")) == 0.8400000000000001)
    assert(jaroWinkler(u("abc"), u("abc")) == 1.0)
    assert(jaroWinkler(u("ab"), u("")) == 0.0)
    assert(jaroWinkler(u(""), u("")) == 1.0)
    // symmetric on an unrelated pair
    assert(jaroWinkler(u("kiwi"), u("plum")) == jaroWinkler(u("plum"), u("kiwi")))
  }

  test("kcore_profile: matches a brute-force synchronous peel") {
    val rows = Relational.queries("kcore_profile")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == Relational.KcoreRounds + 1)
    // brute force the graph + peel
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).toSet
      for (u <- ps; w <- ps if u != w) adj(u) = adj.getOrElse(u, Set.empty) + w
    }
    val k = adj.values.map(_.size).max / 2
    var nodes = adj.keySet.toSet
    def edges(ns: Set[Long]): Long =
      ns.toSeq.map(u => (adj(u) & ns).size.toLong).sum
    var expect = Vector((0, k.toLong, nodes.size.toLong, edges(nodes)))
    for (r <- 1 to Relational.KcoreRounds) {
      nodes = nodes.filter(u => (adj(u) & nodes).size >= k)
      expect :+= ((r, k.toLong, nodes.size.toLong, edges(nodes)))
    }
    assert(rows.toVector == expect)
    // survivors are monotone non-increasing
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
  }

  test("gini_best_split: argmin matches brute-force impurity scan") {
    val r = Stats.queries("gini_best_split")(spark, sfDir).collect().head
    val li = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        col("l_returnflag"))
      .collect().map(x => (x.getLong(0) / Stats.GiniBucketWidth, x.getString(1)))
    val byB = li.groupBy(_._1).view
      .mapValues(g => g.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val bks = byB.keys.toVector.sorted
    val classes = Seq("A", "N", "R")
    val tot = classes.map(c => byB.values.map(_.getOrElse(c, 0L)).sum)
    val n = tot.sum
    var best = (Double.MaxValue, Long.MaxValue)
    var run = classes.map(_ => 0L)
    bks.foreach { bk =>
      run = run.zip(classes).map { case (a, c) =>
        a + byB(bk).getOrElse(c, 0L) }
      val nl = run.sum
      val nr = n - nl
      if (nl > 0 && nr > 0) {
        val sl2 = run.map(x => x * x).sum
        val sr2 = run.zip(tot).map { case (l, t) => (t - l) * (t - l) }.sum
        val wg = ((nl * nl - sl2).toDouble / nl +
          (nr * nr - sr2).toDouble / nr) / n
        if (wg < best._1 || (wg == best._1 && bk < best._2)) best = (wg, bk)
      }
    }
    assert(r.getLong(0) == best._2)
    assert(r.getDouble(3) == best._1)
    assert(r.getLong(2) == n)
  }

  test("source_lang_tvd: matches brute-force distribution distance") {
    val rows = Stats.queries("source_lang_tvd")(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).view
      .mapValues(g => g.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val langs = docs.map(_._2).distinct
    val sources = bySource.keys.toVector.sorted
    val expect = for {
      i <- sources.indices; j <- (i + 1) until sources.size
    } yield {
      val (s1, s2) = (sources(i), sources(j))
      val n1 = bySource(s1).values.sum
      val n2 = bySource(s2).values.sum
      val num = langs.map(l => math.abs(
        bySource(s1).getOrElse(l, 0L) * n2 - bySource(s2).getOrElse(l, 0L) * n1))
        .sum
      (s1, s2, n1, n2, num, num.toDouble / (2.0 * n1 * n2))
    }
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toVector == expect.toVector)
    rows.foreach(r => assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1))
  }

  test("topPrincipalComponent: eigenpair satisfies Cv = λv on the corpus") {
    val (v, lambda) = Stats.topPrincipalComponent(spark, sfDir)
    assert(v.length == Stats.EmbDim)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12) // unit norm
    assert(lambda > 0)
    // rebuild the covariance from the oracle-checked query output and
    // check the eigen residual
    val cov = Array.ofDim[Double](Stats.EmbDim, Stats.EmbDim)
    Stats.queries("emb_covariance")(spark, sfDir).collect().foreach { r =>
      cov(r.getInt(0))(r.getInt(1)) = r.getDouble(6)
      cov(r.getInt(1))(r.getInt(0)) = r.getDouble(6)
    }
    val cv = cov.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(
      cv.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    // tolerance is gap-limited: convergence is (λ2/λ1)^iters, and this
    // corpus has a near-degenerate top pair
    assert(resid < 1e-6 * lambda, s"residual $resid vs lambda $lambda")
    // Rayleigh quotient equals the returned eigenvalue
    val rq = v.zip(cv).map { case (a, b) => a * b }.sum
    assert(math.abs(rq - lambda) < 1e-6 * lambda)
  }

  test("bootstrap_ci_revenue: CI brackets the point estimate, weights match") {
    val r = Stats.queries("bootstrap_ci_revenue")(spark, sfDir).collect().head
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getInt(4) == Stats.BootB)
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"CI [$lo,$hi] should bracket the mean $mean")
    // CI width shrinks like 1/sqrt(n): sanity-bound it at a few percent
    assert((hi - lo) / mean < 0.2)
    // brute-force resample 0's mean from the shared hash mix
    val p = graft.text.TextOps.P
    def h(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c) % p)
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").cast("string"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(o.length.toLong == n)
    def w(hk: Long, b: Long): Long = {
      val mix = (hk * (1103515245L + 2 * b) + b) % p % 100000L
      val i = Stats.BootPoissonCdf.indexWhere(mix < _)
      if (i < 0) Stats.BootPoissonCdf.size.toLong else i.toLong
    }
    val m0 = {
      val ws = o.map { case (k, c) => val ww = w(h(k), 0); (ww * c, ww) }
      ws.map(_._1).sum.toDouble / ws.map(_._2).sum.toDouble
    }
    // m0 is one of the 32 resample means, so it must lie within the
    // min..max envelope — and with rank-2/31 cuts, usually inside the CI
    assert(m0 >= mean * 0.9 && m0 <= mean * 1.1)
  }

  test("corr_matrix_lineitem: pairs match brute-force Pearson") {
    val rows = Stats.queries("corr_matrix_lineitem")(spark, sfDir).collect()
    assert(rows.length == 6)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_quantity").cast("decimal(12,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_discount").cast("decimal(8,4)") * 10000).cast("long"),
        (col("l_tax").cast("decimal(8,4)") * 10000).cast("long"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def corr(i: Int, j: Int): Double = {
      val n = li.length.toDouble
      val sx = li.map(_(i)).sum.toDouble
      val sy = li.map(_(j)).sum.toDouble
      val sxy = li.map(v => BigInt(v(i)) * BigInt(v(j))).sum.toDouble
      val sxx = li.map(v => BigInt(v(i)) * BigInt(v(i))).sum.toDouble
      val syy = li.map(v => BigInt(v(j)) * BigInt(v(j))).sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val names = Map("x1" -> 0, "x2" -> 1, "x3" -> 2, "x4" -> 3)
    rows.foreach { r =>
      val want = corr(names(r.getString(0)), names(r.getString(1)))
      assert(math.abs(r.getDouble(2) - want) < 1e-12,
        s"${r.getString(0)}~${r.getString(1)}")
    }
    // every pair present exactly once, correlations in [-1, 1]
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("priority_top_orders_concat: keys are the per-group top-K in order") {
    val rows = Stats.queries("priority_top_orders_concat")(spark, sfDir)
      .collect()
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = o.groupBy(_._1).toVector.sortBy(_._1).map { case (p, os) =>
      val top = os.sortBy(x => (-x._3, x._2)).take(Stats.ConcatK)
      (p, top.map(_._2).mkString(","), top.map(_._3).sum, top.length.toLong)
    }
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toVector == want)
  }

  test("abc_pareto: classes partition the parts and respect the cum cuts") {
    val rows = Stats.queries("abc_pareto_parts")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val nParts = Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum == nParts, "classes must partition parts")
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-9,
      "shares must sum to 1")
    // inclusive-cum rule: A's total share can never exceed 80%, A+B's 95%
    val aShare = rows.get("A").map(_._3).getOrElse(0.0)
    val bShare = rows.get("B").map(_._3).getOrElse(0.0)
    assert(aShare <= 0.80 + 1e-12)
    assert(aShare + bShare <= 0.95 + 1e-12)
    assert(rows.keySet.subsetOf(Set("A", "B", "C")))
  }

  test("anova_price_by_priority matches a brute-force recomputation") {
    val r = Stats.queries("anova_price_by_priority")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val groups = o.groupBy(_._1).toVector.sortBy(_._1)
    val k = groups.size
    val n = o.length.toLong
    val t = o.map(_._2).sum
    val ss = groups.map(_._2.map(v => BigInt(v._2) * v._2).sum).sum
    val fold = groups.foldLeft(0.0) { case (acc, (_, vs)) =>
      val sg = vs.map(_._2).sum
      acc + sg.toDouble * sg.toDouble / vs.size.toDouble
    }
    val ssb = fold - t.toDouble * t.toDouble / n.toDouble
    val ssw = ss.toDouble - fold
    val f = (ssb / (k - 1.0)) / (ssw / (n.toDouble - k))
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - ssb) <= 1e-6 * math.abs(ssb))
    assert(math.abs(row.getDouble(3) - ssw) <= 1e-6 * math.abs(ssw))
    assert(math.abs(row.getDouble(4) - f) <= 1e-6 * math.abs(f))
    assert(row.getDouble(5) > 0.0 && row.getDouble(5) < 1.0)
  }

  test("kruskal_price_by_priority matches a brute-force rank recomputation") {
    val r = Stats.queries("kruskal_price_by_priority")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = o.length.toLong
    // average rank per distinct value (ties share the mean rank)
    val cnt = o.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val avgRank = {
      var cum = 0L
      cnt.toVector.sortBy(_._1).map { case (v, c) =>
        cum += c
        v -> (cum * 2 - c + 1).toDouble / 2.0
      }.toMap
    }
    val groups = o.groupBy(_._1).toVector.sortBy(_._1)
    val k = groups.size
    val fold = groups.foldLeft(0.0) { case (acc, (_, vs)) =>
      val rg = vs.map(x => avgRank(x._2)).sum
      acc + rg * rg / vs.size.toDouble
    }
    val hUnc = 12.0 / (n.toDouble * (n + 1.0)) * fold - 3.0 * (n + 1.0)
    val tie = cnt.values.map(c => BigInt(c) * c * c - c).sum
    val c = 1.0 - tie.toDouble / (n.toDouble * n.toDouble * n.toDouble - n.toDouble)
    val h = hUnc / c
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(row.getLong(2) == tie.toLong)
    assert(math.abs(row.getDouble(3) - hUnc) <= 1e-6 * math.abs(hUnc) + 1e-9)
    assert(math.abs(row.getDouble(4) - h) <= 1e-6 * math.abs(h) + 1e-9)
    assert(row.getDouble(4) >= 0.0)
  }

  test("dispersion index matches brute force and positivity") {
    val r = Stats.queries("dispersion_daily_events")(spark, sfDir).head()
    val counts = graft.Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
      .agg(count(lit(1)).as("c")).collect().map(_.getLong(1))
    val n = counts.length.toLong
    val tot = counts.sum
    val mean = tot.toDouble / n
    val variance = (counts.map(c => BigInt(c) * c).sum.toDouble -
      tot.toDouble * tot.toDouble / n) / (n - 1.0)
    assert(r.getLong(0) == n && r.getLong(1) == tot)
    assert(math.abs(r.getDouble(3) - variance) < 1e-9 * variance)
    assert(math.abs(r.getDouble(4) - variance / mean) < 1e-12 * (variance / mean))
    assert(r.getDouble(4) > 0.0)
  }

  test("ab z-test matches a brute-force two-proportion computation") {
    val r = Stats.queries("ab_conversion_ztest")(spark, sfDir).head()
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderstatus")).collect()
      .map(x => (x.getLong(0) % 2, x.getString(1) == "F"))
    val (na, xa) = (o.count(_._1 == 0).toLong, o.count(t => t._1 == 0 && t._2).toLong)
    val (nb, xb) = (o.count(_._1 == 1).toLong, o.count(t => t._1 == 1 && t._2).toLong)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((na, xa, nb, xb)))
    val pa = xa.toDouble / na
    val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(7) - z) < 1e-12, s"${r.getDouble(7)} vs $z")
  }

  test("kaplan-meier: survival is the sequential product, monotone in [0,1]") {
    val rows = Stats.queries("survival_kaplan_meier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "no deaths at sf0.001 — censoring horizon broken")
    var prev = 1.0
    var s = 1.0
    rows.sortBy(_._1).foreach { case (_, nRisk, nDeaths, surv) =>
      assert(nDeaths > 0 && nDeaths <= nRisk)
      s *= 1.0 - nDeaths.toDouble / nRisk
      assert(math.abs(surv - s) < 1e-12, s"$surv vs $s")
      assert(surv <= prev + 1e-15 && surv >= 0.0 && surv <= 1.0)
      prev = surv
    }
    // risk sets shrink as lifetime grows
    val risks = rows.sortBy(_._1).map(_._2)
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b })
  }

  test("page_hinkley_drift matches the sequential definition; ph >= 0") {
    val got = Stats.queries("page_hinkley_drift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toVector
    val daily = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector.sortBy(_._1)
    assert(got.map(g => (g._1, g._2)) == daily)
    var s = 0.0
    var m = 0.0
    var j = 0.0
    var minM = Double.PositiveInfinity
    daily.zip(got).foreach { case ((_, v), (_, _, gm, gph)) =>
      s += v.toDouble
      m += v.toDouble - s / (j + 1.0)
      j += 1.0
      minM = math.min(minM, m)
      assert(math.abs(gm - m) <= 1e-9 * math.abs(m) + 1e-9)
      assert(math.abs(gph - (m - minM)) <= 1e-9 * math.abs(m) + 1e-9)
      assert(gph >= 0.0)
    }
  }

  test("bucketedCumsumBy == naive grouped running sum, any data/width") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (width <- Seq(1L, 7L, 100L, 1000L, 10000L); _ <- 1 to 5) {
      // distinct (group, order) keys: the cumsum contract (like the
      // callers' groupBy(p, v) inputs)
      val data = Seq.fill(120)((Seq("a", "b", "c")(rnd.nextInt(3)),
          rnd.nextLong(5000L), rnd.nextLong(50L) + 1L))
        .distinctBy(r => (r._1, r._2))
      val df = data.toDF("p", "v", "cnt")
      val got = Stats.bucketedCumsumBy(df, "p", "v", width, Seq("cnt"))
        .select("p", "v", "cnt_cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = data.groupBy(_._1).flatMap { case (p, rs) =>
        rs.sortBy(_._2).scanLeft(("", 0L, 0L)) { case ((_, _, acc), (_, v, c)) =>
          (p, v, acc + c)
        }.drop(1).map { case (_, v, cum) => (p, v) -> cum }
      }
      assert(got == want, s"width=$width first diff: ${
        want.find { case (k, c) => got.get(k) != Some(c) }}")
    }
  }
}
