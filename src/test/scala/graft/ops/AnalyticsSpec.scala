package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Ground-truth tests for the [[Analytics]] family: the DuckDB oracle
  * proves engine parity; these specs prove the math is right, mostly by
  * brute force at sf0.001.
  */
class AnalyticsSpec extends SparkSpec {

  test("interval_concurrency: matches a driver-side brute-force sweep") {
    val got = Analytics.queries("interval_concurrency")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector

    val holdUs = Analytics.HoldMinutes * 60L * 1000000L
    val dayUs = 86400L * 1000000L
    val ts = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    // split each [t, t+hold) at day boundaries, then per-day brute sweep
    val segs = ts.flatMap { t0 =>
      val t1 = t0 + holdUs
      (t0 / dayUs to (t1 - 1) / dayUs).map { d =>
        (d, math.max(t0, d * dayUs), math.min(t1, (d + 1) * dayUs))
      }
    }
    val expect = segs.groupBy(_._1).toVector.sortBy(_._1).map { case (d, ss) =>
      val events = ss.flatMap(s => Seq((s._2, 1), (s._3, -1)))
        // ends-before-starts at equal instants (half-open convention)
        .sortBy { case (t, delta) => (t, delta) }
      val running = events.scanLeft(0L) { case (acc, (_, dl)) => acc + dl }
      (d, running.max, ss.length.toLong)
    }
    assert(got == expect)
  }

  test("autocorr_daily_revenue: matches driver-side Pearson on the series") {
    val got = Analytics.queries("autocorr_daily_revenue")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1 to Analytics.AcLags))

    val series = Tables.load(spark, sfDir, "orders")
      .groupBy(unix_date(col("o_orderdate").cast("date")).cast("long").as("x"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("v"))
      .orderBy("x").collect().map(_.getLong(1))
    for ((lag, n, r) <- got) {
      val pairs = series.drop(lag).zip(series.dropRight(lag))
      assert(n == pairs.length)
      val xs = pairs.map(_._1.toDouble); val ys = pairs.map(_._2.toDouble)
      val nd = n.toDouble
      val num = nd * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
      val den = math.sqrt(nd * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        math.sqrt(nd * ys.map(y => y * y).sum - ys.sum * ys.sum)
      assert(math.abs(r - num / den) < 1e-9, s"lag $lag: $r vs ${num / den}")
      assert(r > -1.0 - 1e-12 && r < 1.0 + 1e-12)
    }
  }

  test("countmin_heavy_terms: estimates dominate exact counts; top is exact") {
    val rows = Analytics.queries("countmin_heavy_terms")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Analytics.CmsTopK)
    // CMS never undercounts
    assert(rows.forall { case (_, exact, est) => est >= exact })
    // exact column really is the exact top-k of the token stream
    val direct = Tables.load(spark, sfDir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(Analytics.CmsTopK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    assert(rows.map(r => (r._1, r._2)).toVector == direct)
  }

  test("weekday_seasonality: indices average to 1 under day weighting") {
    val rows = Analytics.queries("weekday_seasonality")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(rows.map(_._1).toSeq.sorted == (0L to 6L))
    val allDays = rows.map(_._2).sum
    val allCents = rows.map(_._3).sum
    // sum over weekdays of n_days * idx == total days (idx is a mean ratio)
    val wsum = rows.map { case (_, nd, _, idx) => nd * idx }.sum
    assert(math.abs(wsum - allDays) < 1e-6 * allDays)
    // reconstruct: idx * overall_mean * n_days ~= weekday total cents
    val overall = allCents.toDouble / allDays
    for ((_, nd, cents, idx) <- rows)
      assert(math.abs(idx * overall * nd - cents) < 1e-6 * cents)
  }

  test("grid_neighbor_join: equals the all-pairs O(n^2) answer") {
    val got = Analytics.queries("grid_neighbor_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val P = graft.text.TextOps.P; val MIX = graft.text.TextOps.MIX
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    def coord(h: Long, salt: Long): Long = {
      val u = (h + salt) * MIX % P; u * u % P % Analytics.GridMod
    }
    val pts = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map(k => (k, coord(poly(k.toString), 1), coord(poly(k.toString), 2)))
    val expect = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= Analytics.GridR2
    } yield (a, b, d2)).toSet
    assert(got == expect, "grid neighborhood must be complete: every " +
      "within-radius pair is found and nothing beyond the radius")
  }

  test("schema_drift_profile: deltas consistent, counts match direct query") {
    val rows = Analytics.queries("schema_drift_profile")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 12)
    assert(rows.forall { case (_, _, a, b, d) => d == b - a })
    val ordersA = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(s"${Analytics.DriftYearA}-01-01")
        .cast("timestamp") &&
        col("o_orderdate") < lit(s"${Analytics.DriftYearA.toInt + 1}-01-01")
          .cast("timestamp"))
    val nA = ordersA.count()
    assert(rows.find(r => r._1 == "o_custkey" && r._2 == "count").get._3 == nA)
  }

  test("semdedup_label_prune: scores are true max-cos-to-earlier, budget holds") {
    val rows = Analytics.queries("semdedup_label_prune")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.groupBy(_._1).values.forall(_.length <= Analytics.SemPruneK))

    val embs = Tables.load(spark, sfDir, "embeddings")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byId = embs.map(e => e._1 -> e).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((label, vecId, keeperId, maxCos, _) <- rows.take(10)) {
      val me = byId(vecId)
      val earlier = embs.filter(e => e._3 == label && e._1 < vecId)
      val best = earlier.map(e => (cos(e._2, me._2), e._1))
        .maxBy(t => (t._1, -t._2))
      assert(best._2 == keeperId)
      assert(math.abs(best._1 - maxCos) < 1e-12)
    }
  }

  test("semdedupPrune: banded fallback activates past the threshold and " +
    "matches a driver-side reference of the banded semantics") {
    val embDf = Tables.load(spark, sfDir, "embeddings")
    val embs = embDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // reference banded semantics: per-label rb, SemBands bands of rb sign
    // bits over the leading dims, candidates = lower-id pairs sharing a
    // (band, hash) bucket
    val sizes = embs.groupBy(_._3).map { case (l, v) => l -> v.length.toLong }
    def rbOf(n: Long): Int = Analytics.SemBandMinBits +
      (Analytics.SemBandMinBits until Analytics.SemBandMaxBits)
        .count(b => (1L << b) * Analytics.SemBandTarget < n)
    def bandKeys(v: Array[Float], rb: Int): Seq[(Int, Long)] =
      (0 until Analytics.SemBands).map { i =>
        i -> (0 until rb).map(j =>
          if (v(i * rb + j) > 0f) 1L << j else 0L).sum
      }
    val byLabel = embs.toVector.groupBy(_._3)
    val cand: Vector[(Int, Long, Long)] = byLabel.toVector.flatMap {
      case (label, vs) =>
        val rb = rbOf(sizes(label))
        val buckets: Map[(Int, Long), Vector[Long]] = vs
          .flatMap(e => bandKeys(e._2, rb).map(k => (k, e._1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        buckets.values.toVector.flatMap { ids =>
          for (a <- ids; b <- ids if a < b) yield (a, b)
        }.distinct.map { case (a, b) => (label, a, b) }
    }
    val allPairs = sizes.values.map(n => n * (n - 1) / 2).sum
    assert(cand.size < allPairs,
      "banding must produce strictly fewer candidates than all-pairs")
    val byId = embs.map(e => e._1 -> e._2).toMap
    val expect = cand
      .map { case (label, a, b) => (label, a, b, cos(byId(a), byId(b))) }
      .groupBy(_._3) // per b: best (cos desc, a asc)
      .map { case (_, ps) => ps.minBy(p => (-p._4, p._2)) }
      .groupBy(_._1) // per label: top-K by (cos desc, b asc)
      .flatMap { case (_, ps) =>
        ps.toSeq.sortBy(p => (-p._4, p._3)).take(Analytics.SemPruneK)
          .zipWithIndex
          .map { case ((l, a, b, c), i) => (l, b, a, c, (i + 1).toLong) }
      }.toSet

    // threshold 1: every label is oversized, so the banded path covers
    // the whole corpus
    val got = Analytics.semdedupPrune(embDf, bandThreshold = 1L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.length == expect.size)
    val expByKey = expect.map(e => (e._1, e._2) -> e).toMap
    for (g <- got) {
      val e = expByKey((g._1, g._2))
      assert(g._3 == e._3 && g._5 == e._5 && math.abs(g._4 - e._4) < 1e-12,
        s"banded row mismatch: got $g expected $e")
    }

    // threshold above every label size: exact path only, equal to the
    // registered query's result (which the DuckDB oracle pins exactly)
    val exact = Analytics.semdedupPrune(embDf, bandThreshold = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val registered = Analytics.queries("semdedup_label_prune")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(exact == registered,
      "with no oversized label the guarded form must equal the exact form")
  }

  test("skyline_orders: equals the all-pairs dominance answer") {
    val got = Analytics.queries("skyline_orders")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val pts = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        unix_date(col("o_orderdate").cast("date")).cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = pts.filter { case (_, d, c) =>
      !pts.exists { case (_, d2, c2) =>
        d2 >= d && c2 >= c && (d2 > d || c2 > c)
      }
    }.map { case (k, d, c) => (k, d, c) }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("regress_nation_trend: matches in-memory least squares per nation") {
    val rows = Analytics.queries("regress_nation_trend")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val pts = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        unix_date(col("o_orderdate").cast("date")).cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for ((name, n, slope, icept, r2) <- rows) {
      val p = pts(name)
      assert(n == p.length)
      val nd = n.toDouble
      val xs = p.map(_._2.toDouble); val ys = p.map(_._3.toDouble)
      val sx = xs.sum; val sy = ys.sum
      val sxy = p.map(t => t._2.toDouble * t._3).sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val den = nd * sxx - sx * sx
      assert(math.abs(slope - (nd * sxy - sx * sy) / den)
        < 1e-9 * math.abs(slope).max(1e-3))
      assert(math.abs(icept - (sy * sxx - sx * sxy) / den)
        < 1e-6 * math.abs(icept).max(1.0))
      val r2e = (nd * sxy - sx * sy) * (nd * sxy - sx * sy) /
        (den * (nd * syy - sy * sy))
      assert(math.abs(r2 - r2e) < 1e-9)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
    }
  }

  test("hybrid_rrf_search: fuses the true per-leg ranks") {
    val got = Analytics.queries("hybrid_rrf_search")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(got.length <= Analytics.RrfTopK && got.nonEmpty)

    // lexical leg: the (separately oracle-verified) BM25 scorer, ranked
    val lexRank = LlmData.bm25Scored(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, sc) => (-sc, id) }
      .take(Analytics.RrfDepth).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // semantic leg: brute-force cosine to the query embedding
    val embs = Tables.load(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = embs.find(_._1 == Analytics.RrfQueryId).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val semRank = embs.filter(_._1 != Analytics.RrfQueryId)
      .map(e => (e._1, cos(e._2, qv)))
      .sortBy { case (id, sc) => (-sc, id) }
      .take(Analytics.RrfDepth).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap

    val fused = (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
      val s = lexRank.get(id).map(r => 1.0 / (Analytics.RrfK + r)).getOrElse(0.0) +
        semRank.get(id).map(r => 1.0 / (Analytics.RrfK + r)).getOrElse(0.0)
      (id, lexRank.get(id), semRank.get(id), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(Analytics.RrfTopK)
    assert(got.toSeq.map(t => (t._1, t._2, t._3)) ==
      fused.map(t => (t._1, t._2, t._3)))
    got.toSeq.zip(fused).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-12)
    }
  }

  test("domain_score_linear: exact-integer weights match brute force") {
    val got = Analytics.queries("domain_score_linear")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= Analytics.DomTopK)

    val P = graft.text.TextOps.P
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % P)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bigrams = docs.map { case (id, lang, text) =>
      val toks = text.trim.split("\\s+")
      (id, lang, toks.sliding(2).filter(_.length == 2)
        .map(p => poly(p(0) + " " + p(1)) % Analytics.DomFeatures).toSeq)
    }.filter(_._3.nonEmpty)
    val rawCnt = bigrams.flatMap(_._3).groupBy(identity).map { case (f, v) => f -> v.size.toLong }
    val tgtCnt = bigrams.filter(_._2 == Analytics.DomLang)
      .flatMap(_._3).groupBy(identity).map { case (f, v) => f -> v.size.toLong }
    val rtot = rawCnt.values.sum; val ttot = tgtCnt.values.sum
    val w = rawCnt.map { case (f, rf) =>
      f -> (tgtCnt.getOrElse(f, 0L) * rtot - rf * ttot)
    }
    val scores = bigrams.map { case (id, _, fs) =>
      (id, fs.size.toLong, fs.map(w).sum)
    }
    val expect = scores.sortBy { case (id, _, s) => (-s, id) }
      .take(Analytics.DomTopK).map { case (id, n, s) => (id, n, s) }
    assert(got.toSeq == expect.toSeq)
  }

  test("quantile_sketch_audit: exact order statistics and in-bound sketch") {
    val rows = Analytics.queries("quantile_sketch_audit")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Analytics.MrlProbes)
    assert(rows.forall(_._4), "sketch rank interval outside tolerance")

    val vs = Tables.load(spark, sfDir, "lineitem")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length.toLong
    for ((pct, tgt, exact, _) <- rows) {
      assert(tgt == (pct * n + 99) / 100)
      assert(exact == vs((tgt - 1).toInt))
    }
  }

  test("kanon_risk_audit: group sizes and risk flags match brute force") {
    val rows = Analytics.queries("kanon_risk_audit")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getBoolean(4)))).toMap
    val expect = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), date_format(col("o_orderdate"), "yyyy"),
        col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.keySet == expect.keySet)
    rows.foreach { case (k, (size, risk)) =>
      assert(size == expect(k))
      assert(risk == (size < Analytics.KanonK))
    }
  }

  test("ldiv_audit: l distribution matches brute-force distinct counts") {
    val got = Analytics.queries("ldiv_audit")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val base = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), date_format(col("o_orderdate"), "yyyy"),
        col("o_orderpriority"), col("o_orderstatus"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getString(3)))
    val groups = base.groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2).distinct.length.toLong, vs.length.toLong))
    val expect = groups.values.toSeq.groupBy(_._1).view
      .mapValues(gs => (gs.length.toLong, gs.map(_._2).sum)).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (l, (ng, nr, risk)) =>
      assert((ng, nr) == expect(l))
      assert(risk == (l < 2))
    }
    // every QI group lands in exactly one l bucket
    assert(got.values.map(_._1).sum == groups.size.toLong)
  }

  test("kcenter_coreset: replicates the greedy farthest-first traversal") {
    val got = Analytics.queries("kcenter_coreset")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == Analytics.KcK)
    // greedy radius is non-increasing after the seed
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b })

    val embs = Tables.load(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      for (i <- a.indices) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d
      }
      s
    }
    var centers = Vector(embs.head)
    var expect = Vector((1, embs.head._1, 0.0))
    for (i <- 2 to Analytics.KcK) {
      val (pick, md) = embs.map { e =>
        (e, centers.map(c => d2(e._2, c._2)).min)
      }.maxBy { case (e, m) => (m, -e._1) } match { case (e, m) => (e, m) }
      centers :+= pick
      expect :+= ((i, pick._1, md))
    }
    assert(got.map(t => (t._1, t._2)).toSeq == expect.map(t => (t._1, t._2)))
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g._3 - e._3) < 1e-9) }
  }

  test("t-closeness matches a driver-side EMD brute force") {
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderpriority"))
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val rows = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val prios = rows.map(_._2).distinct.sorted
    val m = prios.length
    val nAll = rows.length.toLong
    val tot = prios.map(p => p -> rows.count(_._2 == p).toLong).toMap
    val expected = rows.map(_._1).distinct.sorted.map { g =>
      val nG = rows.count(_._1 == g).toLong
      var cum = 0L
      var emd = 0L
      prios.foreach { p =>
        val cnt = rows.count(r => r._1 == g && r._2 == p).toLong
        cum += cnt * nAll - tot(p) * nG
        emd += math.abs(cum)
      }
      (g, nG, emd.toDouble / (nG * nAll * (m - 1)).toDouble)
    }
    val got = graft.SparkEntry.queries("tcloseness_audit")(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (row, (g, nG, t)) =>
      assert(row.getString(0) == g)
      assert(row.getLong(1) == nG)
      assert(row.getDouble(2) == t) // identical int64 prefix sums + one division
      assert(row.getBoolean(3) == (t > Analytics.TCloseT))
    }
    // the statistic is a probability distance: always within [0, 1]
    assert(expected.forall { case (_, _, t) => t >= 0.0 && t <= 1.0 })
  }

  test("grid knn join equals the quadratic radius-bounded kNN") {
    // derive the hashed coordinates through the engine once, then brute
    // force k-nearest-within-r over ALL pairs: equality proves the 3x3
    // blocking is complete within r AND the rank window is right
    def coord(h: org.apache.spark.sql.Column, salt: Long) = {
      val u = (h + salt) * graft.text.TextOps.MIX % graft.text.TextOps.P
      u * u % graft.text.TextOps.P % Analytics.GridMod
    }
    val pts = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"),
        graft.text.TextOps.polyHash(col("c_custkey").cast("string")).as("h"))
      .select(col("id"), coord(col("h"), 1).as("x"), coord(col("h"), 2).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.flatMap { case (a, ax, ay) =>
      pts.filter(_._1 != a)
        .map { case (b, bx, by) =>
          (b, (ax - bx) * (ax - bx) + (ay - by) * (ay - by)) }
        .filter(_._2 <= Analytics.GridR2)
        .sortBy { case (b, d2) => (d2, b) }
        .take(Analytics.GridKnnK)
        .zipWithIndex
        .map { case ((b, d2), i) => (a, (i + 1).toLong, b, d2) }
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("grid_knn_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
  }

  test("gridKnnJoin settle phase (cell < radius) equals brute force on a " +
      "dense cloud") {
    // The registered query's testdata only reaches the adaptive cell < r
    // regime from sf0.1 up; this pins the settled path (and its union
    // with the unsettled ring re-probe) in CI on a synthetic cloud dense
    // enough that MOST points settle in phase 1 and some do not.
    import spark.implicits._
    val radius = 100L
    val cell = 25L // 4 rings for the unsettled tail
    val k = 3
    // deterministic scatter over [0, 1000)²: dense enough for ~everyone
    // to have k neighbors within one cell edge, with a sparse corner
    // (ids 990+ pushed to a far band) that must take phase 2
    val pts = (0L until 1000L).map { i =>
      val h = i * 2654435761L % 4294967296L
      val base = if (i >= 990) 900000L else 0L
      (i, base + h % 1000L, base + (h / 1000L) % 1000L)
    }
    val df = pts.toDF("id", "x", "y")
      .withColumn("cx", expr(s"x div $cell"))
      .withColumn("cy", expr(s"y div $cell"))
    val got = Analytics.gridKnnJoin(df, cell, k, radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = pts.flatMap { case (a, ax, ay) =>
      pts.filter(_._1 != a)
        .map { case (b, bx, by) =>
          (b, (ax - bx) * (ax - bx) + (ay - by) * (ay - by)) }
        .filter(_._2 <= radius * radius)
        .sortBy { case (b, d2) => (d2, b) }
        .take(k)
        .zipWithIndex
        .map { case ((b, d2), i) => (a, (i + 1).toLong, b, d2) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected)
    // the scenario must actually exercise BOTH phases: most points have
    // k candidates within one cell edge (settled), the sparse band not
    val withinCell = pts.map { case (a, ax, ay) =>
      pts.count { case (b, bx, by) =>
        b != a &&
          (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= cell * cell }
    }
    assert(withinCell.count(_ >= k) > 800, "dense majority must settle")
    assert(withinCell.count(_ < k) > 5, "sparse band must reach phase 2")
  }

  test("mmr selection matches a driver-side greedy brute force") {
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = embs.find(_._1 == Analytics.MmrQueryId).get._2
    val cands = scala.collection.mutable.ArrayBuffer(
      embs.filter(_._1 != Analytics.MmrQueryId).toSeq: _*)
    var ms = cands.map(c => c._1 -> 0.0).toMap
    val expected = (1 to Analytics.MmrK).map { i =>
      val scored = cands.map { case (id, v) =>
        (id, cos(q, v), ms(id), 0.7 * cos(q, v) - 0.3 * ms(id), v)
      }
      val best = scored.minBy { case (id, _, _, m, _) => (-m, id) }
      cands --= cands.filter(_._1 == best._1)
      ms = cands.map { case (id, v) =>
        id -> math.max(ms(id), cos(v, best._5)) }.toMap
      (i, best._1, best._2, best._3, best._4)
    }
    val got = graft.SparkEntry.queries("emb_mmr_select")(spark, sfDir).collect()
    assert(got.length == Analytics.MmrK)
    got.zip(expected).foreach { case (row, (i, id, rel, m, score)) =>
      assert(row.getInt(0) == i)
      assert(row.getLong(1) == id, s"pick $i: ${row.getLong(1)} vs $id")
      assert(row.getDouble(2) == rel)
      assert(row.getDouble(3) == m)
      assert(row.getDouble(4) == score)
    }
    // picks are distinct and never the query vector itself
    assert(got.map(_.getLong(1)).distinct.length == Analytics.MmrK)
    assert(!got.map(_.getLong(1)).contains(Analytics.MmrQueryId))
  }
}
