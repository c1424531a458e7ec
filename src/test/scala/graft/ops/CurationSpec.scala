package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.dedup.Dedup
import graft.text.TextOps

class CurationSpec extends SparkSpec {

  test("sample_weighted_docs: deterministic under repartitioning, rate tracks weight") {
    val df = Curation.queries("sample_weighted_docs")(spark, sfDir)
    val once = df.collect().map(_.toSeq).toVector
    val again = Curation.queries("sample_weighted_docs")(spark, sfDir)
      .repartition(7).orderBy("doc_id").collect().map(_.toSeq).toVector
    assert(once == again, "hash sampling must not depend on partitioning")
    // every kept doc satisfies the keep predicate; weights are in [1, cap]
    val ws = once.map(_(2).asInstanceOf[Long])
    assert(ws.forall(w => w >= 1 && w <= Curation.WeightCap))
  }

  test("agg_incremental_refresh: merged partials == single-pass recompute") {
    val merged = Curation.queries("agg_incremental_refresh")(spark, sfDir)
      .collect().map(_.toSeq).toVector
    val full = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toVector
    assert(merged == full)
  }

  test("minhash sketch merge: sig(A union B) == elementwise min(sig(A), sig(B))") {
    // the property that makes source_jaccard_matrix's per-source aggregate
    // a legal sketch MERGE rather than an approximation of one
    val docs = Tables.load(spark, sfDir, "documents").limit(6)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingleHashes(col("toks")).as("sh"))
    val rows = docs.select(col("sh"),
        Dedup.minhashSignature(col("sh")).as("sig")).collect()
    for (Seq(a, b) <- rows.toSeq.combinations(2)) {
      val shUnion = (a.getSeq[Long](0) ++ b.getSeq[Long](0)).distinct
      val sigUnion = spark.range(1)
        .select(Dedup.minhashSignature(
          lit(shUnion.toArray).cast("array<long>")).as("sig"))
        .head().getSeq[Long](0)
      val minOfSigs = a.getSeq[Long](1).zip(b.getSeq[Long](1)).map(t => t._1 min t._2)
      assert(sigUnion == minOfSigs)
    }
  }

  test("split_train_test: exhaustive, disjoint, and stable as the corpus grows") {
    val full = Curation.queries("split_train_test")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every doc gets exactly one side; rough proportions hold
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    // growth stability: the assignment of a doc is identical when computed
    // over any SUBSET of the corpus (pure function of the id)
    val subset = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 50)
    val sub = subset
      .withColumn("bucket",
        pmod(TextOps.polyHash(col("doc_id").cast("string")), lit(100)))
      .select(col("doc_id"),
        when(col("bucket") < Curation.TrainPct, "train")
          .when(col("bucket") < Curation.ValPct, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    sub.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("emb_random_projection: JL distance distortion is bounded on sample pairs") {
    val proj = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), Curation.randomProjection(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), transform(col("embedding"), e => e.cast("double")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    // raw ±1 signs scale expected squared distance by RpDim (entries would
    // be ±1/sqrt(RpDim) in the normalized JL form)
    val ratios = for (Seq(a, b) <- ids.combinations(2).toSeq if d2(orig(a), orig(b)) > 0)
      yield d2(proj(a), proj(b)) / Curation.RpDim / d2(orig(a), orig(b))
    // sign projections concentrate around 1 with ~1/sqrt(RpDim) spread;
    // assert a loose envelope so the test is robust, and that the MEAN is
    // tight (unbiasedness)
    assert(ratios.forall(r => r > 0.1 && r < 3.0), s"worst=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean=$mean")

    // the registered scalar query (checksum + norm2) pins every coordinate
    // of the raw projection: recompute both from the array client-side
    // (left-to-right fold, same order as the Spark aggregate) and demand
    // bit equality
    val scal = Curation.queries("emb_random_projection")(spark, sfDir)
      .filter(col("vec_id") < 40)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    ids.foreach { id =>
      val p = proj(id)
      val ck = p.zipWithIndex.foldLeft(0.0) { case (acc, (v, j)) => acc + v * (j + 1) }
      val n2 = p.foldLeft(0.0)((acc, v) => acc + v * v)
      assert(scal(id) == ((ck, n2)), s"vec $id scalar mismatch")
    }
  }

  test("sample_temperature upweights small sources relative to proportional sampling") {
    val d = Tables.load(spark, sfDir, "documents")
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Curation.queries("sample_temperature")(spark, sfDir).collect()
    val taken = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // quotas actually bind: total near (<=) the target, every source present
    assert(out.length <= Curation.TempTarget)
    assert(taken.keySet == counts.keySet)
    // quotas replicate the sqrt-temperature formula exactly (client-side,
    // same source-ordered fold). With near-uniform sources this is ~flat;
    // the sqrt upweighting property itself is pinned on a skewed synthetic
    // mixture below.
    val totW = counts.toSeq.sortBy(_._1).foldLeft(0.0)((a, c) => a + math.sqrt(c._2.toDouble))
    counts.foreach { case (src, nd) =>
      val want = math.floor(Curation.TempTarget * math.sqrt(nd.toDouble) / totW).toLong
      assert(taken(src).toLong == want, s"$src quota ${taken(src)} vs $want")
    }
    // skewed mixture: small source gains share, big source loses it
    import spark.implicits._
    val skew = (1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small"))
    // applicationId-namespaced like every other scratch path — a fixed
    // /tmp dir would race a concurrently-running second JVM
    val dir2 = new java.io.File(
      Tables.scratchDir(spark, "temp_skew")).getAbsolutePath
    skew.toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = Curation.queries("sample_temperature")(spark, dir2).collect()
    val t2 = out2.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(t2("small").toDouble / out2.length > 0.1)  // corpus share 10%
    assert(t2("big").toDouble / out2.length < 0.9)    // corpus share 90%
    // deterministic: identical under re-evaluation
    val again = Curation.queries("sample_temperature")(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("emb_label_centroids matches a client-side mean per (label, dim)") {
    val rows = Curation.queries("emb_label_centroids")(spark, sfDir)
      .filter(col("dim") === 0).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3)))).toMap
    val raw = Tables.load(spark, sfDir, "embeddings")
      .select(col("label").cast("long"), col("vec_id"),
        element_at(col("embedding"), 1).cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    raw.groupBy(_._1).foreach { case (label, vs) =>
      val (n, got) = rows(label)
      assert(n == vs.length)
      // same fold order as the query: vec_id ascending
      val want = vs.sortBy(_._2).foldLeft(0.0)((a, v) => a + v._3) / vs.length
      assert(got == want, s"label $label: $got vs $want")
    }
  }

  test("emb_outliers: reported top-1 is the true farthest vector from the centroid") {
    val out = Curation.queries("emb_outliers")(spark, sfDir).collect()
    assert(out.length == Curation.OutlierK)
    val dists = out.map(r => r.getLong(0) -> r.getDouble(1))
    // descending, tie-broken by id
    assert(dists.sortBy { case (id, d) => (-d, id) }.toSeq == dists.toSeq)
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dim = vecs.head._2.length
    val cent = (0 until dim).map(j =>
      vecs.toSeq.sortBy(_._1).foldLeft(0.0)((a, v) => a + v._2(j)) / vecs.size)
    val far = vecs.map { case (id, v) =>
      id -> v.zip(cent).foldLeft(0.0) { case (a, (x, c)) => a + (x - c) * (x - c) }
    }.maxBy { case (id, d) => (d, -id) }
    assert(dists.head._1 == far._1)
  }

  test("corpus_manifest checksum is order/partitioning independent and change-sensitive") {
    val base = Curation.queries("corpus_manifest")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val shuffled = Tables.load(spark, sfDir, "documents")
      .repartition(11).sortWithinPartitions(col("n_chars"))
      .select(col("source"), TextOps.polyHash(col("text")).as("h"))
      .groupBy("source").agg(expr("bit_xor(h)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
    // a single-document change flips its source's checksum
    val tampered = Tables.load(spark, sfDir, "documents")
      .withColumn("text",
        when(col("doc_id") === 0, concat(col("text"), lit("x")))
          .otherwise(col("text")))
      .select(col("source"), TextOps.polyHash(col("text")).as("h"))
      .groupBy("source").agg(expr("bit_xor(h)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0 = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("source")
    assert(tampered(src0) != base(src0))
    assert((tampered - src0) == (base - src0))
  }

  test("pseudonymize_events: consistent tokens, original ids unrecoverable from output") {
    val out = Curation.queries("pseudonymize_events")(spark, sfDir)
    assert(!out.columns.contains("user_id"))
    // same user always maps to the same token: token count == user count
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.select("user_token").distinct().count() <= users)
    val joined = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"))
      .join(out, "event_id")
      .groupBy("user_id").agg(countDistinct("user_token").as("nt"))
    assert(joined.filter(col("nt") =!= 1).count() == 0)
  }

  test("attribution conserves purchase revenue across touch buckets") {
    val rows = StreamingOps.queries("attribution_last_touch")(spark, sfDir).collect()
    val attributed = BigDecimal(rows.map(_.getDouble(2)).sum).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)
    val total = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(attributed == BigDecimal(total).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, sfDir).filter(col("event_type") === "purchase").count())
  }

  test("funnel steps are monotone and strictly ordered in time") {
    val steps = Curation.queries.get("funnel_view_click_purchase")
      .orElse(Relational.queries.get("funnel_view_click_purchase")).get
      .apply(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps("1_view") >= steps("2_click"))
    assert(steps("2_click") >= steps("3_purchase"))
    assert(steps("1_view") > 0)
  }

  test("fuzzy_part_names: exact within blocks, documented-subset of brute force") {
    val blocked = Curation.queries("fuzzy_part_names")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val names = Tables.load(spark, sfDir, "part")
      .select("p_name").distinct().collect().map(_.getString(0)).toVector
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      Seq(a, b) <- names.sorted.combinations(2)
      if lev(a, b) <= Curation.FuzzyMaxDist
    } yield (a, b)).toSet
    // blocking never invents pairs...
    assert(blocked.subsetOf(brute))
    // ...and is COMPLETE within blocks (every close same-noun pair found)
    val sameBlock = brute.filter { case (a, b) =>
      a.split(" ")(1) == b.split(" ")(1) }
    assert(sameBlock == blocked)
  }

  test("shard_manifest: distributed two-phase rank == serial window, partitioned plan") {
    val dist = Curation.shardManifest(spark, sfDir)
    val serial = Curation.shardManifest(spark, sfDir, distributedRank = false)
    assert(dist.collect().map(_.toString).toSeq ==
      serial.collect().map(_.toString).toSeq)
    // the doc-level rank window in the DEFAULT path is partitioned by
    // n_tokens — no fact-scale frame crosses an Exchange SinglePartition
    // (the only serial window runs over the O(distinct counts) offsets)
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(n_tokens"), plan.take(2000))
  }

  test("shard_manifest: serpentine replication, full coverage, bounded spread") {
    val got = Curation.queries("shard_manifest")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Curation.ShardCount
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").length.toLong)
    val want = docs.sortBy { case (id, t) => (-t, id) }.zipWithIndex
      .map { case ((_, t), rk) =>
        val pos = rk % n
        val shard = if ((rk / n) % 2 == 0) pos else n - 1 - pos
        shard.toLong -> t
      }
      .groupBy(_._1).toSeq
      .map { case (s, ts) =>
        (s, ts.length.toLong, ts.map(_._2).sum, ts.map(_._2).max) }
      .sortBy(_._1)
    assert(got.toSeq == want)
    // every doc landed somewhere, and the token spread across shards is
    // bounded by a single max-size document
    assert(got.map(_._2).sum == docs.length.toLong)
    val totals = got.map(_._3)
    assert(totals.max - totals.min <= docs.map(_._2).max,
      s"spread ${totals.max - totals.min} exceeds max doc")
  }

  test("source_jaccard_matrix: full pair coverage, estimates in [0,1]") {
    val m = Curation.queries("source_jaccard_matrix")(spark, sfDir).collect()
    val nSources = Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count().toInt
    assert(m.length == nSources * (nSources - 1) / 2)
    assert(m.forall { r =>
      val j = r.getDouble(2); j >= 0.0 && j <= 1.0
    })
  }

  private def jvmPolyHash(s: String): Long =
    graft.functions.StringKernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("randomized response debiases to the replicated estimate exactly") {
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val exp = events.groupBy(_._2).toSeq.sortBy(_._1).map { case (et, es) =>
      val reps = es.map { case (id, _, v) =>
        val b = v >= Curation.DpThreshold
        val keep = jvmPolyHash(id.toString) % 4 < 3
        (b, if (keep) b else !b)
      }
      val n = es.length.toLong
      val obs = reps.count(_._2).toLong
      val tru = reps.count(_._1).toLong
      (et, n, obs, (obs.toDouble / n - 0.25) / 0.5, tru.toDouble / n)
    }
    val got = Curation.queries("dp_randomized_response")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == exp)
    // the debiased estimate must track truth (ln3-DP at this n is tight)
    got.foreach { case (_, _, _, est, tru) =>
      assert(math.abs(est - tru) < 0.25)
    }
  }

  test("exact-k sampler keeps exactly the k hash-first docs per source") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      ds.sortBy(d => (jvmPolyHash(d._1.toString), d._1))
        .take(Curation.SampleExactK.toInt).zipWithIndex
        .map { case ((id, _, lang), i) => (src, (i + 1).toLong, id, lang) }
    }
    val got = Curation.queries("sample_exact_k_per_source")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(got == exp)
  }

  test("emb_centroid_margin matches a brute-force centroid recomputation") {
    val rows = Curation.queries("emb_centroid_margin")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    val e = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    assert(rows.map(_._2).sum == e.length.toLong)
    // brute centroids: per (label, dim), mean with members folded in
    // vec-id order — same arithmetic as the engine
    val dim = e.head._2.length
    val cents = e.groupBy(_._3).view.mapValues { vs =>
      val sorted = vs.sortBy(_._1)
      Array.tabulate(dim) { d =>
        sorted.foldLeft(0.0)((acc, v) => acc + v._2(d).toDouble) / vs.size
      }
    }.toMap
    def dotDD(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cosVC(v: Array[Float], c: Array[Double]) = {
      val vd = v.map(_.toDouble)
      dotDD(vd, c) / (math.sqrt(dotDD(vd, vd)) * math.sqrt(dotDD(c, c)))
    }
    val margins = e.map { case (_, v, lab) =>
      val own = cosVC(v, cents(lab))
      val other = cents.collect { case (l, c) if l != lab => cosVC(v, c) }.max
      (lab, own - other)
    }
    val byLab = margins.groupBy(_._1)
    rows.foreach { case (lab, n, _, avgMargin, nNeg) =>
      val ms = byLab(lab).map(_._2)
      assert(n == ms.length.toLong)
      assert(nNeg == ms.count(_ < 0).toLong)
      val want = ms.map(m => math.floor(m * 1099511627776.0)).sum /
        (ms.length * 1099511627776.0)
      assert(math.abs(avgMargin - want) < 1e-9, s"label $lab: $avgMargin vs $want")
    }
  }

  test("mix_domain_weights: capped weights, unit mixture, uniform target") {
    val rows = Curation.queries("mix_domain_weights")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val k = rows.length.toDouble
    // shares and the renormalized mixture each sum to 1
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._7).sum - 1.0) < 1e-9)
    rows.foreach { case (_, _, _, share, w, expTok, _) =>
      assert(w <= Curation.MixMaxRepeat + 1e-12)
      // uncapped sources hit the uniform target exactly: w * share * k = 1
      if (w < Curation.MixMaxRepeat - 1e-12)
        assert(math.abs(w * share * k - 1.0) < 1e-9)
      assert(expTok > 0.0)
    }
    // over-represented sources are downweighted, under-represented upweighted
    rows.foreach { case (_, _, _, share, w, _, _) =>
      if (share > 1.0 / k) assert(w < 1.0 + 1e-12) else assert(w >= 1.0 - 1e-12)
    }
  }

  test("select_token_budget: greedy quality prefix, budget respected, maximal") {
    val got = Curation.queries("select_token_budget")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    // brute-force emulation from the raw docs
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("toks"),
        size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("dtoks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 > 0)
    val ranked = docs.map { case (id, toks, dtoks) =>
      (id, toks, dtoks * Curation.ScoreScale / toks)
    }.sortBy { case (id, _, score) => (-score, id) }
    var cum = 0L
    val want = ranked.takeWhile { case (_, toks, _) =>
      cum += toks; cum <= Curation.TokenBudget
    }.map(_._1).toSet
    assert(got.map(_._1).toSet == want)
    assert(got.map(_._5).max <= Curation.TokenBudget)
    // maximality: adding the best unselected doc would exceed the budget
    val selTok = got.map(_._5).max
    val unsel = ranked.filter(d => !want.contains(d._1))
    if (unsel.nonEmpty) assert(selTok + unsel.head._2 > Curation.TokenBudget)
  }
}
