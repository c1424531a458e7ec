package graft.ops

import graft.{SparkEntry, SparkSpec}

class LearnSpec extends SparkSpec {

  test("logreg GD matches an independent in-memory replication exactly") {
    val got = SparkEntry.queries("logreg_quality_gd")(spark, sfDir).head()
    // replicate the quantized full-batch GD with plain Scala arithmetic
    val facts = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderstatus", "o_totalprice", "o_orderpriority").collect()
      .map { r =>
        val y = if (r.getString(0) == "F") 1L else 0L
        val x1i = BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
        val x2 = if (Set("1-URGENT", "2-HIGH")(r.getString(2))) 1L else 0L
        (y, x1i, x2)
      }
    val q = Learn.GdQ.toDouble
    var (w0, w1, w2) = (0.0, 0.0, 0.0)
    for (_ <- 1 to Learn.GdIters) {
      var g0, g1, g2 = BigInt(0)
      facts.foreach { case (y, x1i, x2) =>
        val z = w0 + w1 * (x1i / Learn.GdX1Scale) + w2 * x2
        val s = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        val r = math.floor(s * q).toLong - y * Learn.GdQ
        g0 += r; g1 += BigInt(r) * x1i; g2 += r * x2
      }
      val n = facts.length
      w0 -= Learn.GdLr * (g0.toDouble / n / q)
      w1 -= Learn.GdLr * (g1.toDouble / n / q / Learn.GdX1Scale)
      w2 -= Learn.GdLr * (g2.toDouble / n / q)
    }
    assert(got.getDouble(0) == w0, s"w0 ${got.getDouble(0)} vs $w0")
    assert(got.getDouble(1) == w1, s"w1 ${got.getDouble(1)} vs $w1")
    assert(got.getDouble(2) == w2, s"w2 ${got.getDouble(2)} vs $w2")
    val acc = got.getDouble(5)
    assert(acc >= 0.0 && acc <= 1.0)
    // the classifier must beat the majority-class trivial baseline's
    // complement — i.e. actually use the features (sanity, not a tuning bar)
    val posRate = facts.count(_._1 == 1L).toDouble / facts.length
    assert(acc >= math.min(posRate, 1 - posRate))
  }

  test("dbscan grid join finds exactly the brute-force eps-neighborhoods") {
    val got = SparkEntry.queries("dbscan_grid_cores")(spark, sfDir).head()
    val pts = graft.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0), e.head.toDouble, e(1).toDouble)
      }
    val eps2 = Learn.DbEps * Learn.DbEps
    val nn = pts.map { case (id, x, y) =>
      id -> pts.count { case (_, bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by) <= eps2
      }.toLong
    }.toMap
    val core = nn.filter(_._2 >= Learn.DbMinPts).keySet
    val border = pts.collect {
      case (id, x, y) if !core(id) && pts.exists { case (bid, bx, by) =>
        bid != id && core(bid) &&
          (x - bx) * (x - bx) + (y - by) * (y - by) <= eps2
      } => id
    }.toSet
    assert(got.getLong(0) == pts.length.toLong)
    assert(got.getLong(1) == core.size.toLong, "core count")
    assert(got.getLong(2) == border.size.toLong, "border count")
    assert(got.getLong(3) == pts.length - core.size - border.size)
    assert(got.getLong(4) == core.map(BigInt(_)).sum.toLong, "core id sum")
    assert(got.getLong(5) == nn.values.max)
  }

  test("weighted median satisfies the defining mass inequality per flag") {
    val rows = SparkEntry.queries("weighted_median_price")(spark, sfDir)
      .collect()
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact,
        r.getDouble(2).toLong))
    rows.foreach { r =>
      val (flag, wm) = (r.getString(0), r.getLong(4))
      val grp = li.filter(_._1 == flag)
      val tw = grp.map(_._3).sum
      val below = grp.filter(_._2 <= wm).map(_._3).sum
      val strictlyBelow = grp.filter(_._2 < wm).map(_._3).sum
      assert(2 * below >= tw, s"$flag: mass at/below wmedian")
      assert(2 * strictlyBelow < tw, s"$flag: wmedian is minimal")
    }
  }

  test("winsorized/trimmed means are bracketed by the cutoffs") {
    SparkEntry.queries("winsorized_price_stats")(spark, sfDir).collect()
      .foreach { r =>
        val (p05, p95) = (r.getLong(2), r.getLong(3))
        assert(p05 <= p95)
        assert(r.getDouble(4) >= p05 && r.getDouble(4) <= p95,
          "winsorized mean outside cutoffs")
        assert(r.getDouble(5) >= p05 && r.getDouble(5) <= p95,
          "trimmed mean outside cutoffs")
        assert(r.getLong(6) <= r.getLong(1))
      }
  }

  test("MAD outliers: deviations agree with the reported median") {
    val rows = SparkEntry.queries("mad_outlier_days")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (v, dev, med, mad) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(dev == math.abs(v - med))
      assert(r.getBoolean(5) == (dev > 3 * mad))
    }
    // sorted by deviation DESC
    val devs = rows.map(_.getLong(2))
    assert(devs.zip(devs.tail).forall { case (a, b) => a >= b })
  }

  test("recursive month spine is gapless and bounded by the data") {
    val rows = SparkEntry.queries("sql_recursive_months")(spark, sfDir)
      .collect()
    val idx = rows.map(_.getLong(0))
    assert(idx.zip(idx.tail).forall { case (a, b) => b == a + 1 },
      "month spine has gaps")
    // totals across the spine equal the raw table's
    val n = rows.map(_.getLong(3)).sum
    assert(n == graft.Tables.load(spark, sfDir, "orders").count())
  }

  test("array audit matches an independent per-order in-memory replication") {
    val got = SparkEntry.queries("array_functions_audit")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong))
    val per = li.groupBy(_._1).map { case (k, qs) =>
      val arr = qs.map(_._2).sorted.toVector
      val t1 = arr.map(_ * 2 + 1).sum
      val nGt = arr.count(_ > 25).toLong
      val s5 = arr.take(5).sum
      val nd = arr.distinct.length.toLong
      val has30 = if (arr.contains(30L)) 1L else 0L
      val dotrev = arr.zip(arr.reverse).map { case (a, b) => a * b }.sum
      (k, t1, nGt, s5, nd, has30, dotrev)
    }
    val want = per.groupBy(_._1 % 8).map { case (g, rows) =>
      g -> Seq(rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum, rows.map(_._5).sum, rows.map(_._6).sum,
        rows.map(_._7).sum)
    }
    assert(got == want)
  }

  test("compaction shrinks the fragmented layout and preserves the data") {
    val df = SparkEntry.queries("compact_small_files_agg")(spark, sfDir)
    val rows = df.collect()
    // result parity with the raw table
    import org.apache.spark.sql.functions._
    val raw = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("id_sum"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("event_type").collect()
    assert(rows.toSeq == raw.toSeq)
    // the scratch dir must hold far fewer than the 64 written micro-files
    val scratch = graft.Tables.scratchDir(spark, "compact/events")
    val n = new java.io.File(scratch).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n > 0 && n < 32, s"expected compacted layout, found $n files")
  }

  test("lateral top-k emits exactly k per segment in rank order") {
    val rows = SparkEntry.queries("sql_lateral_topk")(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (seg, grp) =>
      assert(grp.length == 3, s"$seg: expected 3 rows")
      val prices = grp.map(_.getLong(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("naive bayes train + predict match an in-memory replication exactly") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, lang, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(t => (id, lang, t))
    }
    val cnt = toks.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val tot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnt.keySet.map(_._2).size.toLong

    // train: top-K per class by (cnt desc, tok asc)
    val got = SparkEntry.queries("nb_train_lang")(spark, sfDir).collect()
    val expTop = cnt.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap {
      case (lang, ts) =>
        ts.sortBy { case ((_, tok), c) => (-c, tok) }.take(Learn.NbTopK)
          .zipWithIndex.map { case (((_, tok), c), i) =>
            (lang, (i + 1).toLong, tok, c, tot(lang), vocab,
              (c + 1).toDouble / (tot(lang) + vocab))
          }
    }
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq == expTop)

    // predict: quantized-log-weight NB, exact integer scores
    val q = Learn.NbQ.toDouble
    val langs = tot.keys.toSeq.sorted
    val w0 = langs.map(l =>
      l -> math.floor(q * math.log(1.0 / (tot(l) + vocab))).toLong).toMap
    val nDocs = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val prior = langs.map(l =>
      l -> math.floor(q * math.log(nDocs(l).toDouble / docs.length)).toLong).toMap
    val w = cnt.map { case ((l, t), c) =>
      (l, t) -> math.floor(q *
        math.log((c + 1).toDouble / (tot(l) + vocab))).toLong
    }
    val conf = toks.groupBy(t => (t._1, t._2)).toSeq.map { case ((_, tl), ts) =>
      val byTok = ts.groupBy(_._3).view.mapValues(_.length.toLong)
      val scores = langs.map { cand =>
        cand -> (prior(cand) + byTok.map { case (tok, c) =>
          c * w.getOrElse((cand, tok), w0(cand))
        }.sum)
      }
      val (pred, score) = scores.minBy { case (cand, sc) => (-sc, cand) }
      (tl, pred, score)
    }
    val expConf = conf.groupBy(c => (c._1, c._2)).toSeq.sortBy(_._1).map {
      case ((tl, pl), rs) => (tl, pl, rs.length.toLong, rs.map(_._3).sum)
    }
    val gotConf = SparkEntry.queries("nb_predict_lang")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(gotConf == expConf)
  }

  test("calibration bins: partition the facts, means sit inside their bin") {
    val rows = SparkEntry.queries("logreg_calibration_bins")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nOrders = graft.Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum == nOrders)
    rows.foreach { case (bin, n, nPos, meanPred, fracPos, gap) =>
      assert(bin >= 0 && bin <= 99)
      assert(nPos >= 0 && nPos <= n)
      assert(fracPos >= 0.0 && fracPos <= 1.0)
      // the quantized mean prediction lies within its centile (floor
      // quantization can undershoot the lower edge by at most 2^-20)
      assert(meanPred >= bin / 100.0 - 1.0 / (1 << 20))
      assert(meanPred < (bin + 1) / 100.0)
      assert(math.abs(gap - (meanPred - fracPos)) < 1e-15)
    }
  }
}
