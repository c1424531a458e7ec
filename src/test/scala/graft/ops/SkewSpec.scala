package graft.ops

import graft.{SparkEntry, SparkSpec}

/** The diagnostics that justify salting: heavy-key/Gini profile and the
  * count-table join-size estimator, checked against direct computation
  * from the raw key counts.
  */
class SkewSpec extends SparkSpec {

  test("skew_key_diagnostics: gini and shares match a direct computation") {
    val rows = SparkEntry.queries("skew_key_diagnostics")(spark, sfDir).collect()
    assert(rows.length == Skew.DiagTopK)
    val counts = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = counts.size.toLong
    val t = counts.values.sum
    val sorted = counts.values.toSeq.sorted
    val s1 = sorted.zipWithIndex.map { case (c, i) => c * (i + 1L) }.sum
    val gini = (2.0 * s1 - (n + 1) * t) / (n.toDouble * t)
    rows.foreach { r =>
      assert(r.getLong(4) == n && r.getLong(5) == t)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
      assert(math.abs(r.getDouble(6) - gini) < 1e-12,
        s"gini ${r.getDouble(6)} != direct $gini")
      assert(r.getLong(2) == counts(r.getLong(1)))
      assert(r.getDouble(3) == r.getLong(2).toDouble / t)
    }
    // ranks descend by count
    val cnts = rows.map(_.getLong(2)).toSeq
    assert(cnts == cnts.sortBy(-_), "top-k not count-descending")
    assert(cnts.head == counts.values.max)
  }

  test("join_size_estimate: sampled prediction equals the executed join") {
    val r = SparkEntry.queries("join_size_estimate")(spark, sfDir).head()
    val (nKeys, factRows, est, maxCnt, estSample, actSample) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(estSample == actSample, "estimator disagrees with executed join")
    assert(est >= factRows && maxCnt * maxCnt <= est)
    assert(nKeys > 0 && estSample <= est)
    // direct Σc² over the raw counts
    val direct = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r2 => { val c = r2.getLong(1); c * c }).sum
    assert(est == direct)
  }
}
