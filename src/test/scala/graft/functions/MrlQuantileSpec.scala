package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit tests of the MRL'98 quantile sketch: weight conservation,
  * the deterministic collapse rule, and the rank-error bound under both
  * sequential reduce and adversarial merge orders.
  */
class MrlQuantileSpec extends AnyFunSuite {

  private def sketchOf(k: Int, xs: Seq[Long],
                       chunks: Int = 1): Seq[(Long, Long)] = {
    val agg = new MrlQuantile(k)
    if (chunks <= 1) {
      val b = xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      agg.finish(b)
    } else {
      val parts = xs.grouped(math.max(1, xs.size / chunks)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)((b, v) => agg.reduce(b, v)))
      agg.finish(bufs.reduce(agg.merge))
    }
  }

  private def rankError(samples: Seq[(Long, Long)], sorted: Array[Long],
                        q: Double): Long = {
    val n = sorted.length.toLong
    val target = math.ceil(q * n).toLong
    // estimate: min value whose cumulative weight reaches the target
    val cum = samples.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (v, w)) => (v, acc + w) }
      .drop(1)
    val est = cum.find(_._2 >= target).map(_._1).getOrElse(cum.last._1)
    // its true rank interval vs the target
    val lo = sorted.count(_ < est).toLong + 1
    val hi = sorted.count(_ <= est).toLong
    if (target < lo) lo - target else if (target > hi) target - hi else 0L
  }

  test("weights always sum to the exact input count") {
    val xs = (1L to 10000L).map(i => i * 2654435761L % 1000003L)
    for (chunks <- Seq(1, 7, 32)) {
      val sk = sketchOf(64, xs, chunks)
      assert(sk.map(_._2).sum == xs.size.toLong)
    }
  }

  test("null input is ignored; empty sketch finishes empty") {
    val agg = new MrlQuantile(8)
    assert(agg.finish(agg.reduce(agg.zero, null)) == Seq.empty)
  }

  test("rank error stays within the k-bound at several probes and merge shapes") {
    // deterministic pseudo-shuffled input, heavy repetition included
    val xs = (1L to 20000L).map(i => (i * 1103515245L + 12345L) % 4093L)
    val sorted = xs.sorted.toArray
    val k = 128
    // deterministic-collapse bound: each of the ~log2(n/k) levels
    // contributes at most n/(2k) rank drift (upper-of-pair bias)
    val levels = 64 - java.lang.Long.numberOfLeadingZeros(xs.size.toLong / k) + 1
    val bound = levels * xs.size.toLong / (2L * k)
    for (chunks <- Seq(1, 5, 64); q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val err = rankError(sketchOf(k, xs, chunks), sorted, q)
      assert(err <= bound, s"chunks=$chunks q=$q err=$err bound=$bound")
    }
  }

  test("sketch of fewer than k values is exact") {
    val xs = Seq(5L, 1L, 9L, 3L, 3L)
    val sk = sketchOf(64, xs)
    assert(sk.map(_._1).sorted == xs.sorted)
    assert(sk.forall(_._2 == 1L))
  }
}
