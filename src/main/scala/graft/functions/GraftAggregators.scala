package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF registration surface (SURVEY §2.9): a user-defined aggregate
  * registered through the public `Aggregator` + `functions.udaf` API, with
  * the engine's exactness rule built in.
  *
  * [[DecimalSum]] sums doubles through a scale-2 BigDecimal buffer: merges
  * are associative and exact, so the result is identical under ANY
  * partitioning — the same determinism the builtin path gets from
  * `sum(col.cast("decimal(18,2)"))`. Null inputs are ignored (SQL sum
  * semantics); empty input finishes to null, matching builtin `sum`.
  *
  * This is deliberately NOT used in hot-path queries: a typed Aggregator
  * runs as an ObjectHashAggregate with per-row serialization, while the
  * decimal-cast builtin stays in codegen'd HashAggregate. The class exists
  * to prove the UDAF surface (and its spec proves equality to the builtin
  * on real data).
  */
object DecimalSum
  extends Aggregator[java.lang.Double, JBigDecimal, java.lang.Double] {

  override def zero: JBigDecimal = null

  private def toDec(a: java.lang.Double): JBigDecimal =
    new JBigDecimal(a.toString).setScale(2, RoundingMode.HALF_UP)

  override def reduce(b: JBigDecimal, a: java.lang.Double): JBigDecimal =
    if (a == null) b else if (b == null) toDec(a) else b.add(toDec(a))

  override def merge(x: JBigDecimal, y: JBigDecimal): JBigDecimal =
    if (x == null) y else if (y == null) x else x.add(y)

  override def finish(b: JBigDecimal): java.lang.Double =
    if (b == null) null else b.doubleValue()

  override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Register on a live session as SQL function `graft_dsum`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_dsum", udaf(DecimalSum, Encoders.DOUBLE))
}

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * MERGEABLE summary (Agarwal et al., "Mergeable Summaries", PODS'12)
  * behind bounded-memory top-k at 100 TB: each map task keeps at most
  * `capacity` counters regardless of vocabulary size, the shuffle carries
  * `capacity` entries per partition instead of the whole vocabulary, and
  * merges preserve the deterministic error bound
  *
  *   true_count - N / (capacity + 1)  <=  sketch_count  <=  true_count
  *
  * so any item with frequency above N/(capacity+1) is GUARANTEED present
  * in the merged sketch (candidate-superset property). Exact top-k is then
  * one cheap refine pass restricted to the candidates — see
  * `vocab_heavy_hitters` in [[graft.ops.Curation]].
  *
  * The buffer is a mutable HashMap under a kryo encoder: like
  * [[DecimalSum]] this runs as an ObjectHashAggregate (serialization at
  * partial boundaries only), which is the intended shape for a sketch —
  * the buffer is O(capacity), never O(distinct).
  */
class MisraGries(capacity: Int)
  extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
    Map[String, Long]] {
  import scala.collection.mutable.HashMap

  override def zero: HashMap[String, Long] = HashMap.empty

  override def reduce(b: HashMap[String, Long], tok: String): HashMap[String, Long] = {
    if (tok == null) return b
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None if b.size < capacity => b.update(tok, 1L)
      case None =>
        // decrement-all step: drop every counter by one, evict zeros
        val dead = List.newBuilder[String]
        b.keysIterator.foreach { k =>
          val c = b(k) - 1
          if (c == 0) dead += k else b.update(k, c)
        }
        dead.result().foreach(b.remove)
    }
    b
  }

  override def merge(x: HashMap[String, Long], y: HashMap[String, Long]): HashMap[String, Long] = {
    y.foreach { case (k, v) => x.update(k, x.getOrElse(k, 0L) + v) }
    if (x.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, evict <= 0 —
      // the merge rule that keeps the summed error bounds additive
      val cut = x.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      val dead = x.iterator.collect { case (k, v) if v <= cut => k }.toList
      dead.foreach(x.remove)
      x.mapValuesInPlace((_, v) => v - cut)
    }
    x
  }

  override def finish(b: HashMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[String, Long]] =
    Encoders.kryo[scala.collection.mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** MRL quantile sketch (Manku–Rajagopalan–Lindsay, "Approximate Medians
  * and other Quantiles in One Pass and with Limited Memory", SIGMOD'98)
  * as a typed `Aggregator` — the mergeable bounded-memory quantile
  * summary: level-`i` buffers hold values of weight `2^i`; a full level
  * sorts and promotes every second element (the upper of each adjacent
  * pair — deterministic, no RNG), halving the item count while exactly
  * preserving total weight. Memory is O(k · log(n/k)) regardless of n,
  * the shuffle carries one sketch per partition, and merges concatenate
  * level-wise then re-collapse — the same mergeable-summaries contract as
  * [[MisraGries]].
  *
  * Rank error: each collapse of a level-`i` buffer perturbs any rank by
  * at most `2^i` per promoted pair boundary; summed over the O(log(n/k))
  * levels the worst case is O(n · log(n/k) / k) — k=512 keeps it under
  * ~2.5% of n at 10^6 rows. The estimate is intentionally NOT
  * bit-deterministic across partitionings (merge order varies), so
  * consumers surface it through within-tolerance booleans, never raw
  * (the `approx_sketches` pattern).
  *
  * An odd-sized buffer collapses its first even-sized prefix (post-sort)
  * and retains the maximum at its own level, so weight conservation is
  * unconditional: finish() weights always sum to exactly n.
  */
class MrlQuantile(k: Int)
  extends Aggregator[java.lang.Long,
    scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]],
    Seq[(Long, Long)]] {
  require(k >= 2 && k % 2 == 0, s"level capacity must be even, got $k")
  import scala.collection.mutable.ArrayBuffer

  override def zero: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer.empty

  private def collapse(b: ArrayBuffer[ArrayBuffer[Long]], level: Int): Unit = {
    val buf = b(level)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val even = sorted.length - (sorted.length % 2)
    buf.clear()
    if (even < sorted.length) buf += sorted(sorted.length - 1)
    if (b.size <= level + 1) b += ArrayBuffer.empty[Long]
    val up = b(level + 1)
    var i = 1
    while (i < even) { up += sorted(i); i += 2 }
  }

  private def cascade(b: ArrayBuffer[ArrayBuffer[Long]]): Unit = {
    var i = 0
    while (i < b.size) {
      if (b(i).size >= k) collapse(b, i)
      i += 1
    }
  }

  override def reduce(b: ArrayBuffer[ArrayBuffer[Long]],
                      v: java.lang.Long): ArrayBuffer[ArrayBuffer[Long]] = {
    if (v == null) return b
    if (b.isEmpty) b += ArrayBuffer.empty[Long]
    b(0) += v.longValue()
    if (b(0).size >= k) cascade(b)
    b
  }

  override def merge(x: ArrayBuffer[ArrayBuffer[Long]],
                     y: ArrayBuffer[ArrayBuffer[Long]]): ArrayBuffer[ArrayBuffer[Long]] = {
    y.iterator.zipWithIndex.foreach { case (buf, i) =>
      while (x.size <= i) x += ArrayBuffer.empty[Long]
      x(i) ++= buf
    }
    cascade(x)
    x
  }

  /** (value, weight) samples; Σ weight == exact input count. */
  override def finish(b: ArrayBuffer[ArrayBuffer[Long]]): Seq[(Long, Long)] =
    b.iterator.zipWithIndex.flatMap { case (buf, i) =>
      buf.iterator.map(v => (v, 1L << i))
    }.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[ArrayBuffer[Long]]] =
    Encoders.kryo[ArrayBuffer[ArrayBuffer[Long]]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Integer Gramian accumulator for the embedding covariance query: input
  * is a d-dim quantized vector (fixed-point longs), the buffer packs
  * [count | d column sums | d(d+1)/2 upper-triangle product sums] into
  * one flat long array. Every operation is int64 addition — associative
  * and exact, so the result is identical under any partitioning — and
  * the shuffle carries ONE ~(d²/2)-long state per partition instead of
  * d² exploded rows per input vector (the all-pairs posexplode
  * formulation the DuckDB oracle uses moves |corpus|·d(d+1)/2 rows).
  * Headroom: |q| ≤ 2^21 at 20-bit quantization of unit-scale floats, so
  * product sums stay under 2^63 to ~2^20 vectors per partition-merge
  * chain; beyond that, shard the corpus and merge per-shard Gramians
  * (documented in the query scaladoc).
  */
class Gramian(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
    val v = x.toArray
    b(0) += 1
    var i = 0
    var k = 1 + d
    while (i < d) {
      b(1 + i) += v(i)
      var j = i
      while (j < d) {
        b(k) += v(i) * v(j)
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
