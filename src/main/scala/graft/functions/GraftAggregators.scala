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
