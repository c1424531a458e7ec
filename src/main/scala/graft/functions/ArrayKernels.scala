package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

import graft.text.TextOps

/** Codegen'd Catalyst expressions for the similarity/dedup hot kernels.
  *
  * The higher-order-function formulations of these kernels are correct but
  * interpreted: every lambda step walks an expression tree, which measured
  * ~20 ms per document for the 48-bit SimHash (48 bits x ~60 tokens).
  * These expressions run the same arithmetic as tight JIT-compiled loops
  * inside whole-stage codegen — same results, orders of magnitude faster.
  * Each mirrors its DuckDB-oracle SQL formulation bit-for-bit:
  * [[graft.sim.SimilaritySql]] / [[graft.dedup.DedupSql]].
  */
object ArrayKernels {
  val P: Long = TextOps.P
  val MP: Long = TextOps.MIX % TextOps.P

  def dot_f(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhash_sig(shingleHashes: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingleHashes), k))

  def simhash48(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHash48(ExpressionUtils.expression(tokenHashes)))
}

/** Double-precision dot product of two float arrays; sequential
  * left-to-right accumulation (bit-identical to DuckDB's `list_sum` over
  * the per-index products). Nulls propagate; mismatched lengths use the
  * common prefix (callers use fixed-dim embeddings).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature: slot i = min over the input hash set of
  * `((2i+1)*MP mod P) * h + (2i+2)*MP mod P) mod P` — identical to
  * [[graft.dedup.DedupSql.minhashSignature]]. Empty input → empty array
  * (callers filter).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = (2L * i + 1) * ArrayKernels.MP % ArrayKernels.P
      val b = (2L * i + 2) * ArrayKernels.MP % ArrayKernels.P
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hs.getLong(j) + b) % ArrayKernels.P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val P = ArrayKernels.P
      val MP = ArrayKernels.MP
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long a = (2L * $i + 1) * ${MP}L % ${P}L;
         |  long b = (2L * $i + 2) * ${MP}L % ${P}L;
         |  long m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long v = (a * $hs.getLong($j) + b) % ${P}L;
         |    if (v < m) m = v;
         |  }
         |  $out[$i] = m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 48-bit SimHash from a token-hash array — identical arithmetic to
  * [[graft.dedup.DedupSql.simhash]]: bit j votes `+1` when
  * `((2j+101)*MP%P * h + (2j+102)*MP%P) % P` is odd, bit set when the vote
  * sum is positive; bits folded high→low as `acc*2 + bit`.
  */
case class SimHash48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var acc = 0L
    var j = Dedup48.SIMBITS - 1
    while (j >= 0) {
      val a = (2L * j + 101) * ArrayKernels.MP % ArrayKernels.P
      val b = (2L * j + 102) * ArrayKernels.MP % ArrayKernels.P
      var vote = 0L
      var t = 0
      while (t < n) {
        vote += (if ((a * hs.getLong(t) + b) % ArrayKernels.P % 2 == 1) 1 else -1)
        t += 1
      }
      acc = acc * 2 + (if (vote > 0) 1L else 0L)
      j -= 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val n = ctx.freshName("n")
      val P = ArrayKernels.P
      val MP = ArrayKernels.MP
      s"""
         |int $n = $hs.numElements();
         |long acc = 0L;
         |for (int $j = ${Dedup48.SIMBITS - 1}; $j >= 0; $j--) {
         |  long a = (2L * $j + 101) * ${MP}L % ${P}L;
         |  long b = (2L * $j + 102) * ${MP}L % ${P}L;
         |  long vote = 0L;
         |  for (int $t = 0; $t < $n; $t++) {
         |    vote += ((a * $hs.getLong($t) + b) % ${P}L % 2L == 1L) ? 1L : -1L;
         |  }
         |  acc = acc * 2L + ((vote > 0L) ? 1L : 0L);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SIMBITS constant shared with codegen string interpolation. */
object Dedup48 { val SIMBITS = 48 }
