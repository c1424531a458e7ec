package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd string-hashing kernels (see [[ArrayKernels]] for why):
  * polynomial codepoint hash, char k-gram rolling hashes, winnowing
  * window-minima. Bit-identical to the HOF formulations in
  * [[graft.text.TextOps]] and the DuckDB mirrors in
  * [[graft.text.TextSql]] — all iterate Unicode CODEPOINTS (DuckDB `ord`
  * parity), not UTF-16 units.
  */
object StringKernels {
  def poly_hash(s: Column): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(s)))
  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))
  def char_gram_hashes(s: Column, k: Int): Column =
    ExpressionUtils.column(CharGramHashes(ExpressionUtils.expression(s), k))
  def winnow(grams: Column, w: Int): Column =
    ExpressionUtils.column(Winnow(ExpressionUtils.expression(grams), w))
  def jaro_winkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  val P: Long = graft.text.TextOps.P

  /** See [[JaroWinklerSim]]. Static so codegen calls allocate only the
    * two flag arrays.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = codepoints(a)
    val t = codepoints(b)
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sm = new Array[Boolean](l1)
    val tm = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tm(j) && s(i) == t(j)) { sm(i) = true; tm(j) = true; m += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - trans / 2.0) / md) / 3.0
    var prefix = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (prefix < pMax && s(prefix) == t(prefix)) prefix += 1
    if (jaro > 0.7) jaro + 0.1 * prefix * (1.0 - jaro) else jaro
  }


  def codepoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  def polyHash(s: UTF8String): Long = {
    val cps = codepoints(s)
    var h = 0L
    var i = 0
    while (i < cps.length) { h = (h * 31 + cps(i)) % P; i += 1 }
    h
  }

  def charGramHashes(s: UTF8String, k: Int): Array[Long] = {
    val cps = codepoints(s)
    val n = cps.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + cps(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Distinct window-minima, first-occurrence order — matches
    * `array_distinct(transform(..., i -> array_min(slice(grams, i+1, w))))`.
    */
  def winnow(grams: Array[Long], w: Int): Array[Long] = {
    val n = grams.length - w + 1
    if (n <= 0) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      var m = grams(i)
      var j = 1
      while (j < w) { if (grams(i + j) < m) m = grams(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    out
  }
}

/** Distinct hashes of word n-gram shingles, straight from the token array:
  * the hash of `tok_i || ' ' || ... || tok_(i+n-1)` is computed over the
  * char stream without materializing the joined strings. First-occurrence
  * order (= `array_distinct(transform(...))` order).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  /** Codegen entry point — a STATIC loop like the sibling kernels, so the
    * generated per-row call allocates nothing but the output array (the
    * previous shim built a throwaway expression instance per row).
    */
  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val nTok = arr.numElements()
    val count = nTok - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Array[Int]](nTok)
    var t = 0
    while (t < nTok) { cps(t) = StringKernels.codepoints(arr.getUTF8String(t)); t += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * 31 + ' ') % StringKernels.P
        val cp = cps(i + k)
        var j = 0
        while (j < cp.length) { h = (h * 31 + cp(j)) % StringKernels.P; j += 1 }
        k += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    StringKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.StringKernels.polyHash($s);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(StringKernels.charGramHashes(input.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.StringKernels.charGramHashes($s, $k));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(StringKernels.winnow(arr, w))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.StringKernels.winnow($g.toLongArray(), $w));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaro-Winkler similarity over Unicode codepoints — the textbook
  * two-pass formulation (match window ⌊max(l1,l2)/2⌋-1, half-counted
  * transpositions, prefix boost p=0.1 capped at 4 applied above the 0.7
  * threshold), with the double arithmetic in the exact operation order
  * DuckDB's `jaro_winkler_similarity` performs it, so thresholded joins
  * hash identically against the oracle (JW_ORACLE_PARITY spec pins this
  * on the real part-name pair set).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringKernels.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
