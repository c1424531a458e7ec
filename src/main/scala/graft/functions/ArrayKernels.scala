package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  def nearest_centroids(v: Column, centIds: Array[Long],
                        cents: Array[Array[Double]], probes: Int): Column =
    ExpressionUtils.column(
      NearestCentroids(ExpressionUtils.expression(v), centIds, cents, probes))

  def minhash_sig(shingleHashes: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingleHashes), k))

  def simhash48(tokenHashes: Column): Column =
    ExpressionUtils.column(SimHash48(ExpressionUtils.expression(tokenHashes)))

  def sorted_intersect(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectLongs(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Intersection of two SORTED-ascending long arrays as a linear two-pointer
  * merge — the hot kernel of triangle counting (one intersection per
  * oriented edge). `array_intersect` is already codegen'd but generic: per
  * row it builds a boxed hash set of one side and probes with the other
  * (measured 67 s CPU across the sf0.1 triangle stage). The merge does the
  * same set intersection on primitive longs with zero hashing and one
  * right-sized output allocation — same elements, ascending order (callers
  * aggregate over the exploded elements, so order is semantics-free).
  *
  * Inputs MUST be sorted ascending; duplicates are kept pairwise-min times
  * (callers pass distinct adjacency sets, so this never triggers). Nulls
  * propagate via BinaryExpression's null-safe wrapper. Input type is
  * enforced at analysis time (array<long> only — the kernels read raw
  * 8-byte slots, so an int/string array would be misread, not erroring);
  * null ELEMENTS (legal when a child's containsNull is true, e.g. SQL
  * literals through the registered graft_sorted_intersect) are skipped —
  * set semantics treat null as absent — with the null branch generated
  * only for nullable-element children so the graph hot path keeps the
  * tight three-branch loop.
  */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"requires (array<bigint>, array<bigint>) inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def aNulls: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }
  private def bNulls: Boolean = right.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val buf = new Array[Long](math.min(n, m))
    val an = aNulls; val bn = bNulls
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      if (an && x.isNullAt(i)) i += 1
      else if (bn && y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { buf(k) = xv; k += 1; i += 1; j += 1 }
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val skipA = if (aNulls) s"if ($a.isNullAt($i)) { $i++; continue; }" else ""
      val skipB = if (bNulls) s"if ($b.isNullAt($j)) { $j++; continue; }" else ""
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  $skipA
         |  $skipB
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $buf[$k++] = $xv; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `size(sorted_intersect(a, b))` without materializing the intersection —
  * the link-prediction / containment shape (only the overlap COUNT is
  * consumed). Same sorted-ascending input contract, analysis-time type
  * check, and null-element skip as [[SortedIntersectLongs]].
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"requires (array<bigint>, array<bigint>) inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def dataType: DataType = LongType

  private def aNulls: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }
  private def bNulls: Boolean = right.dataType match {
    case ArrayType(_, cn) => cn; case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val an = aNulls; val bn = bNulls
    var i = 0; var j = 0; var k = 0L
    while (i < n && j < m) {
      if (an && x.isNullAt(i)) i += 1
      else if (bn && y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { k += 1L; i += 1; j += 1 }
      }
    }
    k
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val skipA = if (aNulls) s"if ($a.isNullAt($i)) { $i++; continue; }" else ""
      val skipB = if (bNulls) s"if ($b.isNullAt($j)) { $j++; continue; }" else ""
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0;
         |long $k = 0L;
         |while ($i < $n && $j < $m) {
         |  $skipA
         |  $skipB
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $k++; $i++; $j++; }
         |}
         |${ev.value} = $k;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
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
      // every local must be freshName'd: cosine() instantiates THREE of
      // these kernels in one Project, and with non-nullable inputs the
      // unwrapped codegen branch would redeclare a fixed `acc` in the same
      // scope — a janino compile error and a silent interpreted fallback
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The `probes` nearest centroid ids for a float-array vector, by squared
  * L2 distance (ties → lowest centroid id). The centroid matrix rides along
  * as a broadcast-like literal (a few KB — `nlist × dim` doubles), so
  * assignment is a NARROW projection: no join, no shuffle, whole-stage
  * codegen. This replaces the corpus×centroids join + per-vector-id window
  * (a shuffle of `nlist ×` the corpus) that a relational argmin costs.
  *
  * Distance arithmetic mirrors [[graft.sim.SimilaritySql]] bit-for-bit:
  * `d2 = dot(v,v) - dot(v,c)*2 + dot(c,c)`, each dot a sequential
  * left-to-right double fold.
  */
case class NearestCentroids(child: Expression, centIds: Array[Long],
                            cents: Array[Array[Double]], probes: Int)
    extends UnaryExpression {
  require(centIds.length == cents.length && cents.nonEmpty && probes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val dcc: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  def nearest(vin: ArrayData): ArrayData = {
    val n = cents.length
    val d2 = new Array[Double](n)
    var j = 0
    while (j < n) {
      val c = cents(j)
      val dim = math.min(vin.numElements(), c.length)
      var dvv = 0.0
      var dvc = 0.0
      var i = 0
      while (i < dim) {
        val x = vin.getFloat(i).toDouble
        dvv += x * x
        dvc += x * c(i)
        i += 1
      }
      d2(j) = dvv - dvc * 2 + dcc(j)
      j += 1
    }
    val out = new Array[Long](math.min(probes, n))
    val used = new Array[Boolean](n)
    var p = 0
    while (p < out.length) {
      var best = -1
      var i = 0
      while (i < n) {
        if (!used(i) && (best < 0 || d2(i) < d2(best) ||
            (d2(i) == d2(best) && centIds(i) < centIds(best)))) best = i
        i += 1
      }
      used(best) = true
      out(p) = centIds(best)
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.nearest($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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
      // fixed local names collide if the kernel appears twice in one
      // generated scope (non-nullable inputs skip the braced null guard)
      val ca = ctx.freshName("a")
      val cb = ctx.freshName("b")
      val cm = ctx.freshName("m")
      val cv = ctx.freshName("v")
      val P = ArrayKernels.P
      val MP = ArrayKernels.MP
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $ca = (2L * $i + 1) * ${MP}L % ${P}L;
         |  long $cb = (2L * $i + 2) * ${MP}L % ${P}L;
         |  long $cm = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $cv = ($ca * $hs.getLong($j) + $cb) % ${P}L;
         |    if ($cv < $cm) $cm = $cv;
         |  }
         |  $out[$i] = $cm;
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
      // freshName'd for the same one-scope-twice reason as MinHashSig
      val acc = ctx.freshName("acc")
      val ca = ctx.freshName("a")
      val cb = ctx.freshName("b")
      val vote = ctx.freshName("vote")
      val P = ArrayKernels.P
      val MP = ArrayKernels.MP
      s"""
         |int $n = $hs.numElements();
         |long $acc = 0L;
         |for (int $j = ${Dedup48.SIMBITS - 1}; $j >= 0; $j--) {
         |  long $ca = (2L * $j + 101) * ${MP}L % ${P}L;
         |  long $cb = (2L * $j + 102) * ${MP}L % ${P}L;
         |  long $vote = 0L;
         |  for (int $t = 0; $t < $n; $t++) {
         |    $vote += (($ca * $hs.getLong($t) + $cb) % ${P}L % 2L == 1L) ? 1L : -1L;
         |  }
         |  $acc = $acc * 2L + (($vote > 0L) ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SIMBITS constant shared with codegen string interpolation. */
object Dedup48 { val SIMBITS = 48 }
