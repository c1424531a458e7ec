package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Engine registration: exposes the custom Catalyst expressions as SQL
  * functions so `spark.sql("SELECT graft_simhash48(...)")` works — the
  * library is usable as a SparkSessionExtensions plugin:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  import GraftExtensions.foldableInt

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "polynomial codepoint hash mod 1e9+7"),
      (args: Seq[Expression]) => PolyHash(GraftExtensions.arity("graft_poly_hash", args, 1).head)))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "distinct word n-gram shingle hashes; args: (tokens, n)"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_shingle_hashes", args, 2)
        ShingleHashes(args(0), foldableInt("graft_shingle_hashes", args(1))) }))
    e.injectFunction((FunctionIdentifier("graft_char_grams"),
      info("graft_char_grams", "char k-gram rolling hashes; args: (text, k)"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_char_grams", args, 2)
        CharGramHashes(args(0), foldableInt("graft_char_grams", args(1))) }))
    e.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "winnowing fingerprints; args: (grams, w)"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_winnow", args, 2)
        Winnow(args(0), foldableInt("graft_winnow", args(1))) }))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "minhash signature; args: (shingleHashes, k)"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_minhash_sig", args, 2)
        MinHashSig(args(0), foldableInt("graft_minhash_sig", args(1))) }))
    e.injectFunction((FunctionIdentifier("graft_simhash48"),
      info("graft_simhash48", "48-bit simhash of a token-hash array"),
      (args: Seq[Expression]) => SimHash48(
        GraftExtensions.arity("graft_simhash48", args, 1).head)))
    e.injectFunction((FunctionIdentifier("graft_dot_f"),
      info("graft_dot_f", "double-precision dot product of float arrays"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_dot_f", args, 2)
        DotProductF(args(0), args(1)) }))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect",
        "intersection of two sorted-ascending long arrays (two-pointer merge)"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_sorted_intersect", args, 2)
        SortedIntersectLongs(args(0), args(1)) }))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "overlap count of two sorted-ascending long arrays, no materialization"),
      (args: Seq[Expression]) => { GraftExtensions.arity("graft_sorted_intersect_count", args, 2)
        SortedIntersectCount(args(0), args(1)) }))
  }
}

object GraftExtensions {

  /** The int-parameterized kernels (shingle width, winnow window, signature
    * length) bind the literal at plan-construction time; a non-foldable or
    * non-integral argument must fail analysis with the function name, not a
    * NullPointerException deep in `eval`.
    */
  /** Arity guard: a short argument list must fail ANALYSIS with the
    * function name (the same principle [[foldableInt]] applies to bad
    * literals), not escape as an IndexOutOfBoundsException from a builder.
    */
  private[graft] def arity(fn: String, args: Seq[Expression], n: Int): Seq[Expression] = {
    if (args.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> s"`$fn`", "expectedNum" -> n.toString,
          "actualNum" -> args.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"),
        None)
    args
  }

  private[graft] def foldableInt(fn: String, e: Expression): Int = {
    def fail(): Nothing = throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$fn`", "paramName" -> "`k`", "paramType" -> "\"INT\""),
      None)
    if (!e.foldable) fail()
    e.eval(null) match {
      case n: java.lang.Number => n.intValue()
      case null =>
        // A foldable NULL (e.g. graft_winnow(g, NULL)) is a type error,
        // not a foldability error — report it as such.
        throw new org.apache.spark.sql.AnalysisException(
          "DATATYPE_MISMATCH.UNEXPECTED_NULL",
          Map("sqlExpr" -> s"\"$fn(..., k)\"", "exprName" -> "`k`"),
          None)
      case _ => fail()
    }
  }

  /** Register the graft functions on an ALREADY-RUNNING session (the
    * extensions path only applies at session construction).
    */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    def asInt(fn: String)(e: Expression): Int = foldableInt(fn, e)
    r.createOrReplaceTempFunction("graft_poly_hash",
      (args: Seq[Expression]) => PolyHash(arity("graft_poly_hash", args, 1).head), "scala_udf")
    r.createOrReplaceTempFunction("graft_shingle_hashes",
      (args: Seq[Expression]) => { arity("graft_shingle_hashes", args, 2)
        ShingleHashes(args(0), asInt("graft_shingle_hashes")(args(1))) }, "scala_udf")
    r.createOrReplaceTempFunction("graft_char_grams",
      (args: Seq[Expression]) => { arity("graft_char_grams", args, 2)
        CharGramHashes(args(0), asInt("graft_char_grams")(args(1))) }, "scala_udf")
    r.createOrReplaceTempFunction("graft_winnow",
      (args: Seq[Expression]) => { arity("graft_winnow", args, 2)
        Winnow(args(0), asInt("graft_winnow")(args(1))) }, "scala_udf")
    r.createOrReplaceTempFunction("graft_minhash_sig",
      (args: Seq[Expression]) => { arity("graft_minhash_sig", args, 2)
        MinHashSig(args(0), asInt("graft_minhash_sig")(args(1))) }, "scala_udf")
    r.createOrReplaceTempFunction("graft_simhash48",
      (args: Seq[Expression]) => SimHash48(args.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_dot_f",
      (args: Seq[Expression]) => DotProductF(args(0), args(1)), "scala_udf")
  }
}

/** Session factory with the conf an operator of this engine would run at
  * scale: AQE (runtime re-planning, skew-join splitting, partition
  * coalescing) on, shuffle partitions sized to the environment, UTC, and
  * the graft SQL functions registered.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE coalesce BELOW defaultParallelism: shuffle-partition count
      // gives the ceiling, the advisory size picks the real width. Without
      // this, tiny shuffles pay `cpus` partitions of pure fixed cost (the
      // documented recommendation for busy clusters, and measured 1.5x on
      // the bench suite).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_BYTES", "16m"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }
}
