package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Codegen'd kernels must be bit-identical to the pure-builtin (HOF)
  * formulations they replace — the HOF forms are what the DuckDB oracle
  * SQL mirrors.
  */
class KernelSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet").limit(200).cache()

  test("PolyHash kernel == HOF fold") {
    val d = docs.select(
      TextOps.polyHash(col("text")).as("k"),
      TextOps.polyHashHof(col("text")).as("h"))
    assert(d.filter(col("k") =!= col("h")).count() == 0)
  }

  test("CharGramHashes + Winnow kernels == HOF forms") {
    // persist() the staged char/gram arrays: CollapseProject re-inlines a
    // once-used projected column into HOF lambdas, which would turn the
    // HOF reference implementation into O(n^2*k) re-splitting.
    val staged = docs.limit(50)
      .select(col("doc_id"), col("text"), split(col("text"), "").as("chars"))
      .persist()
    val grams = staged
      .select(col("doc_id"),
        TextOps.charGramHashes(col("text"), 5).as("gk"),
        TextOps.charGramHashesHof(col("chars"), 5).as("gh"))
      .persist()
    assert(grams.filter(col("gk") =!= col("gh")).count() == 0)
    val w = grams.select(
      TextOps.winnowFingerprints(col("gk")).as("wk"),
      TextOps.winnowFingerprintsHof(col("gh")).as("wh"))
    assert(w.filter(col("wk") =!= col("wh")).count() == 0)
    staged.unpersist(); grams.unpersist()
  }

  test("ShingleHashes kernel == HOF form") {
    val d = docs
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(TextOps.shingleHashes(col("toks")).as("k"),
        TextOps.shingleHashesHof(col("toks")).as("h"))
    assert(d.filter(col("k") =!= col("h")).count() == 0)
  }

  test("MinHashSig kernel == HOF form") {
    val d = docs
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(TextOps.shingleHashes(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(Dedup.minhashSignature(col("sh")).as("k"),
        Dedup.minhashSignatureHof(col("sh")).as("h"))
    assert(d.filter(col("k") =!= col("h")).count() == 0)
  }

  test("SimHash48 kernel == HOF form") {
    val d = docs
      .select(TextOps.polyHashAll(TextOps.tokens(col("text"))).as("th"))
      .select(Dedup.simhash(col("th")).as("k"), Dedup.simhashHof(col("th")).as("h"))
    assert(d.filter(col("k") =!= col("h")).count() == 0)
  }

  test("DotProductF kernel == HOF fold, bit-exact") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val pairs = e.select(col("embedding").as("a"))
      .crossJoin(e.select(col("embedding").as("b")).limit(5))
    val d = pairs.select(Similarity.dot(col("a"), col("b")).as("k"),
      Similarity.dotHof(col("a"), col("b")).as("h"))
    assert(d.filter(col("k") =!= col("h")).count() == 0)
  }

  test("NearestCentroids kernel == relational join+window argmin") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, 8, iters = 0)
    // reference: d2 argmin via cross join + groupBy-min, same arithmetic
    val centsDf = spark.createDataFrame(cents.toSeq.map {
      case (id, v) => (id, v.toSeq)
    }).toDF("c_id", "c_vec")
    def dotDD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
    val withD2 = e.crossJoin(centsDf)
      .withColumn("d2",
        Similarity.dotHof(col("embedding"), col("embedding"))
          - dotDD(col("embedding"), col("c_vec")) * 2
          + dotDD(col("c_vec"), col("c_vec")))
    val expected = withD2
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("d2"), col("c_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("expected"))
    val got = e.select(col("vec_id"),
      element_at(Similarity.nearestCentroids(col("embedding"), cents, 1), 1)
        .as("got"))
    assert(got.join(expected, Seq("vec_id"))
      .filter(col("got") =!= col("expected")).count() == 0)
  }

  test("kmeans refinement is deterministic and preserves centroid count bound") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // parity mode: the sequential fold is the run-to-run deterministic
    // one (scale mode's partial-agg merge order may vary last-ulp)
    val a = Similarity.kmeansCentroids(e, 8, iters = 1, exactFold = true)
    val b = Similarity.kmeansCentroids(e, 8, iters = 1, exactFold = true)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.toSeq == y.toSeq })
    assert(a.length <= 8 && a.nonEmpty)
  }

  test("kmeans scale mode (avg partial agg) matches the exact fold to float tolerance") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Similarity.kmeansCentroids(e, 8, iters = 1, exactFold = true)
    val scale = Similarity.kmeansCentroids(e, 8, iters = 1, exactFold = false)
    assert(exact.map(_._1).toSeq == scale.map(_._1).toSeq)
    exact.zip(scale).foreach { case ((_, x), (_, y)) =>
      x.zip(y).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("centroid memo returns the identical array without recomputation") {
    Similarity.clearCentroidCache()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = Similarity.kmeansCentroidsCached(e, 8, 1, "vec_id", "embedding", true)
    val b = Similarity.kmeansCentroidsCached(e, 8, 1, "vec_id", "embedding", true)
    assert(a eq b) // same cached instance, not just equal values
    // a DIFFERENT corpus plan must not hit the same entry
    val c = Similarity.kmeansCentroidsCached(
      e.filter(col("vec_id") < 400), 8, 1, "vec_id", "embedding", true)
    assert(!(c eq a))
  }

  test("parquetRowCount reads footers only and matches count()") {
    val path = s"$sfDir/embeddings.parquet"
    assert(graft.Tables.parquetRowCount(spark, path) ==
      spark.read.parquet(path).count())
  }

  test("planeBitsFor: integer bucket math, no floating log") {
    import Similarity.planeBitsFor
    assert(planeBitsFor(500) == 4)     // 16*32=512 >= 500
    assert(planeBitsFor(512) == 4)     // exactly at the boundary
    assert(planeBitsFor(513) == 5)
    assert(planeBitsFor(2000) == 6)    // sf0.1: 64 buckets of ~31
    assert(planeBitsFor(0) == 4)       // floor
    assert(planeBitsFor(Long.MaxValue) == 20) // cap
  }

  test("SortedIntersect kernels == array_intersect on sorted distinct arrays") {
    // random sorted-distinct long arrays, both the array and count forms;
    // the reference is the builtin array_intersect (set semantics agree
    // because inputs are distinct)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      val a = rnd.shuffle((0L to 400L).toVector).take(rnd.nextInt(80)).sorted
      val b = rnd.shuffle((0L to 400L).toVector).take(rnd.nextInt(80)).sorted
      (a, b)
    }
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .select(
        ArrayKernels.sorted_intersect(col("a"), col("b")).as("k"),
        ArrayKernels.sorted_intersect_count(col("a"), col("b")).as("kc"),
        sort_array(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("k") =!= col("ref") ||
      col("kc") =!= size(col("ref")).cast("long")).count() == 0)
    // empty/disjoint/identical edges
    val edge = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(ArrayKernels.sorted_intersect(col("a"), col("b")).as("k"),
        ArrayKernels.sorted_intersect_count(col("a"), col("b")).as("kc"))
      .collect()
    assert(edge(0).getSeq[Long](0).isEmpty && edge(0).getLong(1) == 0L)
    assert(edge(1).getSeq[Long](0).isEmpty && edge(1).getLong(1) == 0L)
    assert(edge(2).getSeq[Long](0) == Seq(1L, 2L, 3L) && edge(2).getLong(1) == 3L)
  }

  test("SortedIntersect kernels reject non-long arrays at analysis time") {
    val df = spark.range(1).select(
      array(lit(1), lit(2)).as("ai"),                       // array<int>
      array(lit("a"), lit("b")).as("as"),                   // array<string>
      array(lit(1L), lit(2L)).as("al"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ArrayKernels.sorted_intersect_count(col("ai"), col("al")))
        .collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ArrayKernels.sorted_intersect(col("as"), col("al")))
        .collect()
    }
  }

  test("SortedIntersect kernels skip null elements (set semantics)") {
    // containsNull = true children: the null-skip branch must engage and
    // treat nulls as absent, not misread slot bytes as 0L
    val df = spark.range(1).select(
      array(lit(null).cast("long"), lit(1L), lit(5L)).as("a"),
      array(lit(1L), lit(2L), lit(5L)).as("b"))
    val r = df.select(
      ArrayKernels.sorted_intersect(col("a"), col("b")).as("k"),
      ArrayKernels.sorted_intersect_count(col("a"), col("b")).as("kc"),
      ArrayKernels.sorted_intersect_count(col("b"), col("a")).as("ck"))
      .collect()(0)
    assert(r.getSeq[Long](0) == Seq(1L, 5L))
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  test("kernels survive both codegen and interpreted eval paths") {
    // Force interpreted path by using the expressions in a filter that
    // Catalyst constant-folds / evaluates eagerly on literals.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val lit = Literal(UTF8String.fromString("abc"), org.apache.spark.sql.types.StringType)
    assert(PolyHash(lit).eval(null) == 96354L)
    val grams = CharGramHashes(lit, 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(grams.toSeq == Seq(97L * 31 + 98, 98L * 31 + 99))
  }
}
