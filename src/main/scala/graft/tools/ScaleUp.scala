package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale-slope data generator: replicates an sf directory N× into a
  * scratch dir so the heavy/iterative operators can be benched one scale
  * step up (sf0.1 ×10 ≈ sf1, ~6 M lineitem) without touching the
  * read-only driver testdata.
  *
  * Replication is NOT naive row duplication — naive copies would turn the
  * dedup/ANN suites into an artificial all-duplicates corpus (quadratic
  * pair blowup that measures the adversarial case, not the scale slope):
  *
  *   - every table key is offset per copy (`key + i*1e8`), preserving
  *     referential integrity; the part co-occurrence graph becomes N
  *     disjoint isomorphic components — exactly N× edges for the
  *     kcore/BFS/labelprop/triangle/pagerank family;
  *   - `documents.text` gets a per-copy letter-rotation (`translate` over
  *     an 11-letter high-frequency alphabet), so copies keep identical
  *     length/shape statistics but are NOT near-duplicates of each other —
  *     shingle sets diverge and MinHash/SimHash measure N× corpus, not
  *     N²-pair pathology;
  *   - `embeddings.embedding` gets one coordinate shifted per copy
  *     (+0.05·i at index i mod 64), so copies are not angle-identical
  *     under cosine — IVF/PQ training and top-k see N× distinct vectors.
  *
  * Keys stay < 1e9 at N ≤ 10 (the engine-wide doc_id/vec_id band-rank
  * guard). region/nation are fixed-size dims at every TPC-H scale factor
  * and are copied verbatim.
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> [copies=10]
  */
object ScaleUp {

  /** Per-copy key offset — above every sf0.1 key, below the 1e9 rank band. */
  private val Off = 100000000L

  /** 11 distinct high-frequency letters; rotation by i (1..10) is a
    * derangement-ish substitution that rewrites most char shingles while
    * preserving text length and token boundaries.
    */
  private val Alpha = "aeiousthnrl"

  private def rotated(i: Int): String = {
    val k = i % Alpha.length
    Alpha.substring(k) + Alpha.substring(0, k)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <inDir> <outDir> [copies=10]")
    val in = args(0)
    val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    require(n >= 1 && n <= 10, s"copies must be 1..10 (key band), got $n")

    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed-cardinality dims — identical at every scale factor
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    def replicate(t: String, parts: Int)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = rd(t)
      wr((0 until n).map(i => f(base, i)).reduce(_ unionByName _), t, parts)
    }
    def shift(d: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(d)((acc, c) => acc.withColumn(c, col(c) + lit(i * Off)))

    replicate("customer", 4)(shift(_, _, "c_custkey"))
    replicate("supplier", 2)(shift(_, _, "s_suppkey"))
    replicate("part", 4)(shift(_, _, "p_partkey"))
    replicate("orders", 8)(shift(_, _, "o_orderkey", "o_custkey"))
    replicate("lineitem", 16)(shift(_, _, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", 8)(shift(_, _, "event_id", "user_id"))
    replicate("documents", 8) { (d, i) =>
      shift(d, i, "doc_id")
        .withColumn("text",
          if (i == 0) col("text") else translate(col("text"), Alpha, rotated(i)))
    }
    replicate("embeddings", 8) { (d, i) =>
      val j = i % 64
      shift(d, i, "vec_id").withColumn("embedding",
        if (i == 0) col("embedding")
        else expr(s"transform(embedding, (x, k) -> " +
          s"CAST(CASE WHEN k = $j THEN x + ${0.05 * i}D ELSE x END AS FLOAT))"))
    }

    val rows = Seq("lineitem", "orders", "documents", "embeddings", "events")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"[scaleup] wrote $out at ${n}x: ${rows.mkString(", ")}")
    spark.stop()
  }
}
