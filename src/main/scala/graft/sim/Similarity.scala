package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — the ANN
  * surface of the LLM-data-pipeline extension.
  *
  * All dot products run in double precision via `zip_with` + `aggregate`
  * (sequential left-to-right fold → bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))`, which folds the same way). No UDFs.
  *
  * Scale shape (100 TB of vectors):
  *   - [[cosineTopK]] is the exact baseline: broadcast the (small) query
  *     set against the corpus — one pass, no shuffle of the corpus, per-
  *     partition top-k via window. Cost O(Q * N * d): right for small Q.
  *   - [[lshBucketTopK]] is the approximate scale path: sign-LSH bucket
  *     both sides and join on bucket id, probing only same-bucket
  *     candidates — corpus stays hash-partitioned by bucket, queries
  *     broadcast; recall is traded via `planeBits`.
  *   - [[nearDupPairs]] blocks the quadratic pair space by bucket before
  *     the exact cosine check — the embedding analog of MinHash banding.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns (codegen'd
    * kernel [[graft.functions.DotProductF]]; [[dotHof]] is the equivalent
    * builtin formulation, kept for the equivalence spec).
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayKernels.dot_f(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH bucket id from the signs of the first `planeBits` dims —
    * axis-aligned hyperplane LSH (deterministic, engine-portable; a
    * random-rotation variant plugs in by pre-multiplying the vectors).
    */
  def signBucket(v: Column, planeBits: Int = 6): Column =
    (0 until planeBits).map(i =>
      when(element_at(v, i + 1) > 0f, 1L << i).otherwise(0L))
      .reduce(_ + _)

  /** Exact top-k cosine neighbors for each query vector (`queries` is a
    * small DataFrame broadcast against the corpus). Deterministic rank:
    * (sim DESC, neighbor id ASC).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
  }

  /** Approximate top-k: probe only the query's sign-LSH bucket. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    planeBits: Int = 6,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(col(vecCol), planeBits).as("bucket")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      signBucket(col(vecCol), planeBits).as("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    q.join(c, Seq("bucket")).filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
  }

  /** IVF-style ANN: a deterministic centroid set (first `nCentroids`
    * corpus vectors — a k-means iteration would refine them; determinism
    * matters more here), every vector assigned to its nearest centroid by
    * L2 (ties → lowest centroid id), queries probe ONLY their centroid's
    * inverted list. The real IVF shape: the corpus is hash-partitioned by
    * centroid id, a query touches 1/nCentroids of the data; nprobe>1 is a
    * union over the next-nearest centroids.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCentroids: Int,
              nprobe: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(corpus.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec")))
    // corpus rows live in exactly ONE inverted list; queries probe their
    // `nprobe` nearest centroids (recall/cost dial).
    def assign(df: DataFrame, id: String, vec: String, probes: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("d2"), col("c_id"))
      df.join(cents)
        .withColumn("d2", dot(col(vec), col(vec)) - dot(col(vec), col("c_vec")) * 2
          + dot(col("c_vec"), col("c_vec")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= probes)
        .select(col(id), col(vec), col("c_id").as("centroid"))
    }
    val corpusAssigned = assign(
      corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id", "n_vec", 1)
    val queriesAssigned = broadcast(assign(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")), "q_id", "q_vec", nprobe))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    queriesAssigned.join(corpusAssigned, Seq("centroid"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
  }

  /** Embedding near-duplicate pairs: sign-LSH blocking, then exact cosine
    * threshold inside each bucket (a < b).
    */
  def nearDupPairs(corpus: DataFrame, minCosine: Double, planeBits: Int = 6,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      signBucket(col(vecCol), planeBits).as("bucket"))
    val x = c.select(col("bucket"), col("id").as("a"), col("vec").as("va"))
    val y = c.select(col("bucket"), col("id").as("b"), col("vec").as("vb"))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > minCosine)
      .select(col("a"), col("b"), col("cos"))
  }
}
