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

  /** Bucket-count math: smallest `b` in [minBits, maxBits] with
    * `2^b * targetBucket >= n`, i.e. enough buckets that the EXPECTED
    * bucket holds ~`targetBucket` vectors — the within-bucket work is then
    * O(N * targetBucket) for near-dup (not O(N²/2^b) with a fixed b, which
    * at 100 TB degenerates to all-pairs-within-64-buckets). Fixed-point
    * integer comparison, NOT ceil(log2(...)): a floating log disagrees
    * with the DuckDB oracle in the last ulp exactly at powers of two,
    * which is where the answer flips. Mirrored by
    * [[SimilaritySql.planeBitsSql]].
    */
  def planeBitsFor(n: Long, targetBucket: Int = 32,
                   minBits: Int = 4, maxBits: Int = 20): Int =
    (minBits to maxBits).find(b => (1L << b) * targetBucket >= n).getOrElse(maxBits)

  /** Symmetric int8 quantization of an embedding column with
    * reconstruction metrics — the storage/bandwidth lever for vector
    * corpora (4x smaller than float32, 8x than float64; at 100 TB the
    * scan time drops proportionally and the codes stay SIMD-friendly).
    * Per vector: `scale = 127 / max|x|`, `q_i = floor(x_i*scale + 0.5)`
    * (explicit round-half-up: `round()` half-even vs half-up differs
    * between engines; floor(+0.5) is identical everywhere).
    *
    * Emits per-vector scalars (scale, max abs reconstruction error,
    * cosine(original, reconstruction), and a mod-P checksum of the codes)
    * rather than the code array itself so the result is oracle-hashable;
    * the checksum pins every code byte.
    */
  def quantizeInt8(emb: DataFrame, dim: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val P = graft.text.TextOps.P
    // dotHof with the casts already no-ops: x/r are double arrays here, so
    // this is the ONE sequential-fold dot definition, not a second copy
    // whose fold order could drift from the oracle independently
    val sdot = (a: Column, b: Column) => dotHof(a, b)
    emb.select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("x"))
      .withColumn("maxabs", array_max(transform(col("x"), e => abs(e))))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("q", transform(col("x"),
        e => floor(e * col("scale") + lit(0.5)).cast("long")))
      .withColumn("r", transform(col("q"), e => e.cast("double") / col("scale")))
      .select(col(idCol), col("scale"),
        array_max(zip_with(col("x"), col("r"), (a, b) => abs(a - b))).as("max_abs_err"),
        (sdot(col("x"), col("r")) /
          (sqrt(sdot(col("x"), col("x"))) * sqrt(sdot(col("r"), col("r")))))
          .as("cos_recon"),
        aggregate(zip_with(col("q"), sequence(lit(1), lit(dim)),
            (qi, i) => ((qi * i) % lit(P) + lit(P)) % lit(P)),
          lit(0L), (acc, e) => (acc + e) % lit(P)).as("q_checksum"))
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI'11): split each `dim`-vector into
    * `m` contiguous subvectors, train an independent `ksub`-centroid
    * codebook per subspace (the same deterministic seeded Lloyd as IVF —
    * [[kmeansCentroids]], exact-fold mode), and encode every vector as
    * its per-subspace nearest-centroid ids. Emits one row per
    * (vec_id, subspace): the code and the squared reconstruction error
    * of that subspace — all scalars, oracle-hashable.
    *
    * Scale shape (100 TB): codebooks are trained once (in practice on a
    * sample) and broadcast; encoding is a single narrow corpus pass per
    * subspace through the [[nearestCentroids]] kernel — zero shuffles.
    * The m * log2(ksub)-bit codes replace dim * 32-bit floats (here 8
    * bytes vs 256 — a 32x storage cut), which is what makes
    * billion-vector ADC search RAM-resident. The per-subspace frames
    * here share the one cached codebook per (corpus, subspace) via
    * [[kmeansCentroidsCached]].
    */
  /** Subvector frame for subspace `mi`: (vec_id, vec) with `vec` the
    * mi-th contiguous `sub`-dim slice.
    */
  private def subFrame(emb: DataFrame, mi: Int, sub: Int,
                       idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      slice(col(vecCol), mi * sub + 1, sub).as("vec"))

  /** Per-subspace PQ codebooks: the deterministic seeded Lloyd of
    * [[kmeansCentroids]] on each subvector frame, memoized per
    * (corpus plan, subspace) via [[kmeansCentroidsCached]] so codes and
    * ADC search share one training pass.
    */
  def pqCodebooks(emb: DataFrame, dim: Int, m: Int, ksub: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  exactFold: Boolean = false
                 ): IndexedSeq[Array[(Long, Array[Double])]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // The m subspace trainings are independent Spark actions — run them
    // concurrently (Spark's scheduler interleaves the jobs) instead of
    // serializing m driver round-trips. The memo (computeIfAbsent) keeps
    // each training single-flight across threads.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until m).map { mi =>
      Future(kmeansCentroidsCached(subFrame(emb, mi, sub, idCol, vecCol),
        ksub, 1, "vec_id", "vec", exactFold))
    }
    fs.map(Await.result(_, Duration.Inf))
  }

  def pqCodes(emb: DataFrame, dim: Int, m: Int, ksub: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              exactFold: Boolean = false): DataFrame = {
    val sub = dim / m
    val spark = emb.sparkSession
    import spark.implicits._
    val books = pqCodebooks(emb, dim, m, ksub, idCol, vecCol, exactFold)
    val parts = (0 until m).map { mi =>
      val centsDf = books(mi).toSeq.toDF("c_id", "c_vec")
      // err2 = |v|^2 - 2<v,c> + |c|^2, the oracle's exact operation order
      subFrame(emb, mi, sub, idCol, vecCol)
        .withColumn("code", element_at(nearestCentroids(col("vec"), books(mi), 1), 1))
        .join(broadcast(centsDf), col("code") === col("c_id"))
        .select(col("vec_id"), lit(mi.toLong).as("m"), col("code"),
          (dotHof(col("vec"), col("vec")) - dotHof(col("vec"), col("c_vec")) * 2 +
            dotHof(col("c_vec"), col("c_vec"))).as("err2"))
    }
    parts.reduce(_ union _).orderBy("vec_id", "m")
  }

  /** The per-(query, neighbor) ADC reduction: each group holds exactly
    * one LUT distance per subspace, so m conditional single-row sums
    * added in fixed subspace order reproduce the oracle's
    * `list_reduce(list(d2q ORDER BY m))` left fold bit-for-bit —
    * (((0+d₀)+d₁)+…) — while staying a plain codegen'd HASH aggregate.
    * The previous collect_list → array_sort → fold formulation computed
    * the same number but through ObjectHashAggregate (per-group array
    * buffers plus a sort per group) — at scale the array buffers grow the
    * shuffle rows m× and fall out of whole-stage codegen, so the flat
    * m-counter form is the shape that survives a 100× corpus.
    */
  private def adcFold(m: Int): Column =
    (0 until m).map(mi => sum(when(col("m") === mi, col("d2q"))))
      .foldLeft(lit(0.0): Column)(_ + _).as("adc")

  /** PQ asymmetric-distance (ADC) top-k: the search half of product
    * quantization. Queries stay full-precision; each corpus vector is
    * its codes, and the approximate distance is the sum over subspaces
    * of the PRECOMPUTED query-to-centroid distance table (LUT) entries
    * the codes select — corpus vectors are never touched at query time.
    *
    * The per-(query, neighbor) sum folds the `m` LUT entries in subspace
    * order (sorted-array fold), bit-identical to the oracle's
    * `list_reduce(list(d2q ORDER BY m))`. Rank is (adc ASC, n_id) —
    * deterministic.
    *
    * Scale shape (100 TB): the LUT is nQueries * m * ksub doubles
    * (KB-sized) and broadcasts; the codes table is the only large input
    * and it joins the LUT without touching raw vectors — the whole
    * search is one broadcast join + one grouped fold over m-row groups,
    * shuffling only (q_id, n_id, partial) pairs. This is exactly why PQ
    * search is RAM-resident at billions of vectors.
    */
  def pqAdcTopK(emb: DataFrame, queries: DataFrame, k: Int, dim: Int,
                m: Int, ksub: Int, idCol: String = "vec_id",
                vecCol: String = "embedding",
                exactFold: Boolean = false): DataFrame = {
    val sub = dim / m
    val spark = emb.sparkSession
    import spark.implicits._
    val books = pqCodebooks(emb, dim, m, ksub, idCol, vecCol, exactFold)
    val codes = (0 until m).map { mi =>
      subFrame(emb, mi, sub, idCol, vecCol)
        .select(col("vec_id").as("n_id"), lit(mi.toLong).as("m"),
          element_at(nearestCentroids(col("vec"), books(mi), 1), 1).as("code"))
    }.reduce(_ union _)
    val lut = (0 until m).map { mi =>
      val centsDf = books(mi).toSeq.toDF("c_id", "c_vec")
      subFrame(queries, mi, sub, idCol, vecCol)
        .select(col("vec_id").as("q_id"), col("vec").as("qv"))
        .crossJoin(centsDf)
        .select(col("q_id"), lit(mi.toLong).as("m"), col("c_id"),
          (dotHof(col("qv"), col("qv")) - dotHof(col("qv"), col("c_vec")) * 2 +
            dotHof(col("c_vec"), col("c_vec"))).as("d2q"))
    }.reduce(_ union _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
    // join ON (m, code=c_id), not m alone: with m as the only hash key
    // every code row matches all ksub LUT entries of its subspace and the
    // code equality runs as a post-join filter — a ksub× (16×) row blowup
    // through the broadcast join (measured ~77 M intermediate rows at
    // sf0.1). Keying the hash on the code too keeps matches to the
    // nQueries rows that actually contribute.
    codes.join(broadcast(lut.withColumnRenamed("m", "lm")),
        col("m") === col("lm") && col("code") === col("c_id"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(adcFold(m))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), col("adc"))
      .orderBy("q_id", "rank")
  }

  /** IVF-PQ composed search — the architecture every billion-scale ANN
    * deployment runs (FAISS IVFPQ): a coarse full-dimension quantizer
    * prunes the corpus to the query's `nprobe` inverted lists, and PQ
    * asymmetric distance scores ONLY those candidates from their codes
    * (raw vectors untouched at query time). Shares the coarse centroid
    * training with [[ivfTopK]] and the subspace codebooks with
    * [[pqCodes]]/[[pqAdcTopK]] through the session memo, so the three
    * queries pay for ONE training pass. Scale shape: candidates are
    * |probed lists| instead of the whole corpus (the factor ADC alone
    * can't give you), the LUT stays KB-sized and broadcast, and the
    * shuffle carries only (q_id, n_id, partial) rows.
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, k: Int, dim: Int,
                m: Int, ksub: Int, nCentroids: Int, nprobe: Int = 1,
                idCol: String = "vec_id", vecCol: String = "embedding",
                exactFold: Boolean = false): DataFrame = {
    val sub = dim / m
    val spark = emb.sparkSession
    import spark.implicits._
    val coarse = kmeansCentroidsCached(emb, nCentroids, 1, idCol, vecCol,
      exactFold)
    val corpusA = emb.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
      .select(col("n_id"),
        element_at(nearestCentroids(col("nv"), coarse, 1), 1).as("centroid"))
    val queriesA = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .select(col("q_id"),
        explode(nearestCentroids(col("qv"), coarse, nprobe)).as("centroid")))
    val cand = corpusA.join(queriesA, Seq("centroid"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
    val books = pqCodebooks(emb, dim, m, ksub, idCol, vecCol, exactFold)
    val codes = (0 until m).map { mi =>
      subFrame(emb, mi, sub, idCol, vecCol)
        .select(col("vec_id").as("n_id"), lit(mi.toLong).as("m"),
          element_at(nearestCentroids(col("vec"), books(mi), 1), 1).as("code"))
    }.reduce(_ union _)
    val lut = (0 until m).map { mi =>
      val centsDf = books(mi).toSeq.toDF("c_id", "c_vec")
      subFrame(queries, mi, sub, idCol, vecCol)
        .select(col("vec_id").as("q_id"), col("vec").as("qv"))
        .crossJoin(centsDf)
        .select(col("q_id"), lit(mi.toLong).as("m"), col("c_id"),
          (dotHof(col("qv"), col("qv")) - dotHof(col("qv"), col("c_vec")) * 2 +
            dotHof(col("c_vec"), col("c_vec"))).as("d2q"))
    }.reduce(_ union _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
    // same join-key discipline as pqAdcTopK: the code equality is part of
    // the broadcast hash key, so each candidate row matches exactly its
    // one LUT entry instead of all ksub entries of the subspace
    cand.join(codes, Seq("n_id"))
      .join(broadcast(lut.withColumnRenamed("m", "lm")
          .withColumnRenamed("q_id", "lq")),
        col("q_id") === col("lq") && col("m") === col("lm") &&
          col("code") === col("c_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(adcFold(m))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), col("adc"))
      .orderBy("q_id", "rank")
  }

  /** The shared tail of every top-k search: exact cosine on candidate
    * (q_id, q_vec, n_id, n_vec) rows, deterministic rank
    * (sim DESC, neighbor id ASC), rank <= k. ONE definition so the
    * tie-break contract and output schema cannot drift between the
    * exact/LSH/IVF variants (each used to carry its own copy).
    */
  private def topKBySim(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    cands.filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("n_id"), col("sim"))
  }

  /** Exact top-k cosine neighbors for each query vector (`queries` is a
    * small DataFrame broadcast against the corpus). Deterministic rank:
    * (sim DESC, neighbor id ASC).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    topKBySim(q.crossJoin(c), k)
  }

  /** Approximate top-k: probe only the query's sign-LSH bucket.
    * Bucket-count resolution: explicit `planeBits` > explicit `corpusSize`
    * (e.g. from catalog stats or [[graft.Tables.parquetRowCount]] footer
    * metadata — no Spark job) > a `corpus.count()` fallback (one plan-time
    * action; convenient, but at scale supply the size).
    */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    planeBits: Option[Int] = None,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    corpusSize: Option[Long] = None): DataFrame = {
    val bits = planeBits.getOrElse(planeBitsFor(corpusSize.getOrElse(corpus.count())))
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(col(vecCol), bits).as("bucket")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      signBucket(col(vecCol), bits).as("bucket"))
    topKBySim(q.join(c, Seq("bucket")), k)
  }

  /** Multi-probe sign-LSH top-k (Lv et al., "Multi-probe LSH: efficient
    * indexing for high-dimensional similarity search", VLDB'07): each
    * query probes its own bucket PLUS every 1-bit-flip neighbor bucket —
    * the planes a near neighbor most plausibly fell on the far side of —
    * recovering most of the recall a single-bucket probe loses without
    * adding hash tables. Candidates are DISTINCT (q, n) id pairs (a pair
    * can surface via several probes); vectors are gathered back by
    * broadcast id joins, so the corpus is scanned once narrow and once
    * for the candidate gather — the [[mrlPrefixTopK]] shape with a
    * (bits+1)-way probe fan-out on the tiny query side only.
    */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     planeBits: Option[Int] = None,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     corpusSize: Option[Long] = None): DataFrame = {
    val bits = planeBits.getOrElse(planeBitsFor(corpusSize.getOrElse(corpus.count())))
    val base = signBucket(col(vecCol), bits)
    val probes = array((base +: (0 until bits).map(i =>
      base.bitwiseXOR(lit(1L << i)))): _*)
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      explode(probes).as("bucket")))
    val c = corpus.select(col(idCol).as("n_id"),
      signBucket(col(vecCol), bits).as("bucket"))
    val candIds = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id")).distinct()
    val full = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val gathered = full.join(broadcast(candIds), Seq("n_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))),
        Seq("q_id"))
    topKBySim(gathered, k)
  }

  /** Radius (range) search: every corpus vector with `cosine >= minCos`
    * of each query — the "all sufficiently-similar neighbors" variant of
    * ANN (retrieval dedup, paraphrase mining), where top-k's fixed cutoff
    * is the wrong contract. Same sign-LSH blocking as [[lshBucketTopK]]:
    * queries broadcast with their bucket id, the corpus is probed only
    * within the query's bucket, then the exact cosine threshold filters.
    * No window, no global sort — output order is imposed by the caller.
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, minCos: Double,
                  planeBits: Option[Int] = None,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  corpusSize: Option[Long] = None): DataFrame = {
    val bits = planeBits.getOrElse(planeBitsFor(corpusSize.getOrElse(corpus.count())))
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(col(vecCol), bits).as("bucket")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      signBucket(col(vecCol), bits).as("bucket"))
    q.join(c, Seq("bucket")).filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .filter(col("sim") >= minCos)
      .select(col("q_id"), col("n_id"), col("sim"))
  }

  /** Nearest-centroid assignment as a NARROW projection: the centroid
    * matrix (nlist × dim doubles — a few KB) is baked into a codegen'd
    * kernel ([[graft.functions.NearestCentroids]]), so assigning N vectors
    * costs one corpus pass with zero shuffle. The relational alternative
    * (corpus × centroids join + per-vector-id window argmin) shuffles
    * `nlist ×` the corpus — the one genuinely scale-hostile plan in an ANN
    * suite, eliminated here.
    */
  def nearestCentroids(v: Column, cents: Array[(Long, Array[Double])],
                       probes: Int): Column =
    graft.functions.ArrayKernels.nearest_centroids(
      v, cents.map(_._1), cents.map(_._2), probes)

  /** Deterministic k-means for IVF coarse quantization: seed with the
    * first `nCentroids` corpus vectors (by id — reproducible, no RNG),
    * then `iters` Lloyd iterations. Centroids that lose all members drop
    * out (standard Lloyd). Two refinement modes:
    *
    *   - `exactFold = false` (scale mode, the DEFAULT): plain `avg` per
    *     (centroid, dim) — associative partial aggregation with map-side
    *     combine, shuffle volume O(partitions × nlist × dim) regardless of
    *     corpus size, no cluster materialization. Last-ulp
    *     nondeterministic (float addition order), which IVF recall does
    *     not care about; only the hash-exact oracle gate does.
    *   - `exactFold = true` (oracle-parity mode, OPT-IN — the registered
    *     verify queries pass it): the per-centroid mean folds members in
    *     vec-id order (sort_array + sequential `aggregate`), bit-identical
    *     to the DuckDB oracle's `list_sum(list(x ORDER BY vec_id))`. ONE
    *     exchange per iteration (groupBy centroid), but each cluster's
    *     members materialize in one aggregation buffer — fine at
    *     verification scale, an OOM risk for a hot cluster at 100 TB,
    *     which is why it is not the default.
    */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 1,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      exactFold: Boolean = false
                     ): Array[(Long, Array[Double])] = {
    def collectCents(df: DataFrame, id: Column, vec: Column): Array[(Long, Array[Double])] =
      df.select(id.cast("long"), vec).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
    var cents = collectCents(
      corpus.filter(col(idCol) < nCentroids),
      col(idCol), transform(col(vecCol), _.cast("double")))
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val dim = cents(0)._2.length
      val assigned = corpus
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
        .withColumn("centroid", element_at(nearestCentroids(col("vec"), cents, 1), 1))
      val coords =
        if (exactFold)
          // Members sorted by (unique) id, then an ordered elementwise
          // fold per dimension — the same double additions in the same
          // order as the oracle, in a single exchange.
          assigned.groupBy(col("centroid"))
            .agg(sort_array(collect_list(struct(col("id"), col("vec")))).as("ms"))
            .select(col("centroid"),
              transform(sequence(lit(0), lit(dim - 1)), p =>
                aggregate(col("ms"), lit(0.0), (acc, m) =>
                  acc + element_at(m.getField("vec"), p + 1).cast("double"))
                  / size(col("ms"))).as("cvec"))
        else
          assigned.select(col("centroid"), posexplode(col("vec")))
            .groupBy(col("centroid"), col("pos"))
            .agg(avg(col("col").cast("double")).as("coord"))
            .groupBy(col("centroid"))
            .agg(array_sort(collect_list(struct(col("pos"), col("coord")))).as("cs"))
            .select(col("centroid"),
              transform(col("cs"), _.getField("coord")).as("cvec"))
      cents = collectCents(coords, col("centroid"), col("cvec"))
      it += 1
    }
    cents
  }

  /** Centroid memo: k-means is a property of (corpus, params), not of the
    * query batch — recomputing it per [[ivfTopK]] call costs two corpus
    * passes and two driver collects each time. Keyed on the ANALYZED plan's
    * semantic hash (same source + params → same centroids within a
    * session); callers with data changing under a fixed path should pass
    * precomputed centroids to [[ivfTopK]] instead.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, String, String, Boolean),
      Array[(Long, Array[Double])]]()

  def clearCentroidCache(): Unit = centroidCache.clear()

  def kmeansCentroidsCached(corpus: DataFrame, nCentroids: Int, iters: Int,
                            idCol: String, vecCol: String,
                            exactFold: Boolean): Array[(Long, Array[Double])] =
    centroidCache.computeIfAbsent(
      (corpus.queryExecution.analyzed.semanticHash(), nCentroids, iters, idCol,
        vecCol, exactFold),
      _ => kmeansCentroids(corpus, nCentroids, iters, idCol, vecCol, exactFold))

  /** IVF ANN: k-means coarse centroids (deterministic seed + `refineIters`
    * Lloyd steps), every corpus vector assigned to exactly ONE inverted
    * list by the narrow [[nearestCentroids]] kernel, queries probe their
    * `nprobe` nearest lists (recall/cost dial). The probe is a broadcast
    * join on centroid id — the corpus is never shuffled; at scale the
    * corpus would be WRITTEN bucketed by centroid so repeated query
    * batches skip even the scan of non-probed lists.
    *
    * `centroids`: pass a precomputed coarse quantizer to skip k-means
    * entirely (the scale deployment: train once, reuse across query
    * batches). When absent, centroids are computed via
    * [[kmeansCentroidsCached]] — memoized per (corpus plan, params) so
    * repeated calls in a session pay for training once.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCentroids: Int,
              nprobe: Int = 1, refineIters: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              exactFold: Boolean = false,
              centroids: Option[Array[(Long, Array[Double])]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      kmeansCentroidsCached(corpus, nCentroids, refineIters, idCol, vecCol, exactFold))
    val corpusAssigned = corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("centroid", element_at(nearestCentroids(col("n_vec"), cents, 1), 1))
    val queriesAssigned = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid", explode(nearestCentroids(col("q_vec"), cents, nprobe))))
    topKBySim(queriesAssigned.join(corpusAssigned, Seq("centroid")), k)
  }

  // --------------------------------------------------------------------------
  // IVF index lifecycle: train once, persist, search many times. At 100 TB
  // the index IS the deployment artifact — k-means runs once per corpus
  // version, the inverted lists live partitioned by centroid id on object
  // storage, and each query batch reads ONLY its probed lists (directory
  // pruning via dynamic partition pruning against the broadcast probe set).
  // --------------------------------------------------------------------------

  /** Train + persist an IVF index under `indexDir`:
    * `centroids/` (centroid_id, cvec) and `lists/` — the full corpus
    * written PARTITIONED BY its nearest-centroid assignment.
    */
  def writeIvfIndex(corpus: DataFrame, indexDir: String, nCentroids: Int,
                    refineIters: Int = 1,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    exactFold: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    val cents = kmeansCentroidsCached(corpus, nCentroids, refineIters,
      idCol, vecCol, exactFold)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
        cents.map { case (id, v) => org.apache.spark.sql.Row(id, v.toSeq) }.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("centroid_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cvec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    corpus.select(col(idCol), col(vecCol),
        element_at(nearestCentroids(col(vecCol), cents, 1), 1).as("centroid"))
      .write.mode("overwrite").partitionBy("centroid")
      .parquet(s"$indexDir/lists")
  }

  /** Load the coarse quantizer back from a persisted index. */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Search a persisted IVF index: queries probe their `nprobe` nearest
    * lists; the probe set joins the partitioned lists table on the
    * PARTITION column, so only probed `centroid=` directories are read
    * (broadcast join + dynamic partition pruning — asserted in the spec).
    * Result contract identical to [[ivfTopK]].
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                       queries: DataFrame, k: Int, nprobe: Int = 1,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = readIvfCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
      .select(col(idCol).as("n_id"), col(vecCol).as("n_vec"), col("centroid"))
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid", explode(nearestCentroids(col("q_vec"), cents, nprobe))))
    topKBySim(q.join(lists, Seq("centroid")), k)
  }

  /** Matryoshka-style prefix-dimension search (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS'22): rank the corpus by cosine over
    * only the FIRST `dPrefix` dimensions (MRL-trained embeddings
    * front-load information, so the prefix is a usable coarse score),
    * keep the top `cands` candidates per query, then re-rank exactly on
    * the full vector. Deterministic at both stages: prefix ties break on
    * neighbor id, final rank is (sim DESC, n_id).
    *
    * Scale shape (100 TB): the coarse pass scans a `dPrefix/dim`-sized
    * prefix column (store it as its own parquet column and the scan reads
    * dPrefix/dim of the bytes — 4x less I/O at 16/64), queries broadcast,
    * per-partition window top-`cands`. The re-rank gather is a BROADCAST
    * of the (Q * cands)-row candidate id set against the corpus — the
    * full-width vectors are touched only for candidates, never shuffled.
    */
  def mrlPrefixTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    dPrefix: Int, cands: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      slice(col(vecCol), 1, dPrefix).as("q_pre")))
    val cPre = corpus.select(col(idCol).as("n_id"),
      slice(col(vecCol), 1, dPrefix).as("n_pre"))
    val wPre = Window.partitionBy(col("q_id"))
      .orderBy(col("pre_sim").desc, col("n_id"))
    val candIds = q.crossJoin(cPre)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("pre_sim", cosine(col("q_pre"), col("n_pre")))
      .withColumn("prerank", row_number().over(wPre))
      .filter(col("prerank") <= cands)
      .select(col("q_id"), col("n_id"))
    val full = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val gathered = full.join(broadcast(candIds), Seq("n_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))),
        Seq("q_id"))
    topKBySim(gathered, k)
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar corpus vectors of a DIFFERENT label — the "hardest"
    * negatives are the near-misses, and mining them is a first-class
    * step of every embedding-training pipeline. Identical contract and
    * scale shape to [[cosineTopK]] (broadcast queries, one corpus pass,
    * per-partition window top-k); the label inequality is a narrow
    * pre-filter on the candidate stream.
    */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col(labelCol).as("q_lab")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col(labelCol).as("n_lab"))
    topKBySim(q.crossJoin(c).filter(col("q_lab") =!= col("n_lab")), k)
  }

  /** Pack the sign bits of the first `bits` dimensions into one BIGINT —
    * the 1-bit-per-dim binary quantization behind Hamming-space search.
    * Capped at 63 bits: bit 63 would make the code negative and a
    * distinct-power SUM overflow-checked engines (the DuckDB oracle)
    * reject; 63 of 64 dims costs ~1 bit of resolution and keeps the code
    * arithmetic portable. Distinct powers of two, so + == OR.
    */
  def binarySignCode(v: Column, bits: Int): Column = {
    require(bits <= 63, s"binarySignCode packs at most 63 bits, got $bits")
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Binary-quantization ANN: corpus and queries collapse to 63-bit sign
    * codes, the coarse rank is Hamming distance `bit_count(code XOR code)`
    * (ties → lower neighbor id), the top `cands` per query re-rank by
    * exact cosine. The modern "binary quantization + rescore" shape
    * (e.g. RaBitQ-style deployments): at 100 TB the code column is
    * 8 bytes/vector (vs 256 for float32x64), the whole coarse pass is a
    * broadcast of the tiny query-code set plus an integer XOR/POPCNT per
    * row — memory-bandwidth-bound, SIMD-friendly, zero shuffle of the
    * corpus — and full vectors are gathered only for the candidate set
    * via a broadcast semi-style join, exactly as [[mrlPrefixTopK]].
    */
  def hammingRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        cands: Int, bits: Int = 63,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      binarySignCode(col(vecCol), bits).as("q_code")))
    val c = corpus.select(col(idCol).as("n_id"),
      binarySignCode(col(vecCol), bits).as("n_code"))
    val wHam = Window.partitionBy(col("q_id"))
      .orderBy(col("ham").asc, col("n_id"))
    val candIds = q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("ham", bit_count(col("q_code").bitwiseXOR(col("n_code"))))
      .withColumn("prerank", row_number().over(wHam))
      .filter(col("prerank") <= cands)
      .select(col("q_id"), col("n_id"))
    val full = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val gathered = full.join(broadcast(candIds), Seq("n_id"))
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))),
        Seq("q_id"))
    topKBySim(gathered, k)
  }

  /** Embedding near-duplicate pairs: sign-LSH blocking, then exact cosine
    * threshold inside each bucket (a < b). `planeBits = None` derives the
    * bucket count from the corpus size ([[planeBitsFor]]) so the
    * within-bucket quadratic term stays bounded at any scale; size
    * resolution as in [[lshBucketTopK]] (stats/footers beat a plan-time
    * count()).
    */
  def nearDupPairs(corpus: DataFrame, minCosine: Double,
                   planeBits: Option[Int] = None,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   corpusSize: Option[Long] = None): DataFrame = {
    val bits = planeBits.getOrElse(planeBitsFor(corpusSize.getOrElse(corpus.count())))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      signBucket(col(vecCol), bits).as("bucket"))
    val x = c.select(col("bucket"), col("id").as("a"), col("vec").as("va"))
    val y = c.select(col("bucket"), col("id").as("b"), col("vec").as("vb"))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > minCosine)
      .select(col("a"), col("b"), col("cos"))
  }
}
