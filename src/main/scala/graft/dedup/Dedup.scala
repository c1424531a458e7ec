package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for the LLM-data-pipeline extension: exact,
  * MinHash+LSH banded near-dup, and SimHash. All built from codegen'd
  * higher-order functions over token/shingle arrays — no UDFs — with
  * deterministic integer hashing ([[TextOps.polyHash]]) mirrored in the
  * DuckDB oracle ([[DedupSql]]).
  *
  * Scale shape (100 TB): every stage is a narrow map except the final
  * candidate join, which shuffles on (band index, band hash) — the classic
  * MinHash-LSH band-bucket join. Bucket sizes are bounded by band width
  * (r rows/band), so the self-join never degenerates into a cross product;
  * skewed buckets (boilerplate docs) are handled by AQE skew splitting.
  * The exact-Jaccard verification joins shingle sets back by doc id — a
  * broadcast at candidate-pair cardinality, a shuffle join beyond.
  */
object Dedup {

  val P: Long = TextOps.P
  val MIX: Long = TextOps.MIX
  /** MinHash signature length / LSH banding: K = BANDS * R. */
  val K = 32
  val BANDS = 16
  val R = 2
  /** SimHash width in bits (int64-safe). */
  val SIMBITS = 48

  /** Exact dedup: keep the lowest doc id per identical text — the
    * hash-groupBy form (`min` per group; one shuffle on the text hash).
    * At scale one groups on `xxhash64(text)` first and resolves the rare
    * collisions within groups; semantics here are on the raw text.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** MinHash slot i of a shingle-hash set: min over the set of the i-th
    * universal hash `(a_i*h + b_i) mod P`. Codegen'd kernel
    * ([[graft.functions.MinHashSig]]); [[minhashSignatureHof]] is the
    * equivalent pure-builtin formulation (kept for the equivalence spec).
    */
  def minhashSignature(shingleHashes: Column): Column =
    graft.functions.ArrayKernels.minhash_sig(shingleHashes, K)

  def minhashSignatureHof(shingleHashes: Column): Column =
    transform(sequence(lit(0), lit(K - 1)), i =>
      array_min(transform(shingleHashes, h =>
        (((i * 2 + 1) * (MIX % P) % P) * h + (i * 2 + 2) * (MIX % P) % P) % P)))

  /** LSH band hashes: band j folds its R signature slots into one bucket
    * key. Docs sharing ANY band bucket become candidate pairs.
    */
  def bandHashes(sig: Column): Column =
    transform(sequence(lit(0), lit(BANDS - 1)), j =>
      (element_at(sig, j * R + 1) * 31L + element_at(sig, j * R + 2)) % P)

  /** Near-dup pairs by MinHash-LSH with exact-Jaccard verification:
    * shingle → sign → band → bucket self-join → verify `J(A,B) >= minJaccard`
    * on the true shingle sets. Returns (a, b, jaccard), a < b.
    */
  def minhashPairs(docs: DataFrame, minJaccard: Double,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Signature table is tiny relative to the corpus — materialize it so the
    // band self-join's two branches don't recompute shingling, and so
    // CollapseProject can't re-inline the HOF chains (which would turn the
    // signature into a per-branch recompute). localCheckpoint (not persist):
    // the blocks are RDD-level, so the ContextCleaner reclaims them when the
    // returned DataFrame is GC'd — persist() pins a CacheManager entry for
    // the session's lifetime, which accumulates across a long query sweep.
    // At cluster scale, swap for reliable checkpoint() or persist+unpersist
    // if executor loss must be recoverable mid-query.
    val sh = docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextOps.shingleHashes(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(eager = false)
    val bands = sh
      .select(col("id"), posexplode(bandHashes(minhashSignature(col("sh")))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
      .localCheckpoint(eager = false)
    // Distinct candidate ids FIRST (cheap fixed-width shuffle), then join
    // the shingle sets back by id — never shuffle arrays at candidate
    // cardinality.
    val cand = bands.select(col("band"), col("bh"), col("id").as("a"))
      .join(bands.select(col("band"), col("bh"), col("id").as("b")), Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(sh.select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni", (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash over whitespace tokens: per-token polynomial hash, per-bit
    * signed vote via `(a_j*h + b_j) mod P mod 2`, fold bits high→low into
    * one int64 (`acc*2 + bit`). Same arithmetic in [[DedupSql.simhash]].
    * `th`: MATERIALIZED token-hash array column (HOF re-inlining would
    * otherwise recompute token hashing once per bit). Codegen'd kernel;
    * [[simhashHof]] is the pure-builtin equivalent for the spec.
    */
  def simhash(th: Column): Column = graft.functions.ArrayKernels.simhash48(th)

  def simhashHof(th: Column): Column = {
    aggregate(sequence(lit(SIMBITS - 1), lit(0), lit(-1)), lit(0L), (acc, j) => {
      val aj = (j * 2 + 101) * (MIX % P) % P
      val bj = (j * 2 + 102) * (MIX % P) % P
      val vote = aggregate(th, lit(0L), (s, h) =>
        s + when(((aj * h + bj) % P) % 2 === 1, 1L).otherwise(-1L))
      acc * 2 + when(vote > 0, 1L).otherwise(0L)
    })
  }

  /** Split a simhash into `nb` contiguous bands (for banded hamming join). */
  def simhashBands(sim: Column, nb: Int = 4): Column = {
    val width = SIMBITS / nb
    array((0 until nb).map(k =>
      shiftrightunsigned(sim, k * width) % (1L << width)): _*)
  }

  /** Near-pairs by SimHash: candidates share >=1 of `nb` bands (pigeonhole:
    * catches every pair within `nb-1` bit flips, probabilistically more),
    * verified by exact hamming distance `bit_count(a XOR b) <= maxHamming`.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sims = docs
      .select(col(idCol).as("id"),
        TextOps.polyHashAll(TextOps.tokens(col(textCol))).as("th"))
      .select(col("id"), simhash(col("th")).as("sim"))
      // see minhashPairs: block re-inlining across the self-join; RDD-level
      // blocks are GC-reclaimed, unlike a CacheManager persist() entry
      .localCheckpoint(eager = false)
    val bands = sims.select(col("id"), col("sim"),
      posexplode(simhashBands(col("sim"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val x = bands.select(col("band"), col("bh"), col("id").as("a"), col("sim").as("sima"))
    val y = bands.select(col("band"), col("bh"), col("id").as("b"), col("sim").as("simb"))
    x.join(y, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sima"), col("simb")).distinct()
      .withColumn("hamming", bit_count(col("sima").bitwiseXOR(col("simb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
  }
}
