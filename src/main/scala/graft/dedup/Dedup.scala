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
  /** Char-n-gram banding: same K, split 8×4 (S-curve threshold ~0.59) —
    * see [[bandHashes]] for why n-grams need a higher blocking threshold.
    */
  val NGRAM_BANDS = 8
  val NGRAM_R = 4
  /** Char-gram width. Measured on the test corpus: k=5 leaves a
    * same-language noise floor of J≈0.17 median / 0.26 p99 (common words
    * are ≤5 chars), k=7 drops it to 0.06/0.13 — two orders of magnitude
    * fewer LSH candidates at the same banding, with true near-dups
    * (substring-sharing rewrites) unaffected.
    */
  val NGRAM_K = 7
  /** SimHash width in bits (int64-safe). */
  val SIMBITS = 48

  /** Sorted-neighborhood blocking: normalized-prefix key length and the
    * sliding window width (each record pairs with its `SNM_W - 1`
    * successors in key order).
    */
  val SnmKeyLen = 24
  val SnmW = 6

  /** Content-defined chunking: gram width for the rolling boundary hash
    * and the boundary mask (cut where `hash % CDC_MASK == 0` → expected
    * chunk length ≈ CDC_MASK chars). Top-N duplicated chunks reported.
    */
  val CDC_K = 7
  val CDC_MASK = 64
  val CDC_TOP = 50

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

  /** LSH band hashes: band j folds its `r` signature slots into one bucket
    * key. Docs sharing ANY band bucket become candidate pairs. The (b, r)
    * split of the K-slot signature sets the S-curve threshold
    * `t ≈ (1/b)^(1/r)`: 16×2 centers at ~0.25 (right for word shingles,
    * where random-pair J ≈ 0), 8×4 at ~0.59 (required for char n-grams,
    * where same-language documents share enough common-word grams that
    * J ≈ 0.3 is the NOISE floor — 16×2 there fires on ~90% of all pairs
    * and the candidate set goes quadratic; measured 215 s vs 2 s at sf0.1).
    */
  def bandHashes(sig: Column, bands: Int = BANDS, r: Int = R): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      aggregate(sequence(lit(1), lit(r)), lit(0L), (acc, i) =>
        (acc * 31L + element_at(sig, j * r + i)) % P))

  /** Session-scoped LSH index memo. The (distinct-set, band-explosion)
    * frames for a given (session, corpus plan, featurization, banding)
    * are the INDEX every LSH-family operator probes — pairs, components,
    * incremental, containment, and the composed pipeline all need the
    * same two materializations, so they are computed once per session
    * (the in-session analog of [[graft.sim.Similarity.writeIvfIndex]]'s
    * persisted lists; at 100 TB this index lives as parquet, appended
    * per ingested batch). `localCheckpoint` blocks are a few MB at test
    * scale and are freed on session stop or [[clearIndexCache]].
    *
    * Scale notes (all measured, see PLANS.md):
    *   - Signature table materialized via `localCheckpoint` so the band
    *     self-join's two branches don't recompute hashing and
    *     CollapseProject can't re-inline the HOF chains; RDD-level blocks
    *     are ContextCleaner-reclaimed, unlike a session-pinned persist().
    *   - Distinct candidate ids FIRST (cheap fixed-width shuffle), then
    *     the sets re-join by id — never shuffle arrays at candidate
    *     cardinality (measured 2×).
    */
  private val shBandCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession,
      Int, String), (DataFrame, DataFrame)]()

  /** Bands-only variant of the index memo, for featurizations whose raw
    * sets are too large to be worth pinning (see [[ngramJaccardPairs]]).
    */
  private val bandOnlyCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession,
      Int, String), DataFrame]()

  /** Ranked sorted-neighborhood frame memo: (rn, id, s) per
    * (session, docs plan, window params) — the plan-time cost of the
    * checkpointed featurization+rank subtree is paid once per corpus,
    * mirroring [[shBandCache]].
    */
  private val snmCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession,
      Int, String), DataFrame]()

  def clearIndexCache(): Unit = {
    shBandCache.clear(); bandOnlyCache.clear(); ccCache.clear(); snmCache.clear()
  }

  /** Drop memo entries whose session has stopped: the RDD blocks go with
    * the session, but without this sweep the map entries would pin the
    * stopped SparkSession (and its analyzed plans) for the JVM lifetime —
    * a slow leak in one-session-per-job deployments. Runs on every memo
    * access; O(entries), which is O(jobs this JVM ran).
    */
  private def purgeStopped[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V])
                                (session: K => org.apache.spark.sql.SparkSession): Unit =
    m.keySet.removeIf(k => session(k).sparkContext.isStopped)

  private def shingleBandIndex(docs: DataFrame, fkey: String,
                               sets: DataFrame => DataFrame,
                               nBands: Int, r: Int): (DataFrame, DataFrame) = {
    purgeStopped(shBandCache)(_._1)
    shBandCache.computeIfAbsent(
      (docs.sparkSession, docs.queryExecution.analyzed.semanticHash(),
        s"$fkey/$nBands/$r"),
      _ => {
        // NO declared layout on either half (deliberate — the
        // checkpointHashPartitioned discipline was A/B-measured here and
        // REJECTED, round 12): `sh` rows carry the shingle arrays, so a
        // build-time hash(id) exchange costs more than the verify-join
        // exchanges it would save; and pre-bucketing `bands` on
        // (band, bh) statically co-partitions the bucket self-join,
        // which REMOVES the exchange AQE needs as a runtime re-plan
        // point — measured net slower (16.4 s vs 11.6 s family A/B at
        // sf0.1) than letting AQE size/convert those narrow-row joins
        // itself. The declared-layout trick pays where the payload is
        // heavy and the join never broadcast-converts (the graph
        // adjacency, the SNM ranked frame); band rows are three longs.
        val sh = sets(docs).filter(size(col("s")) > 0)
          .localCheckpoint(eager = false)
        val bands = sh
          .select(col("id"),
            posexplode(bandHashes(minhashSignature(col("s")), nBands, r)))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
          .localCheckpoint(eager = false)
        (sh, bands)
      })
  }

  /** Band index WITHOUT the raw-set table: one narrow pass
    * set→signature→band-explosion, only the (id, band, bh) rows are
    * retained. For featurizations where the per-doc set is ~the document
    * length (char n-grams), pinning the sets corpus-wide is the memory
    * hazard — at 100 TB the gram sets ARE the corpus re-encoded 8× wider,
    * and locally a ~200 MB eager block allocation is exactly the kind of
    * GC cliff that turns a 2 s query into a 16 s one. Verification
    * recomputes sets for the candidate branches instead: linear, narrow,
    * and never materialized.
    */
  private def bandIndexOnly(docs: DataFrame, fkey: String,
                            sets: DataFrame => DataFrame,
                            nBands: Int, r: Int): DataFrame = {
    purgeStopped(bandOnlyCache)(_._1)
    bandOnlyCache.computeIfAbsent(
      (docs.sparkSession, docs.queryExecution.analyzed.semanticHash(),
        s"$fkey/$nBands/$r"),
      _ => sets(docs).filter(size(col("s")) > 0)
        .select(col("id"),
          posexplode(bandHashes(minhashSignature(col("s")), nBands, r)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
        .localCheckpoint(eager = false))
  }

  private def wordSets(idCol: String, textCol: String)(docs: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      // sorted ascending at build: every consumer is order-invariant
      // (minhash = min per hash fn, overlap sizes), and the sort — once
      // per DOC — buys the primitive two-pointer SortedIntersectCount for
      // every verification PAIR (pairs ≫ docs on any near-dup corpus)
      .select(col("id"), sort_array(TextOps.shingleHashes(col("toks"))).as("s"))

  private def ngramSets(idCol: String, textCol: String, k: Int)(docs: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"),
      sort_array(array_distinct(TextOps.charGramHashes(col(textCol), k))).as("s"))

  /** Distinct candidate (a, b) pairs from a band self-join: the full index
    * on the a side, an arbitrary probe subset on the b side.
    */
  private def candidatePairs(bands: DataFrame, probe: DataFrame): DataFrame =
    bands.select(col("band"), col("bh"), col("id").as("a"))
      .join(probe.select(col("band"), col("bh"), col("id").as("b")), Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()

  /** Exact-Jaccard verification of candidate (a, b) id pairs against the
    * true hash sets `sh` = (id, s).
    */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            minJaccard: Double): DataFrame =
    cand
      .join(sh.select(col("id").as("a"), col("s").as("sha")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("s").as("shb")), Seq("b"))
      .withColumn("inter", graft.functions.ArrayKernels.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("uni", (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))

  /** Asymmetric containment pairs: `max(|A∩B|/|A|, |A∩B|/|B|) >= minC` —
    * the quote/subset detector (a doc wholly contained in a larger one has
    * high containment but can have LOW Jaccard, so a Jaccard threshold
    * misses it). Candidates come from the same minhash banding as
    * [[minhashPairs]] — right when the pair sizes are comparable; a
    * production pass targeting extreme size ratios would band the SMALLER
    * set's signature only (documented trade-off; the oracle mirrors this
    * candidate generation exactly, so parity is independent of recall).
    */
  def containmentPairs(docs: DataFrame, minContainment: Double,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (sh, bands) = shingleBandIndex(docs, s"word/$idCol/$textCol",
      wordSets(idCol, textCol), BANDS, R)
    candidatePairs(bands, bands)
      .join(sh.select(col("id").as("a"), col("s").as("sha")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("s").as("shb")), Seq("b"))
      .withColumn("inter", graft.functions.ArrayKernels.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("containment",
        greatest(col("inter").cast("double") / size(col("sha")),
          col("inter").cast("double") / size(col("shb"))))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"), col("containment"))
  }

  /** Incremental near-dup: pairs involving a NEW document (id >= splitId)
    * — the batch-ingestion shape: dedup each arriving batch against the
    * already-ingested corpus without re-running the full self-join. The
    * corpus side is banded once (at scale: a persisted signature index,
    * appended per batch); the band join probes only new-side buckets, so
    * candidate work is proportional to the NEW batch, not the corpus.
    * Output == the subset of [[minhashPairs]] with b in the new batch
    * (new ids sort above old ids), which is exactly what the oracle
    * asserts.
    */
  def incrementalMinhashPairs(docs: DataFrame, splitId: Long, minJaccard: Double,
                              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (sh, bands) = shingleBandIndex(docs, s"word/$idCol/$textCol",
      wordSets(idCol, textCol), BANDS, R)
    verifyJaccard(
      candidatePairs(bands, bands.filter(col("id") >= splitId)), sh, minJaccard)
  }

  /** Estimator calibration for the MinHash sketch: every banded candidate
    * pair (no threshold — sub-threshold candidates are the point) with
    * the SKETCH estimate (matching signature coordinates / K, the
    * unbiased MinHash Jaccard estimator) next to the exact set Jaccard
    * and the absolute error. This is the audit a dedup deployment runs
    * before trusting signatures alone (e.g. before dropping the exact
    * verify pass at scale): the error column is the measured estimator
    * noise at K = 32 (stddev ≈ √(J(1−J)/K) ≈ 0.09 worst case — the spec
    * bounds the observed mean error). Reuses the session-memoized
    * band/set index, and the K=32 signature recompute runs only for ids
    * that appear in some candidate pair (semi-join first — a doc in no
    * bucket collision never pays the signature kernel).
    */
  def minhashCalibration(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val (sh, bands) = shingleBandIndex(docs, s"word/$idCol/$textCol",
      wordSets(idCol, textCol), BANDS, R)
    val cand = candidatePairs(bands, bands)
    val sig = sh.join(
        cand.select(col("a").as("id"))
          .unionAll(cand.select(col("b").as("id"))).distinct(),
        Seq("id"), "left_semi")
      .select(col("id"), col("s"), minhashSignature(col("s")).as("sig"))
    cand
      .join(sig.select(col("id").as("a"), col("s").as("sha"),
        col("sig").as("siga")), Seq("a"))
      .join(sig.select(col("id").as("b"), col("s").as("shb"),
        col("sig").as("sigb")), Seq("b"))
      .withColumn("inter",
        graft.functions.ArrayKernels.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("exact_jaccard", col("inter").cast("double") / col("uni"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
          m => m)).cast("double") / lit(K.toDouble))
      .select(col("a"), col("b"), col("est_jaccard"), col("exact_jaccard"),
        abs(col("est_jaccard") - col("exact_jaccard")).as("abs_err"))
      .orderBy("a", "b")
  }

  /** Near-dup pairs by MinHash-LSH with exact-Jaccard verification:
    * shingle → sign → band → bucket self-join → verify `J(A,B) >= minJaccard`
    * on the true shingle sets. Returns (a, b, jaccard), a < b.
    */
  def minhashPairs(docs: DataFrame, minJaccard: Double,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (sh, bands) = shingleBandIndex(docs, s"word/$idCol/$textCol",
      wordSets(idCol, textCol), BANDS, R)
    verifyJaccard(candidatePairs(bands, bands), sh, minJaccard)
  }

  /** Near-dup pairs by character n-gram Jaccard: the tokenization-free
    * variant (robust to whitespace/punctuation differences that change
    * word shingles). Distinct char k-gram hash sets, same LSH blocking,
    * exact Jaccard verify. Returns (a, b, jaccard), a < b.
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double, k: Int = NGRAM_K,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bands = bandIndexOnly(docs, s"ngram$k/$idCol/$textCol",
      ngramSets(idCol, textCol, k), NGRAM_BANDS, NGRAM_R)
    // verify against freshly-computed gram sets: two extra narrow kernel
    // passes over the corpus instead of a pinned corpus-width array table
    // (the sets here are ~|text| longs per doc — see bandIndexOnly).
    verifyJaccard(candidatePairs(bands, bands),
      ngramSets(idCol, textCol, k)(docs), minJaccard)
  }

  /** Duplicate-span window width (tokens) for [[substringSpans]]. */
  val SPAN_K = 8

  /** Exact substring-span dedup — the distributed shingle formulation of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL'22): every sliding [[SPAN_K]]-token window that appears
    * verbatim in >= 2 distinct documents marks its token span as
    * duplicated, and overlapping duplicated windows merge into maximal
    * spans (window-function island detection). Unlike the whole-document
    * near-dup families above, this catches PARTIAL duplication — quoted
    * passages, shared boilerplate runs — inside otherwise-unique
    * documents, which is what the suffix-array original removes.
    *
    * One row per document: (doc_id, n_toks, n_spans, dup_tokens, spans)
    * where `spans` is a "start-end,start-end" 1-based inclusive interval
    * list ('' when clean). Integer/string logic end to end — bit-exact
    * against the oracle by construction, no float folds needed.
    *
    * Scale shape (100 TB): the position explode carries one row per
    * token, the same cardinality every shingle op here pays; the single
    * wide stage groups windows for the cross-document frequency filter.
    * The group key here is the window STRING (zero collision risk,
    * oracle-exact); at corpus scale group on `xxhash64(window)` first
    * (8 bytes through the shuffle instead of ~60) and resolve the rare
    * collisions inside buckets — the same escape documented on [[exact]].
    * The span merge is a per-document window over only the duplicated
    * positions (near-empty for clean docs). The suffix-array original is
    * a single-machine construction; this is its shuffle-native analog.
    */
  def substringSpans(docs: DataFrame, k: Int = SPAN_K,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        col("toks"))
    // shingle ONCE into a lazy checkpoint laid out on the shingle key:
    // `pos` feeds the duplicated-shingle aggregate AND the semi-join
    // probe, and `base` a third consumer (the final all-docs join) —
    // column pruning specializes each copy below the parallelism-repair
    // repartition, so the corpus was tokenized three times and shingled
    // twice, with no exchange reuse (measured at 10x data: three
    // identical 8-task tokenize stages plus 25 s + 20 s CPU shingle
    // copies). The declared hash(sh) layout (Bridge re-tag) feeds both
    // consumers where they need it: the groupBy(sh) aggregates in place
    // and the left-semi probe is already co-partitioned with the
    // aggregate's output, so neither re-shuffles the shingle stream.
    val pos = graft.Tables.checkpointHashPartitioned(
      base.filter(col("n_toks") >= k)
        .select(col("doc_id"),
          explode(sequence(lit(1L), col("n_toks") - (k - 1))).as("pos"),
          col("toks"))
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", slice(col("toks"), col("pos").cast("int"), lit(k)))
            .as("sh")),
      Seq("sh"), docs.sparkSession.sparkContext.defaultParallelism,
      eager = false)
    val dup = pos.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("sh"))
    val dupPos = pos.join(dup, Seq("sh"), "leftsemi")
      .select(col("doc_id"), col("pos"), (col("pos") + (k - 1)).as("endp"))
    // island detection: a new span starts where this window begins past
    // everything any earlier window reached (positions are unique per doc)
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dupPos
      .withColumn("newIsl",
        when(col("pos") > coalesce(
          max(col("endp")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("islId", sum(col("newIsl")).over(byPos))
      .groupBy(col("doc_id"), col("islId"))
      .agg(min(col("pos")).as("s"), max(col("endp")).as("e"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"),
        array_join(transform(
            array_sort(collect_list(struct(col("s"), col("e")))),
            x => concat(x("s").cast("string"), lit("-"), x("e").cast("string"))),
          ",").as("spans"))
    base.select(col("doc_id"), col("n_toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("spans"), lit("")).as("spans"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------------------
  // Connected components over the near-dup pair graph: the stage that turns
  // PAIRS into CLUSTERS so exactly one canonical document survives per
  // near-dup group (pairs alone under-delete: a~b, b~c must collapse to one
  // doc even when a~c was never emitted). Implemented as the alternating
  // large-star / small-star edge contraction of Kiveris et al.,
  // "Connected Components in MapReduce and Beyond" (SoCC'14) — a public
  // algorithm that converges in O(log^2 n) rounds, vs O(diameter) for naive
  // label propagation. Each round is two shuffles on node id; edge lists
  // only ever shrink toward the star forest, so peak shuffle volume is the
  // input pair count. This is the shape that survives 100 TB; a GraphX-style
  // Pregel loop would carry vertex state through every round instead.
  // --------------------------------------------------------------------------

  /** Large-star: connect every strictly-larger neighbor of u to u's minimum
    * neighborhood label. Input/output edges are directed (u, v) with v < u.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: connect every smaller neighbor of u — and u itself — to the
    * minimum of u's smaller neighborhood. Preserves the v < u orientation.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    e.join(mins, "u").select(col("v").as("w"), col("m"))
      .union(mins.select(col("u").as("w"), col("m")))
      .filter(col("w") =!= col("m"))
      .select(col("w").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Connected components of an undirected pair graph. Input: (a, b) pairs
    * (any orientation, duplicates fine). Output: (u, root) — one row per
    * NON-ROOT node, root = minimum node id of its component.
    *
    * Convergence test: both sides distinct, so `|E'| == |E|` plus an inner
    * join of the same size proves set equality — two cheap counts and one
    * key-key join per round, no EXCEPT. Each round's frontier is
    * `localCheckpoint`ed: the loop is driver-coordinated (as every
    * iterative graph algorithm is), but per-round lineage is cut so round
    * k never recomputes rounds 0..k-1.
    */
  /** Session memo for converged component frames: the driver-coordinated
    * rounds are the one part of the dedup family whose cost cannot hide in
    * a lazy plan, and every consumer of the same pair graph (canonical-doc
    * selection, the composed training pipeline) needs the identical
    * result, so converge once per (session, pair-graph plan).
    */
  private val ccCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession,
      Int, Int), DataFrame]()

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    purgeStopped(ccCache)(_._1)
    ccCache.computeIfAbsent(
      (pairs.sparkSession, pairs.queryExecution.analyzed.semanticHash(), maxIter),
      _ => ccConverge(pairs, maxIter))
  }

  private def ccConverge(pairs: DataFrame, maxIter: Int): DataFrame = {
    var e = pairs.select(
        greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var nE = e.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // ONE action per round: a full-outer join of the two DISTINCT edge
      // sets yields |next ∪ e| (count of joined rows) and |next| (count of
      // next-side markers) in the same pass; set equality ⟺ both == |e|.
      val row = next.withColumn("nn", lit(1))
        .join(e.withColumn("oo", lit(1)), Seq("u", "v"), "full_outer")
        .agg(count(lit(1)), count(col("nn"))).head()
      val total = row.getLong(0)
      val nNext = row.getLong(1)
      converged = total == nE && nNext == nE
      e = next
      nE = nNext
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    e.select(col("u"), col("v").as("root"))
  }

  /** Canonical-document selection: map EVERY doc to the minimum doc id of
    * its near-dup component (itself when unpaired), with the component size
    * and a keep flag. `docs LEFT JOIN components` — components is at most
    * pair-graph-node sized, so at 100 TB this is a broadcast against the
    * corpus scan unless near-dup density is pathological.
    */
  def canonicalDocs(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val roots = connectedComponents(pairs)
      .select(col("u").as(idCol), col("root"))
    val mapping = docs.select(col(idCol))
      .join(roots, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("root"), col(idCol)).as("canonical_id"))
    val sizes = mapping.groupBy("canonical_id")
      .agg(count(lit(1)).as("cluster_size"))
    mapping.join(sizes, Seq("canonical_id"))
      .select(col(idCol), col("canonical_id"), col("cluster_size"),
        (col(idCol) === col("canonical_id")).cast("int").as("keep"))
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

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo, "The
    * merge/purge problem for large databases", SIGMOD'95): sort records by
    * a normalized blocking key (here the first [[SnmKeyLen]] chars of
    * [[TextOps.normalize]]d text), slide a [[SnmW]]-record window down the
    * sorted order, and exact-verify only window-adjacent pairs — the
    * classic entity-resolution alternative to hash blocking, catching
    * near-dups whose edits fall OUTSIDE the key prefix that LSH banding
    * on full content also catches, at linear candidate cost (N·(w-1)).
    *
    * The global rank is a two-level distributed prefix sum, NOT one
    * unpartitioned window: order-preserving coarse buckets (first 2 key
    * chars) get a serial offset window over O(#buckets) rows, and the
    * per-bucket row_number runs partition-parallel — the same parallel-
    * scan shape as [[graft.ops.Stats]]' rank machinery, so the sort
    * scales with executors while the DuckDB oracle keeps its one-window
    * formulation (identical integers). Window pairs come from a BLOCK
    * equi-join, not a w-1-way rank explode: ranks are grouped into
    * contiguous blocks of w, each probe row is replicated to its own
    * block and the next (2 copies — any pair within distance w-1 spans
    * at most two adjacent w-blocks), and the equi-join on the block id
    * applies the cheap long-distance predicate BEFORE the shingle
    * intersect kernel ever runs. The build side is the checkpointed
    * ranked frame itself, already hash-partitioned on the block id, so
    * the pair join shuffles the shingle arrays 2x (the replicas) instead
    * of the explode form's (w-1)x, and the SHUFFLE_HASH build means no
    * SortMergeJoin ever sorts rows carrying the arrays (the same
    * payload-sort discipline as the triangle-count adjacency attach).
    * Verification is the same exact shingle-set Jaccard as the LSH
    * families. Returns (a, b, jaccard), a < b.
    */
  /** Test observability hook: the last ranked/checkpointed frame
    * [[sortedNeighborhoodPairs]] built or reused. PlanShapeSpec pins its
    * partition count to session width — the round-11 cores-report fix: a
    * `localCheckpoint` FREEZES whatever width AQE left, and without the
    * explicit repartition the small `bk` exchange's 4-8-partition
    * coalesce became permanent for every downstream scan.
    */
  @volatile private[graft] var snmRankedForTest: DataFrame = _

  def sortedNeighborhoodPairs(docs: DataFrame, window: Int = SnmW,
                              keyLen: Int = SnmKeyLen, minJaccard: Double = 0.5,
                              idCol: String = "doc_id", textCol: String = "text"
                             ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    purgeStopped(snmCache)(_._1)
    // checkpoint + memo: the ranked frame (with its regex-normalize +
    // shingle featurization and two window passes) feeds BOTH sides of
    // the rank self-join — without the lineage break the whole
    // featurization plan recomputes per side (measured 8.7 s -> ~2 s at
    // sf0.01), and the memo amortizes the checkpoint's one-time plan
    // compilation across calls on the same corpus.
    val ranked = snmCache.computeIfAbsent(
      (docs.sparkSession, docs.queryExecution.analyzed.semanticHash(),
        s"$idCol/$textCol/$keyLen/$window"),
      _ => {
        // featurize ONCE into a lazy bk-partitioned checkpoint. The
        // featurization (normalize + tokenize + shingle hash + sort) feeds
        // TWO consumers — the bucket-offset aggregate and the rank window
        // — and without a lineage break each consumer re-featurizes the
        // whole corpus independently; worse, column pruning pushes the
        // offset branch's copy BELOW the parallelism-repair repartition,
        // so it ran at raw scan width (measured at 10x data on 32 cores:
        // 33.4 s CPU over 8 tasks = 6.2 s serial-ish wall, PLUS a 49 s-CPU
        // 32-wide copy for the window branch; the r14 cores report read
        // the query at ~1.0x 4->32 speedup — the round-8 serial-stage
        // signature). The checkpoint's declared hash(bk) layout (Bridge
        // re-tag) also lets EnsureRequirements elide the rank window's
        // exchange, so the arrays never move between featurization and
        // ranking.
        val sh = graft.Tables.checkpointHashPartitioned(
          docs.select(col(idCol).as("id"),
              substring(TextOps.normalize(col(textCol)), 1, keyLen).as("key"),
              // sorted ascending: the Jaccard verify below runs the
              // two-pointer SortedIntersectCount kernel, whose contract is
              // sorted input — shingleHashes alone emits first-occurrence
              // order, which would undercount on non-identical near-dups
              sort_array(TextOps.shingleHashes(TextOps.tokens(col(textCol)))).as("s"))
            .filter(size(col("s")) > 0)
            .withColumn("bk", substring(col("key"), 1, 2)),
          Seq("bk"), docs.sparkSession.sparkContext.defaultParallelism,
          // lazy: materializes inside the first consuming action instead
          // of a separate construct-time job (one fewer cold-path job;
          // the broadcast build of `off` below triggers it, and the rank
          // pass then reads the materialized partitions)
          eager = false)
        val wOff = Window.orderBy(col("bk"))
        val off = sh.groupBy(col("bk")).agg(count(lit(1)).as("cnt"))
          .select(col("bk"), (sum(col("cnt")).over(wOff) - col("cnt")).as("off"))
        val inner = Window.partitionBy(col("bk")).orderBy(col("key"), col("id"))
        sh.join(broadcast(off), "bk")
          .withColumn("rn", row_number().over(inner) + col("off"))
          // blk groups the rank order into contiguous blocks of w: any
          // pair within distance w-1 lives in one block or two ADJACENT
          // blocks, so the pair join below is an equi-join on blk with a
          // 2-way replica explode — not a (w-1)-way rank explode
          .select(col("rn"), floor(col("rn") / window).as("blk"),
            col("id"), col("s"))
          // pin the CHECKPOINT's width: the frame freezes with whatever
          // partitioning the rank plan produced, and AQE's byte-coalescing
          // leaves the small bk exchange at ~4-8 partitions — every
          // downstream stage that scans the checkpoint (the pair join and
          // the per-pair intersect kernel, the query's CPU) then runs
          // that narrow forever (measured 8-wide / 28 s-CPU stages on a
          // 32-core session at 10× data; the round-11 cores report flagged
          // the 1.27× 4→32 speedup). One small exchange at build time
          // buys full width for every probe — and partitioning on blk
          // (with the layout RE-DECLARED on the checkpoint, which AQE
          // otherwise returns as UnknownPartitioning) means the BUILD
          // side of the pair join is already distributed on the join
          // key: only the 2x probe replicas shuffle, the build side's
          // exchange is elided outright.
          .transform(d => graft.Tables.checkpointHashPartitioned(d,
            Seq("blk"), docs.sparkSession.sparkContext.defaultParallelism,
            eager = false))
      })
    snmRankedForTest = ranked
    val left = ranked
      .select(col("rn").as("rna"), col("id").as("ia"), col("s").as("sa"),
        col("blk"))
      // replicate each probe row to its own block and the next: distance
      // <= w-1 never spans more than two adjacent w-blocks
      .withColumn("blk", explode(array(col("blk"), col("blk") + 1)))
    left.join(
        ranked.select(col("rn").as("rnb"), col("id").as("ib"),
          col("s").as("sb"), col("blk")).hint("shuffle_hash"),
        Seq("blk"))
      // the distance predicate compares two longs; Catalyst folds an
      // inner-join filter into the join condition, so it runs at probe
      // time — before any shingle arrays reach the intersect kernel
      .filter(col("rnb") > col("rna") && col("rnb") < col("rna") + window)
      // single-kernel pre-gate: i/(A+B-i) >= t  <=>  i*(1+t) >= t*(A+B)
      // (denominator always positive — non-empty shingle sets). The
      // division form that the final jaccard filter folds into the join
      // condition references the intersect kernel TWICE per candidate;
      // this algebraic form references it once, and short-circuits the
      // folded condition so the exact-jaccard re-check only ever runs on
      // the (rare) survivors. The RHS is slackened by 1e-9*(A+B): the
      // algebraic form is real-equivalent but not FLOAT-equivalent to the
      // division form for thresholds whose (1+t) rounds (t=0.3 at a
      // jaccard==t tie), and a too-tight gate would silently drop a pair
      // the exact filter and the oracle keep. The slack (relative 1e-9)
      // dwarfs the few-ulp rounding of either side, so the gate can only
      // over-admit — the exact jaccard filter below stays the sole decider.
      .filter(graft.functions.ArrayKernels
          .sorted_intersect_count(col("sa"), col("sb")).cast("double") *
          (lit(1.0) + minJaccard) >=
        lit(minJaccard - 1e-9) *
          (size(col("sa")) + size(col("sb"))).cast("double"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("sa"), col("sb"))
      .withColumn("inter", graft.functions.ArrayKernels.sorted_intersect_count(col("sa"), col("sb")))
      .withColumn("uni", (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Persist the word-shingle MinHash-LSH index: the raw hash sets and
    * the (id, band, bh) band table, the latter PARTITIONED BY band so a
    * probe that only needs some bands reads only those directories —
    * the train-once/search-many deployment shape, mirroring
    * [[graft.sim.Similarity.writeIvfIndex]]. At 100 TB the index is
    * built by one featurization pass and appended per ingested batch;
    * every downstream dedup/decontamination job starts from the files
    * instead of re-hashing the corpus.
    */
  def writeLshIndex(docs: DataFrame, indexDir: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (sh, bands) = shingleBandIndex(docs, "word", wordSets(idCol, textCol),
      BANDS, R)
    sh.write.mode("overwrite").parquet(s"$indexDir/sets")
    // cluster by band before the partitioned write: one file per band
    // directory instead of (tasks × bands) shards — at any scale the
    // band dirs stay one-file-per-writer-wave, and the probe-side reads
    // of a single band stay sequential
    bands.select(col("id"), col("bh"), col("band"))
      .repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$indexDir/bands")
  }

  /** Near-dup pairs from a persisted index ([[writeLshIndex]]): identical
    * result contract to [[minhashPairs]] — candidate band self-join on
    * the persisted band table, exact-Jaccard verify against the persisted
    * sets. No corpus re-featurization.
    */
  def minhashPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, minJaccard: Double): DataFrame = {
    val sh = spark.read.parquet(s"$indexDir/sets")
    val bands = spark.read.parquet(s"$indexDir/bands")
      .select(col("id"), col("band"), col("bh"))
    verifyJaccard(candidatePairs(bands, bands), sh, minJaccard)
  }

  /** Content-defined chunking duplicate report (the Rabin/FastCDC family:
    * Muthitacharoen et al., "A low-bandwidth network file system",
    * SOSP'01): cut each document where the rolling [[CDC_K]]-gram hash
    * ≡ 0 mod [[CDC_MASK]], so chunk boundaries follow CONTENT, not
    * offsets — an insertion early in a document shifts every byte but
    * re-synchronizes at the next content-defined cut, which is why CDC
    * (not fixed-size blocks) is the storage-dedup primitive. Each chunk
    * is identified by its polynomial hash; the report is the top
    * [[CDC_TOP]] chunks appearing more than once corpus-wide, with
    * occurrence and distinct-document counts.
    *
    * Scale shape (100 TB): one narrow pass per document (gram hashes →
    * cut positions → substrings — all codegen'd HOFs, no UDFs), then ONE
    * map-side-combined groupBy on the chunk hash; only (hash, counts)
    * pairs shuffle, never chunk text. The top-N is TakeOrdered.
    */
  /** The (id, chunk) exploded frame behind [[cdcChunkDuplicates]] —
    * exposed for callers that need raw chunks (delta-sync manifests,
    * chunk-level storage dedup).
    */
  def cdcChunks(docs: DataFrame, mask: Int = CDC_MASK, k: Int = CDC_K,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // The cut list goes through posexplode + collect_list, NOT a nested
    // HOF chain: lambdas re-inline free subexpressions per element, so a
    // `chunks` transform whose bounds embed the gram computation re-runs
    // the full rolling hash for EVERY element_at probe — measured 100 s
    // at sf0.1 vs ~2 s for this aggregation-barrier form (the gram pass
    // runs once per document; the explode/groupBy carries only integer
    // cut positions). Cut rule: 1-based gram start >= 2 (a cut at 1
    // would open a zero-length chunk) with hash % mask == 0.
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    val cuts = base
      .select(col("id"), posexplode(TextOps.charGramHashes(col("t"), k)))
      .filter(col("pos") >= 1 && col("col") % mask === 0)
      .groupBy(col("id"))
      .agg(sort_array(collect_list((col("pos") + 1).cast("int"))).as("cuts"))
    base.join(cuts, Seq("id"), "left")
      .withColumn("bounds", concat(array(lit(1)),
        coalesce(col("cuts"), array().cast("array<int>")),
        array((length(col("t")) + 1).cast("int"))))
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("bounds")) - 1), j =>
          col("t").substr(element_at(col("bounds"), j),
            element_at(col("bounds"), j + 1) - element_at(col("bounds"), j))))
          .as("chunk"))
      .filter(length(col("chunk")) > 0)
  }

  def cdcChunkDuplicates(docs: DataFrame, mask: Int = CDC_MASK,
                         k: Int = CDC_K, topN: Int = CDC_TOP,
                         idCol: String = "doc_id", textCol: String = "text"
                        ): DataFrame = {
    cdcChunks(docs, mask, k, idCol, textCol)
      .select(col("id"), TextOps.polyHash(col("chunk")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("clen"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("clen")).as("chunk_len"))
      .filter(col("n_occurrences") > 1)
      .orderBy(col("n_occurrences").desc, col("chunk_hash"))
      .limit(topN)
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
