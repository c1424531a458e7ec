package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Dedup, DedupSql}
import graft.text.{TextOps, TextSql}

/** Corpus-curation operators beyond the round-3 surface: deterministic
  * weighted sampling, incremental aggregate maintenance, and corpus-level
  * sketch comparison. All three are oracle-checked hash-exact.
  */
object Curation {

  /** Weight cap for [[queries]]' weighted sampler: keep probability is
    * `5% * min(n_chars div 100 + 1, cap)` — data-derived, capped at 50%.
    */
  val WeightCap = 10

  /** Incremental-refresh cutover: rows before this date play the
    * "already-materialized" base aggregate; rows on/after it are the delta.
    */
  val RefreshCut = "1997-01-01"

  /** Misra-Gries counter budget and refined top-k for vocab_heavy_hitters:
    * exactness is guaranteed for any token with frequency > N/(capacity+1).
    */
  val MgCapacity = 64
  val HeavyK = 10

  /** Random-projection output dimensionality (JL sketch: 64 -> 16). */
  val RpDim = 16

  /** Max edit distance for the blocked fuzzy name match. */
  val FuzzyMaxDist = 2

  /** dp_randomized_response: the sensitive bit is value >= this threshold;
    * the response mechanism keeps the true bit with p = 3/4 (epsilon =
    * ln 3 local DP).
    */
  val DpThreshold = 50.0

  /** sample_exact_k_per_source: rows kept per stratum. */
  val SampleExactK = 10L

  /** Deterministic split fractions (percent): train 80 / val 10 / test 10. */
  val TrainPct = 80
  val ValPct = 90

  /** Temperature-sampled mixture target size. The temperature is FIXED at
    * alpha = 0.5 and applied as `sqrt` — IEEE-754 requires sqrt correctly
    * rounded, so both engines compute identical weights; a general
    * `pow(n, alpha)` has no such guarantee across libms and would break
    * the hash gate (the same reasoning that keeps idf rational in
    * text_tfidf_top_terms).
    */
  val TempTarget = 100

  /** Embedding-outlier report size. */
  val OutlierK = 10

  /** Balanced sharding: number of output shards in shard_manifest. */
  val ShardCount = 8

  /** mix_domain_weights: per-source repetition cap (max "epochs" any one
    * domain may be upsampled — the standard guard against a tiny domain
    * being replicated into memorization territory when rebalancing toward
    * a uniform token mixture).
    */
  val MixMaxRepeat = 4.0

  /** select_token_budget: total token budget of the selected subset, and
    * the fixed-point scale for the integer quality score (distinct-token
    * ratio in parts-per-million — exact integer division, no float rank
    * keys).
    */
  val TokenBudget = 10000L
  val ScoreScale = 1000000L
  /** Width of one score band in the select_token_budget rank key: ids
    * must stay below this or the key would bleed into the adjacent score
    * band and silently mis-order the budget cut — so the engine RAISES on
    * any doc_id ≥ BudgetBandWidth rather than producing a wrong prefix.
    * 1e12 ids × 1e6 score values tops out at ~1.000001e18 < 2^63.
    */
  val BudgetBandWidth = 1000000000000L
  /** Coarse bucket width for the distributed running-token-sum: the rank
    * key is `(ScoreScale - score) * BudgetBandWidth + doc_id`, so 1e15
    * groups ~1000 score bands per bucket.
    */
  val BudgetBucketWidth = 1000000000000000L

  private def weightCol: Column =
    least(expr("n_chars div 100") + 1, lit(WeightCap))

  /** Deterministic ±1 sign for projection cell (i, j): two-stage mod-P mix
    * (multiply, then square — a quadratic-residue scramble) of the flat
    * cell index. One multiplicative stage leaves a quasi-periodic stripe
    * pattern (parity of `k*m mod P` follows a Beatty sequence in k) whose
    * correlated columns blow the distortion envelope on real embeddings
    * (measured max 5.7x vs 2.4x for this mix at RpDim=16). No RNG, no
    * stored matrix — any worker regenerates any cell; mirrored literally
    * in the oracle. All intermediates stay under 2^63 (no overflow in
    * either engine).
    */
  private def signExpr(i: Column, j: Column): Column = {
    val h1 = (i * RpDim + j + 1) * lit(TextOps.MIX % TextOps.P) % lit(TextOps.P)
    when(h1 * h1 % lit(TextOps.P) % 2 === 0, 1.0).otherwise(-1.0)
  }

  /** The raw JL-projected vector (ARRAY<DOUBLE> of length [[RpDim]]) — the
    * library entry point for callers that feed the sketch into ANN
    * indexing. The registered query wraps this in scalar checksums because
    * the oracle comparator cannot hash a raw array column.
    */
  def randomProjection(emb: Column): Column = {
    val x = transform(emb, e => e.cast("double"))
    transform(sequence(lit(0), lit(RpDim - 1)), j =>
      aggregate(
        zip_with(x, sequence(lit(0), lit(LlmData.EmbDim - 1)),
          (xi, i) => xi * signExpr(i, j)),
        lit(0.0), (acc, v) => acc + v))
  }

  private def prioAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))

  /** Serpentine shard manifest (see the `shard_manifest` query entry for
    * the assignment scheme). The global (n_tokens DESC, doc_id) rank comes
    * in two shapes, identical integers either way:
    *
    *   - `distributedRank = true` (DEFAULT, the 100 TB shape): two-phase
    *     exact rank. Per-token-value counts get the only serial running
    *     sum — O(distinct token counts) rows, thousands at any corpus
    *     size — and the doc-level rank is a window PARTITIONED BY
    *     n_tokens, so no fact-scale frame ever crosses an Exchange
    *     SinglePartition. Offset(v) = #docs with strictly more tokens;
    *     within a token value, rank by doc_id — together exactly the
    *     serial window's total order. A single pathologically hot token
    *     count would concentrate its own docs on one task (the usual
    *     two-level-rank caveat); real length distributions spread over
    *     thousands of values.
    *   - `distributedRank = false` (verify twin): one unpartitioned
    *     row_number window — the formulation the DuckDB oracle states, and
    *     the shape CurationSpec pins the distributed form against.
    */
  def shardManifest(s: SparkSession, dir: String,
                    distributedRank: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val ranked =
      if (!distributedRank)
        toks.withColumn("rk", (row_number().over(
          Window.orderBy(col("n_tokens").desc, col("doc_id"))) - 1)
          .cast("long"))
      else {
        val wOff = Window.orderBy(col("n_tokens").desc)
        val off = toks.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
          .select(col("n_tokens"),
            (sum(col("cnt")).over(wOff) - col("cnt")).as("off"))
        val wIn = Window.partitionBy(col("n_tokens")).orderBy(col("doc_id"))
        toks.join(broadcast(off), "n_tokens")
          .withColumn("rk",
            (col("off") + row_number().over(wIn) - 1).cast("long"))
      }
    ranked
      .withColumn("shard",
        when(expr(s"rk div $ShardCount") % 2 === 0, col("rk") % ShardCount)
          .otherwise(lit(ShardCount - 1) - col("rk") % ShardCount))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_doc_tokens"))
      .orderBy("shard")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- weighted deterministic sampling -----------------------------------
    // Quality/length-weighted Bernoulli sampling with NO rand(): the keep
    // decision is a pure function of the stable doc id, so the sample is
    // identical across retries, partitionings, and engines (the training-
    // data requirement behind sample_hash_docs), while the keep RATE is
    // data-derived per row (here: document length as the quality proxy).
    // Pure narrow filter on the scan — zero shuffle at any corpus size.
    "sample_weighted_docs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("w", weightCol)
        .filter(pmod(TextOps.polyHash(col("doc_id").cast("string")),
          lit(100)) < col("w") * 5)
        .select(col("doc_id"), col("source"), col("w"))
        .orderBy("doc_id")),

    // ---- incremental aggregate maintenance ---------------------------------
    // Materialized-view refresh without recompute: the base aggregate
    // (rows before RefreshCut) is merged with the delta batch's aggregate
    // by RE-AGGREGATING THE PARTIALS — legal because count/decimal-sum are
    // mergeable. At 100 TB the base is O(groups) rows read back from the
    // materialized view, and refresh cost is one pass over the DELTA only;
    // the oracle recomputes from scratch, so the hash gate proves
    // merge == recompute exactly (decimal partials make the merge
    // insensitive to how rows were split across base and delta).
    "agg_incremental_refresh" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val base = prioAgg(orders.filter(col("o_orderdate") < lit(RefreshCut)))
      val delta = prioAgg(orders.filter(col("o_orderdate") >= lit(RefreshCut)))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ---- dataset versioning manifest ---------------------------------------
    // Per-source content fingerprint: doc count, char volume, and an
    // ORDER-INDEPENDENT checksum (XOR of per-doc content hashes). XOR is
    // associative + commutative + self-inverse, so the checksum is a
    // mergeable partial aggregate that cannot overflow and is identical
    // under any partitioning or processing order — two corpus builds match
    // iff their manifests match, the cheap reproducibility gate a
    // training-data pipeline runs after every rebuild.
    "corpus_manifest" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          TextOps.polyHash(col("text")).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          expr("bit_xor(h)").as("checksum"))
        .orderBy("source")),

    // ---- keyed pseudonymization --------------------------------------------
    // PII column replaced by a deterministic token (poly hash of the id):
    // joins and grouping still work across tables (same id -> same token)
    // while the raw id never leaves the engine. Narrow projection — the
    // anonymization adds zero shuffles at any scale; paired with
    // text_pii_redact for free-text fields.
    "pseudonymize_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          pmod(TextOps.polyHash(col("user_id").cast("string")), lit(1000000L))
            .as("user_token"),
          col("event_type"), col("value"))
        .orderBy("event_id")),

    // ---- blocked fuzzy string matching -------------------------------------
    // Entity near-duplicates by edit distance, with the LSH lesson applied
    // to strings: candidate pairs come from an equi self-join on a cheap
    // BLOCKING KEY (here the head noun — the second token), and the O(len^2)
    // levenshtein verifier runs only within blocks — never all-pairs. At
    // 100 TB the name table is the distinct-values dictionary (tiny
    // relative to the fact data) and the block join is one shuffle of it;
    // the worst block bounds the quadratic term exactly like an LSH
    // bucket. Distance is exact integer edit distance — hash-stable.
    // ---- Jaro-Winkler similarity scoring -----------------------------------
    // The record-linkage classic, as a custom codegen'd Catalyst
    // expression ([[graft.functions.JaroWinklerSim]]) — same blocking
    // discipline as fuzzy_part_names (head-token equi-join bounds the
    // quadratic), but scoring EVERY candidate pair with the
    // prefix-boosted similarity instead of thresholding an edit
    // distance. The expression's double arithmetic replicates DuckDB's
    // jaro_winkler_similarity operation-for-operation, so all scores
    // hash exactly — the strongest oracle surface a custom scalar kernel
    // can have.
    "jw_part_pairs" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", element_at(split(col("p_name"), " "), 1))
      names.as("x").join(names.as("y"),
          col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
        .select(col("x.p_name").as("a"), col("y.p_name").as("b"),
          graft.functions.StringKernels.jaro_winkler(
            col("x.p_name"), col("y.p_name")).as("jw"))
        .orderBy("a", "b")
    }),

    "fuzzy_part_names" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", element_at(split(col("p_name"), " "), 2))
      names.as("x").join(names.as("y"),
          col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
        .select(col("x.p_name").as("a"), col("y.p_name").as("b"),
          levenshtein(col("x.p_name"), col("y.p_name")).cast("long").as("dist"))
        .filter(col("dist") <= FuzzyMaxDist)
        .orderBy("a", "b")
    }),

    // ---- deterministic dataset split ---------------------------------------
    // train/val/test assignment as a pure function of the stable doc id —
    // the split survives reprocessing, shard moves, and engine swaps, and
    // a doc can never change sides when the corpus grows (the leakage
    // failure mode of rand()-based splits). Narrow projection, no shuffle.
    "split_train_test" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("bucket",
          pmod(TextOps.polyHash(col("doc_id").cast("string")), lit(100)))
        .select(col("doc_id"), col("source"),
          when(col("bucket") < TrainPct, "train")
            .when(col("bucket") < ValPct, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")),

    // ---- balanced shard assignment -----------------------------------------
    // Writing N training shards balanced by token budget: rank docs by
    // (tokens DESC, id) and assign serpentine over the rank — block b of N
    // consecutive ranks sweeps shards left-to-right when b is even,
    // right-to-left when odd, so each shard gets one doc per block and
    // alternating sweep direction cancels the within-block size gradient
    // (plain round-robin systematically hands shard 0 the larger doc of
    // every block). Deterministic — reassembling the corpus reproduces the
    // identical sharding. See [[shardManifest]] for the rank shape.
    "shard_manifest" -> ((s, dir) => shardManifest(s, dir)),

    // ---- random-projection embedding sketch --------------------------------
    // Johnson-Lindenstrauss sign projection 64 -> RpDim: each output
    // coordinate is a +-1-signed sum over the input vector, with the sign
    // matrix REGENERATED from a hash of (i, j) — nothing is stored or
    // broadcast, so the op is a pure narrow projection at any scale (the
    // standard cheap first stage before ANN indexing at 100 TB; distance
    // preservation is asserted in CurationSpec). The registered query
    // emits per-vector SCALARS — a position-weighted checksum and the
    // squared norm — rather than the projected array itself (a raw array
    // column is unhashable for the oracle comparator; the checksum pins
    // every coordinate, the quantizeInt8 recipe). Sums fold sequentially
    // (exact order), so doubles hash-match the oracle bit for bit.
    "emb_random_projection" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), randomProjection(col("embedding")).as("p"))
        .select(col("vec_id"),
          aggregate(zip_with(col("p"), sequence(lit(1), lit(RpDim)),
              (pj, w) => pj * w.cast("double")),
            lit(0.0), (acc, v) => acc + v).as("proj_checksum"),
          aggregate(transform(col("p"), pj => pj * pj),
            lit(0.0), (acc, v) => acc + v).as("proj_norm2"))
        .orderBy("vec_id")),

    // ---- raw JL projection, per-coordinate ----------------------------------
    // The [[randomProjection]] RAW path (ARRAY<DOUBLE> of RpDim), registered
    // directly under the driver gate by exploding to one (vec_id, j, p_j)
    // row per coordinate — scalars the oracle comparator can hash, with no
    // checksum indirection (emb_random_projection keeps the compact
    // checksum form). Each p_j is the same sequential double fold in both
    // engines, so values are bit-identical. Same narrow no-shuffle shape;
    // the explode is the only addition.
    "emb_rp_coordinates" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(randomProjection(col("embedding"))).as(Seq("j", "p_j")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("p_j"))
        .orderBy("vec_id", "j")),

    // ---- temperature-sampled domain mixture --------------------------------
    // The data-mixing step of every multi-source training corpus: source s
    // contributes quota_s = floor(Target * sqrt(n_s) / sum sqrt(n_s)) docs
    // — sqrt (alpha = 0.5) UPWEIGHTS small sources relative to
    // proportional sampling, the standard temperature trick. WHICH docs
    // fill a quota is a pure function of the stable doc id (rank by doc-id
    // hash within source), so the mixture is reproducible across engines
    // and reprocessing. The sqrt-weight total folds IN SOURCE ORDER
    // through a sorted-array aggregate (engine-reproducible double sum,
    // O(sources) rows). Scale shape: count + broadcast quotas; the rank
    // window partitions BY SOURCE over (doc_id, source) pairs only — at
    // extreme per-source cardinality swap the rank for a per-source hash
    // THRESHOLD from an approx quantile (trades exact quota for no sort).
    "sample_temperature" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w", sqrt(col("n_docs").cast("double")))
      val tot = counts
        .agg(aggregate(array_sort(collect_list(struct(col("source"), col("w")))),
          lit(0.0), (acc, x) => acc + x("w")).as("tot_w"))
      val quota = counts.crossJoin(tot)
        .select(col("source"),
          floor(lit(TempTarget) * col("w") / col("tot_w")).cast("long").as("quota"))
      val byHash = Window.partitionBy(col("source"))
        .orderBy(pmod(TextOps.polyHash(col("doc_id").cast("string")),
          lit(1000000L)), col("doc_id"))
      d.select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(byHash))
        // literal pre-cut FIRST: the dynamic `rn <= quota` filter alone is
        // not foldable, so Catalyst would run a full per-source sort; the
        // rn <= TempTarget bound (every quota ≤ TempTarget by
        // construction) compiles to WindowGroupLimit — map-side partial
        // top-k — and the exact quota trims the survivors after the join
        .filter(col("rn") <= TempTarget)
        .join(broadcast(quota), "source")
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"), col("quota"))
        .orderBy("doc_id")
    }),

    // ---- per-label embedding centroids -------------------------------------
    // Dataset cartography over the vector table: one centroid per label
    // per dimension. The mean folds members in vec-id order (sort_array +
    // sequential aggregate — the kmeansCentroids exactFold recipe), so the
    // double sum is bit-identical to the oracle's
    // `list_sum(list(x ORDER BY vec_id))`. One exchange of (label, dim)
    // cells; members materialize per aggregation buffer, so at extreme
    // per-label cardinality swap in the plain-avg scale mode exactly as
    // kmeansCentroids(exactFold = false) does (last-ulp tolerance instead
    // of hash-exact).
    "emb_label_centroids" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"), col("vec_id"),
          posexplode(col("embedding")))
        .select(col("label"), col("pos").cast("long").as("dim"),
          struct(col("vec_id"), col("col").cast("double").as("x")).as("m"))
        .groupBy(col("label"), col("dim"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(col("label"), col("dim"), size(col("ms")).cast("long").as("n"),
          (aggregate(col("ms"), lit(0.0), (acc, m) => acc + m.getField("x"))
            / size(col("ms"))).as("centroid"))
        .orderBy("label", "dim")),

    // ---- per-label centroid margin audit -----------------------------------
    // The label-quality score behind dataset cartography: per vector,
    // cosine to its OWN label centroid minus the best cosine to any OTHER
    // centroid — negative margin ⇒ the vector sits closer to a foreign
    // class (mislabeled/ambiguous). Centroids are the exact vec-id-ordered
    // folds of emb_label_centroids; the k-centroid table broadcasts and
    // the corpus is scanned ONCE (k·N cosine rows, k small). The per-label
    // mean margin is summed as floor(margin·2⁴⁰) int64 — identical floors
    // of identical doubles on both engines, no float reassociation across
    // rows (int64 headroom to ~4e12 vectors/label; decimal beyond).
    "emb_centroid_margin" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val dotD = (a: Column, b: Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val cents = e.select(col("label").cast("long").as("cl"), col("vec_id"),
          posexplode(col("embedding")))
        .select(col("cl"), col("pos"),
          struct(col("vec_id"), col("col").cast("double").as("x")).as("m"))
        .groupBy(col("cl"), col("pos"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(col("cl"), col("pos"),
          (aggregate(col("ms"), lit(0.0), (acc, m) => acc + m.getField("x"))
            / size(col("ms"))).as("c"))
        .groupBy(col("cl"))
        .agg(collect_list(struct(col("pos"), col("c"))).as("pc"))
        .select(col("cl"), transform(array_sort(col("pc")), x => x("c")).as("cent"))
      val pairs = e.select(col("vec_id"), col("label").cast("long").as("vl"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("vl"), col("cl"),
          (dotD(col("v"), col("cent")) /
            (sqrt(dotD(col("v"), col("v"))) * sqrt(dotD(col("cent"), col("cent")))))
            .as("cos"))
      pairs.groupBy(col("vec_id"), col("vl"))
        .agg(max(when(col("cl") === col("vl"), col("cos"))).as("own"),
          max(when(col("cl") =!= col("vl"), col("cos"))).as("best_other"))
        .select(col("vl"), (col("own") - col("best_other")).as("margin"))
        .select(col("vl"),
          col("margin"),
          floor(col("margin") * lit(1099511627776.0)).cast("long").as("qm"))
        .groupBy(col("vl"))
        .agg(count(lit(1)).as("n"), sum(col("qm")).as("qsum"),
          sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_negative"))
        .select(col("vl").as("label"), col("n"), col("qsum"),
          (col("qsum").cast("double") /
            (col("n").cast("double") * lit(1099511627776.0))).as("avg_margin"),
          col("n_negative"))
        .orderBy("label")
    }),

    // ---- embedding outliers ------------------------------------------------
    // The farthest-from-centroid report that catches corrupt/mislabeled
    // vectors before they poison ANN indexes or dedup thresholds. Global
    // per-dimension centroid via the same vec-id-ordered fold as
    // emb_label_centroids, assembled into an ordered array by a
    // dimension-sorted fold, broadcast, then squared L2 per vector folds
    // SEQUENTIALLY over dimensions (fixed order — bit-exact cross-engine).
    // Top-k is TakeOrderedAndProject: one narrow pass over the corpus
    // plus an O(dims) broadcast, no global sort at any scale.
    "emb_outliers" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cent = e.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("pos"),
          struct(col("vec_id"), col("col").cast("double").as("x")).as("m"))
        .groupBy(col("pos"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(col("pos"),
          (aggregate(col("ms"), lit(0.0), (acc, m) => acc + m.getField("x"))
            / size(col("ms"))).as("c"))
        .agg(collect_list(struct(col("pos"), col("c"))).as("pc"))
        .select(transform(array_sort(col("pc")), x => x("c")).as("cent"))
      e.crossJoin(broadcast(cent))
        .select(col("vec_id"),
          aggregate(
            zip_with(transform(col("embedding"), x => x.cast("double")), col("cent"),
              (x, c) => (x - c) * (x - c)),
            lit(0.0), (acc, v) => acc + v).as("dist2"))
        .orderBy(col("dist2").desc, col("vec_id")).limit(OutlierK)
    }),

    // ---- bounded-memory heavy hitters --------------------------------------
    // Top-k tokens via a Misra-Gries sketch + exact refine, NOT a full
    // vocabulary groupBy: each map task keeps at most MgCapacity counters
    // and the shuffle carries one O(capacity) sketch per partition — at
    // 100 TB the full-vocab shuffle behind vocab_top_tokens moves the
    // entire distinct vocabulary, this moves a constant. The refine join
    // recounts ONLY the candidates (broadcast semi join on the token
    // stream), and the sketch's deterministic bound guarantees the
    // candidates cover every token with frequency > N/(capacity+1), so
    // the refined output is the EXACT top-k whenever the k-th frequency
    // clears that bound (always true here: the corpus vocabulary is
    // smaller than the capacity; the eviction paths are exercised by
    // MisraGriesSpec on adversarial streams). Oracle: the plain exact
    // top-k, proving sketch + refine == exact.
    "vocab_heavy_hitters" -> ((s, dir) => {
      val mg = udaf(new graft.functions.MisraGries(MgCapacity),
        org.apache.spark.sql.Encoders.STRING)
      val toks = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val cand = toks.agg(mg(col("token")).as("sk"))
        .select(explode(map_keys(col("sk"))).as("token"))
      toks.join(broadcast(cand), "token")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(HeavyK)
    }),

    // ---- corpus-level sketch comparison ------------------------------------
    // Pairwise source-vs-source Jaccard similarity from MERGED MinHash
    // sketches: a source's signature is the elementwise MIN of its
    // documents' signatures (= the signature of the union of their shingle
    // sets), which is an associative partial aggregate — the corpus is
    // read ONCE, the shuffle carries sources x K slots, and the pairwise
    // comparison runs on the sketch table (O(sources^2 * K), corpus-size
    // independent). The estimate (matching slots / K) is an exact binary
    // fraction, so it hashes identically cross-engine.
    "source_jaccard_matrix" -> ((s, dir) => {
      val k = Dedup.K
      val sig = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select(col("source"),
          Dedup.minhashSignature(
            TextOps.shingleHashes(TextOps.tokens(col("text")))).as("sig"))
        .select(col("source"), posexplode(col("sig")))
        .groupBy(col("source"), col("pos")).agg(min(col("col")).as("h"))
      sig.as("x").join(sig.as("y"),
          col("x.pos") === col("y.pos") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg((sum(when(col("x.h") === col("y.h"), 1).otherwise(0)) / lit(k))
          .as("jacc_est"))
        .orderBy("src_a", "src_b")
    }),

    // ---- local differential privacy: randomized response -------------------
    // The one DP mechanism expressible with ZERO transcendentals: each
    // event reports its true bit (value >= DpThreshold) with probability
    // p = 3/4, flipped otherwise, and the aggregate debiases with
    // f̂ = (obs/n − (1−p)) / (2p−1). The "coin" is the engine-portable
    // polyHash of the event id (mod 4 < 3), so the noisy report is
    // deterministic per row, reproducible across engines and reruns —
    // Laplace/Gaussian mechanisms need ln/erf whose libm rounding is not
    // portable, which is exactly why the randomized-response form is the
    // hash-gated registry's DP representative. One narrow projection +
    // one combinable groupBy: zero extra shuffles at any scale.
    "dp_randomized_response" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        col("event_type"),
        (col("value") >= lit(DpThreshold)).as("b"),
        (pmod(TextOps.polyHash(col("event_id").cast("string")), lit(4)) < 3)
          .as("keep"))
      e.withColumn("rep",
          when(col("keep"), col("b")).otherwise(!col("b")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("rep").cast("long")).as("n_reported"),
          sum(col("b").cast("long")).as("n_true"))
        .select(col("event_type"), col("n"), col("n_reported"),
          ((col("n_reported").cast("double") / col("n").cast("double")
            - lit(0.25)) / lit(0.5)).as("est_frac"),
          (col("n_true").cast("double") / col("n").cast("double"))
            .as("true_frac"))
        .orderBy(col("event_type"))
    }),

    // ---- exact-k per-group sampling (distributed reservoir) ----------------
    // sample_hash_docs keeps a RATE; audits and eval sets need an exact
    // COUNT per stratum. Deterministic reservoir: order each source's
    // docs by the portable polyHash of their id (a uniform random permutation,
    // frozen forever) and keep the first SampleExactK — same sample on
    // any cluster size, any engine, any rerun. The rank<=K predicate is
    // pushed into the shuffle by WindowGroupLimit, so each partition
    // forwards at most K candidate rows per group — the classic
    // distributed reservoir without any RNG state.
    "sample_exact_k_per_source" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "documents")
        .withColumn("hk", TextOps.polyHash(col("doc_id").cast("string")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("hk"), col("doc_id"))).cast("long"))
        .filter(col("rnk") <= SampleExactK)
        .select(col("source"), col("rnk"), col("doc_id"), col("lang"))
        .orderBy(col("source"), col("rnk"))
    }),

    // ---- domain mixture rebalancing ----------------------------------------
    // The training-mixture rebalancing step every LLM data pipeline runs before
    // sampling: per-source token counts → deviation from a uniform target
    // mixture → per-source sampling weight `min(1/(k·share), cap)` →
    // renormalized effective mixture. One fact-scale pass (tokenize +
    // groupBy source); everything after runs on k source rows. The only
    // float reduction across sources (the normalizer Z) is the sorted-
    // array fold, so both engines add the k doubles in source order.
    "mix_domain_weights" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"))
      val bySrc = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      val tot = bySrc.agg(sum(col("n_tokens")).as("tot"),
        count(lit(1)).as("k"))
      val w = bySrc.crossJoin(broadcast(tot))
        .withColumn("share",
          col("n_tokens").cast("double") / col("tot").cast("double"))
        .withColumn("weight",
          least(lit(1.0) / (col("k").cast("double") * col("share")),
            lit(MixMaxRepeat)))
        .withColumn("exp_tokens", col("weight") * col("n_tokens").cast("double"))
      val z = w.agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("exp_tokens")))),
        lit(0.0), (acc, x) => acc + x("exp_tokens")).as("z"))
      w.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
          col("weight"), col("exp_tokens"),
          (col("exp_tokens") / col("z")).as("mix_share"))
        .orderBy("source")
    }),

    // ---- token-budget subset selection -------------------------------------
    // "Give me the best documents that fit a token budget": rank docs by
    // an integer quality score (distinct-token ratio in ppm — exact int
    // division, no float sort keys), run a DISTRIBUTED running token sum
    // down the quality order ([[Stats.bucketedCumsum]]'s two-level prefix
    // sum — the serial window only ever sees O(#score-bands) rows), and
    // keep the prefix whose cumulative tokens stay within the budget.
    // Rank key = (ScoreScale - score)·BudgetBandWidth + doc_id: descending
    // quality, doc-id tie-break, one BIGINT — so the budget cut is
    // total-order deterministic on both engines. An id at or past the band
    // width would bleed into the neighboring score band, so the key RAISES
    // instead of mis-ordering (codegen'd per-row branch, no extra pass).
    "select_token_budget" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"),
          size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("dtoks"))
        .filter(col("toks") > 0)
        .withColumn("score", expr(s"dtoks * $ScoreScale div toks"))
        .withColumn("kk",
          (lit(ScoreScale) - col("score")) * lit(BudgetBandWidth) +
            when(col("doc_id") < BudgetBandWidth, col("doc_id"))
              .otherwise(raise_error(concat(
                lit("select_token_budget: doc_id exceeds rank band width: "),
                col("doc_id").cast("string"))).cast("long")))
        .select(col("doc_id"), col("source"), col("toks"), col("score"), col("kk"))
      Stats.bucketedCumsum(d, "kk", BudgetBucketWidth, Seq("toks"))
        .filter(col("toks_cum") <= TokenBudget)
        .select(col("doc_id"), col("source"), col("score"), col("toks"),
          col("toks_cum"))
        .orderBy("doc_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "sample_weighted_docs" -> {
      val h = TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source,
         |       least(n_chars // 100 + 1, $WeightCap) AS w
         |FROM documents
         |WHERE ($h) % 100 < least(n_chars // 100 + 1, $WeightCap) * 5
         |ORDER BY doc_id""".stripMargin
    },
    "corpus_manifest" -> {
      val h = TextSql.polyHash("text")
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       bit_xor($h) AS checksum
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },
    "pseudonymize_events" -> {
      val h = TextSql.polyHash("CAST(user_id AS VARCHAR)")
      s"""SELECT event_id, ($h) % 1000000 AS user_token, event_type, "value"
         |FROM events ORDER BY event_id""".stripMargin
    },
    "jw_part_pairs" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk FROM part
        |)
        |SELECT x.p_name AS a, y.p_name AS b,
        |       jaro_winkler_similarity(x.p_name, y.p_name) AS jw
        |FROM names x JOIN names y ON x.blk = y.blk AND x.p_name < y.p_name
        |ORDER BY a, b""".stripMargin,
    "fuzzy_part_names" ->
      s"""WITH names AS (
         |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS blk FROM part
         |)
         |SELECT x.p_name AS a, y.p_name AS b,
         |       CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS dist
         |FROM names x JOIN names y ON x.blk = y.blk AND x.p_name < y.p_name
         |WHERE levenshtein(x.p_name, y.p_name) <= $FuzzyMaxDist
         |ORDER BY a, b""".stripMargin,
    "split_train_test" -> {
      val h = TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source,
         |       CASE WHEN ($h) % 100 < $TrainPct THEN 'train'
         |            WHEN ($h) % 100 < $ValPct THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // identical serpentine rule; sums cast back to BIGINT (DuckDB sums
    // BIGINT into HUGEINT)
    "shard_manifest" ->
      s"""WITH r AS (
         |  SELECT doc_id,
         |         CAST(len(${TextSql.tokens("text")}) AS BIGINT) AS n_tokens,
         |         row_number() OVER (ORDER BY
         |           CAST(len(${TextSql.tokens("text")}) AS BIGINT) DESC,
         |           doc_id) - 1 AS rk
         |  FROM documents
         |)
         |SELECT CASE WHEN (rk // $ShardCount) % 2 = 0
         |            THEN rk % $ShardCount
         |            ELSE ${ShardCount - 1} - rk % $ShardCount END AS shard,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       max(n_tokens) AS max_doc_tokens
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin,
    "emb_random_projection" -> {
      val mix = TextOps.MIX % TextOps.P
      val p = TextOps.P
      s"""WITH proj AS (
         |  SELECT vec_id,
         |    list_transform(range(0, $RpDim), j ->
         |      list_sum(list_transform(range(0, ${LlmData.EmbDim}), i ->
         |        CAST(embedding[i + 1] AS DOUBLE) *
         |        (CASE WHEN ((i * $RpDim + j + 1) * $mix % $p)
         |                   * ((i * $RpDim + j + 1) * $mix % $p) % $p % 2 = 0
         |              THEN 1.0 ELSE -1.0 END)))) AS p
         |  FROM embeddings
         |)
         |SELECT vec_id,
         |  list_sum(list_transform(range(0, $RpDim),
         |    j -> p[j + 1] * CAST(j + 1 AS DOUBLE))) AS proj_checksum,
         |  list_sum(list_transform(p, e -> e * e)) AS proj_norm2
         |FROM proj ORDER BY vec_id""".stripMargin
    },
    "emb_rp_coordinates" -> {
      val mix = TextOps.MIX % TextOps.P
      val p = TextOps.P
      s"""WITH proj AS (
         |  SELECT vec_id,
         |    list_transform(range(0, $RpDim), j ->
         |      list_sum(list_transform(range(0, ${LlmData.EmbDim}), i ->
         |        CAST(embedding[i + 1] AS DOUBLE) *
         |        (CASE WHEN ((i * $RpDim + j + 1) * $mix % $p)
         |                   * ((i * $RpDim + j + 1) * $mix % $p) % $p % 2 = 0
         |              THEN 1.0 ELSE -1.0 END)))) AS p
         |  FROM embeddings
         |)
         |SELECT vec_id, CAST(j AS BIGINT) AS j, p[j + 1] AS p_j
         |FROM proj CROSS JOIN (SELECT UNNEST(range(0, $RpDim)) AS j)
         |ORDER BY vec_id, j""".stripMargin
    },
    "sample_temperature" -> {
      val h = TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n_docs,
         |         sqrt(CAST(count(*) AS DOUBLE)) AS w
         |  FROM documents GROUP BY source
         |), tot AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(w ORDER BY source)), (a, b) -> a + b) AS tot_w
         |  FROM counts
         |), quota AS (
         |  SELECT source,
         |         CAST(floor($TempTarget * w / tot_w) AS BIGINT) AS quota
         |  FROM counts, tot
         |), ranked AS (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ($h) % 1000000, doc_id) AS rn
         |  FROM documents
         |)
         |SELECT doc_id, source, quota
         |FROM ranked JOIN quota USING (source)
         |WHERE rn <= quota ORDER BY doc_id""".stripMargin
    },
    "emb_label_centroids" ->
      s"""SELECT CAST(label AS BIGINT) AS label, CAST(i.i AS BIGINT) AS dim,
         |       count(*) AS n,
         |       list_sum(list(CAST(embedding[i.i + 1] AS DOUBLE) ORDER BY vec_id))
         |         / count(*) AS centroid
         |FROM embeddings, range(0, ${LlmData.EmbDim}) i(i)
         |GROUP BY label, i.i ORDER BY label, dim""".stripMargin,
    "emb_centroid_margin" -> {
      def dot(a: String, b: String) =
        s"list_sum(list_transform(range(1, ${LlmData.EmbDim + 1}), i -> ($a)[i] * ($b)[i]))"
      s"""WITH cells AS (
         |  SELECT CAST(label AS BIGINT) AS cl, i.i AS pos,
         |         list_sum(list(CAST(embedding[i.i + 1] AS DOUBLE) ORDER BY vec_id))
         |           / count(*) AS c
         |  FROM embeddings, range(0, ${LlmData.EmbDim}) i(i)
         |  GROUP BY cl, i.i
         |), cents AS (
         |  SELECT cl, list(c ORDER BY pos) AS cent FROM cells GROUP BY cl
         |), ve AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS vl,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), pairs AS (
         |  SELECT vec_id, vl, cl,
         |         ${dot("v", "cent")} /
         |           NULLIF(sqrt(${dot("v", "v")}) * sqrt(${dot("cent", "cent")}), 0)
         |           AS cos
         |  FROM ve, cents
         |), pv AS (
         |  SELECT vec_id, vl,
         |         max(CASE WHEN cl = vl THEN cos END) AS own,
         |         max(CASE WHEN cl <> vl THEN cos END) AS best_other
         |  FROM pairs GROUP BY vec_id, vl
         |), m AS (
         |  SELECT vl, own - best_other AS margin,
         |         CAST(floor((own - best_other) * 1099511627776.0) AS BIGINT) AS qm
         |  FROM pv
         |)
         |SELECT vl AS label, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(qm) AS BIGINT) AS qsum,
         |       CAST(sum(qm) AS DOUBLE) /
         |         (CAST(count(*) AS DOUBLE) * 1099511627776.0) AS avg_margin,
         |       CAST(sum(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_negative
         |FROM m GROUP BY vl ORDER BY label""".stripMargin
    },

    "emb_outliers" ->
      s"""WITH cells AS (
         |  SELECT i.i AS pos,
         |         list_sum(list(CAST(embedding[i.i + 1] AS DOUBLE) ORDER BY vec_id))
         |           / count(*) AS c
         |  FROM embeddings, range(0, ${LlmData.EmbDim}) i(i)
         |  GROUP BY i.i
         |), ca AS (
         |  SELECT list(c ORDER BY pos) AS cent FROM cells
         |)
         |SELECT vec_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(0, ${LlmData.EmbDim}), j ->
         |      (CAST(embedding[j + 1] AS DOUBLE) - cent[j + 1])
         |        * (CAST(embedding[j + 1] AS DOUBLE) - cent[j + 1]))),
         |    (a, b) -> a + b) AS dist2
         |FROM embeddings, ca
         |ORDER BY dist2 DESC, vec_id LIMIT $OutlierK""".stripMargin,
    "vocab_heavy_hitters" ->
      s"""SELECT token, count(*) AS n
         |FROM (SELECT UNNEST(${TextSql.tokens("text")}) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT $HeavyK""".stripMargin,
    "agg_incremental_refresh" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "source_jaccard_matrix" -> {
      val sh = TextSql.shingleHashes("text")
      val sig = DedupSql.minhashSignature("sh")
      s"""WITH sh AS (
         |  SELECT source, $sh AS sh FROM documents
         |), sigs AS (
         |  SELECT source, $sig AS sig FROM sh
         |), slots AS (
         |  SELECT source, i.i AS pos, sig[i.i + 1] AS h
         |  FROM sigs, range(0, ${Dedup.K}) i(i)
         |), sk AS (
         |  SELECT source, pos, min(h) AS h FROM slots GROUP BY source, pos
         |)
         |SELECT x.source AS src_a, y.source AS src_b,
         |       sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) / ${Dedup.K}.0 AS jacc_est
         |FROM sk x JOIN sk y ON x.pos = y.pos AND x.source < y.source
         |GROUP BY x.source, y.source ORDER BY src_a, src_b""".stripMargin
    },

    "dp_randomized_response" -> {
      val h = TextSql.polyHash("CAST(event_id AS VARCHAR)")
      s"""WITH e AS (
         |  SELECT event_type,
         |         ("value" >= $DpThreshold) AS b,
         |         (($h) % 4 < 3) AS keep
         |  FROM events
         |), r AS (
         |  SELECT event_type, b,
         |         CASE WHEN keep THEN b ELSE NOT b END AS rep
         |  FROM e
         |), a AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_reported,
         |         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_true
         |  FROM r GROUP BY 1
         |)
         |SELECT event_type, n, n_reported,
         |       (CAST(n_reported AS DOUBLE) / CAST(n AS DOUBLE) - 0.25)
         |         / 0.5 AS est_frac,
         |       CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE) AS true_frac
         |FROM a ORDER BY event_type""".stripMargin
    },

    "sample_exact_k_per_source" -> {
      val h = TextSql.polyHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT source, rnk, doc_id, lang FROM (
         |  SELECT source, doc_id, lang,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY ($h), doc_id) AS BIGINT) AS rnk
         |  FROM documents
         |) WHERE rnk <= $SampleExactK ORDER BY source, rnk""".stripMargin
    },

    "mix_domain_weights" ->
      s"""WITH d AS (
         |  SELECT source, CAST(len(${TextSql.tokens("text")}) AS BIGINT) AS toks
         |  FROM documents
         |), b AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(toks) AS BIGINT) AS n_tokens
         |  FROM d GROUP BY source
         |), t AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         |         CAST(count(*) AS BIGINT) AS k
         |  FROM b
         |), s1 AS (
         |  SELECT source, n_docs, n_tokens, k,
         |         CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS share
         |  FROM b, t
         |), w AS (
         |  SELECT source, n_docs, n_tokens, share,
         |         least(1.0 / (CAST(k AS DOUBLE) * share), $MixMaxRepeat) AS weight
         |  FROM s1
         |), e AS (
         |  SELECT source, n_docs, n_tokens, share, weight,
         |         weight * CAST(n_tokens AS DOUBLE) AS exp_tokens
         |  FROM w
         |), z AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list(exp_tokens ORDER BY source)), (a, c) -> a + c) AS z
         |  FROM e
         |)
         |SELECT source, n_docs, n_tokens, share, weight, exp_tokens,
         |       exp_tokens / z AS mix_share
         |FROM e, z ORDER BY source""".stripMargin,

    "select_token_budget" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source, ${TextSql.tokens("text")} AS toks0 FROM documents
         |), d AS (
         |  SELECT doc_id, source, CAST(len(toks0) AS BIGINT) AS toks,
         |         CAST(len(list_distinct(toks0)) AS BIGINT) AS dtoks
         |  FROM d0
         |), f AS (
         |  SELECT doc_id, source, toks, dtoks FROM d WHERE toks > 0
         |), sc AS (
         |  SELECT doc_id, source, toks, dtoks * $ScoreScale // toks AS score FROM f
         |), kk AS (
         |  SELECT doc_id, source, toks, score,
         |         ($ScoreScale - score) * $BudgetBandWidth + doc_id AS kk
         |  FROM sc
         |), c AS (
         |  SELECT doc_id, source, toks, score,
         |         CAST(sum(toks) OVER (ORDER BY kk) AS BIGINT) AS toks_cum
         |  FROM kk
         |)
         |SELECT doc_id, source, score, toks, toks_cum FROM c
         |WHERE toks_cum <= $TokenBudget ORDER BY doc_id""".stripMargin)
}
