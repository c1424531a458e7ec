package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline extension (SURVEY §7.2
  * item 6): tokenization, language-ID heuristic, quality scoring, and
  * winnowing document fingerprints.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so plans stay inside whole-stage
  * codegen and scale linearly with document bytes. The deterministic
  * polynomial hashing below is engine-portable integer arithmetic
  * (int64-safe, mod 1e9+7), mirrored verbatim in [[TextSql]] so every
  * operator is DuckDB-oracle-checkable.
  */
object TextOps {

  /** Modulus for all polynomial hashing: products stay < 2^63. */
  val P = 1000000007L
  /** Per-slot mixing multiplier (Knuth). */
  val MIX = 2654435761L

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish tokens: runs of word chars OR single non-word-non-space chars
    * (the regex-pretokenizer shape GPT-style BPE uses before merges).
    * `regexp_extract_all` (no lookarounds) keeps the pattern portable to
    * the DuckDB oracle.
    */
  def tokensBpeIsh(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Deterministic polynomial string hash: fold (h*31 + codepoint) mod P.
    * Identical arithmetic in DuckDB ([[TextSql.polyHash]]). Codegen'd
    * kernel; [[polyHashHof]] is the builtin formulation (equivalence spec).
    */
  def polyHash(s: Column): Column = graft.functions.StringKernels.poly_hash(s)

  def polyHashHof(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (h, c) => (h * 31L + ascii(c)) % P)

  /** Hash each element of a string array. */
  def polyHashAll(arr: Column): Column = transform(arr, s => polyHash(s))

  /** Word n-gram shingles as strings (space-joined). NB `sequence(0, -1)`
    * would generate a DESCENDING sequence, so short inputs need the guard.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle hash set — the unit of Jaccard/MinHash dedup.
    * Codegen'd kernel hashing the n-gram char stream directly;
    * [[shingleHashesHof]] is the builtin formulation (equivalence spec;
    * `toks` must be a materialized token-array column there).
    */
  def shingleHashes(toks: Column, n: Int = 3): Column =
    graft.functions.StringKernels.shingle_hashes(toks, n)

  def shingleHashesHof(toks: Column, n: Int = 3): Column =
    array_distinct(polyHashAll(shingles(toks, n)))

  // ---- language ID -------------------------------------------------------

  /** Marker stopwords per language; prediction = argmax hit-count with
    * first-listed language winning ties. A transparent n-gram/stopword
    * heuristic (not a trained model) — the point is a deterministic,
    * pushdown-friendly scoring pipeline.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "query", "table", "row"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "filter", "fast"),
    "es" -> Seq("el", "la", "de", "que", "los", "scan", "slow"),
    "fr" -> Seq("le", "les", "des", "est", "une", "merge", "sort"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "spark", "stream"))

  def langHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.foldLeft(lit(false))((acc, m) => acc || t === m)))

  /** Argmax over marker-hit counts, ties to the earlier language.
    * `toks`: materialized token-array column.
    */
  def langIdExpr(toks: Column): Column = {
    val hits = langMarkers.map { case (l, ms) => l -> langHits(toks, ms) }
    // CASE chain: lang i wins if its count >= every later count and
    // strictly beats no earlier one (earlier branches already matched).
    hits.zipWithIndex.foldRight(lit(langMarkers.last._1)) {
      case (((lang, c), i), els) =>
        val laterGte = hits.drop(i + 1).foldLeft(lit(true)) {
          case (acc, (_, c2)) => acc && c >= c2
        }
        when(laterGte, lit(lang)).otherwise(els)
    }
  }

  // ---- quality scoring ---------------------------------------------------

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Quality feature columns: lengths, ratios, lexical diversity. All
    * integer counts + row-wise IEEE double divisions — bit-exact across
    * engines.
    */
  def qualityFeatures(text: Column, toks: Column): Seq[(String, Column)] = {
    val nTok = size(toks)
    val nChar = length(text)
    val stopHits = langHits(toks, stopwords)
    val distinctTok = size(array_distinct(toks))
    val sumTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    Seq(
      "n_chars2" -> nChar.cast("long"),
      "n_tokens" -> nTok.cast("long"),
      "mean_token_len" -> sumTokLen.cast("double") / nTok,
      "stopword_ratio" -> stopHits.cast("double") / nTok,
      "type_token_ratio" -> distinctTok.cast("double") / nTok,
      "digit_ratio" -> regexp_count(text, lit("[0-9]")).cast("double") / nChar,
      "upper_ratio" -> regexp_count(text, lit("[A-Z]")).cast("double") / nChar)
  }

  /** Scalar quality score: fixed-weight combination of the features —
    * same double expression on both engines.
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val f = qualityFeatures(text, toks).toMap
    f("type_token_ratio") * 0.5 + f("stopword_ratio") * 0.3 +
      least(f("mean_token_len") / 10.0, lit(1.0)) * 0.2
  }

  // ---- BPE merge application ---------------------------------------------

  /** Fixed, ORDERED BPE merge table (public high-frequency English pairs).
    * Later entries compose earlier outputs — `th e` only matches a symbol
    * the `t h` merge already produced, which is exactly how a trained BPE
    * vocabulary nests. Fixed (not data-derived) so the oracle can apply
    * the identical chain as literal string replaces; swap in a learned
    * table (e.g. the top pairs from `bpe_char_pairs`) for production.
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t h" -> "th", "th e" -> "the", "i n" -> "in", "a n" -> "an",
    "an d" -> "and", "e r" -> "er", "o n" -> "on", "r e" -> "re",
    "o u" -> "ou", "e n" -> "en", "s t" -> "st", "a t" -> "at",
    "o r" -> "or", "t o" -> "to", "i t" -> "it", "i s" -> "is")

  /** BPE ENCODE as pure string builtins — the symbol string after applying
    * [[BpeMerges]] in order. Representation: every symbol is followed by a
    * space and the string starts with a space, so the literal pattern
    * `" x y "` can only match two complete adjacent symbols (a symbol
    * merely ENDING in `x` keeps its own trailing char before the space,
    * and the leading space anchors the left edge). Word boundaries become
    * a `/` symbol that no merge pattern contains, so merges never cross
    * words. Plain `replace` scans left-to-right non-overlapping in both
    * engines — a deliberate SINGLE-PASS approximation of BPE's greedy
    * application: back-to-back occurrences of the same pair share a
    * separator space, so `t h t h` yields `[th, t, h]` where iterated
    * BPE (Sennrich et al. 2016) yields `[th, th]`. Engine and oracle
    * apply the identical non-overlapping semantics, so parity is exact;
    * the deviation only shows on repeated adjacent pairs (rare in text —
    * zero rows differ on the synthetic corpus). A fixed-point loop
    * (re-replace until unchanged) would match iterated BPE at the cost
    * of a data-dependent expression depth no oracle can mirror. One
    * narrow codegen'd projection per row — no UDF, no shuffle.
    */
  /** The PRE-merge symbol string: leading space, every symbol followed by
    * one space, word boundaries as a `/` symbol no merge may touch. The
    * shared representation of [[bpeMergedString]] (fixed-table encode) and
    * `LlmData.bpeTrainMerges` (merge-table TRAINING), so the trainer's
    * learned pairs apply through the exact encode machinery.
    */
  def bpeSpaced(text: Column): Column =
    concat(lit(" "),
      regexp_replace(
        call_function("replace",
          regexp_replace(lower(text), lit("[^a-z]+"), lit(" ")),
          lit(" "), lit(" / ")),
        lit("([a-z/])"), lit("$1 ")))

  def bpeMergedString(text: Column): Column =
    BpeMerges.foldLeft(bpeSpaced(text)) { case (c, (p, r)) =>
      call_function("replace", c, lit(s" $p "), lit(s" $r "))
    }

  /** Passes per merge for [[bpeMergedStringIterated]]. One non-overlapping
    * replace pass merges at least every other occurrence inside a run of
    * back-to-back repeats (the shared-separator effect documented on
    * [[bpeMergedString]]), so a run of m occurrences reaches its fixed
    * point in ceil(log2(m)) + 1 passes. Runs cannot cross the `/` word
    * boundary and words are single letter runs (≤ ~40 symbols in any real
    * corpus), so 6 passes (2^6 = 64) are exhaustive; the count must be a
    * FIXED unroll — not a data-dependent loop — so the oracle can mirror
    * the chain literally.
    */
  val BpeIterPasses = 6

  /** ITERATED BPE encode — each merge applied to its FIXED POINT before
    * the next, which is exactly Sennrich et al. (2016)'s greedy encode
    * (left-to-right on overlap ties): back-to-back pairs that the
    * single-pass [[bpeMergedString]] approximation leaves unmerged
    * (`t h t h` → [th, t, h]) merge fully here ([th, th]). Still one
    * codegen'd narrow projection of chained `replace` builtins — just
    * [[BpeIterPasses]]× deeper.
    *
    * Run-length bound (round-10 ADVICE): the fixed unroll is the TRUE
    * fixed point only for runs of ≤ 2^([[BpeIterPasses]]-1) = 32
    * back-to-back occurrences of one pair (~64 symbols inside a single
    * `/`-delimited word). A longer pathological repeat run under-merges —
    * identically in the engine and the literal-chain oracle (both unroll
    * the same [[BpeIterPasses]] passes), so parity holds; only the
    * "fixed point" name is approximate beyond that bound. No real-corpus
    * word approaches 64 symbols of one repeated pair.
    */
  def bpeMergedStringIterated(text: Column): Column =
    BpeMerges.foldLeft(bpeSpaced(text)) { case (c, (p, r)) =>
      (1 to BpeIterPasses).foldLeft(c)((cc, _) =>
        call_function("replace", cc, lit(s" $p "), lit(s" $r ")))
    }

  // ---- sentiment (lexicon) -----------------------------------------------

  /** Transparent lexicon sentiment (SURVEY §7.2 item 6): hit-count of
    * positive minus negative marker words over |tokens|, in [-1, 1].
    * Lexicon entries come from the synthetic corpus vocabulary (the
    * mechanism, not the wordlist, is the operator — swap in AFINN/VADER
    * lists for real text). Integer counts + one IEEE division: exact.
    */
  val sentimentLexicon: (Seq[String], Seq[String]) = (
    Seq("fast", "big", "value"), // positive
    Seq("slow", "small", "dup")) // negative

  def sentimentScore(toks: Column): Column = {
    val (pos, neg) = sentimentLexicon
    (langHits(toks, pos) - langHits(toks, neg)).cast("double") / size(toks)
  }

  // ---- PII redaction -----------------------------------------------------

  /** PII patterns kept to the Java-regex ∩ RE2 common subset (character
    * classes + bounded quantifiers, no lookarounds) so the DuckDB oracle
    * ([[TextSql.redactPii]]) applies the IDENTICAL pattern.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  /** Replace every email then phone match with a typed placeholder.
    * Emails first: the phone pattern can't match inside `<EMAIL>`, so the
    * two passes commute on disjoint matches and compose deterministically
    * otherwise. Codegen'd `regexp_replace` — linear in document bytes.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>"))

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhoneRe)).cast("long"))

  // ---- text normalization ------------------------------------------------

  /** Accent fold table for [[normalize]] — a FIXED, engine-portable map
    * (Spark's and DuckDB's `translate` are both codepoint-wise), not a
    * locale-dependent Unicode NFD pass: identical bytes out on any engine.
    */
  val AccentFrom = "áéíóúñç"
  val AccentTo = "aeiounc"

  /** Canonical pre-tokenization cleanup: lowercase, fold accents, replace
    * everything outside [a-z0-9 ] with a space (so punctuation splits
    * words instead of gluing them), collapse space runs, trim. All
    * codegen'd builtins, linear per document; mirrored byte-for-byte by
    * [[TextSql.normalize]].
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(translate(lower(text), AccentFrom, AccentTo),
        "[^a-z0-9 ]", " "),
      " +", " "))

  // ---- winnowing fingerprints -------------------------------------------

  /** Character k-gram rolling hashes (position i → hash of chars i..i+k-1).
    * Codegen'd kernel over the string; [[charGramHashesHof]] is the
    * builtin formulation over a MATERIALIZED char-array column (HOF
    * lambdas re-inline free subexpressions per element — an inline
    * `split` would make it O(n²·k)).
    */
  def charGramHashes(text: Column, k: Int): Column =
    graft.functions.StringKernels.char_gram_hashes(text, k)

  def charGramHashesHof(chars: Column, k: Int): Column =
    when(size(chars) >= k,
      transform(sequence(lit(0), size(chars) - k),
        i => aggregate(sequence(lit(1), lit(k)),
          lit(0L), (h, j) => (h * 31L + ascii(element_at(chars, i + j))) % P)))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing (Schleimer et al., SIGMOD 2003 — public algorithm): the
    * distinct set of per-window minima over the k-gram hash sequence.
    * Robust document fingerprint: shared substrings of length >= k+w-1
    * guarantee a shared fingerprint.
    */
  /** Codegen'd winnow kernel; [[winnowFingerprintsHof]] is the builtin
    * formulation over a materialized grams column (re-inlining caveat).
    */
  def winnowFingerprints(grams: Column, w: Int = 4): Column =
    graft.functions.StringKernels.winnow(grams, w)

  def winnowFingerprintsHof(grams: Column, w: Int = 4): Column =
    when(size(grams) >= w,
      array_distinct(transform(
        sequence(lit(0), size(grams) - w),
        i => array_min(slice(grams, i + 1, lit(w))))))
      .otherwise(array().cast("array<bigint>"))
}
