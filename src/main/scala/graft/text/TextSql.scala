package graft.text

/** DuckDB-dialect mirrors of [[TextOps]], generated from the SAME Scala
  * constants so the oracle can never drift from the engine. Each helper
  * returns a SQL fragment string parameterized on the input expression.
  *
  * Portability rules (see Relational scaladoc): integer arithmetic mod
  * [[TextOps.P]] (int64-safe), row-wise IEEE double division, list folds
  * seeded via `list_prepend(0, ...)` (DuckDB's `list_reduce` has no init
  * parameter — prepending the init value yields the identical fold).
  */
object TextSql {
  val P: Long = TextOps.P
  val MIX: Long = TextOps.MIX

  def tokens(t: String): String = s"regexp_split_to_array(trim($t), '\\s+')"

  def polyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"

  def polyHashAll(arr: String): String =
    s"list_transform($arr, s -> ${polyHash("s")})"

  def shingles(toks: String, n: Int): String = {
    val join = (1 to n).map(k => s"$toks[i+${k - 1}]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 2}, 1)), i -> $join)"
  }

  def shingleHashes(text: String, n: Int = 3): String =
    s"list_distinct(${polyHashAll(shingles(tokens(text), n))})"

  def langHits(toks: String, markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toks, t -> t IN ($set)))"
  }

  /** CASE chain identical to [[TextOps.langIdExpr]]: lang i wins when its
    * count >= every later count; ties resolve to the earlier language.
    */
  def langIdExpr(text: String): String = {
    val toks = tokens(text)
    val hits = TextOps.langMarkers.map { case (l, ms) => l -> langHits(toks, ms) }
    val cases = hits.zipWithIndex.dropRight(1).map { case ((lang, c), i) =>
      val laterGte = hits.drop(i + 1).map { case (_, c2) => s"($c) >= ($c2)" }
        .mkString(" AND ")
      s"WHEN $laterGte THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${TextOps.langMarkers.last._1}' END"
  }

  def qualityFeatures(text: String): Seq[(String, String)] = {
    val toks = tokens(text)
    val stopHits = langHits(toks, TextOps.stopwords)
    Seq(
      "n_chars2" -> s"CAST(length($text) AS BIGINT)",
      "n_tokens" -> s"CAST(len($toks) AS BIGINT)",
      "mean_token_len" ->
        s"CAST(list_sum(list_transform($toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len($toks)",
      "stopword_ratio" -> s"CAST($stopHits AS DOUBLE) / len($toks)",
      "type_token_ratio" -> s"CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks)",
      // NULLIF: an empty document divides by zero — NULL in Spark's
      // non-ANSI mode, NaN in DuckDB's IEEE mode; mirror the NULL
      "digit_ratio" -> s"CAST(len(regexp_extract_all($text, '[0-9]')) AS DOUBLE) / NULLIF(length($text), 0)",
      "upper_ratio" -> s"CAST(len(regexp_extract_all($text, '[A-Z]')) AS DOUBLE) / NULLIF(length($text), 0)")
  }

  def qualityScore(text: String): String = {
    val f = qualityFeatures(text).toMap
    s"(${f("type_token_ratio")}) * 0.5 + (${f("stopword_ratio")}) * 0.3 + " +
      s"least((${f("mean_token_len")}) / 10.0, 1.0) * 0.2"
  }

  /** DuckDB twin of [[TextOps.bpeMergedString]] — identical spacing
    * construction and the identical ordered replace chain (DuckDB's
    * `replace` is plain-substring, global, left-to-right — same semantics
    * as Spark's). Backreference syntax is the one divergence (`\1` vs
    * `$1`); regex classes are engine-portable.
    */
  /** DuckDB twin of [[TextOps.bpeSpaced]]. */
  def bpeSpaced(text: String): String =
    s"' ' || regexp_replace(replace(regexp_replace(lower($text), " +
      s"'[^a-z]+', ' ', 'g'), ' ', ' / '), '([a-z/])', '\\1 ', 'g')"

  def bpeMergedString(text: String): String =
    TextOps.BpeMerges.foldLeft(bpeSpaced(text)) { case (acc, (p, r)) =>
      s"replace($acc, ' $p ', ' $r ')"
    }

  /** DuckDB twin of [[TextOps.bpeMergedStringIterated]] — the identical
    * fixed [[TextOps.BpeIterPasses]]-deep unroll per merge.
    */
  def bpeMergedStringIterated(text: String): String =
    TextOps.BpeMerges.foldLeft(bpeSpaced(text)) { case (acc, (p, r)) =>
      (1 to TextOps.BpeIterPasses).foldLeft(acc)((a, _) =>
        s"replace($a, ' $p ', ' $r ')")
    }

  def sentimentScore(text: String): String = {
    val toks = tokens(text)
    val (pos, neg) = TextOps.sentimentLexicon
    s"CAST(${langHits(toks, pos)} - ${langHits(toks, neg)} AS DOUBLE) / len($toks)"
  }

  /** Identical PII patterns to [[TextOps.redactPii]]; DuckDB needs the
    * explicit 'g' flag for replace-all (Spark's regexp_replace default).
    */
  def redactPii(text: String): String =
    s"regexp_replace(regexp_replace($text, '${TextOps.EmailRe}', '<EMAIL>', 'g'), " +
      s"'${TextOps.PhoneRe}', '<PHONE>', 'g')"

  def piiCounts(text: String): Seq[(String, String)] = Seq(
    "n_emails" -> s"CAST(len(regexp_extract_all($text, '${TextOps.EmailRe}')) AS BIGINT)",
    "n_phones" -> s"CAST(len(regexp_extract_all($text, '${TextOps.PhoneRe}')) AS BIGINT)")

  /** Mirrors [[TextOps.normalize]] — same fold table, same regex chain
    * ('g' flag for DuckDB's replace-all).
    */
  def normalize(text: String): String =
    s"trim(regexp_replace(regexp_replace(" +
      s"translate(lower($text), '${TextOps.AccentFrom}', '${TextOps.AccentTo}'), " +
      s"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  def charGramHashes(text: String, k: Int): String = {
    val chars = s"string_split($text, '')"
    s"list_transform(range(1, greatest(len($chars) - ${k - 2}, 1)), i -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(0, $k), j -> CAST(ord($chars[i + j]) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P))"
  }

  def winnowFingerprints(text: String, k: Int = 5, w: Int = 4): String = {
    val grams = charGramHashes(text, k)
    s"list_distinct(list_transform(range(1, greatest(len($grams) - ${w - 2}, 1)), " +
      s"i -> list_min(($grams)[i : i + ${w - 1}])))"
  }
}
