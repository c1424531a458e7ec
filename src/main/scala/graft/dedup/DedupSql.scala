package graft.dedup

import graft.text.TextSql

/** DuckDB oracle mirrors of [[Dedup]] — same constants, same arithmetic. */
object DedupSql {
  val P: Long = Dedup.P
  val MP: Long = Dedup.MIX % Dedup.P

  def exact(table: String = "documents"): String =
    s"""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
       |FROM $table GROUP BY text ORDER BY doc_id""".stripMargin

  def minhashSignature(sh: String): String =
    s"list_transform(range(0, ${Dedup.K}), i -> " +
      s"list_min(list_transform($sh, h -> " +
      s"(((i*2+1) * $MP % $P) * h + (i*2+2) * $MP % $P) % $P)))"

  /** Generic (b, r) band fold — mirrors [[Dedup.bandHashes]]'s
    * `acc*31 + slot (mod P)` accumulation (signature slots are < P, so for
    * r=2 this equals the round-1 two-term formula bit for bit).
    */
  def bandHashes(sig: String, bands: Int = Dedup.BANDS, r: Int = Dedup.R): String =
    s"list_transform(range(0, $bands), j -> " +
      s"struct_pack(band := j, bh := list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, ${r + 1}), i -> ($sig)[j*$r+i])), " +
      s"(acc, v) -> (acc * 31 + v) % $P)))"

  /** Full MinHash-LSH near-dup pair query with exact-Jaccard verification —
    * the same set → signature → band-bucket self-join → verify plan as
    * the [[Dedup]] LSH band-index plan, in SQL, parameterized by the
    * featurization expression (word shingles / char n-grams).
    */
  def jaccardPairs(setExpr: String, minJaccard: Double,
                   table: String = "documents",
                   bands: Int = Dedup.BANDS, r: Int = Dedup.R): String =
    s"""WITH sh AS (
       |  SELECT doc_id AS id, $setExpr AS sh
       |  FROM $table
       |  WHERE len($setExpr) > 0
       |), bands AS (
       |  SELECT id, sh, UNNEST(${bandHashes(minhashSignature("sh"), bands, r)}) AS b FROM sh
       |), flat AS (
       |  SELECT id, sh, b.band AS band, b.bh AS bh FROM bands
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b, x.sh AS sha, y.sh AS shb
       |  FROM flat x JOIN flat y ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
       |), verified AS (
       |  SELECT a, b,
       |    CAST(len(list_filter(sha, v -> list_contains(shb, v))) AS DOUBLE) /
       |    (len(sha) + len(shb) - len(list_filter(sha, v -> list_contains(shb, v)))) AS jaccard
       |  FROM cand
       |)
       |SELECT a, b, jaccard FROM verified WHERE jaccard >= $minJaccard
       |ORDER BY a, b""".stripMargin

  def minhashPairs(minJaccard: Double, table: String = "documents"): String =
    jaccardPairs(TextSql.shingleHashes("text"), minJaccard, table)

  /** Mirror of [[Dedup.sortedNeighborhoodPairs]]: the serial one-window
    * formulation of the distributed two-level rank (identical integers),
    * the same window-adjacency pairing and exact shingle-set Jaccard.
    */
  def sortedNeighborhoodPairs(window: Int = Dedup.SnmW,
                              keyLen: Int = Dedup.SnmKeyLen,
                              minJaccard: Double = 0.5,
                              table: String = "documents"): String =
    s"""WITH sh AS (
       |  SELECT doc_id AS id,
       |         substring(${TextSql.normalize("text")}, 1, $keyLen) AS key,
       |         ${TextSql.shingleHashes("text")} AS s
       |  FROM $table
       |), nz AS (SELECT * FROM sh WHERE len(s) > 0),
       |ranked AS (
       |  SELECT id, s, row_number() OVER (ORDER BY key, id) AS rn FROM nz
       |), pairs AS (
       |  SELECT least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
       |         x.s AS sa, y.s AS sb
       |  FROM ranked x JOIN ranked y ON y.rn - x.rn BETWEEN 1 AND ${window - 1}
       |), v AS (
       |  SELECT a, b,
       |    CAST(len(list_filter(sa, e -> list_contains(sb, e))) AS DOUBLE) /
       |    (len(sa) + len(sb) - len(list_filter(sa, e -> list_contains(sb, e))))
       |      AS jaccard
       |  FROM pairs
       |)
       |SELECT a, b, jaccard FROM v WHERE jaccard >= $minJaccard
       |ORDER BY a, b""".stripMargin

  /** Mirror of [[Dedup.cdcChunkDuplicates]]: same rolling-gram boundary
    * rule, same substring chunking, same polynomial chunk identity.
    */
  def cdcChunkDuplicates(mask: Int = Dedup.CDC_MASK, k: Int = Dedup.CDC_K,
                         topN: Int = Dedup.CDC_TOP,
                         table: String = "documents"): String = {
    val grams = TextSql.charGramHashes("text", k)
    s"""WITH g AS (
       |  SELECT doc_id AS id, text, $grams AS grams FROM $table
       |), b AS (
       |  SELECT id, text,
       |         list_concat(list_concat([1],
       |           list_filter(range(2, greatest(len(grams), 2) + 1),
       |                       p -> grams[p] % $mask = 0)),
       |           [length(text) + 1]) AS bounds
       |  FROM g
       |), ch AS (
       |  SELECT id, UNNEST(list_transform(range(1, len(bounds)), j ->
       |    substring(text, bounds[j], bounds[j + 1] - bounds[j]))) AS chunk
       |  FROM b
       |), nz AS (SELECT id, chunk FROM ch WHERE length(chunk) > 0),
       |h AS (
       |  SELECT id, ${TextSql.polyHash("chunk")} AS chunk_hash,
       |         CAST(length(chunk) AS BIGINT) AS clen
       |  FROM nz
       |)
       |SELECT chunk_hash, CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occurrences,
       |       min(clen) AS chunk_len
       |FROM h GROUP BY chunk_hash HAVING count(*) > 1
       |ORDER BY n_occurrences DESC, chunk_hash LIMIT $topN""".stripMargin
  }

  /** Mirror of [[Dedup.minhashCalibration]]: every banded candidate pair
    * with sketch estimate, exact Jaccard, and absolute error.
    */
  def minhashCalibration(table: String = "documents"): String = {
    val setExpr = TextSql.shingleHashes("text")
    s"""WITH sh AS (
       |  SELECT doc_id AS id, $setExpr AS sh
       |  FROM $table
       |  WHERE len($setExpr) > 0
       |), sig AS (
       |  SELECT id, sh, ${minhashSignature("sh")} AS sig FROM sh
       |), bands AS (
       |  SELECT id, UNNEST(${bandHashes(minhashSignature("sh"))}) AS b FROM sh
       |), flat AS (
       |  SELECT id, b.band AS band, b.bh AS bh FROM bands
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM flat x JOIN flat y ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
       |), j AS (
       |  SELECT a, b, xa.sh AS sha, xb.sh AS shb, xa.sig AS siga, xb.sig AS sigb
       |  FROM cand JOIN sig xa ON cand.a = xa.id JOIN sig xb ON cand.b = xb.id
       |), m AS (
       |  SELECT a, b,
       |    CAST(len(list_filter(range(0, ${Dedup.K}),
       |           i -> siga[i + 1] = sigb[i + 1])) AS DOUBLE)
       |      / CAST(${Dedup.K} AS DOUBLE) AS est_jaccard,
       |    CAST(len(list_filter(sha, v -> list_contains(shb, v))) AS DOUBLE) /
       |    (len(sha) + len(shb) - len(list_filter(sha, v -> list_contains(shb, v))))
       |      AS exact_jaccard
       |  FROM j
       |)
       |SELECT a, b, est_jaccard, exact_jaccard,
       |       abs(est_jaccard - exact_jaccard) AS abs_err
       |FROM m ORDER BY a, b""".stripMargin
  }

  def ngramJaccardPairs(minJaccard: Double, k: Int = Dedup.NGRAM_K,
                        table: String = "documents"): String =
    jaccardPairs(s"list_distinct(${TextSql.charGramHashes("text", k)})",
      minJaccard, table, Dedup.NGRAM_BANDS, Dedup.NGRAM_R)

  /** Mirror of [[Dedup.substringSpans]]: same sliding windows, same
    * cross-document frequency filter, same island merge — pure integer
    * logic, so the hash gate checks the span algebra itself.
    */
  def substringSpans(k: Int = Dedup.SPAN_K,
                     table: String = "documents"): String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextSql.tokens("text")} AS toks FROM $table
       |), p AS (
       |  SELECT doc_id, toks,
       |         UNNEST(range(1, CAST(len(toks) AS BIGINT) - ${k - 1} + 1)) AS pos
       |  FROM t WHERE len(toks) >= $k
       |), sh AS (
       |  SELECT doc_id, pos, array_to_string(toks[pos:pos+${k - 1}], ' ') AS sh
       |  FROM p
       |), dup AS (
       |  SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2
       |), dp AS (
       |  SELECT doc_id, pos, pos + ${k - 1} AS endp
       |  FROM sh WHERE sh IN (SELECT sh FROM dup)
       |), isl AS (
       |  SELECT doc_id, pos, endp,
       |         CASE WHEN pos > coalesce(max(endp) OVER (PARTITION BY doc_id
       |                ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |              -1) THEN 1 ELSE 0 END AS new_isl
       |  FROM dp
       |), isl2 AS (
       |  SELECT doc_id, pos, endp,
       |         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS isl_id
       |  FROM isl
       |), sp AS (
       |  SELECT doc_id, isl_id, min(pos) AS s, max(endp) AS e
       |  FROM isl2 GROUP BY doc_id, isl_id
       |), perdoc AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |         CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
       |         string_agg(s || '-' || e, ',' ORDER BY s) AS spans
       |  FROM sp GROUP BY doc_id
       |)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_toks,
       |       coalesce(d.n_spans, 0) AS n_spans,
       |       coalesce(d.dup_tokens, 0) AS dup_tokens,
       |       coalesce(d.spans, '') AS spans
       |FROM t LEFT JOIN perdoc d USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Oracle for [[Dedup.containmentPairs]] — same candidates, asymmetric
    * containment metric.
    */
  def containmentPairs(minContainment: Double,
                       table: String = "documents"): String =
    s"""WITH sh AS (
       |  SELECT doc_id AS id, ${TextSql.shingleHashes("text")} AS sh
       |  FROM $table
       |  WHERE len(${TextSql.shingleHashes("text")}) > 0
       |), bands AS (
       |  SELECT id, sh, UNNEST(${bandHashes(minhashSignature("sh"))}) AS b FROM sh
       |), flat AS (
       |  SELECT id, sh, b.band AS band, b.bh AS bh FROM bands
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b, x.sh AS sha, y.sh AS shb
       |  FROM flat x JOIN flat y ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
       |), verified AS (
       |  SELECT a, b,
       |    greatest(
       |      CAST(len(list_filter(sha, v -> list_contains(shb, v))) AS DOUBLE) / len(sha),
       |      CAST(len(list_filter(sha, v -> list_contains(shb, v))) AS DOUBLE) / len(shb)
       |    ) AS containment
       |  FROM cand
       |)
       |SELECT a, b, containment FROM verified WHERE containment >= $minContainment
       |ORDER BY a, b""".stripMargin

  /** Oracle for [[Dedup.incrementalMinhashPairs]]: the FULL self-join pair
    * query restricted to pairs whose b side is in the new batch (top 20%
    * of ids) — asserting the incremental path finds exactly the pairs the
    * batch path would.
    */
  def incrementalMinhashPairs(minJaccard: Double,
                              table: String = "documents"): String =
    s"""SELECT a, b, jaccard FROM (${minhashPairs(minJaccard, table)}) q
       |WHERE b >= (SELECT count(*) * 8 // 10 FROM $table)
       |ORDER BY a, b""".stripMargin

  /** Oracle for [[Dedup.canonicalDocs]] over minhash near-dup pairs: the
    * pair query embedded as a derived table, transitive closure by
    * recursive CTE (UNION-dedup guarantees termination on cycles), then
    * component root = min reachable node. Same output contract as the
    * Spark side: every doc mapped, singletons map to themselves.
    */
  def canonicalDocs(minJaccard: Double, table: String = "documents"): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT a, b FROM (${minhashPairs(minJaccard, table)}) q
       |), edges AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
       |), reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |), comp AS (
       |  SELECT u AS id, least(u, min(v)) AS root FROM reach GROUP BY u
       |), mapping AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS canonical_id
       |  FROM $table d LEFT JOIN comp c ON d.doc_id = c.id
       |), sizes AS (
       |  SELECT canonical_id, count(*) AS cluster_size
       |  FROM mapping GROUP BY canonical_id
       |)
       |SELECT m.doc_id, m.canonical_id, s.cluster_size,
       |       CAST(m.doc_id = m.canonical_id AS INT) AS keep
       |FROM mapping m JOIN sizes s USING (canonical_id)
       |ORDER BY m.doc_id""".stripMargin

  /** [[canonicalDocs]] with the keep-BEST survivor policy: same recursive
    * component closure, but the kept member is the highest
    * [[TextSql.qualityScore]] in the cluster (ties → lowest doc_id) rather
    * than the minimum id.
    */
  def keepBestDocs(minJaccard: Double, table: String = "documents"): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT a, b FROM (${minhashPairs(minJaccard, table)}) q
       |), edges AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
       |), reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |), comp AS (
       |  SELECT u AS id, least(u, min(v)) AS root FROM reach GROUP BY u
       |), mapping AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS canonical_id,
       |         ${TextSql.qualityScore("d.text")} AS quality
       |  FROM $table d LEFT JOIN comp c ON d.doc_id = c.id
       |), sizes AS (
       |  SELECT canonical_id, count(*) AS cluster_size
       |  FROM mapping GROUP BY canonical_id
       |)
       |SELECT m.doc_id, m.canonical_id, s.cluster_size, m.quality,
       |       CAST(row_number() OVER (PARTITION BY m.canonical_id
       |              ORDER BY m.quality DESC, m.doc_id) = 1 AS INT)
       |         AS keep_best
       |FROM mapping m JOIN sizes s USING (canonical_id)
       |ORDER BY m.doc_id""".stripMargin

  def simhash(text: String): String = {
    val th = TextSql.polyHashAll(TextSql.tokens(text))
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), range(${Dedup.SIMBITS - 1}, -1, -1)), " +
      s"(acc, j) -> acc * 2 + CASE WHEN " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $th), (s, h) -> s + " +
      s"CASE WHEN (((j*2+101) * $MP % $P) * h + (j*2+102) * $MP % $P) % $P % 2 = 1 " +
      s"THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END)"
  }

  def simhashBandsStructs(sim: String, nb: Int = 4): String = {
    val width = Dedup.SIMBITS / nb
    val items = (0 until nb).map(k =>
      s"struct_pack(band := $k, bh := (($sim) >> ${k * width}) & ${(1L << width) - 1})")
    s"[${items.mkString(", ")}]"
  }

  def simhashPairs(maxHamming: Int, table: String = "documents"): String =
    s"""WITH sims AS (
       |  SELECT doc_id AS id, ${simhash("text")} AS sim FROM $table
       |), bands AS (
       |  SELECT id, sim, UNNEST(${simhashBandsStructs("sim")}) AS b FROM sims
       |), flat AS (
       |  SELECT id, sim, b.band AS band, b.bh AS bh FROM bands
       |), cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b, x.sim AS sima, y.sim AS simb
       |  FROM flat x JOIN flat y ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
       |)
       |SELECT a, b, CAST(bit_count(xor(sima, simb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sima, simb)) <= $maxHamming
       |ORDER BY a, b""".stripMargin
}
