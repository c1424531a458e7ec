package graft.sim

/** DuckDB oracle mirrors of [[Similarity]]. The dot product folds
  * left-to-right in double precision on both engines, so similarity values
  * are bit-identical, not just approximately equal.
  */
object SimilaritySql {

  def dot(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> " +
      s"CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"

  // NULLIF guard: Spark's non-ANSI divide returns NULL on a zero norm and
  // downstream filters drop the row; DuckDB's IEEE mode would return NaN,
  // which its ordering ranks ABOVE every real similarity — the NULLIF
  // makes the oracle NULL out exactly where the engine does.
  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)}) / NULLIF(sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)}), 0)"

  def signBucket(v: String, planeBits: Int = 6): String =
    (0 until planeBits).map(i =>
      s"CASE WHEN ($v)[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")

  /** Mirrors [[Similarity.planeBitsFor]] with the same integer fixed-point
    * (no floating log2): a one-row CTE `pb(pb)`.
    */
  def planeBitsSql(table: String, targetBucket: Int = 32,
                   minBits: Int = 4, maxBits: Int = 20): String =
    s"""SELECT coalesce(min(b), $maxBits) AS pb FROM range($minBits, ${maxBits + 1}) t(b)
       |WHERE (CAST(1 AS BIGINT) << b) * $targetBucket >= (SELECT count(*) FROM $table)""".stripMargin

  /** [[signBucket]] with the bit count read from the `pb` CTE column —
    * bits at positions >= pb contribute 0, so the static sum over
    * [0, maxBits) equals the engine's literal `planeBits`-bit bucket.
    */
  def signBucketDynamic(v: String, pbCol: String = "pb", maxBits: Int = 20): String =
    (0 until maxBits).map(i =>
      s"CASE WHEN $i < $pbCol AND ($v)[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")

  /** Oracle for [[Similarity.quantizeInt8]] — same staged arithmetic,
    * same sequential double folds, same mod-P code checksum.
    */
  def quantizeInt8(dim: Int, table: String = "embeddings"): String = {
    val P = graft.text.TextOps.P
    def sdot(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($a)[i] * ($b)[i]))"
    s"""WITH xs AS (
       |  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
       |  FROM $table
       |), sc AS (
       |  SELECT vec_id, x,
       |         127.0 / list_max(list_transform(x, e -> abs(e))) AS scale
       |  FROM xs WHERE list_max(list_transform(x, e -> abs(e))) > 0
       |), qs AS (
       |  SELECT vec_id, x, scale,
       |         list_transform(x, e -> CAST(floor(e * scale + 0.5) AS BIGINT)) AS q
       |  FROM sc
       |), rs AS (
       |  SELECT vec_id, x, scale, q,
       |         list_transform(q, e -> CAST(e AS DOUBLE) / scale) AS r
       |  FROM qs
       |)
       |SELECT vec_id, scale,
       |  list_max(list_transform(range(1, ${dim + 1}), i -> abs(x[i] - r[i]))) AS max_abs_err,
       |  ${sdot("x", "r")} / NULLIF(sqrt(${sdot("x", "x")}) * sqrt(${sdot("r", "r")}), 0) AS cos_recon,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, ${dim + 1}), i -> ((q[i] * i) % $P + $P) % $P)),
       |    (a, b) -> (a + b) % $P) AS q_checksum
       |FROM rs ORDER BY vec_id""".stripMargin
  }

  def cosineTopK(k: Int, nQueries: Int, dim: Int, table: String = "embeddings"): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM $table WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM $table),
       |sims AS (
       |  SELECT q_id, n_id, ${cosine("q_vec", "n_vec", dim)} AS sim
       |  FROM q JOIN c ON q_id <> n_id
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Mirrors [[Similarity.mrlPrefixTopK]]: coarse cosine over the first
    * `dPrefix` list positions (identical fold order to the engine's
    * sliced prefix), top-`cands` by (pre_sim DESC, n_id), exact full-dim
    * re-rank.
    */
  def mrlPrefixTopK(k: Int, nQueries: Int, dPrefix: Int, cands: Int, dim: Int,
                    table: String = "embeddings"): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM $table WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM $table),
       |pre AS (
       |  SELECT q_id, n_id, q_vec, n_vec,
       |         ${cosine("q_vec", "n_vec", dPrefix)} AS pre_sim
       |  FROM q JOIN c ON q_id <> n_id
       |), cand AS (
       |  SELECT q_id, n_id, q_vec, n_vec,
       |         row_number() OVER (PARTITION BY q_id ORDER BY pre_sim DESC, n_id) AS prerank
       |  FROM pre
       |), re AS (
       |  SELECT q_id, n_id, ${cosine("q_vec", "n_vec", dim)} AS sim
       |  FROM cand WHERE prerank <= $cands
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM re
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Mirrors [[Similarity.hammingRerankTopK]]: 63-bit sign codes (the
    * same distinct-power CASE sum as [[signBucket]]), Hamming coarse rank
    * via `bit_count(xor(...))` with ties to the lower neighbor id, exact
    * cosine re-rank of the top-`cands`.
    */
  def hammingRerankTopK(k: Int, nQueries: Int, cands: Int, dim: Int,
                        bits: Int = 63, table: String = "embeddings"): String =
    s"""WITH b AS (SELECT vec_id, embedding, ${signBucket("embedding", bits)} AS code FROM $table),
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec, code AS q_code FROM b WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, code AS n_code FROM b),
       |ham AS (
       |  SELECT q_id, n_id, q_vec, n_vec,
       |         bit_count(xor(q_code, n_code)) AS ham
       |  FROM q JOIN c ON q_id <> n_id
       |), cand AS (
       |  SELECT q_id, n_id, q_vec, n_vec,
       |         row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, n_id) AS prerank
       |  FROM ham
       |), re AS (
       |  SELECT q_id, n_id, ${cosine("q_vec", "n_vec", dim)} AS sim
       |  FROM cand WHERE prerank <= $cands
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM re
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Mirrors [[Similarity.hardNegativesTopK]] on the first `nQueries`
    * vectors as queries.
    */
  def hardNegativesTopK(k: Int, nQueries: Int, dim: Int,
                        table: String = "embeddings"): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_lab
       |           FROM $table WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, label AS n_lab FROM $table),
       |sims AS (
       |  SELECT q_id, n_id, ${cosine("q_vec", "n_vec", dim)} AS sim
       |  FROM q JOIN c ON q_id <> n_id AND q_lab <> n_lab
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  def lshBucketTopK(k: Int, nQueries: Int, dim: Int,
                    table: String = "embeddings"): String =
    lshBucketTopKWhere(k, s"q.vec_id < $nQueries", dim, table)

  /** Every corpus vector is a query (the kNN-eval shape). An explicit
    * variant, not a "larger than any id" nQueries sentinel: a magic bound
    * silently DROPS queries the day ids outgrow it, turning an eval bug
    * into a confusing parity failure instead of an obvious one.
    */
  def lshBucketTopKAllQueries(k: Int, dim: Int,
                              table: String = "embeddings"): String =
    lshBucketTopKWhere(k, "TRUE", dim, table)

  private def lshBucketTopKWhere(k: Int, queryPred: String, dim: Int,
                                 table: String): String =
    s"""WITH pbt AS (${planeBitsSql(table)}),
       |b AS (SELECT vec_id, embedding, ${signBucketDynamic("embedding")} AS bucket FROM $table, pbt),
       |sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         ${cosine("q.embedding", "c.embedding", dim)} AS sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE $queryPred
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Mirrors [[Similarity.multiProbeTopK]]: own bucket + every
    * 1-bit-flip bucket on the query side, DISTINCT candidate pairs,
    * exact cosine rank.
    */
  def multiProbeTopK(k: Int, nQueries: Int, dim: Int,
                     table: String = "embeddings"): String =
    s"""WITH pbt AS (${planeBitsSql(table)}),
       |b AS (SELECT vec_id, embedding, ${signBucketDynamic("embedding")} AS bucket
       |      FROM $table, pbt),
       |qp AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec,
       |         UNNEST(list_concat([bucket],
       |           list_transform(range(0, (SELECT pb FROM pbt)), i ->
       |             xor(bucket, CAST(1 AS BIGINT) << CAST(i AS INTEGER)))))
       |           AS bucket
       |  FROM b WHERE vec_id < $nQueries
       |), cand AS (
       |  SELECT DISTINCT qp.q_id, c.vec_id AS n_id
       |  FROM qp JOIN b c ON qp.bucket = c.bucket AND qp.q_id <> c.vec_id
       |), sims AS (
       |  SELECT cand.q_id, cand.n_id,
       |         ${cosine("q.embedding", "c.embedding", dim)} AS sim
       |  FROM cand
       |  JOIN $table q ON cand.q_id = q.vec_id
       |  JOIN $table c ON cand.n_id = c.vec_id
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Mirrors [[Similarity.ivfTopK]] including the deterministic k-means
    * refinement: seed centroids = first `nCentroids` vectors, ONE Lloyd
    * step whose per-centroid per-dimension mean folds members in vec-id
    * order (`list_sum(list(x ORDER BY id))` == Spark's sorted sequential
    * `aggregate` fold, bit-exact), then assignment by
    * `d2 = dot(v,v) - dot(v,c)*2 + dot(c,c)` with ties to the lowest
    * centroid id — the same arithmetic the codegen'd
    * [[graft.functions.NearestCentroids]] kernel runs.
    */
  /** Mirrors [[Similarity.pqCodes]]: per subspace, the same seeded
    * one-step Lloyd (exact member fold in m_id order), the same
    * (d2, c_id) assignment tie-break, the same |v|^2 - 2<v,c> + |c|^2
    * reconstruction error — stitched across subspaces with UNION ALL.
    */
  def pqCodes(m: Int, ksub: Int, dim: Int,
              table: String = "embeddings"): String = {
    val sel = (0 until m)
      .map(mi => s"SELECT vec_id, m, code, err2 FROM enc_$mi")
      .mkString("\nUNION ALL\n")
    s"WITH ${pqCtes(m, ksub, dim, table).mkString(",\n")}\n$sel\nORDER BY vec_id, m"
  }

  /** The shared PQ training CTEs (seeded one-step Lloyd per subspace →
    * `cents1_$mi` codebooks, `enc_$mi` code assignments) used by both the
    * [[pqCodes]] oracle and the [[pqAdcTopK]] search oracle — ONE
    * definition so the codebook arithmetic cannot drift between them.
    */
  private def pqCtes(m: Int, ksub: Int, dim: Int,
                     table: String): Seq[String] = {
    val sub = dim / m
    def subvec(x: String, mi: Int) =
      s"($x)[${mi * sub + 1}:${(mi + 1) * sub}]"
    def d2(v: String, c: String) =
      s"(${dot(v, v, sub)}) - (${dot(v, c, sub)}) * 2 + (${dot(c, c, sub)})"
    (0 until m).map { mi =>
      s"""cents0_$mi AS (
         |  SELECT vec_id AS c_id, ${subvec("embedding", mi)} AS c_vec
         |  FROM $table WHERE vec_id < $ksub
         |), a0_$mi AS (
         |  SELECT m_id, m_vec, centroid FROM (
         |    SELECT v.vec_id AS m_id, ${subvec("v.embedding", mi)} AS m_vec,
         |           c.c_id AS centroid,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             ${d2(subvec("v.embedding", mi), "c.c_vec")}, c.c_id) AS rn
         |    FROM $table v, cents0_$mi c
         |  ) WHERE rn = 1
         |), coords_$mi AS (
         |  SELECT centroid, j,
         |         list_sum(list(CAST(m_vec[j] AS DOUBLE) ORDER BY m_id))
         |           / count(*) AS coord
         |  FROM a0_$mi CROSS JOIN range(1, ${sub + 1}) t(j)
         |  GROUP BY centroid, j
         |), cents1_$mi AS (
         |  SELECT centroid AS c_id, list(coord ORDER BY j) AS c_vec
         |  FROM coords_$mi GROUP BY centroid
         |), enc_$mi AS (
         |  SELECT vec_id, CAST($mi AS BIGINT) AS m, centroid AS code, err2
         |  FROM (
         |    SELECT v.vec_id, c.c_id AS centroid,
         |           ${d2(subvec("v.embedding", mi), "c.c_vec")} AS err2,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             ${d2(subvec("v.embedding", mi), "c.c_vec")}, c.c_id) AS rn
         |    FROM $table v, cents1_$mi c
         |  ) WHERE rn = 1
         |)""".stripMargin
    }
  }

  /** Mirrors [[Similarity.pqAdcTopK]]: reuses the [[pqCtes]] codebooks,
    * builds the query-to-centroid LUT with the same
    * |q|^2 - 2<q,c> + |c|^2 staged arithmetic, selects LUT entries by
    * code, and folds the m per-subspace distances in subspace order
    * (`list_reduce` over `list(d2q ORDER BY m)` == the engine's
    * sorted-struct `aggregate` fold — bit-identical in IEEE double).
    */
  def pqAdcTopK(k: Int, nQueries: Int, m: Int, ksub: Int, dim: Int,
                table: String = "embeddings"): String = {
    val sub = dim / m
    def subvec(x: String, mi: Int) =
      s"($x)[${mi * sub + 1}:${(mi + 1) * sub}]"
    def d2(v: String, c: String) =
      s"(${dot(v, v, sub)}) - (${dot(v, c, sub)}) * 2 + (${dot(c, c, sub)})"
    val lutCtes = (0 until m).map { mi =>
      s"""lut_$mi AS (
         |  SELECT q.vec_id AS q_id, CAST($mi AS BIGINT) AS m, c.c_id,
         |         ${d2(subvec("q.embedding", mi), "c.c_vec")} AS d2q
         |  FROM $table q, cents1_$mi c WHERE q.vec_id < $nQueries
         |)""".stripMargin
    }
    val codesSel = (0 until m)
      .map(mi => s"SELECT vec_id AS n_id, m, code FROM enc_$mi")
      .mkString("\nUNION ALL\n")
    val lutSel = (0 until m)
      .map(mi => s"SELECT q_id, m, c_id, d2q FROM lut_$mi")
      .mkString("\nUNION ALL\n")
    s"""WITH ${(pqCtes(m, ksub, dim, table) ++ lutCtes).mkString(",\n")},
       |codes AS ($codesSel),
       |lut AS ($lutSel),
       |pairs AS (
       |  SELECT l.q_id, c.n_id,
       |         list_reduce(list_prepend(0.0, list(l.d2q ORDER BY l.m)),
       |                     (a, b) -> a + b) AS adc
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.c_id
       |  WHERE l.q_id <> c.n_id
       |  GROUP BY l.q_id, c.n_id
       |), ranked AS (
       |  SELECT q_id, n_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rank
       |  FROM pairs
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, adc FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  def ivfTopK(k: Int, nQueries: Int, nCentroids: Int, dim: Int, nprobe: Int = 1,
              refineIters: Int = 1, table: String = "embeddings"): String = {
    require(refineIters == 1, "oracle SQL is written for exactly one Lloyd step")
    def d2(v: String, c: String) =
      s"""(${dot(v, v, dim)})
         |           - (${dot(v, c, dim)}) * 2
         |           + (${dot(c, c, dim)})""".stripMargin
    def assign(src: String, cents: String, idAs: String, vecAs: String, probes: Int) =
      s"""SELECT $idAs, $vecAs, centroid FROM (
         |  SELECT v.vec_id AS $idAs, v.embedding AS $vecAs, c.c_id AS centroid,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${d2("v.embedding", "c.c_vec")}, c.c_id) AS rn
         |  FROM ($src) v, $cents c
         |) WHERE rn <= $probes""".stripMargin
    s"""WITH cents0 AS (SELECT vec_id AS c_id, embedding AS c_vec FROM $table WHERE vec_id < $nCentroids),
       |a0 AS (${assign(s"SELECT vec_id, embedding FROM $table", "cents0", "m_id", "m_vec", 1)}),
       |coords AS (
       |  SELECT centroid, j,
       |         list_sum(list(CAST(m_vec[j] AS DOUBLE) ORDER BY m_id)) / count(*) AS coord
       |  FROM a0 CROSS JOIN range(1, ${dim + 1}) t(j)
       |  GROUP BY centroid, j
       |),
       |cents1 AS (SELECT centroid AS c_id, list(coord ORDER BY j) AS c_vec FROM coords GROUP BY centroid),
       |corpus_a AS (${assign(s"SELECT vec_id, embedding FROM $table", "cents1", "n_id", "n_vec", 1)}),
       |queries_a AS (${assign(s"SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries", "cents1", "q_id", "q_vec", nprobe)}),
       |sims AS (
       |  SELECT q.q_id, c.n_id, ${cosine("q.q_vec", "c.n_vec", dim)} AS sim
       |  FROM queries_a q JOIN corpus_a c ON q.centroid = c.centroid AND q.q_id <> c.n_id
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Mirrors [[Similarity.ivfPqTopK]]: the [[ivfTopK]] coarse CTEs
    * (seeded one-step Lloyd, full-dim (d2, c_id) assignment, nprobe query
    * probes) restrict the candidate pairs, and the [[pqAdcTopK]]
    * codebook/LUT CTEs score exactly those candidates with the same
    * ordered per-subspace fold.
    */
  def ivfPqTopK(k: Int, nQueries: Int, m: Int, ksub: Int, nCentroids: Int,
                dim: Int, nprobe: Int = 1,
                table: String = "embeddings"): String = {
    val sub = dim / m
    def d2full(v: String, c: String) =
      s"""(${dot(v, v, dim)})
         |           - (${dot(v, c, dim)}) * 2
         |           + (${dot(c, c, dim)})""".stripMargin
    def assign(src: String, cents: String, idAs: String, vecAs: String, probes: Int) =
      s"""SELECT $idAs, $vecAs, centroid FROM (
         |  SELECT v.vec_id AS $idAs, v.embedding AS $vecAs, c.c_id AS centroid,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${d2full("v.embedding", "c.c_vec")}, c.c_id) AS rn
         |  FROM ($src) v, $cents c
         |) WHERE rn <= $probes""".stripMargin
    def subvec(x: String, mi: Int) =
      s"($x)[${mi * sub + 1}:${(mi + 1) * sub}]"
    def d2sub(v: String, c: String) =
      s"(${dot(v, v, sub)}) - (${dot(v, c, sub)}) * 2 + (${dot(c, c, sub)})"
    val coarse = Seq(
      s"""ivf_cents0 AS (SELECT vec_id AS c_id, embedding AS c_vec
         |  FROM $table WHERE vec_id < $nCentroids)""".stripMargin,
      s"""ivf_a0 AS (${assign(s"SELECT vec_id, embedding FROM $table",
             "ivf_cents0", "m_id", "m_vec", 1)})""",
      s"""ivf_coords AS (
         |  SELECT centroid, j,
         |         list_sum(list(CAST(m_vec[j] AS DOUBLE) ORDER BY m_id))
         |           / count(*) AS coord
         |  FROM ivf_a0 CROSS JOIN range(1, ${dim + 1}) t(j)
         |  GROUP BY centroid, j
         |)""".stripMargin,
      s"""ivf_cents1 AS (SELECT centroid AS c_id, list(coord ORDER BY j)
         |  AS c_vec FROM ivf_coords GROUP BY centroid)""".stripMargin,
      s"""corpus_a AS (${assign(s"SELECT vec_id, embedding FROM $table",
             "ivf_cents1", "n_id", "n_vec", 1)})""",
      s"""queries_a AS (${assign(
             s"SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries",
             "ivf_cents1", "q_id", "q_vec", nprobe)})""",
      """cand AS (
        |  SELECT q.q_id, c.n_id FROM queries_a q
        |  JOIN corpus_a c ON q.centroid = c.centroid AND q.q_id <> c.n_id
        |)""".stripMargin)
    val lutCtes = (0 until m).map { mi =>
      s"""lut_$mi AS (
         |  SELECT q.vec_id AS q_id, CAST($mi AS BIGINT) AS m, c.c_id,
         |         ${d2sub(subvec("q.embedding", mi), "c.c_vec")} AS d2q
         |  FROM $table q, cents1_$mi c WHERE q.vec_id < $nQueries
         |)""".stripMargin
    }
    val codesSel = (0 until m)
      .map(mi => s"SELECT vec_id AS n_id, m, code FROM enc_$mi")
      .mkString("\nUNION ALL\n")
    val lutSel = (0 until m)
      .map(mi => s"SELECT q_id, m, c_id, d2q FROM lut_$mi")
      .mkString("\nUNION ALL\n")
    s"""WITH ${(pqCtes(m, ksub, dim, table) ++ coarse ++ lutCtes).mkString(",\n")},
       |codes AS ($codesSel),
       |lut AS ($lutSel),
       |pairs AS (
       |  SELECT l.q_id, cd.n_id,
       |         list_reduce(list_prepend(0.0, list(l.d2q ORDER BY l.m)),
       |                     (a, b) -> a + b) AS adc
       |  FROM cand x
       |  JOIN codes cd ON cd.n_id = x.n_id
       |  JOIN lut l ON l.q_id = x.q_id AND l.m = cd.m AND cd.code = l.c_id
       |  GROUP BY l.q_id, cd.n_id
       |), ranked AS (
       |  SELECT q_id, n_id, adc,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rank
       |  FROM pairs
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, adc FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Mirrors [[Similarity.rangeSearch]]: same dynamic bucket count, same
    * bucket-blocked candidates, same exact-cosine threshold.
    */
  def rangeSearch(minCos: Double, nQueries: Int, dim: Int,
                  table: String = "embeddings"): String =
    s"""WITH pbt AS (${planeBitsSql(table)}),
       |b AS (SELECT vec_id, embedding, ${signBucketDynamic("embedding")} AS bucket FROM $table, pbt),
       |sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         ${cosine("q.embedding", "c.embedding", dim)} AS sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $nQueries
       |)
       |SELECT q_id, n_id, sim FROM sims WHERE sim >= $minCos
       |ORDER BY q_id, n_id""".stripMargin

  def nearDupPairs(minCosine: Double, dim: Int,
                   table: String = "embeddings"): String =
    s"""WITH pbt AS (${planeBitsSql(table)}),
       |b AS (SELECT vec_id, embedding, ${signBucketDynamic("embedding")} AS bucket FROM $table, pbt),
       |pairs AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |         ${cosine("x.embedding", "y.embedding", dim)} AS cos
       |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |)
       |SELECT a, b, cos FROM pairs WHERE cos > $minCosine ORDER BY a, b""".stripMargin
}
