package graft.sim

/** DuckDB oracle mirrors of [[Similarity]]. The dot product folds
  * left-to-right in double precision on both engines, so similarity values
  * are bit-identical, not just approximately equal.
  */
object SimilaritySql {

  def dot(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> " +
      s"CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"

  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)}) / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)}))"

  def signBucket(v: String, planeBits: Int = 6): String =
    (0 until planeBits).map(i =>
      s"CASE WHEN ($v)[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")

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

  def lshBucketTopK(k: Int, nQueries: Int, dim: Int, planeBits: Int = 6,
                    table: String = "embeddings"): String =
    s"""WITH b AS (SELECT vec_id, embedding, ${signBucket("embedding", planeBits)} AS bucket FROM $table),
       |sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         ${cosine("q.embedding", "c.embedding", dim)} AS sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $nQueries
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, sim FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  def ivfTopK(k: Int, nQueries: Int, nCentroids: Int, dim: Int, nprobe: Int = 1,
              table: String = "embeddings"): String = {
    def assign(src: String, idAs: String, vecAs: String, probes: Int = 1) =
      s"""SELECT $idAs, $vecAs, centroid FROM (
         |  SELECT v.vec_id AS $idAs, v.embedding AS $vecAs, c.vec_id AS centroid,
         |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |           (${dot("v.embedding", "v.embedding", dim)})
         |           - (${dot("v.embedding", "c.embedding", dim)}) * 2
         |           + (${dot("c.embedding", "c.embedding", dim)}), c.vec_id) AS rn
         |  FROM ($src) v, (SELECT vec_id, embedding FROM $table WHERE vec_id < $nCentroids) c
         |) WHERE rn <= {PROBES}""".stripMargin.replace("{PROBES}", probes.toString)
    s"""WITH corpus_a AS (${assign(s"SELECT vec_id, embedding FROM $table", "n_id", "n_vec")}),
       |queries_a AS (${assign(s"SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries", "q_id", "q_vec", nprobe)}),
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

  def nearDupPairs(minCosine: Double, dim: Int, planeBits: Int = 6,
                   table: String = "embeddings"): String =
    s"""WITH b AS (SELECT vec_id, embedding, ${signBucket("embedding", planeBits)} AS bucket FROM $table),
       |pairs AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |         ${cosine("x.embedding", "y.embedding", dim)} AS cos
       |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |)
       |SELECT a, b, cos FROM pairs WHERE cos > $minCosine ORDER BY a, b""".stripMargin
}
