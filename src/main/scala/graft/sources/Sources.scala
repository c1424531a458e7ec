package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY §2.1).
  *
  * All sources go through Spark's DataSource V2 readers, so predicate
  * pushdown, column pruning and vectorized decoding apply; an `s3a://`
  * path behaves identically to `file://` given hadoop-aws + credentials in
  * the Hadoop conf (reference's env-switched MinIO/S3 endpoint, O5, becomes
  * `spark.hadoop.fs.s3a.*` configuration — never engine logic).
  */
object Sources {

  /** S1: CSV scan with header. Explicit schema preferred (pins nullability
    * and keeps full-scan-free pruning); `inferSchema=true` reproduces the
    * reference's pandas-inferred path (`src/sql_to_kafka.py:127`) at the
    * cost of one extra pass — unacceptable at 100 TB, so explicit is the
    * default here.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S4: multiline JSON document scan — a file containing one JSON array of
    * documents becomes one row per element (reference `json.load` +
    * list-iteration, `src/s3_json_to_xml.py:104,126`). Explicit schema in
    * document order (never inference — it sorts keys, SURVEY §7.4.2).
    * `FAILFAST` reproduces the reference's raise-on-malformed behavior (F3).
    */
  def jsonDocuments(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(path)

  /** Parquet table scan (the engine-native format; S2 analog). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — the second columnar lake format (Spark-native reader, same
    * vectorized decode + pushdown + pruning surface as parquet). Round-trip
    * is lossless for every type the engine uses, proven by
    * `orc_roundtrip_agg` hashing equal to its parquet-side oracle.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink twin of [[orc]] (zlib by default; columnar stats + indexes
    * written per stripe, so a downstream filter skips stripes like parquet
    * skips row groups).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Distributed raw-object writer: one file per row, written from the
    * EXECUTORS through the Hadoop FileSystem API (`file://` here, `s3a://`
    * or HDFS on a cluster with zero code change) — the shape of a media
    * lake materialization where payload objects live beside the metadata
    * table. Pairs with Spark's built-in `binaryFile` source for the
    * read-back (path/length/content), proven lossless end to end by the
    * `binaryfile_ingest` oracle, which recomputes the expected
    * (name, size, hex) triple from the source table alone.
    */
  def writeBinaryFiles(df: DataFrame, dir: String,
                       nameCol: String = "fname",
                       payloadCol: String = "payload"): Unit = {
    import org.apache.spark.sql.functions.col
    // Ship the SESSION's Hadoop conf to the executors as a plain Map (the
    // Configuration object itself is not Serializable, and a fresh
    // `new Configuration()` would silently drop spark.hadoop.* settings —
    // s3a credentials/endpoints — that only exist session-side).
    val confMap = {
      val hc = df.sparkSession.sessionState.newHadoopConf()
      val it = hc.iterator(); val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    df.select(col(nameCol), col(payloadCol))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val hconf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => hconf.set(k, v) }
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
        // write-to-temp + overwrite-rename per object, temp name scoped by
        // task attempt: a retried or speculative attempt never interleaves
        // bytes into the final path (a reader sees the old object or the
        // new one, not a torn write — and never a missing object: there is
        // no delete-before-rename window). FileContext.rename(OVERWRITE)
        // is the atomic replace on HDFS/file://; where FileContext is
        // unavailable for the scheme, the plain-rename fallback treats
        // "target exists" as success — content is deterministic per row,
        // so a concurrent attempt's object is byte-identical.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fc = try Some(org.apache.hadoop.fs.FileContext.getFileContext(
          new org.apache.hadoop.fs.Path(dir).toUri, hconf))
        catch { case _: java.io.IOException => None }
        it.foreach { r =>
          val target = new org.apache.hadoop.fs.Path(dir, r.getString(0))
          val tmp = new org.apache.hadoop.fs.Path(dir,
            s".${r.getString(0)}.$attempt.tmp")
          val out = fs.create(tmp, true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          fc match {
            case Some(ctx) =>
              ctx.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            case None =>
              if (!fs.rename(tmp, target)) {
                // target exists: it is either a concurrent attempt's copy
                // of THIS run's bytes (identical — deterministic per row)
                // or a PREVIOUS run's stale object that must be replaced.
                // Delete-and-retry covers both; only if the retry ALSO
                // loses (another attempt renamed in between — that copy
                // is this run's content) is dropping tmp safe.
                fs.delete(target, false)
                if (!fs.rename(tmp, target)) {
                  if (fs.exists(target)) fs.delete(tmp, false)
                  else throw new java.io.IOException(s"rename $tmp -> $target failed")
                }
              }
          }
        }
      }
  }
}
