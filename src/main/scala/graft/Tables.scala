package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet test-table access (TESTDATA.md). One parquet file per table under
  * the scale-factor dir the driver passes to every query.
  *
  * Scans stay plain `spark.read.parquet` so Catalyst's data-source V2 path
  * keeps predicate pushdown, column pruning, and vectorized decoding — at
  * 100 TB these tables would be partitioned directories instead of single
  * files and nothing here would change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS); Spark's vectorized
    * reader needs `spark.sql.legacy.parquet.nanosAsLong` (or rebasing) for
    * it. Loading via this helper normalizes `ts` to a TimestampType column
    * (microsecond precision) regardless of which mode the session is in.
    */
  /** Exact row count from parquet FOOTER metadata — driver-side file-status
    * + footer reads, NO Spark job. The cheap way to size algorithm
    * parameters (LSH bucket counts, sample rates) at plan-construction
    * time: row-group counts are exact in every parquet footer. At lake
    * scale prefer catalog statistics or an explicitly supplied N; this
    * helper covers path-addressed tables without a catalog.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // RECURSE into subdirectories: a Hive-partitioned layout keeps its
    // part files one level down, and a non-recursive listing would
    // silently return 0 — which downstream sizing (LSH bucket counts)
    // would accept as a real corpus size
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) Seq(st)
      else fs.listStatus(p).toSeq
        .filterNot(_.getPath.getName.startsWith("_"))
        .flatMap(f => if (f.isDirectory) walk(f.getPath)
          else if (f.getPath.getName.endsWith(".parquet")) Seq(f) else Nil)
    }
    walk(root).map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  /** Hash-repartition on `keys`, localCheckpoint, and RE-DECLARE the
    * resulting layout on the returned frame. Under AQE the checkpoint's
    * `LogicalRDD` comes back with `UnknownPartitioning` even though the
    * rows are physically laid out `pmod(murmur3(keys), n)` — so every
    * downstream join/aggregate on `keys` re-shuffles the full checkpoint
    * payload. Re-tagging the true `HashPartitioning` (via the
    * [[org.apache.spark.sql.graftbridge.Bridge]] into Spark's classic
    * Dataset internals) lets `EnsureRequirements` elide those exchanges —
    * the same contract as a bucketed table read, for session-lifetime
    * working sets that would be bucketed TABLES at 100 TB.
    *
    * The declared layout is exactly what this method just produced
    * (repartition immediately followed by the checkpoint), so the
    * mis-declaration hazard of raw `tagHashPartitioned` cannot arise.
    */
  def checkpointHashPartitioned(df: DataFrame, keys: Seq[String],
                                numPartitions: Int,
                                eager: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.col
    val ck = df.repartition(numPartitions, keys.map(col): _*)
      .localCheckpoint(eager)
    org.apache.spark.sql.graftbridge.Bridge
      .tagHashPartitioned(ck, keys, numPartitions)
  }

  /** Repair under-provisioned scan parallelism. The single-file test
    * tables carry ONE parquet row group, so their scan yields ONE input
    * partition and every downstream codegen'd kernel (gram hashing,
    * minhash, quality features) runs on one core no matter how many the
    * session has. This helper repartitions ONLY in that case — when the
    * scan already provides >= session-core partitions (any real lake
    * layout: thousands of row-group splits), it is an exact no-op, so the
    * 100 TB plan stays the narrow scan→kernel chain with no extra
    * exchange. Locally the round trip costs one shuffle of the raw rows
    * (sub-MB for the tables this applies to) and buys core-count
    * parallelism for the CPU-bound kernels (measured: the text/dedup
    * family drops ~2-4x per query at sf0.1 on 4 cores).
    */
  def parallelized(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Size the repair by DATA VOLUME, capped at the session's cores:
    // ~128 KB of plan-stats bytes per partition. Flooding a tiny corpus
    // across 32 threads costs more in per-stage task scheduling than the
    // kernels win back (measured: the n-gram pipeline at local[32] ran
    // 6.9 s with a 32-way repair vs 2.8 s with a volume-sized one).
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes / (128L * 1024) + 1).min(cores).max(2).toInt
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** Per-session scratch directory for round-trip queries, namespaced by
    * applicationId so two concurrent runs on one machine (bench alongside
    * tests) never overwrite each other's scratch between a write and the
    * read-back. The ONE definition — queries and specs must share it or a
    * namespacing change silently breaks whichever copy lags. Each per-app
    * root registers a JVM shutdown hook that deletes it recursively, so
    * iterating runs don't accumulate dataset copies in java.io.tmpdir.
    */
  private val scratchRoots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def scratchDir(spark: SparkSession, name: String): String = {
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${spark.sparkContext.applicationId}")
    if (scratchRoots.add(root.getAbsolutePath))
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          val sub = f.listFiles(); if (sub != null) sub.foreach(rm); f.delete()
        }
        rm(root)
      }
    new java.io.File(root, name).getAbsolutePath
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: double division of epoch-nanos loses
        // sub-microsecond precision (2^53 < 1e18) and can shift a value
        // across a truncation boundary.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros-encoded parquet without a UTC flag reads as TIMESTAMP_NTZ;
        // the session timezone is pinned to UTC everywhere (SparkSpec /
        // GraftExtensions), so the wall-clock reinterpretation cast is the
        // identity on the underlying micros value.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
