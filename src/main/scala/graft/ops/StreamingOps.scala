package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamPipelines

/** Batch registrations of the streaming transforms (same
  * `DataFrame => DataFrame` bodies run under `readStream` in
  * StreamingSpec) plus the as-of join. Oracle SQL mirrors window
  * semantics with explicit epoch arithmetic so bucket alignment is
  * engine-independent.
  */
object StreamingOps {

  /** Staged event log for the EXECUTED streaming queries, memoized per
    * (session, dir) like `pageRankGraph` — staging is a harness cost, not
    * query semantics, and re-writing a full copy of the events table per
    * invocation dominated `stream_dedup_exec`'s first pass in round 10.
    * Rooted in [[Tables.scratchDir]] so the per-app JVM shutdown hook
    * reclaims it (the round-10 form `createTempDirectory`'d a fresh copy
    * per call and never deleted it — round-10 verdict #1 / ADVICE).
    * Layout: `b1/` = the pristine log, `b2/` = every 7th event delivered
    * again (the at-least-once replay the dedup query repairs).
    */
  private val stageMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private[graft] def clearExecStageCache(): Unit = stageMemo.clear()

  /** Collision-free staging subdir name for a dataset dir: SHA-1 of the
    * FULL path, not `String.hashCode` — two distinct dirs with colliding
    * 32-bit hashCodes in one session would silently share (and the second
    * would overwrite) one staging directory while both memo entries kept
    * pointing at it.
    */
  private def stageKey(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private def stagedEventLog(s: SparkSession, dir: String): String = {
    stageMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    stageMemo.computeIfAbsent((s, dir), _ => {
      val root = Tables.scratchDir(s, s"sdedup_in_${stageKey(dir)}")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      ev.write.mode("overwrite").parquet(s"$root/b1")
      ev.filter(col("event_id") % 7 === 0)
        .write.mode("overwrite").parquet(s"$root/b2")
      root
    })
  }

  /** Range-ordered staged event log for the executed sessionizer. `in/`
    * holds the events table repartitioned BY RANGE on `ts` into
    * [[SessSlices]] part files whose modification times are set in range
    * order, plus two far-future single-row sentinel files (latest mod
    * times, user_id = -1). A `maxFilesPerTrigger = 1` file stream then
    * delivers the log time-ordered ACROSS micro-batches (order within one
    * batch stays arbitrary — the sessionizer sorts per key), so a
    * zero-delay watermark is exact: slice k+1's minimum exceeds slice k's
    * maximum by range partitioning, and no event ever arrives below the
    * watermark. Sentinel one advances the final watermark past every real
    * session's close; sentinel two (one minute later, so it merges into
    * the sentinel session instead of emitting it) triggers the timeout
    * pass that flushes them — watermarks take effect one batch late, and
    * relying on a trailing no-data batch instead would couple the query
    * to spark.sql.streaming.noDataMicroBatches.enabled.
    */
  private[graft] val SessSlices = 4

  /** Session gap shared by the batch twin, the executed sessionizer, and
    * the oracle (30 minutes, in micros).
    */
  val SessionGapUs: Long = 30L * 60L * 1000000L

  private def stagedSessionLog(s: SparkSession, dir: String): String = {
    stageMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    stageMemo.computeIfAbsent((s, s"ssess:$dir"), _ => {
      val root = Tables.scratchDir(s, s"ssess_in_${stageKey(dir)}")
      val inPath = s"$root/in"
      // event_type rides along for the executed stream-stream join, which
      // shares this staged ordered log (the sessionizer ignores it)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), col("value"))
      ev.repartitionByRange(SessSlices, col("ts"))
        .write.mode("overwrite").parquet(inPath)
      val p = new org.apache.hadoop.fs.Path(inPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      def parts(): Seq[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
      // part-0000N names sort in range order; pin mod times to that order
      // (minute steps keep every file far inside the source's maxFileAge)
      val base = fs.getFileStatus(p).getModificationTime
      val slices = parts().sortBy(_.getPath.getName)
      slices.zipWithIndex.foreach { case (f, i) =>
        fs.setTimes(f.getPath, base + i * 60000L, -1) }
      val maxTsUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
      def writeSentinel(tsUs: Long, seen: Set[String], mod: Long): Set[String] = {
        import s.implicits._
        Seq((-1L, -1L, "sentinel", tsUs, 0.0))
          .toDF("user_id", "event_id", "event_type", "us", "value")
          .select(col("user_id"), col("event_id"), col("event_type"),
            timestamp_micros(col("us")).as("ts"), col("value"))
          .coalesce(1).write.mode("append").parquet(inPath)
        val now = parts().map(_.getPath.getName).toSet
        (now -- seen).foreach(n =>
          fs.setTimes(new org.apache.hadoop.fs.Path(p, n), mod, -1))
        now
      }
      val farUs = maxTsUs + 100L * 86400L * 1000000L
      val seen1 = writeSentinel(farUs, slices.map(_.getPath.getName).toSet,
        base + 100L * 60000L)
      writeSentinel(farUs + 60L * 1000000L, seen1, base + 101L * 60000L)
      root
    })
  }

  /** Per-invocation sink/checkpoint namespace: a checkpoint is single-use
    * state (reusing one would make a re-run a no-op restore, not a
    * measurement), so each execution gets a fresh subdir — still under the
    * shutdown-hook-reclaimed scratch root, never leaked.
    */
  private val execSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Shuffle width for an EXECUTED streaming query, derived from the staged
    * input's on-disk size with the session's AQE advisory partition size.
    * AQE cannot re-plan inside a micro-batch, so a stateful stream's
    * state-partition count is pinned at query start from
    * `spark.sql.shuffle.partitions` — at bench width (32) a kilobyte-state
    * stream paid 32 state-store open+commit cycles per stateful operator
    * per micro-batch of near-pure fixed cost (measured on
    * stream_join_click_exec: stage wall 4.8 s, task-time sum 142.6 s, CPU
    * 2.9 s — tasks blocked, not computing; at width 8 the same stage read
    * 1.4 s wall). This applies the SAME volume rule AQE's partition
    * coalescing applies to the batch twins: width = bytes / advisory,
    * never above the configured shuffle width (so at 100 TB, where
    * bytes/advisory vastly exceeds it, the width is exactly what the conf
    * says — the rule only shrinks provably small state, it never caps
    * scale-out).
    */
  private def streamShuffleWidth(s: SparkSession, paths: String*): Int = {
    val hconf = s.sparkContext.hadoopConfiguration
    val bytes = paths.map { raw =>
      val p = new org.apache.hadoop.fs.Path(raw)
      p.getFileSystem(hconf).getContentSummary(p).getLength
    }.sum
    val conf = s.sessionState.conf
    val advisory = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    // Raw compressed on-disk bytes are divided by the (uncompressed-
    // calibrated) advisory size DELIBERATELY, i.e. the width is biased
    // narrow. The round-14 ADVICE suggested scaling by an encoded→
    // in-flight expansion factor (~4x); implemented and MEASURED in
    // round 15: the wider state width regressed stream_etl_upsert_exec
    // ~2.3x raw in two independent windows at both SFs (sf0.1 in-suite
    // 2.09→4.92 s, sf1 subset 2.23→5.13 s) — per-partition state-store
    // open/commit fixed cost dominates in-flight bytes at every local
    // scale, which is the exact pathology the width rule exists to
    // remove. Reverted; the clamp to the configured width still means at
    // 100 TB (bytes/advisory >> conf width either way) the factor is
    // irrelevant and scale-out is never capped.
    math.max(1L, math.min(conf.numShufflePartitions.toLong,
      bytes / math.max(1L, advisory) + 1)).toInt
  }

  /** Cloned session pinned to `width` shuffle partitions for ONE streaming
    * query. The width is captured into the query's checkpoint at start, so
    * it must live on a session no concurrent batch query shares (Verify
    * runs queries par-8 on one session — mutating the shared conf there
    * would race). Clock/parquet-legacy confs that affect streaming-side
    * expression semantics are copied explicitly: a fresh session state
    * falls back to SparkContext-level defaults, which carry them only when
    * this JVM's context was built by [[graft.GraftSession]].
    */
  private def streamSession(s: SparkSession, width: Int): SparkSession = {
    val s2 = s.newSession()
    // copy EVERY runtime conf override the parent session carries, not a
    // 2-key allowlist: any semantics-affecting conf set on the parent at
    // runtime must reach the executed stream exactly as it reaches its
    // batch twin (round-14 ADVICE). Static confs are fixed at context
    // level and unsettable per-session — skipped. The width override is
    // applied LAST so it wins over a copied parent width.
    s.sessionState.conf.getAllConfs
      .filter { case (k, _) =>
        // SQL runtime confs only: getAllConfs also surfaces core spark.*
        // context properties (driver port/host, app id) that are not
        // per-session-settable, and static SQL confs are fixed at context
        // level — both throw CANNOT_MODIFY_CONFIG
        k.startsWith("spark.sql.") &&
          !org.apache.spark.sql.internal.SQLConf.isStaticConfigKey(k) }
      .foreach { case (k, v) => s2.conf.set(k, v) }
    s2.conf.set("spark.sql.shuffle.partitions", width.toString)
    s2
  }

  /** stream_late_data_audit: watermark delay (µs — 6 h sits inside the
    * jittered disorder band at test SFs, so the report is non-degenerate)
    * and the arrival-bucket width of the two-level running max.
    */
  val LateDelayUs = 6L * 3600L * 1000000L
  val LateBucket = 10000L

  /** As-of join: for each event, the most recent order of the same user
    * at-or-before the event time (ties on time resolve to highest order
    * key — fully deterministic).
    *
    * Implementation is the scalable union+window form: tag both inputs,
    * union, partition by user, order by (time, kind, key), carry the last
    * seen order forward with `last(ignoreNulls)`. ONE shuffle on the user
    * key and a linear pass — no row explosion, no range-join blowup; at
    * 100 TB this is the sort-merge as-of shape (cf. pandas merge_asof /
    * QuestDB ASOF), expressed entirely in Catalyst operators.
    */
  def asOfJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    // cast("timestamp"): parquet NTZ timestamps → session-TZ (UTC)
    // timestamps so unix_micros applies; identity under UTC.
    val e = events.select(col("event_id"), col("user_id").as("k"),
      unix_micros(col("ts").cast("timestamp")).as("t"),
      lit(1).as("kind"), lit(null).cast("long").as("okey"))
    val o = orders.select(lit(null).cast("long").as("event_id"), col("o_custkey").as("k"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"), lit(0).as("kind"),
      col("o_orderkey").as("okey"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("kind"), col("okey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_orderkey", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("last_orderkey"))
      .orderBy("event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_counts" -> ((s, dir) =>
      StreamPipelines.tumblingCounts(Tables.events(s, dir))
        .orderBy("w_start", "event_type")),
    "stream_sliding_counts" -> ((s, dir) =>
      StreamPipelines.slidingCounts(Tables.events(s, dir))
        .orderBy("w_start", "event_type")),
    // stateful tumbling aggregation + stateless per-window top-k cut; see
    // StreamPipelines.topkPerWindow for the streaming/batch split
    "stream_window_topk" -> ((s, dir) =>
      StreamPipelines.topkPerWindow(
        StreamPipelines.tumblingCounts(Tables.events(s, dir)))
        .orderBy("w_start", "rnk")),
    // at-least-once repair: every 7th event "delivered" twice, key-dedup
    // restores exactly-once before the windowed aggregation. Batch twin of
    // dedupWithinWatermark (StreamingSpec runs the streaming form); the
    // oracle is the tumbling aggregation over the UN-duplicated log —
    // dedup transparency is the assertion. Duplicate rows are identical,
    // so which copy survives cannot affect any output column.
    "stream_dedup_replay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      StreamPipelines.tumblingCounts(
        ev.union(ev.filter(col("event_id") % 7 === 0))
          .dropDuplicates("event_id"))
        .orderBy("w_start", "event_type")
    }),
    "stream_sessionize" -> ((s, dir) =>
      StreamPipelines.sessionize(Tables.events(s, dir))
        .orderBy("user_id", "s_start")),
    "asof_join_events_orders" -> ((s, dir) =>
      asOfJoin(Tables.events(s, dir), Tables.load(s, dir, "orders"))),

    // Last-touch revenue attribution: each purchase credits the most
    // recent prior view/click of the same user (at-or-before, ties to the
    // highest event id — fully deterministic). Same union+window as-of
    // shape as asOfJoin: ONE shuffle on user_id, a linear carry-forward
    // pass, no range-join explosion; purchases with no prior touch fall
    // into the 'none' bucket, so revenue is conserved (spec-asserted).
    "attribution_last_touch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("k"),
          unix_micros(col("ts").cast("timestamp")).as("t"),
          col("event_id").as("eid"), lit(0).as("kind"),
          col("event_type").as("touch"), lit(null).cast("double").as("rev"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("k"),
          unix_micros(col("ts").cast("timestamp")).as("t"),
          col("event_id").as("eid"), lit(1).as("kind"),
          lit(null).cast("string").as("touch"), col("value").as("rev"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("kind"), col("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      touches.unionByName(purchases)
        .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .groupBy(coalesce(col("last_touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("rev").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("touch")
    }),
    // ---- EXECUTED Structured Streaming dedup (not a batch twin) ------------
    // The one registry row that actually RUNS a streaming query: stage a
    // duplicate-injected narrow event log (an at-least-once replay: every
    // 7th event delivered twice), drain it through readStream → watermark →
    // dropDuplicatesWithinWatermark → checkpointed parquet sink with
    // Trigger.AvailableNow, then aggregate the SINK's contents. n_events ==
    // n_distinct_ids per type and decimal-exact sum_value prove real
    // streaming state restored exactly-once semantics end to end (sink
    // files, not in-memory shortcuts). The 3650-day delay makes dedup state
    // cover the whole synthetic time range so the oracle is the exact
    // distinct log — at production cadence the delay is sized to the real
    // replay horizon (minutes-hours), keeping state O(keys in horizon);
    // nothing here is driver-resident, so the shape survives 100 TB: the
    // staged log, the dedup state, and the sink all scale out.
    "stream_dedup_exec" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val stage = stagedEventLog(s, dir)
      val run = Tables.scratchDir(s, s"sdedup_run_${execSeq.incrementAndGet()}")
      val schema = s.read.parquet(s"$stage/b1").schema
      val s2 = streamSession(s,
        streamShuffleWidth(s, s"$stage/b1", s"$stage/b2"))
      val src = StreamPipelines.parquetSource(s2, s"$stage/*", schema)
      val q = StreamPipelines.dedupWithinWatermark(src, "3650 days")
        .writeStream.format("parquet")
        .option("path", s"$run/out").option("checkpointLocation", s"$run/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.schema(schema).parquet(s"$run/out")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct_ids"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // ---- EXECUTED Structured Streaming windowed ETL (not a batch twin) -----
    // Second registry row that RUNS a real streaming query, covering the
    // stateful shape the batch twins only mirror: readStream over the
    // staged pristine log → watermark → tumbling window aggregation →
    // foreachBatch partition-level UPSERT sink (complete mode re-emits
    // updated windows; each micro-batch dynamically overwrites ONLY the
    // date partitions it touched — the idempotent late-data-reopens-its-day
    // table-maintenance shape, StreamPipelines.runFileEtlUpsert). The
    // registered result is the SINK read back, so exactness against the
    // batch oracle proves the streaming state + upsert bookkeeping end to
    // end. Scale shape: streaming state is O(open windows × types), the
    // sink rewrite is per touched date partition — both independent of log
    // size; at production cadence append/update mode with watermark
    // eviction bounds state to the disorder horizon.
    "stream_etl_upsert_exec" -> ((s, dir) => {
      val stage = stagedEventLog(s, dir)
      val run = Tables.scratchDir(s, s"setl_run_${execSeq.incrementAndGet()}")
      val schema = s.read.parquet(s"$stage/b1").schema
      StreamPipelines.runFileEtlUpsert(
        streamSession(s, streamShuffleWidth(s, s"$stage/b1")),
        s"$stage/b1", schema, s"$run/out", s"$run/ckpt")
      // d is a partition directory column on the sink: cast pins it to the
      // string the upsert wrote (partition type inference would read it
      // back as DATE and silently change the schema vs the oracle)
      s.read.parquet(s"$run/out")
        .select(col("w_start"), col("event_type"), col("n"),
          col("sum_value"), col("d").cast("string").as("d"))
        .orderBy("w_start", "event_type")
    }),

    // ---- EXECUTED arbitrary-stateful sessionization (not a batch twin) -----
    // Third registry row that RUNS a real streaming query, covering the
    // one streaming API whose registered evidence was still mirror-only:
    // KeyValueGroupedDataset.flatMapGroupsWithState (engine-managed
    // per-key state, EventTimeTimeout, append mode). The staged log is
    // range-ordered across micro-batches (see stagedSessionLog), the
    // sessionizer folds each user's events into ONE open session of
    // state, emits a session when a later event proves the 30-minute gap,
    // and the watermark timeout flushes each user's final session — the
    // sink is checkpointed parquet, and the registered result is the SINK
    // read back, oracle = the batch gap-sessionization. Scale shape:
    // state is O(active users) x one session, timeouts are engine-managed
    // per key, the sink appends — nothing driver-resident.
    "stream_sessionize_exec" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StatefulOps
      val stage = stagedSessionLog(s, dir)
      val run = Tables.scratchDir(s, s"ssess_run_${execSeq.incrementAndGet()}")
      val schema = s.read.parquet(s"$stage/in").schema
      val s2 = streamSession(s, streamShuffleWidth(s, s"$stage/in"))
      val src = s2.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/in")
      import s2.implicits._
      val typed = src.withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("ts_us"),
          // the engine's own decimal(18,2) cast, so the folded cents sum
          // is bit-identical to the batch decimal aggregation
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .as[StatefulOps.SessEvent]
      val q = StatefulOps.sessionizeStreaming(typed, SessionGapUs).toDF()
        .writeStream.format("parquet")
        .option("path", s"$run/out").option("checkpointLocation", s"$run/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$run/out")
        .filter(col("user_id") >= 0) // drop the sentinel user's session
        .select(col("user_id"),
          date_format(timestamp_micros(col("start_us")),
            "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(timestamp_micros(col("last_us") + lit(SessionGapUs)),
            "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("n_events"),
          (col("cents").cast("double") / lit(100.0)).as("session_value"))
        .orderBy("user_id", "s_start")
    }),

    "stream_join_click_pairs" -> ((s, dir) =>
      StreamPipelines.clickErrorJoin(Tables.events(s, dir))
        .orderBy("err_id", "clk_id")),

    // ---- EXECUTED stream-stream interval join (not a batch twin) -----------
    // Fourth executed streaming query: the last stateful streaming API
    // whose registered evidence was mirror-only. The SAME clickErrorJoin
    // body the batch twin uses runs under readStream over the staged
    // ordered log — a real stream-stream inner join with watermarks on
    // both sides and the two-sided time-range condition that bounds join
    // state. Inner-join matches emit EAGERLY (the watermark only governs
    // state eviction), so AvailableNow drains every pair with no sentinel
    // flush needed; the range-ordered staging plus the 1-hour watermark
    // delay guarantee no input row is ever late-dropped (slice k+1's min
    // exceeds slice k's max, and eviction of a click needs the watermark
    // past t_clk + lookback, which cannot precede a matching error's
    // arrival). The registered result is the checkpointed SINK read back;
    // oracle = the batch interval join.
    "stream_join_click_exec" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val stage = stagedSessionLog(s, dir)
      val run = Tables.scratchDir(s, s"ssjoin_run_${execSeq.incrementAndGet()}")
      val schema = s.read.parquet(s"$stage/in").schema
      // 3 files per trigger → exactly two micro-batches over the 4 slices
      // + 2 sentinels: pairs spanning the slice-2→slice-3 boundary prove
      // cross-batch join state, while each extra batch costs a full
      // 2-sided state-store commit cycle per shuffle partition (measured
      // ~2-3 s/batch) that buys no additional evidence — the sessionizer
      // keeps 1 file/trigger because its timeout flush NEEDS the sentinel
      // in a later batch than the last real data
      val src = streamSession(s, streamShuffleWidth(s, s"$stage/in"))
        .readStream.schema(schema)
        .option("maxFilesPerTrigger", 3).parquet(s"$stage/in")
      val q = StreamPipelines.clickErrorJoin(src)
        .writeStream.format("parquet")
        .option("path", s"$run/out").option("checkpointLocation", s"$run/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$run/out")
        .select(col("err_id"), col("clk_id"), col("user_id"))
        .orderBy("err_id", "clk_id")
    }),
    "stream_static_enrich" -> ((s, dir) =>
      StreamPipelines.enrichWithCustomers(
        Tables.events(s, dir), Tables.load(s, dir, "customer"))
        .orderBy("event_id"))
  ,

    // ---- watermark late-data accounting (batch twin) -----------------------
    // What a streaming engine's watermark DROPS, made auditable: arrival
    // order is the ingest stream (the clean event_id order plus a
    // deterministic bounded jitter — the multi-partition interleave
    // watermarks exist for), the watermark after each arrival is the
    // running max event time seen so far minus [[LateDelayUs]], and an
    // event is late iff its event time sits below that watermark. Per-day
    // on-time/late counts — the accounting report that sizes a production
    // withWatermark() delay. Scale shape: the running max is TWO-LEVEL
    // (per-arrival-bucket maxima, a serial scan over O(buckets) rows for
    // the exclusive offsets, intra-bucket windows in parallel) — arrival
    // order is never totally sorted in one task.
    "stream_late_data_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir).select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("t"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .withColumn("arr", col("event_id") +
          pmod(col("event_id") * 1103515245L + 12345L, lit(101L)) * 3L)
        .withColumn("bk", expr(s"arr div $LateBucket"))
      val wOff = Window.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = e.groupBy(col("bk")).agg(max(col("t")).as("bmax"))
        .select(col("bk"), max(col("bmax")).over(wOff).as("prev_max"))
      val wIn = Window.partitionBy(col("bk")).orderBy(col("arr"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.join(off, "bk")
        .withColumn("wm_max", greatest(
          coalesce(max(col("t")).over(wIn), lit(Long.MinValue)),
          coalesce(col("prev_max"), lit(Long.MinValue))))
        // compared on the + side: wm_max is Long.MinValue on the very
        // first arrival, and MinValue - delay overflows under ANSI
        .withColumn("late", col("wm_max") > col("t") + lit(LateDelayUs))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
        .orderBy("day")
    }))

  /** Gap-sessionization oracle, shared by the batch twin and the executed
    * flatMapGroupsWithState form (both must equal it exactly).
    */
  private val SessionizeSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   >= INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |)
      |SELECT user_id,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
      |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM numbered GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin

  /** Interval-join oracle, shared by the batch twin and the executed
    * stream-stream form (both must equal it exactly).
    */
  private val ClickErrorJoinSql =
    """WITH err AS (
      |  SELECT event_id AS err_id, user_id, epoch_us(ts) AS t_err
      |  FROM events WHERE event_type = 'error'
      |), clk AS (
      |  SELECT event_id AS clk_id, user_id, epoch_us(ts) AS t_clk
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT err_id, clk_id, err.user_id
      |FROM err JOIN clk ON err.user_id = clk.user_id
      |  AND clk.t_clk >= err.t_err - 30 * 60 * 1000000
      |  AND clk.t_clk < err.t_err
      |ORDER BY err_id, clk_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "stream_late_data_audit" ->
      s"""WITH e AS (
         |  SELECT event_id, epoch_us(ts) AS t, strftime(ts, '%Y-%m-%d') AS day,
         |         event_id + ((event_id * 1103515245 + 12345) % 101) * 3 AS arr
         |  FROM events
         |), w AS (
         |  SELECT day, t,
         |    max(t) OVER (ORDER BY arr, event_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS wm
         |  FROM e
         |)
         |SELECT day, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN wm - $LateDelayUs > t THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_late
         |FROM w GROUP BY day ORDER BY day""".stripMargin,
    "stream_tumbling_counts" ->
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_window_topk" ->
      """WITH c AS (
        |  SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600),
        |           '%Y-%m-%d %H:%M:%S') AS w_start,
        |         event_type, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT w_start, event_type, n, sum_value,
        |         CAST(row_number() OVER (PARTITION BY w_start
        |           ORDER BY n DESC, event_type) AS INT) AS rnk
        |  FROM c
        |)
        |SELECT w_start, event_type, CAST(n AS BIGINT) AS n, rnk
        |FROM r WHERE rnk <= 3 ORDER BY w_start, rnk""".stripMargin,
    // executed-streaming dedup: the checkpointed sink's contents must be
    // exactly the pristine (un-duplicated) log — count == distinct count
    // per type, decimal-exact value sum
    // executed-streaming windowed upsert ETL: the partition-upserted sink
    // must equal the batch tumbling aggregation, d = the window's date
    "stream_etl_upsert_exec" ->
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d') AS d
        |FROM events GROUP BY 1, 2, 5 ORDER BY w_start, event_type""".stripMargin,
    "stream_dedup_exec" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // dedup transparency: the replayed+deduped aggregation must equal the
    // aggregation over the pristine log
    "stream_dedup_replay" ->
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sliding_counts" ->
      """WITH expanded AS (
        |  SELECT event_type,
        |         to_timestamp(floor(epoch(ts) / 900) * 900) - to_seconds(CAST(i * 900 AS BIGINT)) AS w_start
        |  FROM events, UNNEST(range(0, 4)) AS t(i)
        |)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type, count(*) AS n
        |FROM expanded GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_sessionize" -> SessionizeSql,
    // the executed flatMapGroupsWithState sessionizer must reproduce the
    // batch gap-sessionization exactly
    "stream_sessionize_exec" -> SessionizeSql,
    "attribution_last_touch" ->
      """WITH attributed AS (
        |  SELECT e.value,
        |    (SELECT t.event_type FROM events t
        |     WHERE t.user_id = e.user_id
        |       AND t.event_type IN ('view', 'click')
        |       AND epoch_us(t.ts) <= epoch_us(e.ts)
        |     ORDER BY epoch_us(t.ts) DESC, t.event_id DESC LIMIT 1) AS lt
        |  FROM events e WHERE e.event_type = 'purchase'
        |)
        |SELECT coalesce(lt, 'none') AS touch,
        |       count(*) AS n_purchases,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM attributed GROUP BY 1 ORDER BY touch""".stripMargin,
    "asof_join_events_orders" ->
      """SELECT event_id, user_id,
        |  (SELECT o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
        |FROM events e ORDER BY event_id""".stripMargin,
    "stream_join_click_pairs" -> ClickErrorJoinSql,
    // the executed stream-stream join must reproduce the batch interval
    // join exactly (inner-join emission is eager; staging is ordered)
    "stream_join_click_exec" -> ClickErrorJoinSql,
    "stream_static_enrich" ->
      """SELECT event_id, user_id, event_type, c_mktsegment
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin
  )
}
