package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming pipelines — the north-star upgrade of the
  * reference's daily batch jobs (BASELINE.json: "Kafka-to-S3 ETL maps to
  * Structured Streaming with Kafka source and Parquet/S3 sink").
  *
  * Design rule: every transform is a plain `DataFrame => DataFrame` that
  * works identically on a batch frame and a streaming frame — batch runs
  * are the oracle for the streaming runs (tested in StreamingSpec), and
  * `Trigger.AvailableNow` reproduces the reference's daily-batch cadence
  * (O2, `dags/sql_to_kafka_dag.py:21-30`) with checkpointed exactly-once
  * sink semantics instead of the reference's at-least-once keyless
  * publish (SURVEY §7.4.5).
  */
object StreamPipelines {

  /** Kafka JSON topic → typed columns. The inverse of
    * [[graft.sinks.KafkaSink.toMessages]]: value bytes → schema'd struct.
    */
  def parseKafkaJson(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), schema).as("r"),
        col("timestamp").as("kafka_ts"))
      .select(col("r.*"), col("kafka_ts"))

  /** Kafka source (needs spark-sql-kafka on the classpath at runtime;
    * untestable in this container — the parse/transform stages are the
    * tested surface).
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** File-based streaming source over a parquet path (the testable stand-in
    * for the Kafka source; identical downstream plan).
    */
  def parquetSource(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  // ---- shared batch/streaming transforms ----------------------------------

  /** Tumbling-window counts + exact decimal sums per event type.
    * On a streaming frame add [[withWatermark]] upstream.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Top-k event types per tumbling window by count (ties to the smaller
    * type string). The AGGREGATION is the streaming-stateful part
    * (identical to [[tumblingCounts]]'s incremental state); the per-window
    * rank cut is a stateless post-process — in a live pipeline it runs in
    * foreachBatch over each micro-batch's updated windows, in batch it
    * compiles to WindowGroupLimit (no full sort). One shape, two runners —
    * the StreamingSpec drives the streaming aggregation and applies this
    * same cut to the sink.
    */
  def topkPerWindow(counts: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rnk", row_number().over(Window.partitionBy(col("w_start"))
        .orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= k)
      .select(col("w_start"), col("event_type"), col("n"), col("rnk"))
  }

  /** Sliding-window event rates. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-based), built-in `session_window`. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
        col("n_events"), col("session_value"))

  /** Stream-stream interval join: the clicks within `lookback` BEFORE each
    * error of the same user (the funnel/attribution join, streaming form).
    * Watermarks on BOTH sides plus the two-sided time-range condition are
    * what let Structured Streaming bound the join state: a click row can
    * be dropped from state once the error-side watermark passes
    * `ts_clk + lookback`. Without the range condition the state grows
    * forever — the condition is a correctness requirement at scale, not
    * an optimization. Same body runs on batch frames (watermark is a
    * no-op there), which is how the oracle checks it.
    */
  def clickErrorJoin(events: DataFrame, lookbackMinutes: Int = 30,
                     watermark: String = "1 hour"): DataFrame = {
    val err = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u_err"),
        col("ts").as("ts_err"))
      .withWatermark("ts_err", watermark)
    val clk = events.filter(col("event_type") === "click")
      .select(col("event_id").as("clk_id"), col("user_id").as("u_clk"),
        col("ts").as("ts_clk"))
      .withWatermark("ts_clk", watermark)
    err.join(clk, expr(
        s"""u_err = u_clk AND
           |ts_clk >= ts_err - INTERVAL $lookbackMinutes MINUTES AND
           |ts_clk < ts_err""".stripMargin))
      .select(col("err_id"), col("clk_id"), col("u_err").as("user_id"))
  }

  /** Stream-static enrichment: each event joined (left) to the customer
    * dimension. The static side needs no watermark — it is re-read (or
    * broadcast) per micro-batch, the canonical streaming-lookup shape.
    * Same body on a batch frame is the oracle.
    */
  def enrichWithCustomers(events: DataFrame, customers: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("event_type"))
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"))

  /** Streaming dedup within the watermark — the exactly-once-ish upgrade
    * the reference lacks (at-least-once producer ⇒ duplicates possible;
    * SURVEY §7.4.5).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour",
                           keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  // ---- sinks --------------------------------------------------------------

  /** Parquet-on-object-store sink with checkpointing;
    * `Trigger.AvailableNow` drains everything available then stops —
    * the daily-batch cadence with streaming-grade exactly-once bookkeeping.
    */
  def parquetSink(df: DataFrame, outPath: String, checkpoint: String,
                  availableNow: Boolean = true): DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    if (availableNow) w.trigger(Trigger.AvailableNow()) else w
  }

  /** Streaming upsert ETL: `foreachBatch` + partition-level dynamic
    * overwrite per micro-batch. Each batch's aggregate rewrites ONLY the
    * date partitions it touches — late data re-opens its day and the
    * rerun is idempotent at partition granularity. This is the
    * production append-mostly table-maintenance shape; the plain
    * append sink ([[parquetSink]]) is the immutable-log shape.
    * Checkpointing still gives exactly-once batch tracking; the write
    * itself is idempotent per (batch, partition) by construction.
    */
  def runFileEtlUpsert(spark: SparkSession, inPath: String, schema: StructType,
                       outPath: String, checkpoint: String): Unit = {
    val raw = normalizeTs(parquetSource(spark, inPath, schema), schema)
    val q = tumblingCounts(raw.withWatermark("ts", "1 hour"))
      .withColumn("d", substring(col("w_start"), 1, 10))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.TableSink.upsertPartitions(batch.toDF(), outPath, Seq("d"))
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** End-to-end job: streaming parquet source → watermark + dedup →
    * tumbling aggregation → parquet sink, drained with AvailableNow.
    */
  def runFileEtl(spark: SparkSession, inPath: String, schema: StructType,
                 outPath: String, checkpoint: String): Unit = {
    val src = normalizeTs(parquetSource(spark, inPath, schema), schema)
    val agg = tumblingCounts(src.withWatermark("ts", "1 hour"))
    val q = parquetSink(agg, outPath, checkpoint).start()
    q.awaitTermination()
  }

  /** Normalize a legacy nanos-as-long `ts` to a real timestamp, ONLY when
    * the schema says the column is a long (see Tables.events) — the ONE
    * definition both file-ETL entry points share, so a TimestampType
    * schema can never hit an integral `div` on a timestamp (the
    * unconditional copy in the upsert path used to fail analysis there).
    */
  private def normalizeTs(df: DataFrame, schema: StructType): DataFrame =
    schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // session tz is pinned UTC, so the NTZ reinterpretation cast is
        // the identity on the underlying micros (see Tables.events)
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
}
