package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Kafka sink (K2, SURVEY §2.2): one JSON message per row, keyless,
  * at-least-once — the Spark-native form of the reference's per-row
  * `json.dumps` → `producer.produce` loop (`src/sql_to_kafka.py:198-226`).
  *
  * The row→message transform is a plain (testable, codegen'd) DataFrame
  * transform; the actual network write is `format("kafka")`, which needs
  * the spark-sql-kafka connector on the cluster classpath and a reachable
  * broker — both absent in this container, so [[write]] is exercised in
  * integration environments while [[toMessages]] carries the semantics.
  */
object KafkaSink {

  /** Shape rows into Kafka message bodies: `value` = JSON object of all
    * columns in schema order (reference key order = column order,
    * `src/sql_to_kafka.py:157-163,209`). Keyless by default for parity —
    * the reference publishes without a key, so there is no per-entity
    * ordering guarantee (SURVEY §7.4.5); pass `keyCol` to upgrade.
    */
  def toMessages(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    // ignoreNullFields=false: the reference's json.dumps serializes SQLite
    // NULLs as JSON null (SURVEY §1.2) — Spark's default would drop them.
    val value = to_json(struct(df.columns.map(col): _*),
      Map("ignoreNullFields" -> "false")).as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None => df.select(value)
    }
  }

  /** Producer options mirroring the reference's tuned knobs
    * (`src/sql_to_kafka.py:175-182`, `.env.sample:12-16`): acks=all,
    * retries, batching. `enable.idempotence=false` for strict parity
    * (the reference is at-least-once, non-idempotent); flip to true for
    * the exactly-once-ish upgrade.
    */
  def referenceProducerOptions(bootstrap: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "kafka.acks" -> "all",
    "kafka.retries" -> "3",
    "kafka.batch.size" -> "16384",
    "kafka.linger.ms" -> "1",
    "kafka.buffer.memory" -> "33554432",
    "kafka.enable.idempotence" -> "false")

  /** Batch publish. With the default `format = "kafka"` this is the real
    * connector path (needs spark-sql-kafka on the classpath + a broker —
    * see build.sbt); pass `format = "graft-kafka-log"` to execute the
    * identical pipeline against the [[KafkaLogSink]] stand-in (same schema
    * contract, same required options, local log-file delivery), plus its
    * extra `path` option via `extraOptions`. The message schema is
    * validated up front with the connector's own rules either way, so a
    * shape bug fails here and not at cluster submit time.
    */
  /** Publish an ALREADY-SHAPED message frame with a caller-supplied full
    * option map — the entry point that lets [[graft.GraftConfig]]'s
    * env-tuned producer knobs (acks, retries, batching) actually reach
    * the producer instead of the hard-coded reference defaults.
    */
  def writeMessages(msgs: DataFrame, topic: String,
                    options: Map[String, String],
                    format: String = "kafka"): Unit = {
    KafkaLogSink.validateMessageSchema(msgs.schema, topicOption = true)
    msgs.write.format(format).mode("append")
      .options(options).option("topic", topic).save()
  }

  def write(df: DataFrame, topic: String, bootstrap: String,
            keyCol: Option[String] = None, format: String = "kafka",
            extraOptions: Map[String, String] = Map.empty): Unit = {
    val msgs = toMessages(df, keyCol)
    KafkaLogSink.validateMessageSchema(msgs.schema, topicOption = true)
    msgs.write
      .format(format)
      // Append is the producer semantic (publish is append-only); also the
      // only mode a V2 sink without catalog support accepts.
      .mode("append")
      .options(referenceProducerOptions(bootstrap))
      .option("topic", topic)
      .options(extraOptions)
      .save()
  }

  /** O4: pre-flight TCP reachability probe (reference
    * `src/sql_to_kafka.py:228-250`): plain socket connect per bootstrap
    * server, 1 s timeout, true if ANY broker answers. A driver-side check
    * outside the query plan — the pipeline degrades to "process but don't
    * publish" when it fails, like the reference's fallback (`:286-301`).
    */
  def isReachable(bootstrap: String, timeoutMs: Int = 1000): Boolean =
    bootstrap.split(",").exists { server =>
      val s = new java.net.Socket()
      try {
        // parse inside the try: a malformed or IPv6 bootstrap entry must
        // degrade the probe to false, not crash the driver the probe
        // exists to protect
        val parts = server.trim.split(":")
        val (host, port) = (parts(0), if (parts.length > 1) parts(1).toInt else 9092)
        s.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
        true
      } catch {
        case scala.util.control.NonFatal(_) => false
      } finally s.close()
    }
}
