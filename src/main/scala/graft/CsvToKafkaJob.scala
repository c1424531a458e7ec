package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.schemas.ProductSchemas
import graft.sinks.KafkaSink
import graft.sources.Sources

/** The relational pipeline as a runnable job — the Spark shape of the
  * reference's `python -m src.sql_to_kafka` entry point
  * (`src/sql_to_kafka.py:252-314`, SURVEY §3.1):
  *
  *   CSV → products table → F1∧F2 filter (+O1 order) → per-row JSON →
  *   Kafka (or stdout sample when no broker is reachable — the
  *   reference's "process but don't publish" degraded mode, `:286-301`).
  *
  * One lazy Catalyst plan replaces the reference's five materialized
  * stages; the CSV scan prunes to the filter columns + payload, and the
  * Kafka write shuffles nothing (narrow pipeline end to end).
  *
  * Usage: CsvToKafkaJob [products.csv] [asOfDate=2026-07-13] [daysBack]
  *        [status] [topic] [bootstrap]
  *
  * Defaults come from [[GraftConfig]] (S5): the reference's env keys
  * (CSV_FILE_PATH, DEFAULT_DAYS_BACK, ARTICLE_STATUS, KAFKA_TOPIC,
  * KAFKA_BOOTSTRAP_SERVERS, producer tuning) with its defaults;
  * positional args override env.
  */
object CsvToKafkaJob {
  def main(args: Array[String]): Unit = {
    val conf = GraftConfig.fromEnv()
    val csv = args.lift(0).getOrElse(conf.csvFilePath)
    val asOf = args.lift(1).getOrElse("2026-07-13")
    val daysBack = args.lift(2).map(_.toInt).getOrElse(conf.defaultDaysBack)
    val status = args.lift(3).getOrElse(conf.articleStatus)
    val topic = args.lift(4).getOrElse(conf.kafkaTopic)
    val bootstrap = args.lift(5).getOrElse(conf.kafkaBootstrapServers)

    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val products = Sources.csv(spark, csv, ProductSchemas.flat)
      // explicit asOf threshold, never a buried current_date() — the
      // reference's tests had to mock the clock (SURVEY §5.1)
      val threshold = java.time.LocalDate.parse(asOf).minusDays(daysBack).toString
      val recent = products
        .filter(col("articleStatus") === lit(status) &&
          col("b2bReadinessDate") >= lit(threshold))
        .orderBy(col("b2bReadinessDate").desc, col("ean"))
      // pin the message batch once: the publish, the count, and the
      // degraded-mode sample all read the SAME materialized rows instead
      // of re-scanning a CSV that may have changed between actions
      val messages = KafkaSink.toMessages(recent).localCheckpoint()
      val n = messages.count()
      if (KafkaSink.isReachable(bootstrap)) {
        // env-tuned producer knobs (S5) actually reach the producer —
        // GraftConfig.producerOptions overrides the reference defaults
        KafkaSink.writeMessages(messages, topic, conf.producerOptions)
        println(s"[csv-to-kafka] published $n messages to $topic")
      } else {
        println(s"[csv-to-kafka] kafka unreachable at $bootstrap — processed $n rows, sample:")
        messages.limit(3).collect().foreach(r => println("  " + r.getString(0)))
      }
    } finally spark.stop()
  }
}
