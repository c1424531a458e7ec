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
  * Usage: CsvToKafkaJob <products.csv> [asOfDate=2026-07-13] [daysBack=30]
  *        [status=created] [topic=products] [bootstrap=localhost:9092]
  */
object CsvToKafkaJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CsvToKafkaJob <products.csv> [asOf] [daysBack] [status] [topic] [bootstrap]")
    val csv = args(0)
    val asOf = args.lift(1).getOrElse("2026-07-13")
    val daysBack = args.lift(2).map(_.toInt).getOrElse(30)
    val status = args.lift(3).getOrElse("created")
    val topic = args.lift(4).getOrElse("products")
    val bootstrap = args.lift(5).getOrElse("localhost:9092")

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
      val messages = KafkaSink.toMessages(recent)
      if (KafkaSink.isReachable(bootstrap)) {
        KafkaSink.write(recent, topic, bootstrap)
        println(s"[csv-to-kafka] published ${recent.count()} messages to $topic")
      } else {
        val n = messages.count()
        println(s"[csv-to-kafka] kafka unreachable at $bootstrap — processed $n rows, sample:")
        messages.limit(3).collect().foreach(r => println("  " + r.getString(0)))
      }
    } finally spark.stop()
  }
}
