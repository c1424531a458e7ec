package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("defaults match the reference's load_env defaults") {
    val c = GraftConfig.fromEnv(Map.empty)
    assert(c == GraftConfig())
    assert(c.csvFilePath == "data/products.csv")
    assert(c.kafkaBootstrapServers == "localhost:9092")
    assert(c.kafkaTopic == "product-updates")
    assert(c.kafkaAcks == "all")
    assert(c.kafkaRetries == 3)
    assert(c.kafkaBatchSize == 16384)
    assert(c.kafkaLingerMs == 1)
    assert(c.kafkaBufferMemory == 33554432L)
    assert(c.defaultDaysBack == 30)
    assert(c.articleStatus == "created")
    assert(c.logBackupCount == 7)
  }

  test("env overrides take precedence over defaults") {
    val c = GraftConfig.fromEnv(Map(
      "KAFKA_TOPIC" -> "t2", "KAFKA_RETRIES" -> "9",
      "DEFAULT_DAYS_BACK" -> "365", "ARTICLE_STATUS" -> "retired",
      "KAFKA_BUFFER_MEMORY" -> "1024"))
    assert(c.kafkaTopic == "t2" && c.kafkaRetries == 9)
    assert(c.defaultDaysBack == 365 && c.articleStatus == "retired")
    assert(c.kafkaBufferMemory == 1024L)
    // untouched keys keep defaults
    assert(c.kafkaAcks == "all" && c.csvFilePath == "data/products.csv")
  }

  test("malformed numeric env fails fast naming the key") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("KAFKA_RETRIES" -> "lots"))
    }
    assert(e.getMessage.contains("KAFKA_RETRIES"))
  }

  test("producerOptions mirror the reference producer tuning") {
    val opts = GraftConfig().producerOptions
    assert(opts == graft.sinks.KafkaSink.referenceProducerOptions("localhost:9092"))
    val tuned = GraftConfig.fromEnv(Map("KAFKA_LINGER_MS" -> "50")).producerOptions
    assert(tuned("kafka.linger.ms") == "50")
  }
}
