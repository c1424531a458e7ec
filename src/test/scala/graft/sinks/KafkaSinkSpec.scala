package graft.sinks

import graft.SparkSpec

class KafkaSinkSpec extends SparkSpec {
  import spark.implicits._

  test("toMessages encodes one JSON object per row in column order, keyless") {
    val df = Seq(("e1", "created", 55.0), ("e2", "retired", 18.5))
      .toDF("ean", "articleStatus", "price_eur")
    val msgs = KafkaSink.toMessages(df).as[String].collect()
    assert(msgs(0) == """{"ean":"e1","articleStatus":"created","price_eur":55.0}""")
    assert(msgs(1) == """{"ean":"e2","articleStatus":"retired","price_eur":18.5}""")
  }

  test("toMessages with keyCol emits key+value for per-entity ordering upgrade") {
    val df = Seq(("e1", 1L)).toDF("ean", "n")
    val out = KafkaSink.toMessages(df, keyCol = Some("ean"))
    assert(out.columns.toSeq == Seq("key", "value"))
    val r = out.head
    assert(r.getString(0) == "e1" && r.getString(1) == """{"ean":"e1","n":1}""")
  }

  test("null columns serialize as JSON null (json.dumps parity)") {
    val df = Seq((Some("e1"), Option.empty[Double])).toDF("ean", "price_usd")
    assert(KafkaSink.toMessages(df).as[String].head == """{"ean":"e1","price_usd":null}""")
  }

  test("connector contract: full pipeline executes through the stand-in sink") {
    // Kafka-source-shaped frame (the schema format("kafka") yields) →
    // parse → transform → toMessages → write. Same plan as the production
    // connector path; only the terminal format differs.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = Seq(
      ("""{"ean":"e1","price":55.0}""", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("""{"ean":"e2","price":18.5}""", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("v", "timestamp")
      .select(col("v").cast("binary").as("value"), col("timestamp"))
    val schema = StructType(Seq(StructField("ean", StringType),
      StructField("price", DoubleType)))
    val parsed = graft.streaming.StreamPipelines.parseKafkaJson(raw, schema)
      .filter(col("price") > 20.0)
      .select(col("ean"), col("price"))
    val dir = new java.io.File(tempDir("kafka_log"))
    KafkaSink.write(parsed, topic = "products", bootstrap = "localhost:9092",
      keyCol = Some("ean"), format = "graft-kafka-log",
      extraOptions = Map("path" -> dir.getAbsolutePath))
    val lines = dir.listFiles().filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    // e2 was filtered out (price 18.5 ≤ 20); e1 survives with its JSON
    // body string-escaped inside the frame.
    assert(lines ==
      Seq("""{"topic":"products","key":"e1","value":"{\"ean\":\"e1\",\"price\":55.0}"}"""))
  }

  test("connector contract: schema violations fail at analysis, like the connector") {
    import org.apache.spark.sql.types._
    val noValue = StructType(Seq(StructField("body", StringType)))
    val e1 = intercept[IllegalArgumentException] {
      KafkaLogSink.validateMessageSchema(noValue, topicOption = true)
    }
    assert(e1.getMessage.contains("'value' not found"))
    val badKey = StructType(Seq(StructField("key", LongType),
      StructField("value", StringType)))
    val e2 = intercept[IllegalArgumentException] {
      KafkaLogSink.validateMessageSchema(badKey, topicOption = true)
    }
    assert(e2.getMessage.contains("key attribute type"))
    val noTopic = StructType(Seq(StructField("value", StringType)))
    val e3 = intercept[IllegalArgumentException] {
      KafkaLogSink.validateMessageSchema(noTopic, topicOption = false)
    }
    assert(e3.getMessage.contains("topic option required"))
    // valid shapes pass
    KafkaLogSink.validateMessageSchema(noTopic, topicOption = true)
    KafkaLogSink.validateMessageSchema(KafkaLogSink.fullMessageSchema,
      topicOption = false)
  }

  test("connector contract: bootstrap option is required by the sink") {
    val df = Seq(("e1", 1L)).toDF("ean", "n")
    val msgs = KafkaSink.toMessages(df)
    val e = intercept[Exception] {
      msgs.write.format("graft-kafka-log").mode("append")
        .option("topic", "t").option("path", "/tmp/never")
        .save()
    }
    assert(e.getMessage.contains("kafka.bootstrap.servers"))
  }

  test("reachability probe: closed port → false, listening port → true") {
    assert(!KafkaSink.isReachable("127.0.0.1:1", timeoutMs = 200))
    val ss = new java.net.ServerSocket(0)
    try assert(KafkaSink.isReachable(s"127.0.0.1:${ss.getLocalPort}"))
    finally ss.close()
  }
}
