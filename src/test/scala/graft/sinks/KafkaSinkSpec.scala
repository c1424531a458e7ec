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

  test("reachability probe: closed port → false, listening port → true") {
    assert(!KafkaSink.isReachable("127.0.0.1:1", timeoutMs = 200))
    val ss = new java.net.ServerSocket(0)
    try assert(KafkaSink.isReachable(s"127.0.0.1:${ss.getLocalPort}"))
    finally ss.close()
  }
}
