package graft.sources

import graft.SparkSpec
import graft.schemas.ProductSchemas
import graft.sinks.KafkaSink
import org.apache.spark.sql.functions._

/** The reference's relational pipeline over a synthesized products CSV
  * (reference-shaped per FIXTURES.md §§1,3 — values are our own).
  */
class CsvPipelineSpec extends SparkSpec {

  private lazy val csvPath: String = {
    val dir = java.nio.file.Paths.get(tempDir("graft_csv"))
    val header = ProductSchemas.flat.fieldNames.mkString(",")
    def row(ean: String, status: String, ready: String, priceUsd: String) =
      Seq(ean, "16050217", s"${ean}_Black", "M", "Black", "BrandX", "8", "SubX",
        "Knit", "Pullover", "Female", "Summer", "StyleName", "BD",
        "39.99", priceUsd, "35.50", "14.28",
        ready, status, "ready", "2020-01-01T00:00:00.000Z", "2020-06-01T00:00:00.000Z",
        "75% Viscose", "Machine wash", "A product").mkString(",")
    val rows = Seq(
      row("1000000000001", "created", "2025-11-01T08:00:00.000Z", "55.0"),
      row("1000000000002", "created", "2025-11-05T10:00:00.000Z", ""),
      row("1000000000003", "draft", "2025-11-10T00:00:00.000Z", "10.0"),
      row("1000000000004", "created", "2025-10-01T00:00:00.000Z", "20.0"))
    val f = dir.resolve("products.csv")
    java.nio.file.Files.writeString(f, (header +: rows).mkString("\n"))
    f.toString
  }

  test("CSV scan with explicit flat schema: types + empty cell -> null") {
    val df = Sources.csv(spark, csvPath, ProductSchemas.flat)
    assert(df.count() == 4)
    assert(df.schema("price_usd").dataType.typeName == "double")
    // empty price_usd cell is NULL (pandas-NaN -> SQLite NULL parity)
    assert(df.filter(col("ean") === "1000000000002")
      .head.isNullAt(df.schema.fieldIndex("price_usd")))
  }

  test("FIXTURES §3 semantics: fixed clock, 30d window, status filter, DESC") {
    // asOf 2025-12-01, daysBack 30 -> threshold 2025-11-01; P002 then P001.
    val threshold = java.time.LocalDate.parse("2025-12-01").minusDays(30).toString
    val out = Sources.csv(spark, csvPath, ProductSchemas.flat)
      .filter(col("articleStatus") === "created" &&
        col("b2bReadinessDate") >= lit(threshold))
      .orderBy(col("b2bReadinessDate").desc, col("ean"))
      .select("ean").collect().map(_.getString(0)).toSeq
    assert(out == Seq("1000000000002", "1000000000001"))
  }

  test("threshold-midnight inclusion: 2025-11-01T08:00 >= '2025-11-01'") {
    val df = Sources.csv(spark, csvPath, ProductSchemas.flat)
      .filter(col("b2bReadinessDate") >= lit("2025-11-01"))
    assert(df.filter(col("ean") === "1000000000001").count() == 1)
  }

  test("pipeline end: Kafka message carries nulls as JSON null in column order") {
    val recent = Sources.csv(spark, csvPath, ProductSchemas.flat)
      .filter(col("ean") === "1000000000002")
    val msg = KafkaSink.toMessages(recent.select("ean", "price_usd", "articleStatus"))
      .head.getString(0)
    assert(msg == """{"ean":"1000000000002","price_usd":null,"articleStatus":"created"}""")
  }

  test("inferred-schema variant reproduces the reference's pandas inference") {
    val df = Sources.csvInferred(spark, csvPath)
    assert(df.schema("price_eur").dataType.typeName == "double")
    assert(df.schema("ean").dataType.typeName == "long") // digits -> integer inference
  }

  test("ORC round-trip preserves data and pushes predicates to the scan") {
    val out = tempDir("graft_orc") + "/t"
    val orders = graft.Tables.load(spark, sfDir, "orders")
    orders.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == orders.count())
    val filtered = back.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"))
    assert(filtered.count() ==
      orders.filter(col("o_orderstatus") === "O").count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(o_orderstatus,O)"), plan)
    // column pruning reaches the ORC reader too
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"), plan)
  }
}
