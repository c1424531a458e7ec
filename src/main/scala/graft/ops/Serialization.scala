package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sinks.KafkaSink
import graft.xml.{XmlDocument, XmlRender, XmlRules}

/** Serialization operators over the test tables: P3/K2 Kafka message
  * shaping and the X1/X2 XML subsystem (SURVEY §2.2, §2.5), exercised on
  * driver data. All three queries are oracle-checked: the fixed shaped
  * schema makes even the full wrapper-rule XML fragment reconstructible
  * as a literal SQL concat (see [[oracle]]); byte parity of the renderer
  * itself against the reference's output is carried by XmlRenderSpec's
  * golden tests.
  */
object Serialization {

  /** Shape an order row like a nested product document and render X1 —
    * distributed per-row rendering, no driver fold.
    */
  def ordersAsXml(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .orderBy("o_orderkey")
      .limit(1000)
    val shaped = orders.select(struct(
      col("o_orderkey").cast("string").as("ean"),
      col("o_orderpriority").as("styleOption"),
      array(struct(lit("English").as("language"),
        col("o_orderpriority").as("value"))).as("countryOfOrigin"),
      array(struct(lit("EDI Retail Price").as("priceType"),
        lit("Euro").as("priceCurrency"),
        col("o_totalprice").as("price"),
        lit("Worldwide").as("validInRegion"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("validFrom"),
        lit("9999-12-31T00:00:00.000Z").as("validUntil"))).as("itemSellingPrices"),
      struct(date_format(col("o_orderdate"), "yyyy-MM-dd").as("createdOn"),
        col("o_orderstatus").as("articleStatus")).as("styleLifeCycle")).as("product"),
      col("o_orderkey"))
    val spark = s
    import spark.implicits._
    shaped.map { r =>
      (r.getLong(r.fieldIndex("o_orderkey")),
        XmlRender.renderProduct(r.getStruct(0), "    ", XmlRules.reference))
    }.toDF("o_orderkey", "xml").orderBy("o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xml_render_orders" -> ((s, dir) => ordersAsXml(s, dir)),

    // X2 at scale: one complete XML document per group (priority class),
    // folded in parallel — the distributed alternative to the global
    // single-document assemble.
    "xml_documents_per_priority" -> ((s, dir) => {
      val shaped = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .orderBy("o_orderkey").limit(2000)
        .select(
          col("o_orderkey").cast("string").as("ean"),
          col("o_orderpriority").as("styleOption"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("b2bReadinessDate"),
          col("o_orderpriority"))
      XmlDocument.assemblePerKey(shaped, "o_orderpriority")
        .select(col("key"), length(col("document")).cast("long").as("doc_len"))
        .orderBy("key")
    }),
    // Nested-document codec round trip IN THE GATE (the document model
    // otherwise only exercises specs): each order is shaped into the
    // reference's nested product form (struct + array-of-struct), encoded
    // with to_json, decoded back with from_json under the explicit
    // document schema, and the ARRAY FIELD is exploded and aggregated.
    // The oracle computes the same numbers from the flat columns, so the
    // hash gate proves the nested encode -> decode -> explode path is
    // lossless for scalars, structs, arrays, and doubles alike. All
    // narrow except the final aggregate.
    "nested_doc_roundtrip" -> ((s, dir) => {
      val docSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ean",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("styleLifeCycle",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("articleStatus",
              org.apache.spark.sql.types.StringType))),
          nullable = true),
        org.apache.spark.sql.types.StructField("itemSellingPrices",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("priceCurrency",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("price",
                org.apache.spark.sql.types.DoubleType)))), nullable = true)))
      Tables.load(s, dir, "orders")
        // deterministic 1-in-3 subset: the query proves the codec path,
        // not bulk JSON throughput — no need to pay the parser on every row
        .filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(to_json(struct(
          col("o_orderkey").cast("string").as("ean"),
          struct(col("o_orderstatus").as("articleStatus")).as("styleLifeCycle"),
          array(
            struct(lit("Euro").as("priceCurrency"),
              col("o_totalprice").as("price")),
            struct(lit("USD").as("priceCurrency"),
              (col("o_totalprice").cast("decimal(18,2)") *
                lit(1.08).cast("decimal(18,2)")).cast("double").as("price")))
            .as("itemSellingPrices"))).as("doc"))
        .select(from_json(col("doc"), docSchema).as("p"))
        .select(col("p.styleLifeCycle.articleStatus").as("status"),
          explode(col("p.itemSellingPrices")).as("sp"))
        .groupBy(col("status"), col("sp.priceCurrency").as("currency"))
        .agg(count(lit(1)).as("n"),
          sum(col("sp.price").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("status", "currency")
    }),

    "kafka_messages_orders" -> ((s, dir) => {
      val recent = Relational.recentByStatus(Tables.load(s, dir, "orders"),
        "o_orderstatus", "o_orderdate", Seq("o_orderkey", "o_custkey"),
        status = "O", threshold = "1998-01-01")
      KafkaSink.toMessages(recent)
    })
  )

  /** DuckDB oracles. All three are SQL-expressible:
    *   - `xml_render_orders`: the shaped struct is a FIXED schema, so the
    *     wrapper-rule render linearizes to a literal string concat — the
    *     oracle rebuilds the whole fragment byte-for-byte. The one
    *     engine-sensitive token is the double `o_totalprice` rendered via
    *     Java `Double.toString` vs DuckDB's shortest-round-trip varchar
    *     cast; verified identical over every o_totalprice in the sf0.001/
    *     0.01/0.1 test tables (166,500 values, 0 mismatches), and the
    *     range (< 1e6, no scientific notation) keeps both in the same
    *     shortest-decimal regime.
    *   - `kafka_messages_orders`: same `to_json(struct_pack(...))` recipe
    *     as json_encode_events — all fields are strings/bigints, so no
    *     float-formatting divergence.
    *   - `xml_documents_per_priority`: the per-key document is a
    *     length-additive fold — declaration + `<products>` wrapper plus
    *     the sum of per-row fragment lengths, with each flat-scalar
    *     fragment reconstructed literally in SQL.
    */
  def oracle: Map[String, String] = Map(
    "xml_render_orders" ->
      """WITH sel AS (
        |  SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS ean,
        |         o_orderpriority AS prio,
        |         CAST(o_totalprice AS VARCHAR) AS price,
        |         strftime(o_orderdate, '%Y-%m-%dT00:00:00.000Z') AS vfrom,
        |         strftime(o_orderdate, '%Y-%m-%d') AS created
        |  FROM orders WHERE o_orderstatus = 'O'
        |  ORDER BY o_orderkey LIMIT 1000
        |)
        |SELECT o_orderkey,
        |  '    <ean>' || ean || '</ean>' || chr(10) ||
        |  '    <styleOption>' || prio || '</styleOption>' || chr(10) ||
        |  '    <countryOfOrigin>' || chr(10) ||
        |  '      <entry>' || chr(10) ||
        |  '        <language>English</language>' || chr(10) ||
        |  '        <value>' || prio || '</value>' || chr(10) ||
        |  '      </entry>' || chr(10) ||
        |  '    </countryOfOrigin>' || chr(10) ||
        |  '    <itemSellingPrices>' || chr(10) ||
        |  '      <price>' || chr(10) ||
        |  '        <priceType>EDI Retail Price</priceType>' || chr(10) ||
        |  '        <priceCurrency>Euro</priceCurrency>' || chr(10) ||
        |  '        <price>' || price || '</price>' || chr(10) ||
        |  '        <validInRegion>Worldwide</validInRegion>' || chr(10) ||
        |  '        <validFrom>' || vfrom || '</validFrom>' || chr(10) ||
        |  '        <validUntil>9999-12-31T00:00:00.000Z</validUntil>' || chr(10) ||
        |  '      </price>' || chr(10) ||
        |  '    </itemSellingPrices>' || chr(10) ||
        |  '    <styleLifeCycle>' || chr(10) ||
        |  '      <createdOn>' || created || '</createdOn>' || chr(10) ||
        |  '      <articleStatus>O</articleStatus>' || chr(10) ||
        |  '    </styleLifeCycle>' || chr(10) AS xml
        |FROM sel ORDER BY o_orderkey""".stripMargin,
    "nested_doc_roundtrip" ->
      """WITH r AS (
        |  SELECT o_orderstatus AS status, 'Euro' AS currency,
        |         o_totalprice AS price FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderstatus, 'USD',
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
        |              CAST(1.08 AS DECIMAL(18,2)) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 3 = 0
        |)
        |SELECT status, currency, count(*) AS n,
        |       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM r GROUP BY status, currency ORDER BY status, currency""".stripMargin,
    "kafka_messages_orders" ->
      """SELECT CAST(to_json(struct_pack(
        |         ready_date := strftime(o_orderdate, '%Y-%m-%d'),
        |         o_orderkey := o_orderkey,
        |         o_custkey := o_custkey,
        |         o_orderstatus := o_orderstatus)) AS VARCHAR) AS "value"
        |FROM orders
        |WHERE o_orderstatus = 'O' AND strftime(o_orderdate, '%Y-%m-%d') >= '1998-01-01'
        |ORDER BY strftime(o_orderdate, '%Y-%m-%d') DESC, o_orderkey, o_custkey""".stripMargin,
    "xml_documents_per_priority" ->
      """WITH sel AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS ean, o_orderpriority AS prio,
        |         strftime(o_orderdate, '%Y-%m-%d') AS rdate
        |  FROM orders WHERE o_orderstatus = 'O'
        |  ORDER BY o_orderkey LIMIT 2000
        |), frags AS (
        |  SELECT prio,
        |    '  <product>' || chr(10) ||
        |    '    <ean>' || ean || '</ean>' || chr(10) ||
        |    '    <styleOption>' || prio || '</styleOption>' || chr(10) ||
        |    '    <b2bReadinessDate>' || rdate || '</b2bReadinessDate>' || chr(10) ||
        |    '    <o_orderpriority>' || prio || '</o_orderpriority>' || chr(10) ||
        |    '  </product>' || chr(10) AS frag
        |  FROM sel
        |)
        |SELECT prio AS key,
        |  CAST(length('<?xml version="1.0" encoding="UTF-8"?>') + 1
        |       + length('<products>') + 1
        |       + sum(length(frag))
        |       + length('</products>') + 1 AS BIGINT) AS doc_len
        |FROM frags GROUP BY prio ORDER BY key""".stripMargin)
}
