package graft.xml

import graft.SparkSpec
import graft.schemas.ProductSchemas
import graft.sources.Sources
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

class XmlRenderSpec extends SparkSpec {

  private def row(schema: StructType, values: Any*): Row =
    new GenericRowWithSchema(values.toArray, schema)

  private val miniSchema = StructType(Seq(
    StructField("ean", StringType),
    StructField("countryOfOrigin", ArrayType(ProductSchemas.langValue)),
    StructField("itemSellingPrices", ArrayType(ProductSchemas.priceInterval)),
    StructField("styleLifeCycle", ProductSchemas.lifeCycle),
    StructField("tags", ArrayType(StringType)),
    StructField("price_eur", DoubleType)))

  test("scalar, struct, wrapped array, unwrapped array, null-omission") {
    val r = row(miniSchema,
      "1234567890123",
      Seq(row(ProductSchemas.langValue, "English", "DE")),
      Seq(row(ProductSchemas.priceInterval,
        "Retail", "Euro", 55.0, "Austria", "2020-01-01T00:00:00.000Z", null)),
      row(ProductSchemas.lifeCycle, "2020-01-01", null, "created", "ready"),
      Seq("alpha", "beta"),
      18.5)
    val xml = XmlRender.renderProduct(r, "    ")
    val expected =
      """    <ean>1234567890123</ean>
        |    <countryOfOrigin>
        |      <entry>
        |        <language>English</language>
        |        <value>DE</value>
        |      </entry>
        |    </countryOfOrigin>
        |    <itemSellingPrices>
        |      <price>
        |        <priceType>Retail</priceType>
        |        <priceCurrency>Euro</priceCurrency>
        |        <price>55.0</price>
        |        <validInRegion>Austria</validInRegion>
        |        <validFrom>2020-01-01T00:00:00.000Z</validFrom>
        |      </price>
        |    </itemSellingPrices>
        |    <styleLifeCycle>
        |      <createdOn>2020-01-01</createdOn>
        |      <articleStatus>created</articleStatus>
        |      <enrichmentStatus>ready</enrichmentStatus>
        |    </styleLifeCycle>
        |    <tags>
        |      alpha
        |      beta
        |    </tags>
        |    <price_eur>18.5</price_eur>
        |""".stripMargin
    assert(xml == expected)
  }

  test("python str() float parity: integral doubles keep .0, shortest repr") {
    assert(XmlRender.pystr(55.0) == "55.0")
    assert(XmlRender.pystr(18.5) == "18.5")
    assert(XmlRender.pystr(39.99) == "39.99")
    assert(XmlRender.pystr(14.28) == "14.28")
    assert(XmlRender.pystr(true) == "True")
    assert(XmlRender.pystr(false) == "False")
    assert(XmlRender.pystr(null) == "None")
  }

  test("python str() float parity at the notation thresholds (CPython-validated)") {
    // Java switches to scientific at 1e7 / 1e-3, CPython at 1e16 / 1e-4 —
    // every expected string below is the verbatim CPython str() output
    assert(XmlRender.pystr(12345678.5) == "12345678.5")
    assert(XmlRender.pystr(1e7) == "10000000.0")
    assert(XmlRender.pystr(123456789012345.6) == "123456789012345.6")
    assert(XmlRender.pystr(1e15) == "1000000000000000.0")
    assert(XmlRender.pystr(1e16) == "1e+16")
    assert(XmlRender.pystr(0.0005) == "0.0005")
    assert(XmlRender.pystr(0.001) == "0.001")
    assert(XmlRender.pystr(9.9e-5) == "9.9e-05")
    assert(XmlRender.pystr(1e22) == "1e+22")
    assert(XmlRender.pystr(-12345678.5) == "-12345678.5")
  }

  test("escape=true fixes the reference's raw-ampersand bug") {
    val s = StructType(Seq(StructField("name", StringType)))
    val raw = XmlRender.renderProduct(row(s, "A&B <Co>"), "")
    assert(raw == "<name>A&B <Co></name>\n") // parity: unescaped
    val fixed = XmlRender.renderProduct(row(s, "A&B <Co>"), "",
      XmlRules.reference.copy(escape = true))
    assert(fixed == "<name>A&amp;B &lt;Co&gt;</name>\n")
  }

  test("GOLDEN: full 21-product document byte-matches the reference's actual output") {
    // Behavioral parity check against the reference's own input/output pair
    // (read-only at test time; nothing is copied into this repo).
    val in = "/root/reference/data/sample_products.json"
    val golden = "/root/reference/data/output.xml"
    assume(new java.io.File(in).exists() && new java.io.File(golden).exists())
    val df = Sources.jsonDocuments(spark, in, ProductSchemas.nested)
    val mine = XmlDocument.assemble(df)
    val expected = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(golden)), "UTF-8")
    assert(mine == expected)
  }

  test("assemblePerKey emits one well-formed document per key, input-ordered") {
    val in = "/root/reference/data/sample_products.json"
    assume(new java.io.File(in).exists())
    val df = Sources.jsonDocuments(spark, in, ProductSchemas.nested)
    val perBrand = XmlDocument.assemblePerKey(df, "brandName").collect()
    assert(perBrand.nonEmpty)
    perBrand.foreach { r =>
      val doc = r.getAs[String]("document")
      assert(doc.startsWith(XmlDocument.declaration + "<products>\n"))
      assert(doc.endsWith("</products>\n"))
    }
  }

  test("single-object sink round-trips through the Hadoop FS API") {
    val tmp = tempDir("graft_xml")
    val path = s"file://$tmp/out.xml"
    XmlDocument.writeSingleObject(spark, path, "<products>é</products>")
    assert(XmlDocument.readSingleObject(spark, path) == "<products>é</products>")
  }
}
