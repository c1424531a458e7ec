package graft.schemas

import org.apache.spark.sql.types._

/** Explicit schemas for the two shapes of the reference's product entity
  * (SURVEY §1.1, FIXTURES.md §§1-2). Always explicit — never inference —
  * because (a) the reference's own DDL is decorative (overwritten by
  * pandas-inferred types, `src/sql_to_kafka.py:130`) so the *effective*
  * contract is the one pinned here, and (b) Spark JSON schema inference
  * sorts keys alphabetically, which would break document-order parity for
  * `to_json` / XML rendering (SURVEY §7.4.2).
  */
object ProductSchemas {

  private def s(n: String) = StructField(n, StringType, nullable = true)
  private def d(n: String) = StructField(n, DoubleType, nullable = true)

  /** Flat 26-column relational row (`src/sql_to_kafka.py:74-101`; effective
    * types per CSV inference: strings + nullable doubles, dates as ISO
    * strings — SURVEY §1.2).
    */
  val flat: StructType = StructType(Seq(
    s("ean"), s("styleNumber"), s("styleOption"), s("size"), s("color"),
    s("brandName"), s("brandcode"), s("subbrandName"), s("productCategory"),
    s("productSubcategory"), s("gender"), s("ediSeason"), s("ediStyleName"),
    s("countryOfOrigin"),
    d("price_eur"), d("price_usd"), d("price_gbp"), d("grossPrice_eur"),
    s("b2bReadinessDate"), s("articleStatus"), s("enrichmentStatus"),
    s("createdOn"), s("lastUpdated"),
    s("fabricComposition"), s("washingInstructions"), s("ediDescription")))

  /** `{language, value}` pair used by countryOfOrigin / fabricCompositions
    * (`data/sample_products.json:7,24`). */
  val langValue: StructType = StructType(Seq(s("language"), s("value")))

  /** Temporal price validity interval (`data/sample_products.json:8-12`). */
  val priceInterval: StructType = StructType(Seq(
    s("priceType"), s("priceCurrency"), d("price"),
    s("validInRegion"), s("validFrom"), s("validUntil")))

  /** Lifecycle sub-struct (`data/sample_products.json:14`). */
  val lifeCycle: StructType = StructType(Seq(
    s("createdOn"), s("lastUpdated"), s("articleStatus"), s("enrichmentStatus")))

  /** Nested document shape in document key order (FIXTURES.md §2).
    * Optional fields (`subbrandName`, `ediStyleName`) are just nullable —
    * absent keys read as null and the XML renderer omits nulls.
    */
  val nested: StructType = StructType(Seq(
    s("ean"), s("styleNumber"), s("styleOption"), s("size"),
    StructField("countryOfOrigin", ArrayType(langValue), nullable = true),
    StructField("itemSellingPrices", ArrayType(priceInterval), nullable = true),
    StructField("itemGrossPrices", ArrayType(priceInterval), nullable = true),
    s("b2bReadinessDate"),
    StructField("styleLifeCycle", lifeCycle, nullable = true),
    s("color"), s("brandName"), s("brandcode"), s("subbrandName"),
    s("productCategory"), s("productSubcategory"), s("gender"), s("ediSeason"),
    s("ediStyleName"),
    StructField("fabricCompositions", ArrayType(langValue), nullable = true)))
}
