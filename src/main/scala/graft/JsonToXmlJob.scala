package graft

import org.apache.spark.sql.SparkSession

import graft.schemas.ProductSchemas
import graft.sources.Sources
import graft.xml.{XmlDocument, XmlRules}

/** The document pipeline as a runnable job — the Spark shape of the
  * reference's `python -m src.s3_json_to_xml` entry point
  * (`src/s3_json_to_xml.py:281-334`, SURVEY §3.3):
  *
  *   download JSON array → parse → per-product XML render → one XML object.
  *
  * Here: `spark.read.json(multiLine)` (any Hadoop FS URI — `file://`,
  * `s3a://…` with hadoop-aws configured) → distributed X1 render →
  * ordered X2 fold → single-object write. No temp-file stage; the
  * source/sink URIs replace the reference's boto3 download/upload plumbing.
  *
  * Usage: JsonToXmlJob <input.json> <output.xml> [--escape]
  */
object JsonToXmlJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JsonToXmlJob <input.json> <output.xml> [--escape]")
    val Array(in, out) = args.take(2)
    val rules = XmlRules.reference.copy(escape = args.contains("--escape"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = Sources.jsonDocuments(spark, in, ProductSchemas.nested)
      val doc = XmlDocument.assemble(df, rules)
      XmlDocument.writeSingleObject(spark, out, doc)
      println(s"[json-to-xml] wrote ${doc.length} chars, ${df.count()} products -> $out")
    } finally spark.stop()
  }
}
