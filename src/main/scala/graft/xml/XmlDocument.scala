package graft.xml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-document XML assembly (operator X2, SURVEY §2.5) and the
  * single-object sink (K3/K4, SURVEY §2.2).
  *
  * The output is *defined* as one XML document (reference
  * `src/s3_json_to_xml.py:130-144`), so the final concatenation is an
  * intentionally non-distributed step. Everything before it — per-product
  * rendering — runs as a distributed `map`. At 100 TB one would emit one
  * document per partition/key instead; [[assemblePerKey]] provides that
  * scale path.
  */
object XmlDocument {

  val declaration = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"

  /** Distributed render: every row of `df` (already shaped as the product
    * struct) → its `<product>` fragment, input order pinned by an explicit
    * ordinal so the document is deterministic under any partitioning.
    */
  def renderFragments(df: DataFrame, rules: XmlRules = XmlRules.reference): Dataset[(Long, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withColumn("__ord", monotonically_increasing_id())
      .map { row =>
        val ord = row.getLong(row.fieldIndex("__ord"))
        // select data fields BY NAME (as assemblePerKey does): positional
        // dropRight would strip a real column if the input already carried
        // one named __ord (withColumn replaces in place, not appends)
        val keep = row.schema.zipWithIndex.filter(_._1.name != "__ord")
        val productRow = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          keep.map { case (_, i) => row.get(i) }.toArray,
          org.apache.spark.sql.types.StructType(keep.map(_._1)))
        (ord, "  <product>\n" + XmlRender.renderProduct(productRow, "    ", rules) + "  </product>\n")
      }
  }

  /** Assemble the single document: ordered fold of fragments between the
    * declaration + `<products>` wrapper. Driver-side by design (single
    * logical output object).
    */
  def assemble(df: DataFrame, rules: XmlRules = XmlRules.reference): String = {
    val fragments = renderFragments(df, rules)
      .toDF("__ord", "xml")
      .orderBy("__ord")
      .select("xml")
      .collect()
      .map(_.getString(0))
    declaration + "<products>\n" + fragments.mkString + "</products>\n"
  }

  /** Scale path: one document per key (e.g. per brand / per day) instead of
    * one global document — each group folds independently and in parallel,
    * no driver materialization.
    */
  def assemblePerKey(df: DataFrame, keyCol: String,
                     rules: XmlRules = XmlRules.reference): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val key = keyCol
    df.withColumn("__ord", monotonically_increasing_id())
      .map { row =>
        val k = Option(row.get(row.fieldIndex(key))).map(_.toString).getOrElse("")
        val ord = row.getLong(row.fieldIndex("__ord"))
        val cols = row.schema.fieldNames.zipWithIndex
          .filter { case (n, _) => n != "__ord" }
        val productRow = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          cols.map { case (_, i) => row.get(i) }.toArray,
          org.apache.spark.sql.types.StructType(
            cols.map { case (n, _) => row.schema(n) }))
        (k, ord, "  <product>\n" + XmlRender.renderProduct(productRow, "    ", rules) + "  </product>\n")
      }
      .toDF("key", "__ord", "xml")
      .groupBy($"key")
      // array_sort on (ord, xml) structs restores input order inside each
      // group — collect_list alone is partition-order-dependent.
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct($"__ord", $"xml"))),
        x => x.getField("xml"))).as("body"))
      .select($"key",
        concat(lit(declaration + "<products>\n"), $"body", lit("</products>\n")).as("document"))
  }

  /** Single-object write (K3/K4): one string → one object at `path`, via
    * the Hadoop FileSystem API so `file://`, `hdfs://` and `s3a://` (with
    * hadoop-aws on the cluster classpath) all work. S3A streams multipart
    * on large outputs — the reference's `upload_file` multipart analog.
    */
  def writeSingleObject(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a single object back as a string (S3/S4 download analog —
    * reference `src/s3_json_to_xml.py:71-93` without the temp-file stage).
    */
  def readSingleObject(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
