package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("graft SQL functions are callable from spark.sql") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_poly_hash('abc') AS h").head.getLong(0) == 96354L)
    val sh = spark.sql(
      "SELECT graft_shingle_hashes(array('a','b','c','d'), 3) AS s").head.getSeq[Long](0)
    assert(sh.length == 2)
    val sim = spark.sql(
      "SELECT graft_simhash48(graft_minhash_sig(graft_shingle_hashes(split('x y z w v', ' '), 3), 8)) AS s")
      .head.getLong(0)
    assert(sim >= 0)
    val d = spark.sql(
      "SELECT graft_dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head.getDouble(0)
    assert(d == 11.0)
  }

  test("parameter analysis errors: non-foldable vs NULL get distinct classes") {
    GraftExtensions.register(spark)
    spark.range(1).selectExpr("cast(id as int) AS k", "array('a','b','c') AS g")
      .createOrReplaceTempView("fold_err")
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_winnow(g, k) FROM fold_err").collect()
    }
    assert(nonFoldable.getCondition == "NON_FOLDABLE_ARGUMENT")
    val nullArg = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_winnow(g, NULL) FROM fold_err").collect()
    }
    assert(nullArg.getCondition == "DATATYPE_MISMATCH.UNEXPECTED_NULL")
  }

  test("UDAF surface: graft_dsum equals the builtin decimal-cast sum") {
    graft.functions.DecimalSum.register(spark)
    spark.read.parquet(s"$sfDir/orders.parquet")
      .createOrReplaceTempView("orders_udaf")
    val viaUdaf = spark.sql(
      """SELECT o_orderpriority, graft_dsum(o_totalprice) AS s
        |FROM orders_udaf GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect()
    val viaBuiltin = spark.sql(
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM orders_udaf GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect()
    assert(viaUdaf.nonEmpty)
    assert(viaUdaf.map(_.toString).toSeq == viaBuiltin.map(_.toString).toSeq)
    // empty input finishes to null like builtin sum
    val empty = spark.sql(
      "SELECT graft_dsum(o_totalprice) FROM orders_udaf WHERE o_orderkey < 0").head
    assert(empty.isNullAt(0))
  }

  test("SQL function results match the Column API kernels") {
    GraftExtensions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_poly_hash(text) AS h FROM docs_ext ORDER BY doc_id").collect()
    val viaCol = docs.select(col("doc_id"), graft.text.TextOps.polyHash(col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq == viaCol.map(_.toString).toSeq)
  }
}
