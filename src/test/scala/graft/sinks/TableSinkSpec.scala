package graft.sinks

import graft.{SparkSpec, Tables}
import graft.ops.Skew
import org.apache.spark.sql.functions._

class TableSinkSpec extends SparkSpec {

  test("partitioned write: partition pruning reads only matching directories") {
    val out = tempDir("graft_part")
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    TableSink.writePartitioned(orders, out, Seq("o_year"))
    val pruned = spark.read.parquet(out).filter(col("o_year") === 1998)
    val plan = pruned.queryExecution.executedPlan.toString
    // a pruned scan lists only the matching partition directory
    assert(pruned.count() ==
      orders.filter(year(col("o_orderdate")) === 1998).count())
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
  }

  test("bucketed tables: join on the bucket key runs without an exchange") {
    // default spark-warehouse/ dir (gitignored); warehouse.dir is static.
    // A previous JVM's table files survive while the in-memory catalog
    // forgets them — clean both before writing.
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    TableSink.writeBucketed(li, "li_b", "l_orderkey", 4, Some("l_orderkey"))
    TableSink.writeBucketed(o, "o_b", "o_orderkey", 4, Some("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("partition upsert replaces only the touched partitions") {
    val out = tempDir("graft_upsert") + "/t"
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    TableSink.writePartitioned(orders, out, Seq("o_year"))
    val before = spark.read.parquet(out)
    val untouched = before.filter(col("o_year") =!= 1998).count()
    // materialize BEFORE the rewrite — the lazy frame re-reads files
    val sumBefore = before.filter(col("o_year") === 1998)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)
    // rerun 1998 with modified totals (the idempotent daily-rerun shape)
    TableSink.upsertPartitions(
      orders.filter(col("o_year") === 1998)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0),
      out, Seq("o_year"))
    val after = spark.read.parquet(out)
    assert(after.filter(col("o_year") =!= 1998).count() == untouched)
    // 1998 rows were replaced, not appended, and carry the new values
    assert(after.filter(col("o_year") === 1998).count() ==
      orders.filter(col("o_year") === 1998).count())
    val sumAfter = after.filter(col("o_year") === 1998)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(sumAfter.subtract(sumBefore).doubleValue() ==
      orders.filter(col("o_year") === 1998).count().toDouble)
  }

  test("compaction: many small files become few, data byte-identical") {
    val out = tempDir("graft_compact") + "/t"
    val orders = Tables.load(spark, sfDir, "orders")
    orders.repartition(40).write.parquet(out)
    def partFiles = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val before = partFiles.length
    assert(before >= 40)
    def fingerprint = spark.read.parquet(out).agg(
      count(lit(1)), sum(col("o_orderkey")),
      sum(col("o_totalprice").cast("decimal(18,2)"))).head.toString
    val fpBefore = fingerprint
    TableSink.compact(spark, out, targetBytes = 1L << 30)
    assert(partFiles.length < before / 10)
    assert(fingerprint == fpBefore)
  }

  test("range layout: per-file key ranges are disjoint (footer-skippable)") {
    val out = tempDir("graft_range") + "/t"
    TableSink.writeRangeLayout(
      Tables.load(spark, sfDir, "orders"), out, "o_orderkey", nFiles = 6)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
  }

  test("z-order layout: per-file min/max boxes shrink in BOTH dimensions") {
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("d_epoch", unix_date(col("o_orderdate").cast("date")).cast("long"))
    val out = tempDir("graft_zorder") + "/t"
    TableSink.writeZOrderLayout(orders, out, "o_custkey", "d_epoch", nFiles = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    val boxes = back.groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("cLo"), max("o_custkey").as("cHi"),
        min("d_epoch").as("dLo"), max("d_epoch").as("dHi"))
      .collect()
    assert(boxes.length > 4)
    val (cLo, cHi, dLo, dHi) = orders
      .agg(min("o_custkey"), max("o_custkey"), min("d_epoch"), max("d_epoch"))
      .head() match { case r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) }
    val cSpan = (cHi - cLo).toDouble.max(1)
    val dSpan = (dHi - dLo).toDouble.max(1)
    // every file's bounding box covers a strict sub-rectangle of the
    // (custkey x day) plane, and the mean coverage is far below the ~1.0
    // a round-robin layout gives — that area ratio IS the expected
    // fraction of files a 2-D point predicate has to read
    val areas = boxes.map { r =>
      ((r.getAs[Long]("cHi") - r.getAs[Long]("cLo")) / cSpan) *
        ((r.getAs[Long]("dHi") - r.getAs[Long]("dLo")) / dSpan)
    }
    assert(areas.max < 0.9, s"a z-order file covers the whole plane: ${areas.toSeq}")
    assert(areas.sum / areas.length < 0.5, s"weak clustering: ${areas.toSeq}")
  }

  test("salted aggregation equals direct aggregation (decimal-exact)") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    val salted = Skew.saltedSumCount(ev, "event_type", col("value").cast("decimal(18,2)"))
      .orderBy("event_type").collect()
    assert(direct.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSeq ==
      salted.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSeq)
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("event_id"))
    val users = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(users, Seq("user_id")).count()
    val salted = Skew.saltedJoin(ev, users, "user_id").count()
    assert(plain == salted)
  }

  test("K5: create-if-not-exists is idempotent and keeps the typed schema") {
    val table = "products_ddl_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    assert(TableSink.createIfNotExists(spark, table,
      graft.schemas.ProductSchemas.flat))          // created
    assert(!TableSink.createIfNotExists(spark, table,
      graft.schemas.ProductSchemas.flat))          // second call: no-op
    assert(spark.table(table).schema == graft.schemas.ProductSchemas.flat)
    assert(spark.table(table).count() == 0)        // empty, K1 load supersedes
    spark.sql(s"DROP TABLE $table")
  }
}
