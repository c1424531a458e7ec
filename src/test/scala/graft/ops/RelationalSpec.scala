package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query with an oracle has matching column sets are sane") {
    // Each oracle-backed query must exist in the queries map.
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("flagship: status filter + lexicographic date range + DESC order") {
    val df = SparkEntry.queries("recent_created_orders")(spark, sfDir)
    val rows = df.collect()
    assert(rows.forall(_.getString(3) == "O"))
    assert(rows.forall(_.getString(0) >= "1998-01-01"))
    val dates = rows.map(_.getString(0))
    assert(dates.zip(dates.tail).forall { case (a, b) => a >= b }, "not DESC")
  }

  test("recentByStatus keeps threshold-midnight rows (reference F2 subtlety)") {
    // '2020-01-15T08:00:00' >= '2020-01-15' lexicographically — included.
    import spark.implicits._
    val df = Seq(
      ("a", "created", "2020-01-15 08:00:00"),
      ("b", "created", "2020-01-14 23:59:59"),
      ("c", "draft", "2020-01-16 00:00:00")
    ).toDF("id", "st", "d").withColumn("d", to_timestamp($"d"))
    val out = Relational.recentByStatus(df, "st", "d", Seq("id"), "created", "2020-01-15")
    assert(out.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("window top-k emits at most k per partition, deterministically ranked") {
    val df = SparkEntry.queries("window_topk_per_customer")(spark, sfDir)
    val byCust = df.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(byCust <= 3)
  }

  test("pricing summary is decimal-exact (re-run equals itself)") {
    val a = SparkEntry.queries("agg_pricing_summary")(spark, sfDir).collect()
    val b = SparkEntry.queries("agg_pricing_summary")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("star join broadcasts every dimension") {
    val plan = SparkEntry.queries("join_star_region_rev")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }
}
