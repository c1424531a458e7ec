package graft.functions

import scala.util.Random

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  /** Drive the Aggregator API directly on a skewed stream split across
    * simulated partitions, so the eviction (reduce) and subtract-merge
    * paths both run — the corpus query never trips them (vocab < capacity).
    */
  private def sketchOf(stream: Seq[String], cap: Int, parts: Int): Map[String, Long] = {
    val mg = new MisraGries(cap)
    val merged = stream.grouped(math.max(1, stream.size / parts))
      .map(chunk => chunk.foldLeft(mg.zero)(mg.reduce))
      .reduce(mg.merge)
    mg.finish(merged)
  }

  test("counts are underestimates within N/(capacity+1) and heavy items survive") {
    val rnd = new Random(7)
    // 3 heavy items + a long tail of 200 singletons-ish
    val stream = rnd.shuffle(
      List.fill(400)("hot1") ++ List.fill(250)("hot2") ++ List.fill(120)("hot3") ++
        (1 to 400).map(i => s"tail${i % 200}"))
    val cap = 16
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 13)) {
      val sk = sketchOf(stream, cap, parts)
      assert(sk.size <= cap)
      sk.foreach { case (k, est) =>
        assert(est <= exact(k), s"$k overestimated")
        assert(est >= exact(k) - n / (cap + 1), s"$k below error bound")
      }
      // candidate-superset: every item with freq > N/(cap+1) must be present
      exact.filter(_._2 > n / (cap + 1)).keys
        .foreach(k => assert(sk.contains(k), s"heavy item $k evicted"))
    }
  }

  test("merge order does not break the bound") {
    val stream = (1 to 900).map(i => s"t${i % 37}") ++ List.fill(300)("big")
    val mg = new MisraGries(8)
    val bufs = stream.grouped(100).map(c => c.foldLeft(mg.zero)(mg.reduce)).toList
    val leftFold = mg.finish(bufs.reduceLeft(mg.merge))
    assert(leftFold.contains("big"))
    assert(leftFold("big") <= 300 && leftFold("big") >= 300 - stream.size / 9)
  }

  test("vocab_heavy_hitters equals the exact top-k on the documents corpus") {
    val viaSketch = graft.ops.Curation.queries("vocab_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    val exact = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(graft.ops.Curation.HeavyK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    assert(viaSketch == exact)
  }

  test("sketch column aggregates under the DataFrame udaf surface") {
    val mg = udaf(new MisraGries(4), Encoders.STRING)
    val df = spark.createDataFrame(
      Seq.fill(50)("a").map(Tuple1(_)) ++ Seq.fill(3)("b").map(Tuple1(_))
        ++ (1 to 30).map(i => Tuple1(s"x$i"))).toDF("t")
    val sk = df.repartition(6).agg(mg(col("t")).as("sk"))
      .head().getMap[String, Long](0)
    assert(sk.contains("a") && sk.size <= 4)
  }
}
