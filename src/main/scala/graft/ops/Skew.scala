package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's runtime
  * skew-join splitting (which [[graft.GraftSession]] enables), for the
  * cases AQE can't fix: skewed AGGREGATION keys, and skewed joins where
  * the planner can't see the skew in advance.
  */
object Skew {

  /** Two-phase salted aggregation: spray the hot key across `salts`
    * partial groups, combine partials. Exactly equivalent to a direct
    * groupBy for decomposable aggregates (sum/count/min/max); the shuffle
    * carries `salts` rows per original group instead of one hot partition.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))

  /** Salted broadcast-free join of a skewed fact against a dimension:
    * replicate each dim row `salts` times, salt the fact side uniformly,
    * join on (key, salt). Use when the dim is too big to broadcast but
    * fact keys are skewed.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Registered queries: salting is TRANSPARENT — each has a plain
    * GROUP-BY / join oracle. The aggregated measure is decimal-cast before
    * summing (exact, associative), so the salted two-phase sum is
    * bit-identical to the oracle's single-phase sum regardless of how the
    * partials interleave.
    */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> ((s, dir) =>
      saltedSumCount(graft.Tables.events(s, dir), "event_type",
        col("value").cast("decimal(18,2)"))
        .select(col("event_type"),
          col("sum_value").cast("double").as("sum_value"), col("n"))
        .orderBy("event_type")),

    "skew_salted_join" -> ((s, dir) => {
      val fact = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val dim = graft.Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      saltedJoin(fact, dim, "suppkey")
        .groupBy(col("s_nationkey"))
        .agg(sum(col("price")).cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy("s_nationkey")
    }))

  def oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_salted_join" ->
      """SELECT s_nationkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}
