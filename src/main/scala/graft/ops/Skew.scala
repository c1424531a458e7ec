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
}
