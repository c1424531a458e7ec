package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Column <-> Expression bridge. In Spark 4 the `Column` API is decoupled
  * from Catalyst (Spark Connect column nodes) and the converters live in
  * `private[sql]` `classic.ExpressionUtils`; custom-Expression libraries
  * conventionally reach them from inside the `org.apache.spark.sql`
  * namespace. This is the only file outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-declare the hash partitioning of a just-checkpointed frame.
    *
    * `df.repartition(n, cols).localCheckpoint()` physically lays rows out
    * as `pmod(murmur3(cols), n)` per partition, but under AQE the
    * `LogicalRDD` the checkpoint returns carries `UnknownPartitioning`
    * (the adaptive wrapper hides the exchange's output partitioning at
    * checkpoint time), so every downstream join/aggregate on `keys`
    * re-shuffles the full checkpoint payload even though the layout
    * already satisfies the distribution. This rebuilds the checkpoint's
    * `LogicalRDD` with the `HashPartitioning` the repartition actually
    * produced, which `EnsureRequirements` then accepts — the same
    * exchange-elision contract as a bucketed table read.
    *
    * CORRECTNESS CONTRACT: callers must pass exactly the key columns and
    * partition count of the `repartition` that produced `df`, with no
    * row-redistributing step between it and the checkpoint. Declaring a
    * layout the rows don't actually have silently mis-joins. The input
    * must BE a checkpointed frame (its analyzed plan a bare
    * [[LogicalRDD]]) — anything else throws.
    */
  def tagHashPartitioned(df: DataFrame, keys: Seq[String],
                         numPartitions: Int): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        require(lr.rdd.getNumPartitions == numPartitions,
          s"declared $numPartitions partitions but the checkpointed RDD " +
            s"has ${lr.rdd.getNumPartitions}")
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"no column '$k' in checkpoint output ${lr.output.map(_.name)}")))
        // copy, changing ONLY the partitioning. The curried second
        // parameter list (session, originStats, originConstraints) must
        // ride along — dropping originStats in particular replaces the
        // checkpoint's measured size with the conf default (Long.Max),
        // which blocks every downstream broadcast decision (observed:
        // +3 exchanges on the triangle plan). `lr.stats`/`lr.constraints`
        // are the public views that already resolve to the origin values.
        Dataset.ofRows(session,
          lr.copy(outputPartitioning = HashPartitioning(attrs, numPartitions))(
            session, Some(lr.stats), Some(lr.constraints)))
      case other => throw new IllegalArgumentException(
        "tagHashPartitioned expects a checkpointed frame (bare LogicalRDD " +
          s"plan); got ${other.getClass.getSimpleName}")
    }
  }
}
