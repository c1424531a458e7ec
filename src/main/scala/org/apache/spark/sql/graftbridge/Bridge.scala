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
  /** Conf flag: when `true`, [[tagHashPartitioned]] SCANS the checkpoint
    * before re-declaring and asserts every row actually lives in
    * `pmod(murmur3(keys), n)` — turning the worst failure mode here (a
    * wrongly declared layout silently mis-joins) into a loud error. On in
    * every spec run (SparkSpec sets it), off by default at bench/prod:
    * the validation pass reads the whole checkpoint once.
    *
    * `sample` mode (round-13 verdict #8) checks only the first
    * [[SampleRows]] rows of EACH partition — O(n_partitions · 64) rows
    * instead of a full scan, cheap enough to leave on outside spec runs.
    * It still catches every realistic misuse: a wrong key set, key order
    * sensitivity, a wrong partition count, or a row-redistributing step
    * between repartition and checkpoint all mis-place rows across most
    * partitions, not in a tail one sampling could miss.
    */
  val ValidateLayoutKey = "spark.graft.bridge.validateLayout"

  /** Rows checked per partition in `sample` validation mode. */
  val SampleRows = 64

  def tagHashPartitioned(df: DataFrame, keys: Seq[String],
                         numPartitions: Int): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        require(lr.rdd.getNumPartitions == numPartitions,
          s"declared $numPartitions partitions but the checkpointed RDD " +
            s"has ${lr.rdd.getNumPartitions}")
        // Unique-match resolution (session resolver, so caseSensitive is
        // honored): a first-match lookup over output with duplicate names
        // could tag the WRONG attribute — and a wrong declared layout
        // mis-joins silently by design.
        val resolver = session.sessionState.analyzer.resolver
        val attrs = keys.map { k =>
          lr.output.filter(a => resolver(a.name, k)) match {
            case Seq(one) => one
            case Seq() => throw new IllegalArgumentException(
              s"no column '$k' in checkpoint output ${lr.output.map(_.name)}")
            case many => throw new IllegalArgumentException(
              s"ambiguous column '$k': ${many.size} matches in checkpoint " +
                s"output ${lr.output.map(_.name)}")
          }
        }
        val mode = session.conf.get(ValidateLayoutKey, "false")
        if (mode == "true" || mode == "sample") {
          import org.apache.spark.sql.functions.{col, spark_partition_id}
          // HashPartitioning's OWN partition-id expression (pmod(murmur3,
          // n)) — same seed, same null handling as the exchange that laid
          // the rows out, so agreement here IS the elision contract.
          val pidExpr = HashPartitioning(attrs, numPartitions)
            .partitionIdExpression
          val checked = Dataset.ofRows(session, lr)
            .select(spark_partition_id().as("pid"), column(pidExpr).as("want"))
          // sample mode: per-partition take(k) on the row iterator — each
          // task stops after k rows (the select evaluates lazily), so the
          // cost is O(partitions · k) rows, not a full checkpoint scan.
          val bad =
            if (mode == "sample")
              checked.rdd.mapPartitions(_.take(SampleRows))
                .filter(r => r.getInt(0) != r.getInt(1)).take(1)
                .map(r => (r.getInt(0), r.getInt(1)))
            else
              checked.filter(col("pid") =!= col("want")).limit(1).collect()
                .map(r => (r.getInt(0), r.getInt(1)))
          require(bad.isEmpty,
            s"tagHashPartitioned: declared hash(${keys.mkString(",")}) % " +
              s"$numPartitions, but partition ${bad.head._1} holds " +
              s"a row whose keys hash to partition ${bad.head._2} — " +
              "the checkpoint does not have the declared layout")
        }
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
