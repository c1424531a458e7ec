package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite; sf0.001 for speed. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Test scratch dir, deleted recursively at JVM exit — bare
    * `Files.createTempDirectory` call sites accumulated round-trip
    * dataset copies in /tmp across every sbt test run (round-10 leak
    * finding, same class as the stream_dedup_exec fix).
    */
  def tempDir(prefix: String): String = SparkSpec.tempDir(prefix)

  /** Hash-partitioned shuffle exchanges in a physical plan, counted from
    * the PLAN TREE (recursing through AQE wrappers) rather than by
    * grepping the rendered string — the "Exchange hashpartitioning" text
    * is version-dependent, so string pins broke on Spark upgrades instead
    * of on real regressions (round-12 ADVICE).
    */
  def hashExchangeCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // QueryStageExec and ReusedExchangeExec are LEAF wrappers: if the plan
    // is counted after an action has materialized query stages, collect()
    // stops at them and a pin could pass vacuously on an undercount
    // (round-13 ADVICE). Recurse into both; the generic QueryStageExec
    // match covers shuffle AND broadcast stages.
    def cnt(p: SparkPlan): Int = p.collect {
      case a: AdaptiveSparkPlanExec => cnt(a.executedPlan)
      case s: QueryStageExec => cnt(s.plan)
      case r: ReusedExchangeExec => cnt(r.child)
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => 1
    }.sum
    cnt(df.queryExecution.executedPlan)
  }
}

object SparkSpec {
  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val sub = f.listFiles(); if (sub != null) sub.foreach(rm); f.delete()
      }
      rm(d)
    }
    d.getAbsolutePath
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Every spec-run tagHashPartitioned call validates the declared
      // layout row-by-row (Bridge.ValidateLayoutKey): a wrong declaration
      // mis-joins silently in prod, so CI pays the extra checkpoint scan
      // to fail loud instead.
      .config(org.apache.spark.sql.graftbridge.Bridge.ValidateLayoutKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
