package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries are dumped from a fixed-size thread pool (default 8, env
  * `SPARK_GRAFT_VERIFY_PAR`), not sequentially: at sf0.01 each query is
  * latency-dominated (stage setup, AQE re-plans, streaming micro-batch
  * commit cycles), so one-at-a-time left most of the 32 cores idle and the
  * round-12 sequential dump ran 337-378 s against the driver's 570 s
  * timeout — the margin that produced an empty CORRECTNESS_r12.json.
  * Safety: every cross-query shared structure is an atomic
  * `computeIfAbsent` memo (staged streaming logs, graph caches), catalog
  * table names are applicationId- and query-unique, and the v_* temp views
  * register byte-identical definitions at every call site, so concurrent
  * re-registration is a no-op. Spark job submission is thread-safe.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (dev loop)
    val only = args.drop(2).toSet
    // Same session factory as Bench/production (GraftSession: extensions,
    // AQE + coalescing, nanosAsLong) so a conf-sensitive bug can't pass
    // Verify and fail Bench, or vice versa.
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.File(outDir)
    out.mkdirs()
    // In subset mode, drop result dirs of queries NOT being re-run: stale
    // parquet from a previous full run would otherwise be silently
    // re-verified as if current by tools/verify_local.py.
    if (only.nonEmpty) out.listFiles().filter(f => f.isDirectory && !only(f.getName))
      .foreach(d => { def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(d) })
    val wall0 = System.nanoTime()
    val par = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt)
    // Daemon threads + try/finally below: if a Future wrapper itself dies
    // (OOM, interrupt — outside the per-query catch), a non-daemon fixed
    // pool would keep the JVM alive silently past the driver's kill
    // instead of exiting loudly (round-13 ADVICE).
    val pool = Executors.newFixedThreadPool(par, r => {
      val t = new Thread(r); t.setDaemon(true); t
    })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // (name, ok, seconds) per query — feeds manifest.json below. Future
    // order = submission order, so the manifest stays name-sorted.
    val futures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) => Future {
        // Worker threads inherit the active session (inheritable thread
        // local), but pin it explicitly so Spark-internal SQLConf.get
        // lookups can never fall back to a stale default.
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            true
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            // remove any PREVIOUS run's result for this query: a stale dir
            // would be verified as if produced by today's code, masking
            // the regression the failure just revealed
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
            }
            rm(new java.io.File(s"$outDir/$name"))
            false
          }
        (name, ok, (System.nanoTime() - t0) / 1e9)
      } }
    try {
    val status = Await.result(Future.sequence(futures), Duration.Inf)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest.json: what Verify itself observed — query count, per-query
    // dumped/failed + wall seconds, total wall. CORRECTNESS_r09.json came
    // back `{}` while the same jar reproduced 277/277 green (round-9
    // verdict #1): with this manifest committed beside the dumps, an
    // empty driver-side file is immediately attributable to the harness
    // (manifest says N dumped) or to the engine (manifest says failures).
    // Per-query `sec` is latency under `parallelism` concurrent dumps —
    // queue/contention time included, so it upper-bounds the solo time.
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // Wall-clock budget: the driver kills Verify at ~570 s. Stamp the
    // budget verdict into the manifest so a shrinking margin is visible in
    // the committed artifact before it becomes an empty correctness file.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUDGET_SEC", "450").toInt
    val perQ = status.map { case (n, ok, t) =>
      s"""${q(n)}: {"dumped": $ok, "sec": ${f"$t%.3f"}}""" }
      .mkString("{", ",", "}")
    val manifest =
      s"""{"sf_dir": ${q(sfDir)}, "queries_total": ${status.size}, """ +
      s""""master": ${q(spark.sparkContext.master)}, """ +
      s""""dumped": ${status.count(_._2)}, """ +
      s""""failed": ${status.count(!_._2)}, """ +
      s""""failed_names": ${status.collect { case (n, false, _) => q(n) }
           .mkString("[", ",", "]")}, """ +
      s""""wall_sec": ${f"$wallSec%.1f"}, """ +
      s""""parallelism": $par, """ +
      s""""budget_sec": $budgetSec, """ +
      s""""within_budget": ${wallSec <= budgetSec}, """ +
      s""""subset_mode": ${only.nonEmpty}, "per_query": $perQ}"""
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    System.err.println(s"[verify] manifest: ${status.count(_._2)}/" +
      s"${status.size} dumped, ${status.count(!_._2)} failed, " +
      f"wall $wallSec%.1f s (budget $budgetSec s, par $par)")
    if (only.isEmpty && wallSec > budgetSec)
      System.err.println(s"[verify] WARNING: wall exceeds budget — the " +
        s"driver timeout is ~570 s; raise parallelism or trim query cost")
    } finally {
      // Always reached, even if Await itself throws: the pool is daemon so
      // it can't pin the JVM, and a failed session stop must not mask the
      // original exception (which propagates and exits nonzero).
      pool.shutdown()
      try spark.stop()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
