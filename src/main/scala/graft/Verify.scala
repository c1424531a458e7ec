package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
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
    // (name, ok, seconds) per query — feeds manifest.json below.
    val status = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // remove any PREVIOUS run's result for this query: a stale dir
          // would be verified as if produced by today's code, masking the
          // regression the failure just revealed
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
          }
          rm(new java.io.File(s"$outDir/$name"))
          false
        }
      (name, ok, (System.nanoTime() - t0) / 1e9)
    }
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
    val perQ = status.map { case (n, ok, t) =>
      s"""${q(n)}: {"dumped": $ok, "sec": ${f"$t%.3f"}}""" }
      .mkString("{", ",", "}")
    val manifest =
      s"""{"sf_dir": ${q(sfDir)}, "queries_total": ${status.size}, """ +
      s""""dumped": ${status.count(_._2)}, """ +
      s""""failed": ${status.count(!_._2)}, """ +
      s""""failed_names": ${status.collect { case (n, false, _) => q(n) }
           .mkString("[", ",", "]")}, """ +
      s""""wall_sec": ${f"${(System.nanoTime() - wall0) / 1e9}%.1f"}, """ +
      s""""subset_mode": ${only.nonEmpty}, "per_query": $perQ}"""
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    System.err.println(s"[verify] manifest: ${status.count(_._2)}/" +
      s"${status.size} dumped, ${status.count(!_._2)} failed")
    spark.stop()
  }
}
