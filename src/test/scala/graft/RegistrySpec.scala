package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: a duplicated query name ANYWHERE — across modules or
  * within one Map literal — silently shadows one query (and its oracle)
  * with another, which is exactly how a passing gate can verify the wrong
  * plan. SparkEntry's runtime require catches cross-module clashes; this
  * spec scans the SOURCE for the in-file case Scala's Map literal
  * swallows (caught live once: two snapshot_diff_orders in one file).
  */
class RegistrySpec extends AnyFunSuite {

  private val opsDir = new java.io.File("src/main/scala/graft/ops")

  test("query names are globally unique at the source level") {
    val pat = java.util.regex.Pattern.compile("\"([a-z0-9_]+)\" -> \\(\\(s")
    val names = opsDir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val m = pat.matcher(src)
        Iterator.continually(m).takeWhile(_.find())
          .map(_.group(1) -> f.getName).toSeq
      }
    val dups = names.groupBy(_._1).collect {
      case (n, fs) if fs.length > 1 => s"$n (${fs.map(_._2).mkString(", ")})"
    }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString("; ")}")
    // and every source-level name made it into the merged registry
    assert(names.map(_._1).toSet == SparkEntry.queries.keySet)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }
}
