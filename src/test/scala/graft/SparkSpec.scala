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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
