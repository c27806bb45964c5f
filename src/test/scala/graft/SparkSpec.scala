package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)

      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.table.NoForkLocalFileSystem].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001  = "/root/testdata/sf0.01"

  /** Temp fixture dir, swept at JVM exit — accumulated test trees in /tmp
    * degrade later bench runs via page-cache/writeback pressure (the same
    * failure mode Bench's own `graft-*` startup sweep defends against). */
  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    SparkSpec.deleteOnExit(d)
    d.toString
  }
}

object SparkSpec {
  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach { root =>
      try {
        import java.nio.file._
        Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () } })
      } catch { case _: Exception => () }
    }))
  private[graft] def deleteOnExit(p: java.nio.file.Path): Unit = { hook; created.add(p) }
}
