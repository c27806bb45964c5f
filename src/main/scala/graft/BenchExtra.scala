package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic harness (guide §1: measure first) — NOT part of the frozen
  * driver contract. Runs named SparkEntry queries in one session (same
  * confs as Bench's query phase) and prints, per query: wall seconds,
  * Spark job count, and the top jobs by wall time with their call sites —
  * the fixture-vs-plan cost split the official bench cannot show.
  *
  * Usage: runMain graft.BenchExtra <query> [<query> ...] | all
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {

  private final class JobClock extends SparkListener {
    case class Job(id: Int, desc: String, site: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      val site = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
      jobs.put(e.jobId, Job(e.jobId, desc, site, System.nanoTime(), 0L))
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.end = System.nanoTime())
    }
    def drain(): Seq[Job] = {
      import scala.collection.JavaConverters._
      val out = jobs.values().asScala.toSeq.sortBy(_.id)
      jobs.clear()
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .master(s"local[$cores]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.table.NoForkLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clock = new JobClock
    spark.sparkContext.addSparkListener(clock)

    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      clock.drain()
      val t0 = System.nanoTime()
      val n  = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      SparkEntry.releaseCaches()
      val jobs = clock.drain()
      val jsum = jobs.map(j => (j.end - j.start) / 1e9).sum
      println(f"[extra] $name rows=$n wall=$dt%.2f jobs=${jobs.size} jobWallSum=$jsum%.2f")
      jobs.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
        println(f"[extra]   job=${j.id}%4d sec=${(j.end - j.start) / 1e9}%6.2f site=${j.site} desc=${j.desc.take(90)}")
      }
      // phase budget: job wall + count grouped by description (batch id
      // stripped so phases aggregate across batches)
      jobs.groupBy(_.desc.replaceAll("b\\d+ ", "").trim)
        .map { case (d, js) =>
          (d, js.size, js.map(j => (j.end - j.start) / 1e9).sum) }
        .toSeq.sortBy(-_._3)
        .foreach { case (d, c, s) =>
          println(f"[extra]   phase=${if (d.isEmpty) "(unlabeled)" else d}%-28s jobs=$c%3d sec=$s%6.2f")
        }
    }
    spark.stop()
  }
}
