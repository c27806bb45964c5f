package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE SparkEntry query against a tier and print count,
  * wall seconds, and (optionally, GRAFT_EXPLAIN=1) the executed plan.
  * Usage: runMain graft.QueryOne <name> [sfDir] [cores]
  */
object QueryOne {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)

      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.table.NoForkLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n  = df.count()
    val dt = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
    println(f"[queryone] $name rows=$n wall=$dt%.2fs sf=$sfDir cores=$cores")
    SparkEntry.releaseCaches()
    spark.stop()
  }
}
