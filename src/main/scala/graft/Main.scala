package graft

import org.apache.spark.sql.SparkSession

import graft.operators.MergeOnRead
import graft.streaming.{CdcPipeline, PipelineConfig}

/** spark-submit entry point for the CDC ingest job (north rule: "run via
  * spark-submit on a multi-executor cluster"). No master/parallelism is
  * hard-coded — all of that comes from spark-submit/cluster conf; only
  * engine semantics are configured here.
  *
  * {{{
  * spark-submit --class graft.Main engine.jar \
  *   --changelog  s3://bucket/changelog \
  *   --table      s3://bucket/token_docs \
  *   --checkpoint s3://bucket/ckpt \
  *   [--errors DIR] [--lineage DIR] [--mode cow|mor|auto] [--buckets N]
  *   [--salt N] [--compact-threshold F] [--follow] [--vacuum-retain N]
  * }}}
  *
  * Default is one AvailableNow drain (catch up, commit, exit 0) — the
  * cron-able shape, like the reference's monthly run. `--follow` keeps
  * tailing the change log until killed; restart resumes from the
  * checkpoint and the commit ledger skips replayed batches.
  */
object Main {

  private def parse(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap ++ (if (args.contains("--follow")) Map("follow" -> "true") else Map.empty)

  def main(args: Array[String]): Unit = {
    val a = parse(args.filterNot(_ == "--follow"))
    def req(k: String): String =
      a.getOrElse(k, sys.error(s"missing required --$k (have: ${a.keys.mkString(",")})"))

    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)

      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .appName("graft-cdc-ingest")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", classOf[graft.table.NoForkLocalFileSystem].getName)
      .getOrCreate()

    val table = req("table")
    val cfg = PipelineConfig(
      tableRoot = table,
      changeLogDir = req("changelog"),
      checkpointDir = req("checkpoint"),
      errorDir = a.getOrElse("errors", s"$table/_errors"),
      lineageDir = a.getOrElse("lineage", s"$table/_lineage"),
      numBuckets = a.getOrElse("buckets", "64").toInt,
      salt = a.getOrElse("salt", "1").toInt, // off, per Bench.skewStudy
      mode = a.getOrElse("mode", "cow"),
      compactThreshold = a.getOrElse("compact-threshold", "0.5").toDouble)
    val p = new CdcPipeline(spark, cfg)

    if (args.contains("--follow")) {
      // continuous tail: micro-batches as files arrive
      val q = spark.readStream
        .schema(graft.operators.Conform.EventSchema)
        .parquet(s"${cfg.changeLogDir}/batch-*")
        .writeStream
        .option("checkpointLocation", cfg.checkpointDir)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          p.applyBatch(df, id); ()
        }
        .start()
      q.awaitTermination()
    } else {
      val stats = p.runAvailableNow()
      stats.foreach(s => System.err.println(s"[graft] $s"))
      a.get("vacuum-retain").foreach { r =>
        // version-derived commit id → re-running compaction after a crash
        // hits the ledger instead of double-applying
        if (cfg.mode != "cow") // mor and auto tables may carry deltas; compact is a ledgered no-op when clean
          MergeOnRead.compact(p.table, s"main-compact-v${p.table.currentVersion.getOrElse(0L)}")
        val (deleted, kept) = p.table.vacuum(r.toInt)
        System.err.println(s"[graft] vacuum: deleted=$deleted kept=$kept")
      }
    }
    spark.stop()
  }
}
