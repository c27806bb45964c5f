package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ingest.CdcGenerator
import graft.operators.MergeOnRead
import graft.streaming.{CdcPipeline, PipelineConfig}

/** Per-round benchmark (driver contract): prints ONE JSON line.
  *
  * Headline metric = BASELINE.json's: change-events/sec applied,
  * end-to-end (conform → validate/route → LWW dedup → copy-on-write
  * MERGE → manifest commit → lineage) over a synthetic CDC stream
  * derived from the tier's `documents` table.
  *
  * The north rule's two-cluster-size criterion (≥0.8 scaling efficiency
  * from N to 4N executors) has no real cluster in this sandbox, so the
  * SAME job runs at `local[8]` and `local[32]` on the SAME pre-written
  * change log, and both throughputs + the efficiency ratio are reported
  * (see BASELINE.md).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPLICATE
  * (stream multiplier, default 90 ≈ 1.0M events at sf0.1),
  * SPARK_GRAFT_CPUS (max parallelism, default 32).
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-c$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply every batch dir of `changeLog` through the full pipeline on a
    * fresh table; returns wall seconds. Same code path as the streaming
    * foreachBatch body (CdcPipeline.applyBatch). In MOR mode a final
    * compaction is INSIDE the timed region so the measured cost covers a
    * fully folded table state, not just appended deltas. */
  private def runCdc(
      spark: SparkSession, changeLog: String, batches: Int, buckets: Int,
      mode: String): Double = {
    val base = Files.createTempDirectory("graft-bench-run").toString
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table",
      changeLogDir = changeLog,
      checkpointDir = s"$base/checkpoint",
      errorDir = s"$base/errors",
      lineageDir = s"$base/lineage",
      numBuckets = buckets,
      mode = mode))
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val tb = System.nanoTime()
      val st = p.applyBatch(spark.read.parquet(f"$changeLog/batch-$b%05d"), b.toLong)
      System.err.println(
        f"[bench] mode=$mode batch=$b wall=${(System.nanoTime() - tb) / 1e9}%.2fs merge=${st.wallMs / 1000.0}%.2fs " +
          f"ins=${st.inserted} upd=${st.updated} del=${st.deleted} rows=${st.rowsAfter}")
    }
    if (mode == "mor") { MergeOnRead.compact(p.table, "bench-final"); () }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir     = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxCpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val loCpus    = math.max(1, maxCpus / 4)
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "90").toInt
    val batches   = 4
    val buckets   = 64

    // ---- stage the change log once (not timed) ----
    val stage     = newSession(maxCpus)
    val changeLog = Files.createTempDirectory("graft-bench-log").toString
    CdcGenerator.writeBatches(stage, sfDir, changeLog, batches, replicate)
    val nEvents = stage.read.parquet(s"$changeLog/batch-*").count()
    // JIT/codegen warm-up on a sliver so neither timed run pays it
    val warm = Files.createTempDirectory("graft-bench-warm").toString
    CdcGenerator.writeBatches(stage, sfDir, warm, batches = 2)
    Seq("cow", "mor").foreach(m => runCdc(stage, warm, 2, 8, m))
    stage.stop()

    // ---- same job, N then 4N cores, same input, both commit modes ----
    case class ModeResult(mode: String, tLo: Double, tHi: Double) {
      def epsLo: Double = nEvents / tLo
      def epsHi: Double = nEvents / tHi
      def eff: Double   = (epsHi / epsLo) / (maxCpus.toDouble / loCpus)
      def json: String =
        f""""$mode":{"sec_lo":$tLo%.2f,"sec_hi":$tHi%.2f,"events_per_sec_lo":$epsLo%.1f,"events_per_sec_hi":$epsHi%.1f,"scaling_efficiency":$eff%.3f}"""
    }
    val sLo = newSession(loCpus)
    val lo = Seq("cow", "mor").map(m => m -> runCdc(sLo, changeLog, batches, buckets, m)).toMap
    sLo.stop()
    val sHi = newSession(maxCpus)
    val hi = Seq("cow", "mor").map(m => m -> runCdc(sHi, changeLog, batches, buckets, m)).toMap

    val modes = Seq("cow", "mor").map(m => ModeResult(m, lo(m), hi(m)))
    val best  = modes.maxBy(_.epsHi)
    val epsHi = best.epsHi
    val eff   = best.eff

    // ---- per-operator query timings on the tier (at max cores) ----
    // SPARK_GRAFT_QUERIES=0 skips them (fast CDC-only iteration)
    val runQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "0"
    val queries =
      (if (runQueries) SparkEntry.queries.toSeq.sortBy(_._1) else Seq.empty).map {
        case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(sHi, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
          name -> (System.nanoTime() - t0) / 1e9
      }
    val qJson = queries.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")

    println(
      f"""{"metric":"change-events/sec applied (end-to-end MERGE throughput)","value":$epsHi%.1f,"unit":"events/sec","sf":"$sfDir","queries":$qJson,"cdc":{"events":$nEvents,"batches":$batches,"buckets":$buckets,"replicate":$replicate,"cores_lo":$loCpus,"cores_hi":$maxCpus,"best_mode":"${best.mode}","scaling_efficiency":$eff%.3f,${modes.map(_.json).mkString(",")}},"query_total_sec":${queries.map(_._2).sum}%.2f}""")
    sHi.stop()
  }
}
