package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.{Conform, Dedup, Merge, MergeOnRead, MergeStats, SchemaEvolution, Validate}
import graft.table.SnapshotTable

/** Configuration for one CDC ingest pipeline instance. */
case class PipelineConfig(
    tableRoot: String,
    changeLogDir: String,
    checkpointDir: String,
    errorDir: String,
    lineageDir: String,
    numBuckets: Int = 16,
    // two-phase salted pre-aggregation kicks in above this many events per
    // batch (hot-key defense at scale; below it the extra shuffle costs
    // more than it saves)
    saltThreshold: Long = 2000000L,
    salt: Int = 32,
    // "cow" rewrites touched buckets per commit; "mor" appends delta files
    // (O(batch) commit) and folds at read/compaction time — the right mode
    // for trickle batches against a large table
    mode: String = "cow",
    // mor: compact when deltaRows exceed this fraction of base rows
    compactThreshold: Double = 0.5)

/** The engine's core: change-log tail → conform → validate/route →
  * LWW dedup → exactly-once MERGE, as a Structured Streaming
  * `foreachBatch` pipeline, resumable from checkpoint.
  *
  * Exactly-once story (reference analog: idempotent monthly archive,
  * CountyAddressPointETL.py:242-250):
  *  1. Structured Streaming's checkpoint gives replayable source offsets
  *     and a stable batchId on restart.
  *  2. commit_id = f(pipeline, batchId); the [[SnapshotTable]] manifest
  *     chain is the ledger — a replayed batch is skipped before any write.
  *  3. Even a bypassed ledger cannot corrupt state: MERGE's row-level
  *     `batch.lsn > target._lsn` condition makes re-application a no-op.
  *
  * Delivery contract: duplicate delivery of an applied batch is a no-op
  * (ledger), and ARBITRARY event-to-batch assignment is tolerated — LWW
  * by LSN plus persisted delete tombstones ([[Merge.TombCol]]) make the
  * final state order-independent; even a delete delivered before the
  * batch holding its insert cannot be undone by the late lower-LSN
  * insert. Tombstones expire at compaction once the applied-LSN frontier
  * passes them ([[MergeOnRead.compact]]'s expireTombstonesBelow).
  */
final class CdcPipeline(spark: SparkSession, cfg: PipelineConfig) {

  val table: SnapshotTable = {
    val existing = SnapshotTable.load(spark, cfg.tableRoot)
    if (existing.currentVersion.isDefined) existing
    else SnapshotTable.create(
      spark, cfg.tableRoot,
      StructType(Conform.EventSchema.fields.filterNot(f =>
        Seq("lsn", "op", "ingest_ts").contains(f.name)))
        .add(Merge.LsnCol, "long", nullable = false)
        .add(Merge.TombCol, "boolean", nullable = true),
      cfg.numBuckets)
  }

  def commitIdFor(batchId: Long): String = s"b$batchId"

  /** Apply one raw change batch (batch API — also the foreachBatch body). */
  def applyBatch(raw: DataFrame, batchId: Long): MergeStats = {
    val commitId = commitIdFor(batchId)
    if (table.appliedCommitIds.contains(commitId)) {
      val cur = table.current.get
      return MergeStats(commitId, cur.version, skipped = true, 0, cur.rowCount,
        cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1, 0, Seq.empty)
    }
    val stats =
      try {
        val conformed = Conform(raw)
        val split     = Validate(conformed, commitId)
        writeErrors(split.errors)
        val events = split.valid
        val deduped =
          if (cfg.salt > 1 && batchEstimate(raw) >= cfg.saltThreshold)
            Dedup.lwwSalted(events, cfg.salt)
          else Dedup.lww(events)
        if (cfg.mode == "mor") {
          val s = MergeOnRead(table, deduped, commitId, batchId)
          maybeCompact()
          s
        } else Merge(table, deduped, commitId, batchId)
      } catch {
        // Whole-batch rejects (reference analog: checkRequiredFields
        // abort) — recorded as an error + an empty commit so the ledger
        // marks the batch applied and the STREAM keeps running:
        case Conform.BatchRejected(missing) =>
          rejectBatch(raw, commitId, batchId, s"missing_required_column:${missing.mkString(",")}")
        case SchemaEvolution.Incompatible(msg) =>
          // extra column re-appeared with a non-widenable type
          rejectBatch(raw, commitId, batchId, s"schema_incompatible:$msg")
        case Conform.ConformFailed(detail) =>
          // un-castable required column (e.g. tokens arrived as string).
          // Deliberately NOT a blanket AnalysisException catch: an
          // environment-caused analysis error (vacuumed data file, bad
          // errorDir path) must fail the stream, not ledger the batch as
          // applied with only a sample retained.
          rejectBatch(raw, commitId, batchId, s"conform_failed:$detail")
      }
    writeLineage(stats, batchId)
    stats
  }

  private def batchEstimate(raw: DataFrame): Long =
    // rows-from-metadata estimate; exact count would cost a job
    raw.queryExecution.optimizedPlan.stats.rowCount
      .map(_.longValue)
      .getOrElse(raw.queryExecution.optimizedPlan.stats.sizeInBytes.longValue / 256L)

  private def rejectBatch(
      raw: DataFrame, commitId: String, batchId: Long,
      reason: String): MergeStats = {
    val err = raw
      .limit(1000) // sample of the rejected batch for the quarantine table
      .select(
        lit(commitId).as("commit_id"),
        lit(-1L).as("lsn"),
        lit(null).cast("string").as("doc_id"),
        lit(s"batch_rejected:$reason").as("reason"),
        to_json(struct(raw.columns.map(col).toIndexedSeq: _*)).as("raw"))
    writeErrors(err)
    val cur = table.current.get
    table.commit(cur.copy(
      version = cur.version + 1, parent = cur.version,
      commitId = commitId, batchId = batchId))
    MergeStats(commitId, cur.version + 1, skipped = false, 0, cur.rowCount,
      cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1, 0,
      Seq(s"batch_rejected:$reason"))
  }

  /** Append to the quarantine table — but not for empty error sets: a
    * clean stream would otherwise pay a fixed parquet-append job every
    * batch. The isEmpty probe early-terminates at the first error row, so
    * dirty batches pay one cheap limit-1 scan; clean batches trade the
    * append job for a scan of the (already-filtered) error branch. */
  private def writeErrors(errors: DataFrame): Unit =
    if (!errors.isEmpty)
      errors.write.mode(SaveMode.Append).parquet(s"${cfg.errorDir}")

  /** Per-batch AND per-partition lineage to the metrics table: one row
    * per bucket this commit wrote (partition_id = bucket, rows from the
    * committed file's footer) plus a batch summary row (partition_id =
    * -1) carrying the offset range, rows applied, conflict count, and
    * skew ratio (max/avg bucket rows this commit). */
  private def writeLineage(s: MergeStats, batchId: Long): Unit = {
    import spark.implicits._
    val cur = table.current
    // exact dir match — a bare prefix would conflate commit b1 with b10.
    // A COW apply that found pending MOR deltas first folds them under
    // c-<id>.pre-compact (Merge.apply's foldTouched) and then writes its
    // own join output under c-<id>; count each bucket once, preferring
    // the later (join) file. MOR delta dirs carry a writer-unique nonce
    // (see MergeOnRead.apply), hence the regex.
    val all = cur.toSeq.flatMap(m => m.files ++ m.deltaFiles)
    val deltaDir = ("/c-" + java.util.regex.Pattern.quote(s.commitId) +
      "(\\.[0-9a-f]+)?\\.d/").r
    val mainFiles = all.filter(f =>
      f.path.contains(s"/c-${s.commitId}/") ||
        deltaDir.findFirstIn(f.path).isDefined)
    val mainB = mainFiles.map(_.bucket).toSet
    // pre-compact files survive in the manifest only for buckets the join
    // did not rewrite; attribute those to this batch too (its fold IO)
    val commitFiles = mainFiles ++ all.filter(f =>
      f.path.contains(s"/c-${s.commitId}.pre-compact/") && !mainB.contains(f.bucket))
    val skew =
      if (commitFiles.isEmpty) 1.0
      else {
        val rows = commitFiles.map(_.rows.toDouble)
        val avg  = rows.sum / rows.size
        if (avg == 0) 1.0 else rows.max / avg
      }
    val summary = graft.LineageRecord(
      commit_id = s.commitId, batch_id = batchId, partition_id = -1,
      offset_start = s.minLsn, offset_end = s.maxLsn,
      rows_applied = s.inserted + s.updated + s.deleted,
      conflict_count = s.updated + s.staleEvents,
      skew_ratio = skew, wall_ms = s.wallMs)
    val perBucket = commitFiles.map { f =>
      graft.LineageRecord(
        commit_id = s.commitId, batch_id = batchId, partition_id = f.bucket,
        offset_start = s.minLsn, offset_end = s.maxLsn,
        rows_applied = f.rows, conflict_count = -1,
        skew_ratio = skew, wall_ms = s.wallMs)
    }
    (summary +: perBucket).toDS().coalesce(1)
      .write.mode(SaveMode.Append).parquet(cfg.lineageDir)
  }

  /** Stream the change-log directory to completion (AvailableNow) and
    * return per-batch stats observed this run. Restart-safe: offsets come
    * from the checkpoint; replayed batches hit the commit ledger. */
  def runAvailableNow(maxFilesPerTrigger: Option[Int] = None): Seq[MergeStats] = {
    Files.createDirectories(Paths.get(cfg.checkpointDir))
    val reader = spark.readStream.schema(Conform.EventSchema)
    val src = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n))
      .getOrElse(reader)
      .parquet(s"${cfg.changeLogDir}/batch-*")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[MergeStats]()
    val query = src.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        seen.add(applyBatch(df, batchId))
        ()
      }
      .start()
    query.awaitTermination()
    import scala.collection.JavaConverters._
    seen.iterator().asScala.toSeq
  }

  /** Fold deltas into base when they outgrow the configured fraction of
    * the TOTAL table (base + deltas — a ratio on base alone would fire
    * forever against an empty base). Set compactThreshold = infinity to
    * run compaction purely as scheduled maintenance via
    * [[MergeOnRead.compact]]. */
  private def maybeCompact(): Unit = {
    val m = table.current.get
    if (m.deltaRows > (m.rowCount + m.deltaRows) * cfg.compactThreshold) {
      // targeted: rewrite only delta-carrying buckets (clean buckets'
      // files carry by reference); full compact() stays the scheduled-
      // maintenance path (tombstone expiry rides it)
      MergeOnRead.foldTouched(table, s"compact-v${m.version}", batchId = -1L)
      ()
    }
  }

  /** The authoritative table, logical view: delta-resolved (MOR),
    * tombstones filtered, internal columns stripped. */
  def readTable(): DataFrame = MergeOnRead.liveView(table)

  /** Time travel: the same logical view AT an earlier committed version
    * (manifests are immutable, so this is just a resolve against that
    * version's file lists — no data copies). Versions whose data files
    * were vacuumed fail on read, by design (Iceberg expire_snapshots
    * tradeoff; see SnapshotTable.vacuum). */
  def readTableAt(version: Long): DataFrame =
    MergeOnRead.liveView(table, Some(version))

  /** Typed view of the authoritative table (the engine contract's
    * `Dataset[TokenDoc]`; `n_tok` downcast from the widened internal
    * long). A value above Int range — the exact case widening exists
    * for — must FAIL the read, not wrap silently in the downcast. */
  def readTyped(): org.apache.spark.sql.Dataset[graft.TokenDoc] = {
    import spark.implicits._
    readTable()
      .select(col("doc_id"), col("tokens"),
        when(col("n_tok") > Int.MaxValue,
          raise_error(concat(lit("n_tok exceeds Int range for doc_id="), col("doc_id"))))
          .otherwise(col("n_tok").cast("int")).as("n_tok"),
        col("source"))
      .as[graft.TokenDoc]
  }

  /** Point lookup by doc_id: prunes the read to the key's single hash
    * bucket (1/numBuckets of the data files), then drops files whose
    * footer min/max doc_id range cannot contain the key (zone map) —
    * before any IO. The partition-pruning path a doc-id-keyed table
    * exists for. */
  def lookup(docId: String): DataFrame =
    MergeOnRead.resolveKey(table, docId)
      .filter(col("doc_id") === docId &&
        !coalesce(col(Merge.TombCol), lit(false)))
      .drop(Merge.InternalCols: _*)
}
