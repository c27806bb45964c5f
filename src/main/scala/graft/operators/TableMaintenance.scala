package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.table.SnapshotTable

/** Table-maintenance operations a production operator reaches for weekly,
  * expressed as ordinary commits through the same MERGE machinery as the
  * CDC stream — so they inherit the ledger (idempotent replay), the LSN
  * ordering contract, lineage, and both commit modes for free.
  *
  * - [[deleteWhere]] — delete-by-predicate (GDPR purge, bad-source
  *   retraction). Reference analog: delete_by_query,
  *   DeletePoints.py:42-48.
  * - [[enrichRewrite]] — UPDATE-only rewrite re-deriving columns from a
  *   dimension join. Reference analog: the grid-enrichment rewrite job,
  *   update_address_point_grids.py:9-21.
  */
object TableMaintenance {

  /** Tombstone every live row matching `predicate`, as one commit at a
    * fresh LSN just above the table's watermark. The events flow through
    * the standard Merge/MergeOnRead path, so replays are ledger no-ops
    * and late CDC events below the watermark cannot resurrect the rows.
    *
    * Scale shape: one resolved scan filtered by the (pushdown-eligible)
    * predicate produces only doc_id + constants — O(matches) shuffle, and
    * under MOR an O(matches) commit. */
  def deleteWhere(
      table: SnapshotTable,
      predicate: Column,
      commitId: String,
      mode: String = "cow"): MergeStats = {
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot"))
    val lsn = cur.watermarkLsn + 1
    val batch = MergeOnRead.resolve(table)
      .filter(!coalesce(col(Merge.TombCol), lit(false)))
      .filter(predicate)
      .select(col("doc_id"), lit(lsn).as("lsn"), lit("D").as("op"))
    commit(table, batch, commitId, mode)
  }

  /** Re-derive payload columns for EVERY live row (an UPDATE-only merge):
    * `derive` maps the live rows to their rewritten payload — typically a
    * broadcast dimension join adding/refreshing derived columns. Added
    * columns evolve the target schema additively; doc_id must be
    * preserved row-for-row (this is a rewrite, not an upsert of new keys).
    * All rewrites commit at one fresh LSN above the watermark. */
  def enrichRewrite(
      table: SnapshotTable,
      commitId: String,
      mode: String = "cow")(derive: DataFrame => DataFrame): MergeStats = {
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot"))
    val lsn = cur.watermarkLsn + 1
    val live = MergeOnRead.resolve(table)
      .filter(!coalesce(col(Merge.TombCol), lit(false)))
      .drop(Merge.InternalCols: _*)
    val batch = derive(live)
      .withColumn("lsn", lit(lsn))
      .withColumn("op", lit("U"))
    commit(table, batch, commitId, mode)
  }

  private def commit(
      table: SnapshotTable, batch: DataFrame,
      commitId: String, mode: String): MergeStats =
    if (mode == "mor") MergeOnRead(table, batch, commitId, batchId = -2L)
    else Merge(table, batch, commitId, batchId = -2L)

  /** Migrate the table to a new hash-bucket count (one full rewrite via
    * [[MergeOnRead.compact]]); the growth knob for a table whose per-
    * bucket file size has outgrown the original count. All readers and
    * writers pick the new count up from the manifest — the COW merge,
    * MOR appends, point-lookup pruning, and the changelog view are all
    * keyed off `manifest.numBuckets`, never a cached constant. */
  def rebucket(table: SnapshotTable, newBuckets: Int, commitId: String): MergeStats =
    MergeOnRead.compact(table, commitId, rebucketTo = Some(newBuckets))

  /** Roll the table back to an earlier version: commits a NEW manifest
    * whose state (files, deltas, schema, watermark) is the target
    * version's — history is never rewritten, so the bad commits stay in
    * the chain (and in the idempotence ledger: a stream REDELIVERY of a
    * rolled-back batch is still skipped — rollback retracts state, it
    * does not un-apply a delivery; replay the events at fresh LSNs to
    * re-land them). O(1): no data files move. Pairs with
    * [[MergeOnRead.changesSince]] for find-the-bad-batch forensics.
    * A target whose data files vacuum already reclaimed fails typed
    * ([[graft.table.VacuumedVersionException]]) BEFORE anything
    * commits — otherwise the new head would reference deleted files
    * and every subsequent read of the table would throw. */
  def rollbackTo(table: SnapshotTable, version: Long): MergeStats = {
    val t0  = System.nanoTime()
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot"))
    require(version <= cur.version, s"cannot roll forward to $version")
    // commits are CAS'd at cur+1 so versions are contiguous from 0 and
    // manifests are never deleted — ≥0 plus the bound above IS existence
    require(version >= 0, s"no version $version (versions start at 0)")
    if (version == cur.version)
      // already there — a duplicate of the current manifest would add a
      // no-op commit and (worse) a duplicate commitId to the ledger
      return MergeStats(s"rollback-to-v$version", cur.version, skipped = true,
        0, cur.rowCount, cur.rowCount, 0, 0, 0, 0, 0, 0, -1,
        cur.watermarkLsn, (System.nanoTime() - t0) / 1000000, Seq.empty)
    // from-version suffix keeps commitIds unique when the same target is
    // rolled back to more than once (the chain doubles as the
    // exactly-once ledger, so ids must never repeat)
    val commitId = s"rollback-to-v$version-from-v${cur.version}"
    val target = table.manifest(version)
    // enforce the readability precondition, never trust the caller with
    // it: committing a head that references vacuum-reclaimed files would
    // wedge EVERY later read, the silently-wrong-state class this engine
    // fails typed everywhere else. O(files) driver-side metadata probes.
    // A vacuum racing this window is the same class as vacuum-vs-writer:
    // once the commit lands the files are head-referenced and retained;
    // the orphan grace window covers the remaining sliver.
    table.verifyReadable(target)
    table.commit(target.copy(
      version = cur.version + 1,
      parent = cur.version,
      commitId = commitId,
      batchId = -3L))
    MergeStats(commitId, cur.version + 1, skipped = false,
      0, cur.rowCount, target.rowCount, 0, 0, 0, 0, 0, 0, -1,
      target.watermarkLsn, (System.nanoTime() - t0) / 1000000, Seq.empty)
  }
}
