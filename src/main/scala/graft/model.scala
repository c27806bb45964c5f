package graft

import java.sql.Timestamp

/** Core data model for the CDC/incremental-ingest engine.
  *
  * Target-table row shape is fixed by the engine contract:
  * `(doc_id string, tokens array<int>, n_tok int, source string)` —
  * reference analog: the canonical 30-column address-point schema
  * (CountyAddressPointETL.py:39-42), reduced to the tokenized-sequence
  * domain. `_lsn` is an internal lineage column carried in the physical
  * table so MERGE can enforce last-writer-wins idempotently at the row
  * level (reference analog: LoadDate/ModifyDate audit columns,
  * CountyAddressPointETL.py:37,464-465).
  */
case class TokenDoc(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

/** A change event from the upstream log.
  *
  * `lsn` is the strictly-monotonic global order key (last-writer-wins);
  * `op` is 'I' | 'U' | 'D'. Reference analogs: InsertCursor /
  * UpdateCursor / DeleteFeatures (SURVEY.md §2.1 S4-S6).
  */
case class ChangeEvent(
    lsn: Long,
    op: String,
    doc_id: String,
    tokens: Array[Int],
    n_tok: Option[Long],
    source: String,
    ingest_ts: Timestamp)

/** A validation failure routed to the error side table.
  * Reference analog: errorPtsDict → createErrorPts shapefile
  * (CreateErrorPts.py:4-33). */
case class ErrorRecord(
    commit_id: String,
    lsn: Long,
    doc_id: String,
    reason: String,
    raw: String)

/** A quarantined error row that later re-validated through
  * [[graft.streaming.CdcPipeline.replayErrors]]: (`lsn`, `doc_id`)
  * identify the error row — stream errors carry unique lsns, but
  * bootstrap quarantine rows all share the snapshot's floor lsn, so the
  * lsn alone is NOT a key (round-4 review finding); `doc_id` is null for
  * the quarantine class whose correction supplies it. `resolved_by` is
  * the replay commit whose corrected copy passed validation. */
case class ResolutionRecord(
    lsn: Long,
    doc_id: String,
    resolved_by: String)

/** A near-duplicate flag from the incremental dedup index
  * ([[graft.operators.DedupIndex]]): `doc_id`'s insert (at `lsn`) was a
  * near-dup of `dup_of` (inserted earlier, at `dup_lsn`), with `agree`
  * of 16 MinHash lanes in agreement. Under the "flag" policy this is an
  * annotation (the row still merged); under "quarantine" the doc's
  * events were rejected to the error table too.
  * Reference analog: the per-load duplicate sweep,
  * DeletePoints.py:11-40. */
case class NearDupRecord(
    commit_id: String,
    doc_id: String,
    lsn: Long,
    dup_of: String,
    dup_lsn: Long,
    agree: Int)

/** Per-batch, per-partition lineage emitted to the metrics table.
  * Reference analog: old/new count reconciliation prints
  * (CountyAddressPointETL.py:384,503-504; UpdateAddressPointsSDE.py:33-63). */
case class LineageRecord(
    commit_id: String,
    batch_id: Long,
    partition_id: Int,
    offset_start: Long,
    offset_end: Long,
    rows_applied: Long,
    conflict_count: Long,
    skew_ratio: Double,
    wall_ms: Long)

/** One entry in the idempotent commit ledger.
  * Reference analog: archive_last_month's exists-check
  * (CountyAddressPointETL.py:242-250). */
case class CommitRecord(
    commit_id: String,
    batch_id: Long,
    version: Long,
    offsets: String,
    rows_applied: Long,
    ts: Timestamp)
