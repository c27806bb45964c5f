package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

import graft.sources.GraftDataSource

/** V1 streaming sink: `df.writeStream.format("graft")` — the write half
  * of the table's streaming surface (the read half is
  * [[GraftChangelogSource]]). A binlog tail becomes one statement:
  *
  * {{{
  *   spark.readStream.schema(eventSchema).parquet(walDir)   // or any source
  *     .writeStream.format("graft")
  *     .option("path", tableRoot)
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * Each micro-batch routes through [[GraftDataSource.insertInto]] — the
  * SAME semantics as `df.write.format("graft").mode("append")`: frames
  * carrying (lsn, op) are verbatim change batches (within-batch LWW,
  * deletes honored, out-of-order LSNs across batches safe); frames
  * without them are payload upserts stamped at one fresh LSN above the
  * watermark. Never a bare file append — ledger, LWW, schema evolution
  * and lineage all apply.
  *
  * Exactly-once: the commit id is `stream-<key>-<batchId>`, where the
  * key derives from `option("streamId", ...)` if given, else the
  * checkpoint location. On restart Spark re-offers the last
  * un-acknowledged batch with the same batchId; the deterministic id
  * hits the commit ledger and the replay is skipped — the same
  * contract as the engine's own ingest loop (CdcPipeline). Without a
  * checkpoint (or explicit streamId) the key is a per-query nonce:
  * exactly-once within the query's lifetime, and a restart is a new
  * query by definition (its source offsets reset too).
  *
  * Deployment contract: one writer per table — a concurrent commit
  * between the stamp and the commit fails typed (CommitConflict), same
  * as the batch write path.
  *
  * Replication caveat: when the upstream of this sink is a graft
  * CHANGELOG stream, set `option("onRollback", "fail")` on the source —
  * a source-table rollback surfaces as retraction rows at their
  * original (older) lsns, which this sink's LWW merge drops as stale;
  * failing loudly there is the only non-divergent option
  * ([[GraftChangelogSource]] scaladoc has the recovery steps).
  *
  * Reference analog: the scheduled loader applying each night's change
  * extract into the authoritative table exactly once
  * (UpdateAddressPointsSDE.py:24-48) — here as a standing query.
  */
class GraftStreamSink(
    spark: SparkSession, root: String, streamKey: String) extends Sink {

  // within-run duplicate guard (the MemorySink idiom); the ledger is
  // the cross-run authority
  @volatile private var latestBatchId = -1L

  // ONE table handle for the sink's lifetime: manifests are immutable,
  // and a fresh load per micro-batch would re-parse the whole manifest
  // chain for the ledger check every trigger (O(versions²) cumulative
  // driver IO over a standing query)
  private lazy val table = graft.table.SnapshotTable.load(spark, root)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (batchId <= latestBatchId) return
    val batchDf = org.apache.spark.sql.classic.GraftSqlBridge.asBatch(data)
    GraftDataSource.insertInto(table, batchDf, overwrite = false,
      commitId = Some(s"stream-$streamKey-$batchId"))
    latestBatchId = batchId
  }

  override def toString: String = s"GraftStreamSink[$root]"
}
