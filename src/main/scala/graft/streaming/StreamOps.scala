package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators beyond the core CDC apply loop: event-time
  * windowed aggregation with a watermark, and custom keyed state via
  * mapGroupsWithState.
  *
  * Reference analog: the reference has no streaming (monthly batches,
  * SURVEY.md §2.10); these are the engine-side operators a live change
  * stream needs for monitoring/lineage — window = the "counts per run"
  * reports (CountyAddressPointETL.py:384,503-504) generalized to
  * event-time, keyed state = the per-feed bookkeeping the reference keeps
  * in process-local dicts.
  */
object StreamOps {

  /** Tumbling event-time window metrics over a change stream: per
    * (window, op) event counts with a watermark bounding state. Works on
    * both a streaming and a batch DataFrame (same plan — the batch twin
    * is the oracle). */
  def opCountsByWindow(
      events: DataFrame,
      windowLen: String = "1 minute",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ingest_ts", watermarkDelay)
      else events
    src
      .groupBy(window(col("ingest_ts"), windowLen).as("w"), col("op"))
      .agg(count(lit(1)).as("n_events"), max(col("lsn")).as("max_lsn"))
      .select(
        col("w.start").as("window_start"),
        col("op"), col("n_events"), col("max_lsn"))
  }

  case class DocProgress(doc_id: String, n_events: Long, last_lsn: Long, deleted: Boolean)

  /** Keyed custom state: running per-doc event count + LSN frontier via
    * mapGroupsWithState (the engine's own state normally lives in the
    * snapshot table; this is the operator surface for stateful stream
    * logic that does not). NoTimeout: a processing-time timeout keeps
    * AvailableNow queries alive waiting on the clock — state GC belongs
    * to an explicit TTL pass, not the trigger loop. */
  def docProgress(
      spark: SparkSession,
      events: DataFrame): Dataset[DocProgress] = {
    import spark.implicits._
    events
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("lsn"), col("op"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (docId: String, rows: Iterator[(String, Long, String)],
         state: GroupState[DocProgress]) => {
          val prev = state.getOption.getOrElse(DocProgress(docId, 0L, Long.MinValue, deleted = false))
          val next = rows.foldLeft(prev) { case (acc, (_, lsn, op)) =>
            DocProgress(
              docId,
              acc.n_events + 1,
              math.max(acc.last_lsn, lsn),
              if (lsn >= acc.last_lsn) op == "D" else acc.deleted)
          }
          state.update(next)
          next
        })
  }

  /** [[docProgress]] with bounded state: event-time TTL via
    * `EventTimeTimeout` — a doc idle past `ttl` (by WATERMARK, not the
    * wall clock, so AvailableNow drains terminate) emits one final row
    * with `evicted = true` and its state is removed; a later event for
    * the same doc restarts its count from zero. This is the explicit
    * state-GC pass the NoTimeout variant defers (the unbounded keyed
    * state that would otherwise grow with total distinct keys ever
    * seen — the thing that OOMs a year-old stream at scale). */
  case class DocProgressTtl(
      doc_id: String, n_events: Long, last_lsn: Long,
      deleted: Boolean, evicted: Boolean)

  def docProgressWithTtl(
      spark: SparkSession,
      events: DataFrame,
      watermarkDelay: String = "30 seconds",
      ttlMs: Long = 60000L): Dataset[DocProgressTtl] = {
    import spark.implicits._
    events
      .filter(col("doc_id").isNotNull)
      // the watermark column must SURVIVE into the stateful operator's
      // input — projecting it away drops the watermark tag and the
      // analyzer rejects EventTimeTimeout
      .select(col("doc_id"), col("lsn"), col("op"), col("ingest_ts"))
      .withWatermark("ingest_ts", watermarkDelay)
      .as[(String, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (docId: String, rows: Iterator[(String, Long, String, java.sql.Timestamp)],
         state: GroupState[DocProgressTtl]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(last.copy(evicted = true))
          } else {
            val prev = state.getOption.getOrElse(
              DocProgressTtl(docId, 0L, Long.MinValue, deleted = false, evicted = false))
            var maxTsMs = Long.MinValue
            val next = rows.foldLeft(prev) { case (acc, (_, lsn, op, ts)) =>
              maxTsMs = math.max(maxTsMs, ts.getTime)
              DocProgressTtl(
                docId,
                acc.n_events + 1,
                math.max(acc.last_lsn, lsn),
                if (lsn >= acc.last_lsn) op == "D" else acc.deleted,
                evicted = false)
            }
            state.update(next)
            // expire once the WATERMARK passes last-seen + ttl; a group
            // fed only late (sub-watermark) events must still get a
            // FUTURE timeout — Spark rejects timestamps at/below the
            // current watermark
            state.setTimeoutTimestamp(
              math.max(maxTsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator(next)
          }
        })
  }

  /** Run [[docProgress]] over a streaming source to completion
    * (AvailableNow) into an in-memory table; returns the final per-doc
    * states. Update-mode sink: the LAST row per doc_id is its state. */
  def runDocProgress(
      spark: SparkSession,
      streamingEvents: DataFrame,
      checkpointDir: String,
      queryName: String): DataFrame = {
    val q = docProgress(spark, streamingEvents).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one deterministic hash-agg: the winner per doc is the LEXICOGRAPHIC
    // max over ALL state columns — no window + dropDuplicates whose
    // pick among tied n_events rows depends on partition order
    spark.table(queryName)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("n_events"), col("last_lsn"), col("deleted"))).as("s"))
      .select(col("doc_id"), col("s.n_events"), col("s.last_lsn"), col("s.deleted"))
  }
}
