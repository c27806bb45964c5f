package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key last-writer-wins dedup over a change batch.
  *
  * The reference dedups first-writer-wins on a content hash
  * (DeletePoints.py:11-40, ordered by OBJECTID); CDC inverts this to
  * LAST-writer-wins ordered by the event LSN (SURVEY.md A1/W2):
  * `groupBy(doc_id).agg(max_by(event, lsn))` — an associative/commutative
  * reduce, so Spark's hash aggregate does map-side partial combine before
  * the shuffle (each input partition emits at most one pre-aggregated row
  * per locally-seen key — the built-in defense against hot keys).
  *
  * [[lwwSalted]] adds an EXPLICIT two-phase salted pre-aggregation for
  * pathological skew (FIXTURES.md G5): phase 1 reduces (doc_id, salt)
  * groups so a single hot doc_id's events spread over `salt` reducers;
  * phase 2 reduces the ≤salt survivors per key. Correct because max_by
  * over (lsn, event) is associative. Use when one key's event count
  * exceeds what a single reducer should absorb (10^10-event design point).
  */
object Dedup {

  /** Single-phase LWW: one shuffle on doc_id, map-side partial agg.
    *
    * `doc_id` is emitted from the GROUPING KEY, not from the winner
    * struct (they are equal by definition). This is load-bearing for
    * plan quality (round-6, guide §7.2): consumers that derive columns
    * from `doc_id` alone — the merge's touched-bucket probe projects
    * `pmod(xxhash64(doc_id), B)` and nothing else — let Catalyst prune
    * the (unused) max_by aggregate entirely and collapse the groupBy
    * into the downstream distinct; with the struct-field spelling the
    * optimizer cannot prove `_e.doc_id == doc_id` and every such probe
    * paid the full LWW reduce. */
  def lww(events: DataFrame): DataFrame = {
    val payload = struct(events.columns.map(col).toIndexedSeq: _*)
    events
      .groupBy(col("doc_id"))
      .agg(max_by(payload, col("lsn")).as("_e"))
      .select(events.columns.toIndexedSeq.map {
        case "doc_id" => col("doc_id")
        case c        => col(s"_e.$c").as(c)
      }: _*)
  }

  /** Two-phase salted LWW for hot-key skew. `salt` ≈ shuffle parallelism
    * you want the hottest key to use.
    *
    * Measured verdict (Bench.skewStudy): for THIS aggregate salting never
    * pays — max_by partial-combines map-side, so even 50% of all events
    * on one key reaches its reducer as ≤(#map partitions) pre-reduced
    * rows, and the salted plan's second full shuffle costs more than the
    * skew it would spread (1.0 s single-phase vs 1.8 s salted on that
    * pathological batch; unique-key batches 3.8 vs 4.4 s). Off by default
    * in [[graft.streaming.PipelineConfig]]; kept for dedup variants whose
    * reduce is NOT map-side combinable (e.g. a collect-all-versions
    * audit), where per-key fan-out is the only defense. */
  def lwwSalted(events: DataFrame, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1; use lww() otherwise")
    val payload = struct(events.columns.map(col).toIndexedSeq: _*)
    val phase1 = events
      .withColumn("_salt", pmod(xxhash64(col("lsn")), lit(salt.toLong)))
      .groupBy(col("doc_id"), col("_salt"))
      .agg(max_by(payload, col("lsn")).as("_e"))
    phase1
      .groupBy(col("doc_id"))
      .agg(max_by(col("_e"), col("_e.lsn")).as("_e"))
      .select(col("_e.*"))
  }
}
