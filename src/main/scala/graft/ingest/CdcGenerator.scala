package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic change-event generator.
  *
  * Derives a CDC stream (insert/update/delete on doc_id) from the
  * driver-provided `documents` table with pure arithmetic — no RNG, no
  * wall-clock — so the DuckDB oracle can regenerate the identical stream
  * and the final table state is exactly checkable (BASELINE.md "replay
  * table-state match = 100%").
  *
  * Scenarios encoded (FIXTURES.md §4):
  *  - G1 inserts: rep 0 of every doc is an 'I'.
  *  - G2 updates: docs get 1 + (id % 3) reps; rep r>0 is a 'U' whose token
  *    array shifts by r*7 (mod 65536) — LWW must keep the max-LSN payload.
  *  - G3 deletes: docs with id % 17 == 3 end with a 'D' (null payload).
  *  - G5 hot-key skew: docs with id % 50 == 0 get 12 extra updates
  *    (~2% of keys carry ~10x the events).
  *  - E1 invalid rows: id % 97 == 5 → rep-0 n_tok off by one (routed to
  *    error_records); id % 89 == 7 → rep-0 doc_id null.
  *
  * LSN = r * 10_000_000 + id: globally unique, later reps strictly larger.
  */
object CdcGenerator {
  val LsnStride = 10000000L
  val MaxReps   = 15 // 1 + max(id%3) + 12 hot-key extras

  /** Number of change events per document id (Spark column expr). */
  private def repsCol = lit(1) + (col("doc_id") % 3) +
    when(col("doc_id") % 50 === 0, lit(12)).otherwise(lit(0))

  /** The generated change stream for one scale tier.
    * @param sfDir directory holding documents.parquet */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val baseToks = Tokenize.tokens(col("text"))
    docs
      .withColumn("reps", repsCol)
      .withColumn("r", explode(sequence(lit(0), col("reps") - 1)))
      .withColumn("lsn", col("r") * LsnStride + col("doc_id"))
      .withColumn(
        "op",
        when(col("r") === 0, lit("I"))
          .when(col("r") === col("reps") - 1 && col("doc_id") % 17 === 3, lit("D"))
          .otherwise(lit("U")))
      .withColumn(
        "out_doc_id",
        when(col("doc_id") % 89 === 7 && col("r") === 0, lit(null: String))
          .otherwise(Tokenize.docId(col("doc_id"))))
      .withColumn(
        "tokens",
        when(col("op") === "D", lit(null))
          .otherwise(transform(baseToks, t => ((t + col("r") * 7) % 65536).cast("int"))))
      .withColumn(
        "n_tok",
        when(col("op") === "D", lit(null))
          .otherwise(
            size(col("tokens")) +
              when(col("doc_id") % 97 === 5 && col("r") === 0, lit(1)).otherwise(lit(0))))
      .withColumn("ingest_ts", timestamp_seconds(col("lsn") / lit(1000.0)))
      .select(
        col("lsn"),
        col("op"),
        col("out_doc_id").as("doc_id"),
        col("tokens"),
        col("n_tok").cast("long").as("n_tok"),
        col("source"),
        col("ingest_ts"))
  }

  /** DuckDB twin of [[events]] as a CTE body (columns: lsn, op, doc_id,
    * tokens, n_tok, source). MUST stay in lockstep with [[events]]. */
  def eventsSql: String = {
    val toks = Tokenize.tokensSql("d.text")
    s"""
    SELECT r.r * $LsnStride + d.doc_id AS lsn,
      CASE WHEN r.r = 0 THEN 'I'
           WHEN r.r = (1 + (d.doc_id % 3) + (CASE WHEN d.doc_id % 50 = 0 THEN 12 ELSE 0 END)) - 1
                AND d.doc_id % 17 = 3 THEN 'D'
           ELSE 'U' END AS op,
      CASE WHEN d.doc_id % 89 = 7 AND r.r = 0 THEN NULL
           ELSE ${Tokenize.docIdSql("d.doc_id")} END AS doc_id,
      CASE WHEN (CASE WHEN r.r = 0 THEN 'I'
                      WHEN r.r = (1 + (d.doc_id % 3) + (CASE WHEN d.doc_id % 50 = 0 THEN 12 ELSE 0 END)) - 1
                           AND d.doc_id % 17 = 3 THEN 'D'
                      ELSE 'U' END) = 'D' THEN NULL
           ELSE list_transform($toks, t -> cast((t + r.r * 7) % 65536 AS int)) END AS tokens,
      CASE WHEN (CASE WHEN r.r = 0 THEN 'I'
                      WHEN r.r = (1 + (d.doc_id % 3) + (CASE WHEN d.doc_id % 50 = 0 THEN 12 ELSE 0 END)) - 1
                           AND d.doc_id % 17 = 3 THEN 'D'
                      ELSE 'U' END) = 'D' THEN NULL
           ELSE cast(len($toks) + (CASE WHEN d.doc_id % 97 = 5 AND r.r = 0 THEN 1 ELSE 0 END) AS bigint)
           END AS n_tok,
      d.source AS source
    FROM documents d
    JOIN (SELECT unnest(range(0, $MaxReps)) AS r) r
      ON r.r < 1 + (d.doc_id % 3) + (CASE WHEN d.doc_id % 50 = 0 THEN 12 ELSE 0 END)
    """
  }

  /** Write the stream as offset-ranged parquet batch files
    * `<outDir>/batch-%05d/` (split by rep index → each batch's LSNs are
    * strictly above the previous batch's), for the Structured Streaming
    * file source. Returns batch count. */
  def writeBatches(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      batches: Int = 4): Int = {
    val ev  = events(spark, sfDir)
    val per = (MaxReps + batches - 1) / batches
    (0 until batches).foreach { b =>
      val lo = b.toLong * per * LsnStride
      val hi = (b + 1).toLong * per * LsnStride
      ev.filter(col("lsn") >= lo && col("lsn") < hi)
        .write
        .mode("overwrite")
        .parquet(f"$outDir/batch-$b%05d")
    }
    batches
  }
}
