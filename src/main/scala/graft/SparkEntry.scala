package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{CdcGenerator, Tokenize}
import graft.streaming.{CdcPipeline, PipelineConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a DuckDB-runnable oracle in [[oracleSql]]
  * (tables registered by file name: documents, events, lineitem, …).
  * Column names and row ordering match between the Spark plan and the
  * oracle SQL — the driver's compare hashes values per sorted column name.
  */
object SparkEntry {

  /** Flagship: run the full CDC pipeline (generate change log → stream →
    * conform → validate/route → LWW dedup → exactly-once MERGE) on
    * sf0.001 and return the final authoritative table state. */
  def entry(spark: SparkSession): DataFrame =
    cdcMergeState(spark, "/root/testdata/sf0.001")

  /** End-to-end pipeline over a fresh temp table; returns final state. */
  private def cdcMergeState(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table",
      changeLogDir = s"$base/changelog",
      checkpointDir = s"$base/checkpoint",
      errorDir = s"$base/errors",
      lineageDir = s"$base/lineage",
      numBuckets = 16))
    CdcGenerator.writeBatches(spark, dir, s"$base/changelog", batches = 4)
    p.runAvailableNow(maxFilesPerTrigger = Some(1))
    p.readTable()
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CDC engine (the reference's role, §0) ----
    "q_cdc_merge_state" -> ((s, dir) => cdcMergeState(s, dir)),
    "q_cdc_events" -> ((s, dir) =>
      CdcGenerator.events(s, dir)
        .select(col("lsn"), col("op"), col("doc_id"), col("tokens"), col("n_tok"), col("source"))
        .orderBy(col("lsn"))),
    "q_cdc_tokenize" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          Tokenize.docId(col("doc_id")).as("doc_id"),
          Tokenize.tokens(col("text")).as("tokens"),
          size(Tokenize.tokens(col("text"))).as("n_tok"),
          col("source"))
        .orderBy(col("doc_id"))),

    // ---- core relational operators (SURVEY.md §2) ----
    "q_agg_sum" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  /** DuckDB oracle SQL per query (same tables, same column names). */
  def oracleSql: Map[String, String] = {
    val ev = CdcGenerator.eventsSql
    Map(
      "q_cdc_merge_state" ->
        s"""WITH evs AS ($ev),
            valid AS (
              SELECT * FROM evs
              WHERE doc_id IS NOT NULL
                AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))),
            last AS (
              SELECT doc_id,
                     max_by(op, lsn) AS op,
                     max_by(tokens, lsn) AS tokens,
                     max_by(n_tok, lsn) AS n_tok,
                     max_by(source, lsn) AS source
              FROM valid GROUP BY doc_id)
            SELECT doc_id, tokens, cast(n_tok AS bigint) AS n_tok, source
            FROM last WHERE op <> 'D' ORDER BY doc_id""",
      "q_cdc_events" ->
        s"""WITH evs AS ($ev)
            SELECT lsn, op, doc_id, tokens, n_tok, source FROM evs ORDER BY lsn""",
      "q_cdc_tokenize" ->
        s"""SELECT ${Tokenize.docIdSql("doc_id")} AS doc_id,
                   ${Tokenize.tokensSql("text")} AS tokens,
                   cast(len(${Tokenize.tokensSql("text")}) AS int) AS n_tok,
                   source
            FROM documents ORDER BY doc_id""",
      "q_agg_sum" ->
        """SELECT l_returnflag, l_linestatus,
                  cast(sum(l_quantity) AS bigint) AS sum_qty,
                  count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
    )
  }
}
