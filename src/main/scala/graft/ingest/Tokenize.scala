package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible tokenizer.
  *
  * The engine's payload is pre-tokenized training sequences; tests and
  * benchmarks seed initial table state by tokenizing the driver-provided
  * `documents` table deterministically (seed-free pure arithmetic, so the
  * DuckDB oracle can reproduce token arrays bit-for-bit).
  *
  * Token function (word → int in [0, 65535]):
  *   tok(w) = (length(w)*131 + ascii(first(w))*7 + ascii(last(w))) % 65536
  *
  * Reference analog: parse_address.parse, the one third-party "tokenizer"
  * in the reference conform layer (CountyAddressPointETL.py:919-938) —
  * here a pure Catalyst expression chain, no UDF (SURVEY.md §2.11).
  */
object Tokenize {

  /** tokens: array<int> from a whitespace-separated text column.
    * Pure built-in functions → whole-stage codegen, no UDF. */
  def tokens(text: Column): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    transform(
      words,
      w =>
        ((length(w) * lit(131) + ascii(w) * lit(7) + ascii(reverse(w)))
          % 65536).cast("int"))
  }

  /** DuckDB twin of [[tokens]] — MUST stay in lockstep with it. */
  def tokensSql(textExpr: String): String =
    s"list_transform(list_filter(string_split($textExpr, ' '), w -> length(w) > 0), " +
      s"w -> cast((length(w)*131 + ascii(w)*7 + ascii(reverse(w))) % 65536 as int))"

  /** Canonical doc_id from the documents table's int64 id. */
  def docId(id: Column): Column = concat(lit("doc"), id.cast("string"))

  def docIdSql(idExpr: String): String = s"'doc' || cast($idExpr as varchar)"
}
