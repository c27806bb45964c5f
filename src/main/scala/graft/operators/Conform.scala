package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conform a raw change batch to the canonical event schema, then split
  * valid rows from error rows.
  *
  * Canonical event columns:
  *   lsn long, op string, doc_id string, tokens array<int>,
  *   n_tok long, source string, ingest_ts timestamp
  *
  * Reference analog: the per-county conform loops (normalize, decode,
  * cast — CountyAddressPointETL.py:280-345) feeding errorPtsDict
  * (SURVEY.md §2.9 V1). All rules are declarative Column expressions —
  * whole-stage codegen, no UDFs.
  */
object Conform {

  val EventSchema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = true), // null routed to errors
    StructField("tokens", ArrayType(IntegerType), nullable = true),
    StructField("n_tok", LongType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("ingest_ts", TimestampType, nullable = true)
  ))

  /** Columns a batch MUST carry; a batch missing one is rejected whole
    * (reference analog: checkRequiredFields abort,
    * CountyAddressPointETL.py:5343-5352). */
  val RequiredColumns: Seq[String] = Seq("lsn", "op", "doc_id", "tokens")

  case class BatchRejected(missing: Seq[String])
      extends Exception(s"missing required column(s): ${missing.mkString(",")}")

  /** A required column exists but cannot be cast to its canonical type
    * (e.g. tokens arrived as string). Distinct from environmental
    * AnalysisExceptions (missing data file, bad path), which must
    * PROPAGATE and fail the stream loudly instead of quarantining a
    * valid batch. */
  case class ConformFailed(detail: String)
      extends Exception(s"batch not castable to event schema: $detail")

  /** Schema gate + normalization to the canonical event shape.
    * - missing `source` column → additive schema evolution, defaults to
    *   "unknown" (null values likewise default — E1 does not list null
    *   source as an error case)
    * - `n_tok` missing → derived from `size(tokens)`
    * - `n_tok` int → widened to long (widening evolution case)
    * - op normalized to upper-case single letter
    * - unknown extra columns pass through (additive evolution; the MERGE
    *   layer adds them to the target schema)
    * @throws BatchRejected when a required column is absent entirely. */
  def apply(raw: DataFrame): DataFrame = {
    val present = raw.columns.toSet
    val missing = RequiredColumns.filterNot(present.contains)
    if (missing.nonEmpty) throw BatchRejected(missing)

    def opt(name: String, default: Column): Column =
      if (present.contains(name)) col(name) else default

    val canonical = Seq(
      col("lsn").cast(LongType).as("lsn"),
      upper(trim(col("op").cast(StringType))).as("op"),
      // dirty-null lattice: the reference treats '', ' ', 'NULL', '<Null>'
      // etc. as null (errorList, CountyAddressPointETL.py:77-79)
      cleanString(col("doc_id").cast(StringType)).as("doc_id"),
      col("tokens").cast(ArrayType(IntegerType)).as("tokens"),
      opt("n_tok", size(col("tokens")).cast(LongType))
        .cast(LongType).as("n_tok"),
      coalesce(cleanString(opt("source", lit(null))
        .cast(StringType)), lit("unknown")).as("source"),
      opt("ingest_ts", lit(null)).cast(TimestampType).as("ingest_ts")
    )
    val known = EventSchema.fieldNames.toSet
    val extras = raw.columns.filterNot(known.contains).toIndexedSeq.map(col)
    // The analysis error scope is exactly this select: `raw` itself is
    // already resolved, so an AnalysisException here can only be an
    // un-castable canonical column — a data-shape problem, rethrown as
    // ConformFailed so the pipeline quarantines it. Analysis errors from
    // any OTHER stage are not caught anywhere and fail the stream.
    try raw.select(canonical ++ extras: _*)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw ConformFailed(e.getMessage.takeWhile(_ != '\n'))
    }
  }

  /** Map the reference's dirty-null sentinels to real null (P2). */
  def cleanString(c: Column): Column = {
    val cleaned = trim(c)
    when(cleaned.isNull || cleaned.isin("", "None", "<Null>", "NULL", "null", "#"), lit(null))
      .otherwise(cleaned)
  }
}

/** Row-level validation + error routing (SURVEY.md §2.9).
  * Rules per FIXTURES.md E1: n_tok mismatch, null doc_id, null tokens on
  * I/U; plus unknown op codes. */
object Validate {

  /** Array of failed-rule names for a conformed event row (empty → valid).
    * Declarative analog of errorPtsDict accumulation. */
  def reasons: Column = array_compact(array(
    when(col("doc_id").isNull, lit("null_doc_id")),
    when(!col("op").isin("I", "U", "D"), lit("bad_op")),
    when(col("op").isin("I", "U") && col("tokens").isNull, lit("null_tokens")),
    when(
      col("op").isin("I", "U") && col("tokens").isNotNull &&
        col("n_tok") =!= size(col("tokens")).cast(LongType),
      lit("n_tok_mismatch"))
  ))

  case class Split(valid: DataFrame, errors: DataFrame)

  /** Split a conformed batch into valid events and error records.
    * One pass over the input per side; both sides reuse the same scan via
    * the `_reasons` column (no cache needed — the filter is cheap and
    * Catalyst prunes independently per branch).
    * @param extraRules deployment-specific rules composed into the same
    *   reason array: each is a Column evaluating to a reason string
    *   (fail) or null (pass) over the conformed event row — e.g.
    *   [[Contamination.rule]]. Pure Column expressions keep the whole
    *   rule array inside one codegen stage. */
  def apply(
      conformed: DataFrame, commitId: String,
      extraRules: Seq[Column] = Nil): Split = {
    val allReasons =
      if (extraRules.isEmpty) reasons
      else array_compact(concat(reasons, array(extraRules: _*)))
    val tagged = conformed.withColumn("_reasons", allReasons)
    val valid  = tagged.filter(size(col("_reasons")) === 0).drop("_reasons")
    val errors = tagged.filter(size(col("_reasons")) > 0).select(
      lit(commitId).as("commit_id"),
      col("lsn"),
      col("doc_id"),
      concat_ws(";", col("_reasons")).as("reason"),
      to_json(struct(conformed.columns.map(col).toIndexedSeq: _*)).as("raw")
    )
    Split(valid, errors)
  }
}

/** Benchmark-contamination screening as a [[Validate]] rule (round-4
  * verdict next-round #6): docs whose token stream shares too many
  * n-grams with a held-out eval set route to `error_records` with
  * reason `contaminated` — the training corpus must not memorize its
  * own benchmark. Reference analog: the roads-set membership probe
  * routed to an error row (CountyAddressPointETL.py:215-240).
  *
  * This is the PIPELINE surface (per-row Column rule over event token
  * arrays, eval grams inlined as a literal — right up to ~10⁵ grams,
  * the size of a benchmark suite). The corpus-scale OFFLINE screen —
  * broadcast-join against an eval n-gram table — is the
  * `q_contamination` driver query's shape; both compute the identical
  * flag ([[graft.functions.DedupOps.windowHashes]] both ways). */
object Contamination {

  /** A [[Validate]] extra rule: `contaminated` when the row's tokens
    * share ≥ `minShared` distinct `gram`-length windows with
    * `evalGrams` (hashes from [[graft.functions.DedupOps.windowHashes]]
    * over the eval corpus). Delete events never match (no payload). */
  def rule(
      evalGrams: Seq[Long],
      gram: Int = graft.functions.DedupOps.ContamGram,
      minShared: Int = graft.functions.DedupOps.ContamShareMin): Column =
    when(
      col("op").isin("I", "U") && col("tokens").isNotNull &&
        size(array_intersect(
          graft.functions.DedupOps.windowHashes(col("tokens"), gram),
          lit(evalGrams.toArray))) >= minShared,
      lit("contaminated"))
}
