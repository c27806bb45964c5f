package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd built-in functions (no UDFs), and
  * every operator has a DuckDB SQL twin (the `...Sql` methods) kept in
  * lockstep so the driver's oracle can replay it exactly.
  */
object TextAnalysis {

  /** Non-empty whitespace-separated words. */
  def words(text: Column): Column = filter(split(text, " "), w => length(w) > 0)
  def wordsSql(t: String): String =
    s"list_filter(string_split($t, ' '), w -> length(w) > 0)"

  // ---- language ID (n-gram/stopword heuristic) ----

  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es"),
    "fr" -> Seq("le", "les", "et", "une", "est", "du"))

  private def langScore(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop.map(lit): _*)))

  /** Best-scoring language, ties broken by list order; "unknown" when no
    * stopword hits at all. */
  def langGuess(text: Column): Column = {
    val ws = words(text)
    val scored = LangStopwords.map { case (l, sw) => (l, langScore(ws, sw)) }
    val maxScore = greatest(scored.map(_._2): _*)
    scored.foldRight(lit("unknown")) { case ((l, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
  }

  def langGuessSql(t: String): String = {
    val ws = wordsSql(t)
    def score(sw: Seq[String]) =
      s"len(list_filter($ws, w -> list_contains([${sw.map(s => s"'$s'").mkString(",")}], w)))"
    val scores = LangStopwords.map { case (l, sw) => (l, score(sw)) }
    val maxExpr = s"greatest(${scores.map(_._2).mkString(",")})"
    // foldRight order: earlier languages win ties (same as langGuess)
    scores.reverse.foldLeft("'unknown'") { case (acc, (l, s)) =>
      s"(CASE WHEN $s = $maxExpr AND $maxExpr > 0 THEN '$l' ELSE $acc END)"
    }
  }

  // ---- quality scoring ----

  /** (n_words, avg_word_len, stopword_ratio, alpha_ratio), ratios rounded
    * to 4dp for cross-engine stability. */
  def qualityCols(text: Column): Seq[Column] = {
    val ws  = words(text)
    val n   = size(ws)
    val en  = LangStopwords.head._2
    val sw  = size(filter(ws, w => w.isin(en.map(lit): _*)))
    val alp = size(filter(ws, w => w.rlike("^[a-z]+$")))
    Seq(
      n.as("n_words"),
      round(aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(n, lit(1)), 4).as("avg_word_len"),
      round(sw.cast("double") / greatest(n, lit(1)), 4).as("stopword_ratio"),
      round(alp.cast("double") / greatest(n, lit(1)), 4).as("alpha_ratio"))
  }

  def qualityColsSql(t: String): String = {
    val ws = wordsSql(t)
    val en = LangStopwords.head._2.map(s => s"'$s'").mkString(",")
    s"""len($ws) AS n_words,
        round(cast(list_sum(list_transform($ws, w -> length(w))) AS double)
          / greatest(len($ws), 1), 4) AS avg_word_len,
        round(cast(len(list_filter($ws, w -> list_contains([$en], w))) AS double)
          / greatest(len($ws), 1), 4) AS stopword_ratio,
        round(cast(len(list_filter($ws, w -> regexp_matches(w, '^[a-z]+$$'))) AS double)
          / greatest(len($ws), 1), 4) AS alpha_ratio"""
  }

  // ---- token counting (whitespace + BPE-ish regex) ----

  /** (ws_tokens, regex_tokens): whitespace split count and a BPE-ish
    * `[a-z]+ | [0-9]+ | other-char` sub-token count. */
  def tokenCountCols(text: Column): Seq[Column] = Seq(
    size(words(text)).as("ws_tokens"),
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("regex_tokens"))

  def tokenCountColsSql(t: String): String =
    s"""len(${wordsSql(t)}) AS ws_tokens,
        len(regexp_extract_all($t, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS regex_tokens"""

  // ---- document fingerprint (rolling polynomial hash) ----

  val FpMod = 1000000007L

  /** Rolling hash over the token stream: fold(acc*31 + tok) % p.
    * Order-sensitive → distinguishes permuted docs, unlike set hashes. */
  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => (acc * 31L + t.cast("long")) % FpMod)

  def fingerprintSql(tokensExpr: String): String =
    s"list_reduce(list_prepend(cast(0 AS bigint), " +
      s"list_transform($tokensExpr, x -> cast(x AS bigint))), " +
      s"(acc, x) -> (acc * 31 + x) % $FpMod)"
}
