package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ingest.Tokenize

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * All hashes are pure arithmetic over the cross-engine word tokens
  * ([[Tokenize]]), so the DuckDB oracle reproduces signatures exactly —
  * no engine-specific hash functions in any dedup path that needs an
  * oracle. (For production-scale entropy, swap TokP/hash params; the
  * operator shapes — shingle → sign → band → bucket-join — are what
  * matter at 100 TB.)
  *
  * Reference analog: the content-hash dedup family
  * (DeletePoints.py:11-40, duplicates.py:20-63) generalized from exact
  * equality to near-duplicate detection.
  */
object DedupOps {
  val P = 2147483647L // 2^31-1, Mersenne prime for the hash family
  /** Mixing multiplier for the hash family: A_i = ((2i+1)·M) mod P.
    * The bare (2i+1) multipliers of rounds 1-2 NEVER WRAP P on this
    * corpus (tokens ≤ ~2300 → shingles < 4·10⁷; products ≤ 31·4·10⁷
    * < P), so every h_i was monotone in s — the minhash minimizer was
    * always the smallest shingle (positions perfectly correlated;
    * banding degenerated to full-signature equality — measured:
    * identical candidate sets for every band config) and the low
    * simhash planes voted on raw parity. Same failure family as round
    * 1's hyperplane collapse; same fix (large multiplier, wraps
    * thousands of times). */
  val M = graft.plans.HyperplaneSigs.M

  // ---- shingles: word-3-gram ints ----

  /** Word-trigram shingles as ints in [0, P). Empty for <3-word docs. */
  def shingles(text: Column): Column =
    shinglesOfTokens(Tokenize.tokens(text))

  /** [[shingles]] over an ALREADY-TOKENIZED array<int> column — the CDC
    * path's spelling (change events carry token arrays, not text; an
    * insert's tokens ARE the doc text's tokens, so signatures agree with
    * the text-side dedup family). */
  def shinglesOfTokens(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 2),
        i =>
          ((element_at(toks, i).cast("long") * 131L +
            element_at(toks, i + 1).cast("long")) * 131L +
            element_at(toks, i + 2).cast("long")) % P))

  /** DuckDB twin of [[shinglesOfTokens]]. */
  def shinglesOfTokensSql(t: String): String =
    s"""(CASE WHEN len($t) < 3 THEN []
         ELSE list_transform(range(1, len($t) - 1),
           i -> ((cast(($t)[i] AS bigint) * 131 + ($t)[i+1]) * 131 + ($t)[i+2]) % $P)
         END)"""

  /** Hot-path twin of [[shingles]]: the fused codegen expression
    * [[graft.plans.ShingleHash]] over the materialized token array —
    * the composed HOF version re-evaluates the whole tokens subtree per
    * element_at inside its lambda (measured 19× at sf0.1; see
    * ShingleHash scaladoc). Call `ShingleHash.register(spark)` first. */
  def shinglesFast(text: Column): Column =
    call_function("graft_shingles", Tokenize.tokens(text))

  def shinglesSql(t: String): String =
    shinglesOfTokensSql(Tokenize.tokensSql(t))

  // ---- MinHash signatures + LSH banding ----
  // Banding follows the standard S-curve: with b bands of r rows
  // (b·r = numHashes), a pair at Jaccard s becomes a candidate with
  // probability 1 − (1 − s^r)^b, which rises steeply around the
  // threshold t* ≈ (1/b)^(1/r). The band config is therefore a TUNABLE
  // derived from the target threshold ([[bandConfigFor]]), not a
  // constant — at 100 TB, sweeping a different near-dup threshold means
  // re-deriving (b, r), never rescanning all pairs. Measured curves for
  // three configs: BENCH minhash_study.

  val NumHashes = 16
  val BandSize  = 4 // default: 4 bands of 4 → t* ≈ 0.71, q_dedup_minhash

  /** The band ROW count r whose S-curve threshold (1/b)^(1/r) lands
    * closest to `threshold`, among divisors of `numHashes`. */
  def bandConfigFor(threshold: Double, numHashes: Int = NumHashes): Int =
    (1 to numHashes).filter(numHashes % _ == 0).minBy { r =>
      val b = numHashes / r
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }

  /** MinHash signature: array of `numHashes` mins of
    * h_i(s) = (s·A_i + i²+7) mod P with A_i = ((2i+1)·[[M]]) mod P.
    * Null-safe: empty shingle set → signature of P (sentinel max). */
  def minhash(sh: Column, numHashes: Int = NumHashes): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        val a = (i.cast("long") * 2L + lit(1L)) * lit(M) % lit(P)
        val hashed = transform(sh, s => (s * a + (i * i + lit(7L))) % P)
        coalesce(array_min(hashed), lit(P))
      })

  def minhashSql(shExpr: String, numHashes: Int = NumHashes): String =
    s"""list_transform(range(0, $numHashes),
        i -> coalesce(list_min(list_transform($shExpr,
          s -> (s * ((i*2+1) * $M % $P) + (i*i+7)) % $P)), $P))"""

  /** LSH band keys: one row key per band, combining the band's signature
    * slice into a single long. Join docs on (band_idx, band_key) to get
    * candidate pairs — the scale path: no all-pairs comparison. */
  def bandKeys(
      sig: Column, numHashes: Int = NumHashes, bandSize: Int = BandSize): Column =
    transform(
      sequence(lit(0), lit(numHashes / bandSize - 1)),
      b =>
        struct(
          b.as("band"),
          aggregate(
            transform(sequence(lit(1), lit(bandSize)), j => element_at(sig, b * bandSize + j)),
            lit(0L),
            (acc, v) => (acc * 131L + v) % P).as("key")))

  def bandKeysSql(
      sigExpr: String, numHashes: Int = NumHashes, bandSize: Int = BandSize): String =
    s"""list_transform(range(0, ${numHashes / bandSize}),
        b -> {'band': b,
              'key': list_reduce(
                list_prepend(cast(0 AS bigint),
                  list_transform(range(1, ${bandSize + 1}), j -> ($sigExpr)[b*$bandSize + j])),
                (acc, v) -> (acc * 131 + v) % $P)})"""

  // ---- SimHash (60-bit, word tokens) ----
  // 60, not 64: bit 63 would wrap Spark's long while DuckDB's list_sum
  // promotes to int128 — cross-engine parity breaks; and 16 bits saturate
  // (accidental dist≤2 collisions + LSH bands too coarse to prune).

  val SimBits = 60

  /** Bit-plane k votes on parity of h_k(s) = (s·A_k + k²+7) mod P
    * (A_k = ((2k+1)·[[M]]) mod P) over
    * the doc's word-trigram SHINGLES, not unigrams: unigram simhash
    * fingerprints the word DISTRIBUTION, and corpora drawn from a shared
    * small vocabulary (like the synthetic docs here) collide at distance
    * 0 between unrelated docs; trigrams are order-sensitive, so unrelated
    * docs land ~Binomial(60, ½) apart while a one-word edit stays within
    * a couple of bits. */
  def simhash(text: Column): Column = {
    val sh = shingles(text)
    aggregate(
      sequence(lit(0), lit(SimBits - 1)),
      lit(0L),
      (acc, k) => {
        val ak = (k.cast("long") * 2L + lit(1L)) * lit(M) % lit(P)
        acc + when(
          aggregate(sh, lit(0L),
            (a, s) =>
              a + (((s * ak +
                (k.cast("long") * k.cast("long") + lit(7L))) % P)
                .bitwiseAND(1L) * 2L - 1L)) > 0,
          call_function("shiftleft", lit(1L), k.cast("int"))).otherwise(lit(0L))
      })
  }

  def simhashSql(t: String): String = {
    val sh = shinglesSql(t)
    s"""list_sum(list_transform(range(0, $SimBits),
        k -> CASE WHEN list_sum(list_transform($sh,
                    s -> (((s * ((k*2+1) * $M % $P) + (k*k+7)) % $P) & 1) * 2 - 1)) > 0
                  THEN (cast(1 AS bigint) << k) ELSE 0 END))"""
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  def hammingSql(a: String, b: String): String = s"bit_count(xor($a, $b))"

  // ---- banded simhash pair join (pairwise near-dup within hamming≤k) ----
  // Pigeonhole: two sigs within hamming ≤ k agree EXACTLY on at least one
  // of k+1 disjoint bit bands, so an equal-band equi-join generates every
  // qualifying pair (recall 1) with bounded candidate output — the scale
  // answer to "emit every pair within distance k" that an all-pairs
  // hamming scan (O(n²)) cannot give. Reference analog: the self
  // theta-join within distance, testing.py:82-114.

  val SimHammingK  = 3
  val SimBands     = SimHammingK + 1 // 4 bands × 15 bits = 60
  val SimBandBits  = SimBits / SimBands
  private val SimBandMask = (1L << SimBandBits) - 1

  /** One struct(band, key) per 15-bit slice of the 60-bit signature. */
  def simBandKeys(sig: Column): Column =
    transform(
      sequence(lit(0), lit(SimBands - 1)),
      b =>
        struct(
          b.as("band"),
          call_function("shiftright", sig, (b * SimBandBits).cast("int"))
            .bitwiseAND(lit(SimBandMask)).as("key")))

  def simBandKeysSql(sigExpr: String): String =
    s"""list_transform(range(0, $SimBands),
        b -> {'band': b, 'key': ($sigExpr >> (b*$SimBandBits)) & $SimBandMask})"""

  // ---- exact n-gram Jaccard ----

  /** |A∩B| / |A∪B| over distinct shingles, rounded 4dp. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    round(
      size(array_intersect(da, db)).cast("double") /
        greatest(size(array_union(da, db)), lit(1)), 4)
  }

  def jaccardSql(a: String, b: String): String =
    s"""round(cast(len(list_intersect(list_distinct($a), list_distinct($b))) AS double)
        / greatest(len(list_distinct(list_concat($a, $b))), 1), 4)"""

  // ---- sliding token-window hashes ----
  // Substring/paragraph-level exact dedup (round-4 verdict next-round
  // #5) + contamination screening (#6) share one primitive: the DISTINCT
  // polynomial hashes of every length-w sliding window of a doc's token
  // array. Sliding (stride 1), not tumbling: a span copied between docs
  // at ARBITRARY alignment still contributes every fully-contained
  // window, so any repeated run of ≥ w tokens shares ≥ 1 window — the
  // alignment-free guarantee tumbling windows cannot give (the
  // Lee-et-al-style substring dedup shape for training corpora).
  // Reference analog: the derived-substring grouping of
  // CreateApartmentDuplicates.py:26-45 (key on a strip of the value,
  // group across rows).

  /** Substring-dedup window length (tokens). */
  val SubWindow = 20
  /** Pairs sharing at least this many distinct windows are flagged. */
  val SubShareMin = 8
  /** Contamination screen n-gram length (the 13-gram convention). */
  val ContamGram = 13
  /** Docs sharing at least this many eval-set n-grams are contaminated. */
  val ContamShareMin = 4

  /** Distinct hashes of all length-`w` sliding windows of `toks`
    * (array<int>): fold((acc·131 + t) mod P) per window. Empty for
    * docs shorter than `w`. O(n·w) via slice-per-offset through
    * interpreted HigherOrderFunctions — the REFERENCE spelling; the
    * corpus-scale queries use [[windowHashesFast]] (the fused O(n)
    * rolling codegen twin, WindowHashesSpec equivalence gate). This
    * spelling stays the default for pure-Column contexts built before
    * any session exists (e.g. `Contamination.rule` in a
    * PipelineConfig), where `call_function` registration is not
    * available. */
  def windowHashes(toks: Column, w: Int): Column =
    when(size(toks) < w, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - w),
        i => aggregate(
          slice(toks, i + 1, lit(w)), lit(0L), (acc, t) => (acc * 131L + t) % P))))

  /** [[windowHashes]] as the fused O(n) rolling-hash codegen expression
    * ([[graft.plans.WindowHashes]]): same values, same first-occurrence
    * order. Call `WindowHashes.register(spark)` once per session. */
  def windowHashesFast(toks: Column, w: Int): Column =
    call_function("graft_window_hashes", toks, lit(w))

  /** DuckDB twin of [[windowHashes]] — MUST stay in lockstep. */
  def windowHashesSql(tokExpr: String, w: Int): String =
    s"""list_distinct(list_transform(range(0, greatest(len($tokExpr) - ${w - 1}, 0)),
        i -> list_reduce(
          list_prepend(cast(0 AS bigint), ($tokExpr)[i+1:i+$w]),
          (a, x) -> (a * 131 + x) % $P)))"""

  // ---- deterministic near-duplicate corpus ----

  /** documents ∪ perturbed variants: docs with id % 7 == 0 get a copy
    * (doc_id + "_v") whose text drops its first word — guaranteed
    * near-dups for the dedup operators to find. Twin: [[variantDocsSql]]. */
  def variantDocs(docs: DataFrame): DataFrame = {
    val base = docs.select(
      Tokenize.docId(col("doc_id")).as("doc_id"),
      col("text"))
    val variants = docs
      .filter(col("doc_id") % 7 === 0)
      .select(
        concat(Tokenize.docId(col("doc_id")), lit("_v")).as("doc_id"),
        expr("substring(text, locate(' ', text) + 1)").as("text"))
    base.unionByName(variants)
  }

  def variantDocsSql: String =
    s"""SELECT ${Tokenize.docIdSql("doc_id")} AS doc_id, text FROM documents
        UNION ALL
        SELECT ${Tokenize.docIdSql("doc_id")} || '_v' AS doc_id,
               substring(text, position(' ' IN text) + 1) AS text
        FROM documents WHERE doc_id % 7 = 0"""

  private def wordsOf(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** documents ∪ planted substring-copy twins: docs with id % 13 == 0
    * get a copy (doc_id + "_s") whose text embeds a 35-word span copied
    * MID-DOC (words 6-40) from doc id+1, followed by 10 of its own
    * words — a guaranteed cross-doc repeated span at an arbitrary
    * alignment for the substring dedup to find. Twin:
    * [[substringCorpusSql]]. */
  def substringCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(
      Tokenize.docId(col("doc_id")).as("doc_id"), col("text"))
    val planted = docs.as("d")
      .join(docs.as("o"), col("o.doc_id") === col("d.doc_id") + 1)
      .filter(col("d.doc_id") % 13 === 0)
      .select(
        concat(Tokenize.docId(col("d.doc_id")), lit("_s")).as("doc_id"),
        concat_ws(" ",
          array_join(slice(wordsOf(col("o.text")), 6, 35), " "),
          array_join(slice(wordsOf(col("d.text")), 1, 10), " ")).as("text"))
    base.unionByName(planted)
  }

  def substringCorpusSql: String = {
    def ws(t: String) =
      s"list_filter(string_split($t, ' '), w -> length(w) > 0)"
    s"""SELECT ${Tokenize.docIdSql("doc_id")} AS doc_id, text FROM documents
        UNION ALL
        SELECT ${Tokenize.docIdSql("d.doc_id")} || '_s' AS doc_id,
               array_to_string((${ws("o.text")})[6:40], ' ') || ' ' ||
                 array_to_string((${ws("d.text")})[1:10], ' ') AS text
        FROM documents d JOIN documents o ON o.doc_id = d.doc_id + 1
        WHERE d.doc_id % 13 = 0"""
  }

  /** documents (flagged: id % 31 == 1 is the EVAL set) ∪ planted
    * contaminated twins: docs with id % 41 == 3 (and not themselves
    * eval) get a copy (doc_id + "_c") opening with the first 25 words of
    * the nearest eval doc at or below their id — ≥ 13 shared 13-grams
    * with the eval set by construction. Columns (doc_id, text, is_eval).
    * Twin: [[contaminationCorpusSql]]. */
  def contaminationCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(
      Tokenize.docId(col("doc_id")).as("doc_id"), col("text"),
      (col("doc_id") % 31 === 1).as("is_eval"))
    val planted = docs.as("d")
      .join(docs.as("e"),
        col("e.doc_id") === col("d.doc_id") - (col("d.doc_id") % 31) + 1)
      .filter(col("d.doc_id") % 41 === 3 && col("d.doc_id") % 31 =!= 1)
      .select(
        concat(Tokenize.docId(col("d.doc_id")), lit("_c")).as("doc_id"),
        concat_ws(" ",
          array_join(slice(wordsOf(col("e.text")), 1, 25), " "),
          array_join(slice(wordsOf(col("d.text")), 1, 15), " ")).as("text"),
        lit(false).as("is_eval"))
    base.unionByName(planted)
  }

  def contaminationCorpusSql: String = {
    def ws(t: String) =
      s"list_filter(string_split($t, ' '), w -> length(w) > 0)"
    s"""SELECT ${Tokenize.docIdSql("doc_id")} AS doc_id, text,
               doc_id % 31 = 1 AS is_eval
        FROM documents
        UNION ALL
        SELECT ${Tokenize.docIdSql("d.doc_id")} || '_c' AS doc_id,
               array_to_string((${ws("e.text")})[1:25], ' ') || ' ' ||
                 array_to_string((${ws("d.text")})[1:15], ' ') AS text,
               false AS is_eval
        FROM documents d
        JOIN documents e ON e.doc_id = d.doc_id - (d.doc_id % 31) + 1
        WHERE d.doc_id % 41 = 3 AND d.doc_id % 31 <> 1"""
  }
}
