package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * - [[cosine]] — exact similarity via zip_with/aggregate (codegen'd).
  * - brute-force top-k: cross join against a (broadcast) query set —
  *   the correctness baseline.
  * - [[hyperplaneSig]] — random-hyperplane LSH signature with
  *   deterministic pseudo-hyperplanes; bucket-join on the signature is
  *   the scale path (candidates share a bucket → no all-pairs join).
  */
object Similarity {

  /** Cosine similarity of two float-array columns (computed in double). */
  def cosine(a: Column, b: Column): Column = {
    val dot   = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val normA = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val normB = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (normA * normB)
  }

  /** DuckDB twin (list_cosine_similarity computes the same quantity; tiny
    * float divergence → always round/threshold well away from boundaries). */
  def cosineSql(a: String, b: String): String = s"list_cosine_similarity($a, $b)"

  /** Hot-path cosine: the fused single-loop codegen expression
    * [[graft.plans.CosineSim]]. Call `CosineSim.register(spark)` once per
    * session first. Same semantics as [[cosine]]. */
  def cosineFast(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  // ---- deterministic pseudo-random hyperplanes for LSH ----

  val SigBits = 8

  /** Hyperplane j component i = ((i*31 + j*17) % 7) - 3 — integer-valued,
    * exactly reproducible in SQL on both engines. */
  def hyperplaneSig(v: Column, dim: Int): Column =
    aggregate(
      sequence(lit(0), lit(SigBits - 1)),
      lit(0L),
      (acc, j) =>
        acc + when(
          aggregate(
            sequence(lit(1), lit(dim)),
            lit(0.0),
            (a, i) =>
              a + element_at(v, i.cast("int")).cast("double") *
                (((i - 1) * 31 + j * 17) % 7 - lit(3)).cast("double")) > 0,
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L)))

  def hyperplaneSigSql(v: String, dim: Int): String =
    s"""list_sum(list_transform(range(0, $SigBits),
        j -> CASE WHEN list_sum(list_transform(range(1, ${dim + 1}),
                    i -> cast(($v)[i] AS double) * (((i-1)*31 + j*17) % 7 - 3))) > 0
                  THEN (cast(1 AS bigint) << j) ELSE 0 END))"""

  /** IVF-style ANN: assign every vector to its nearest of K coarse
    * centroids (here: the first K vectors as deterministic "trained"
    * centroids — swap in k-means output at scale), then search only
    * within the query's cell. The scale path: per-query candidate set is
    * |cell| ≈ N/K instead of N, and the assignment join broadcasts only
    * the K centroids. */
  def ivfAssign(
      vectors: DataFrame, // (vec_id, embedding)
      k: Int,
      score: (Column, Column) => Column = cosine): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = vectors.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("_sim").desc, col("cent_id"))
    vectors
      .join(broadcast(cents))
      .withColumn("_sim", score(col("embedding"), col("cent")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
  }

  /** Brute-force top-k neighbors for each query vector.
    * The query side is broadcast (tiny); scores carry 4dp rounding for
    * cross-engine comparison. */
  def bruteForceTopK(
      vectors: DataFrame, // (vec_id, embedding)
      queries: DataFrame, // (q_id, q_emb)
      k: Int,
      score: (Column, Column) => Column = cosine): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = vectors
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("score", score(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("score"), 4).as("score"))
  }
}
