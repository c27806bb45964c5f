package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native library entry point: injects every graft codegen
  * expression into the session's function registry at session build time,
  * so a user of the library needs NO imperative register calls —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * }}}
  *
  * and then `SELECT graft_simhash(graft_shingles(tokens)) …` works in
  * plain SQL on every session of the cluster. The per-object `register`
  * helpers remain for ad-hoc/test use; this is the deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL/catalog surface: expand spark.read.format("graft") relations
    // into the snapshot-resolve plan (see graft.sources.GraftDataSource)
    ext.injectResolutionRule(session =>
      graft.sources.GraftRelationResolution(session))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - fused cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens) - word-trigram shingle hashes"),
      (exprs: Seq[Expression]) => ShingleHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(shingles) - 60-bit simhash signature"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles[, numHashes]) - minhash signature array"),
      (exprs: Seq[Expression]) =>
        if (exprs.size > 1)
          MinHashSig(exprs.head, exprs(1).eval(null).asInstanceOf[Number].intValue())
        else MinHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "graft_rolling_hash(tokens) - rolling-hash fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sigs"),
      info("graft_hyperplane_sigs",
        "graft_hyperplane_sigs(emb, bits, tables) - multi-table hyperplane LSH signatures"),
      (exprs: Seq[Expression]) => {
        def intOf(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue()
        HyperplaneSigs(exprs.head, intOf(exprs(1)), intOf(exprs(2)))
      }))
  }
}
