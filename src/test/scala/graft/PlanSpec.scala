package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.plans.CosineSim
import graft.table.{Manifest, SnapshotTable}

/** Physical-plan quality gates (the "explain and iterate" discipline):
  * pushdown, pruning, broadcast, codegen — asserted, not eyeballed. */
class PlanSpec extends SparkSpec {

  /** Final plan AFTER execution — under AQE the pre-execution plan has
    * neither final stages nor WholeStageCodegen annotations. */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filters and projection reach the parquet scan (P4/P1)") {
    val plan = planOf("q_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(
      plan.contains("GreaterThan(l_quantity") || plan.contains("IsNotNull(l_quantity"),
      s"quantity predicate not pushed:\n$plan")
    // column pruning: untouched wide columns must not be read
    assert(!plan.contains("l_comment"), "scan reads pruned column l_comment")
  }

  test("dimension join broadcasts (J4) and aggregates split partial/final (A1)") {
    val plan = planOf("q_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(plan.contains("HashAggregate"), "expected hash aggregate")
    // in final-plan strings whole-stage codegen shows as the "*(n)" prefix
    assert(plan.contains("*("), "hot path fell out of codegen")
  }

  test("LWW dedup is a hash aggregate with map-side partial combine (W2)") {
    import graft.ingest.CdcGenerator
    import graft.operators.Dedup
    val plan = Dedup.lww(CdcGenerator.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    // partial_max_by before the exchange, max_by after = map-side combine
    assert(plan.contains("partial_max_by"), s"no partial aggregation:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(doc_id"), "not partitioned by doc_id")
  }

  test("CosineSim (fused codegen) ≡ built-in-composed cosine") {
    import spark.implicits._
    CosineSim.register(spark)
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val both = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(
        round(Similarity.cosine($"a.embedding", $"b.embedding"), 9).as("slow"),
        round(Similarity.cosineFast($"a.embedding", $"b.embedding"), 9).as("fast"))
      .withColumn("diff", abs($"slow" - $"fast"))
    val maxDiff = both.agg(max($"diff")).collect()(0).getDouble(0)
    assert(maxDiff < 1e-9, s"fused cosine diverges: $maxDiff")
    // and it runs inside whole-stage codegen
    val fastDf = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(Similarity.cosineFast($"a.embedding", $"b.embedding").as("s"))
    fastDf.collect()
    val plan = fastDf.queryExecution.executedPlan.toString
    // "*(n) Project [cosinesim(...)" = the expression inside a codegen span
    assert(
      plan.split("\n").exists(l => l.contains("*(") && l.contains("cosinesim")),
      s"CosineSim fell back to interpreted:\n$plan")
  }

  test("MinHashSig (fused codegen) ≡ built-in-composed minhash") {
    import graft.functions.DedupOps
    import graft.plans.MinHashSig
    MinHashSig.register(spark)
    val corpus = DedupOps.variantDocs(
        spark.read.parquet(s"$sf001/documents.parquet").limit(200))
      .withColumn("sh", DedupOps.shingles(col("text")))
    val diff = corpus
      .withColumn("slow", DedupOps.minhash(col("sh")))
      .withColumn("fast", call_function("graft_minhash", col("sh")))
      .filter(col("slow") =!= col("fast"))
      .count()
    assert(diff == 0, s"$diff rows diverge between fused and composed minhash")
  }

  test("SimHashSig (fused codegen) ≡ built-in-composed simhash") {
    import graft.functions.DedupOps
    import graft.plans.SimHashSig
    SimHashSig.register(spark)
    val corpus = DedupOps.variantDocs(
        spark.read.parquet(s"$sf001/documents.parquet").limit(150))
    val diff = corpus
      .withColumn("slow", DedupOps.simhash(col("text")))
      .withColumn("fast",
        call_function("graft_simhash", DedupOps.shingles(col("text"))))
      .filter(col("slow") =!= col("fast"))
      .count()
    assert(diff == 0, s"$diff rows diverge between fused and composed simhash")
  }

  test("snapshot commit is compare-and-swap: a version can be claimed once") {
    import org.apache.spark.sql.types._
    val root = tmpDir("cas")
    val t = SnapshotTable.create(spark, root,
      StructType(Seq(StructField("doc_id", StringType))), numBuckets = 2)
    val m = t.current.get
    val next = m.copy(version = m.version + 1, parent = m.version, commitId = "w1")
    t.commit(next)
    // a racing writer computing the same next version must fail, not clobber
    intercept[Exception] {
      t.commit(next.copy(commitId = "w2"))
    }
    assert(t.current.get.commitId == "w1")
  }
}
