package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupIndex
import graft.streaming.{CdcPipeline, PipelineConfig}

/** Incremental (cross-batch) near-dup detection: the persisted MinHash
  * band index probed per arriving batch (round-4 verdict #1). */
class DedupIndexSpec extends SparkSpec {

  import spark.implicits._

  private def mkPipeline(base: String, policy: String): CdcPipeline =
    new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table",
      changeLogDir = s"$base/changelog",
      checkpointDir = s"$base/checkpoint",
      errorDir = s"$base/errors",
      lineageDir = s"$base/lineage",
      numBuckets = 8,
      nearDupPolicy = policy))

  // ≥3 tokens → non-empty shingles; distinct bases never collide
  private def toks(seed: Int): Seq[Int] =
    (0 until 30).map(i => (seed * 1000 + i * 7) % 65536)

  private def batch(rows: (Long, String, String, Seq[Int])*) =
    rows.toSeq.map { case (lsn, op, doc, t) =>
      (lsn, op, doc, Some(t), Some(t.size.toLong), "s")
    }.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")

  test("near-dup pair split across two micro-batches is flagged (flag policy)") {
    val p = mkPipeline(tmpDir("nd-split"), "flag")
    // batch 0: A (the original) + an unrelated doc
    p.applyBatch(batch(
      (1L, "I", "docA", toks(1)),
      (2L, "I", "docC", toks(2))), 0L)
    // batch 1: B = verbatim copy of A's content, arriving LATER —
    // exactly the case a per-batch one-shot dedup structurally misses
    p.applyBatch(batch(
      (10L, "I", "docB", toks(1)),
      (11L, "I", "docD", toks(3))), 1L)
    val flags = p.readNearDups().collect()
    assert(flags.map(_.getAs[String]("doc_id")).toSet == Set("docB"),
      s"flags: ${flags.mkString(",")}")
    val f = flags.head
    assert(f.getAs[String]("dup_of") == "docA")
    assert(f.getAs[Int]("agree") == graft.functions.DedupOps.NumHashes)
    // flag policy annotates, never rejects: all four docs merged
    assert(p.readTable().select("doc_id").as[String].collect().toSet ==
      Set("docA", "docB", "docC", "docD"))
    // and the flag commit is attributed to batch 1
    assert(f.getAs[String]("commit_id") == "b1")
  }

  test("within-batch near-dups: earlier (lsn, doc_id) wins, later flags") {
    val p = mkPipeline(tmpDir("nd-within"), "flag")
    p.applyBatch(batch(
      (5L, "I", "docY", toks(9)),
      (3L, "I", "docX", toks(9)), // lower lsn → the original
      (7L, "I", "docZ", toks(4))), 0L)
    val flags = p.readNearDups().collect()
    assert(flags.map(r => (r.getAs[String]("doc_id"), r.getAs[String]("dup_of"))).toSet ==
      Set(("docY", "docX")), s"flags: ${flags.mkString(",")}")
  }

  test("quarantine policy: flagged doc's events reject, roster blocks later batches") {
    val p = mkPipeline(tmpDir("nd-quar"), "quarantine")
    p.applyBatch(batch((1L, "I", "docA", toks(1))), 0L)
    // B's insert is a near-dup of A → quarantined, not merged
    p.applyBatch(batch(
      (10L, "I", "docB", toks(1)),
      (11L, "I", "docC", toks(5))), 1L)
    assert(p.readTable().select("doc_id").as[String].collect().toSet ==
      Set("docA", "docC"))
    val errs1 = p.readErrors().filter(col("reason").startsWith("near_dup_of")).collect()
    assert(errs1.map(r => (r.getAs[String]("doc_id"), r.getAs[String]("reason"))).toSet ==
      Set(("docB", "near_dup_of:docA")))
    // a LATER update to the quarantined doc hits the persisted roster —
    // rejected too, even though its content no longer matches anything
    p.applyBatch(batch((20L, "U", "docB", toks(8))), 2L)
    assert(p.readTable().select("doc_id").as[String].collect().toSet ==
      Set("docA", "docC"), "a rostered doc's update must not resurrect it")
    val errs2 = p.readErrors()
      .filter(col("reason").startsWith("near_dup_of") && col("lsn") === 20L).collect()
    assert(errs2.map(_.getAs[String]("doc_id")).toSeq == Seq("docB"))
    // the flag itself is recorded once, in the near-dup side table
    assert(p.readNearDups().select("doc_id").as[String].collect().toSeq == Seq("docB"))
  }

  test("exactly-once: a replayed batch neither re-flags nor double-indexes") {
    val p = mkPipeline(tmpDir("nd-replay"), "flag")
    p.applyBatch(batch((1L, "I", "docA", toks(1))), 0L)
    val s1 = p.applyBatch(batch((10L, "I", "docB", toks(1))), 1L)
    assert(!s1.skipped)
    val flagsBefore = p.readNearDups().collect().toSeq
    // ledger-skip replay of the applied batch
    val s2 = p.applyBatch(batch((10L, "I", "docB", toks(1))), 1L)
    assert(s2.skipped)
    assert(p.readNearDups().collect().toSeq == flagsBefore)
    // a FRESH batch probing the index sees docA and docB once each —
    // no duplicate index rows inflate the candidate set
    p.applyBatch(batch((30L, "I", "docE", toks(1))), 2L)
    val e = p.readNearDups().filter(col("doc_id") === "docE").collect()
    assert(e.length == 1 && e.head.getAs[String]("dup_of") == "docA")
  }

  test("probe IO gate: only touched index buckets of applied commits are read") {
    val base = tmpDir("nd-io")
    val p = mkPipeline(base, "flag")
    p.applyBatch(batch(
      (1L, "I", "docA", toks(1)),
      (2L, "I", "docB", toks(2)),
      (3L, "I", "docC", toks(3)),
      (4L, "I", "docD", toks(4))), 0L)
    val dir = java.nio.file.Paths.get(base, "neardups").toString
    // the probe for a single-doc batch touches ≤ numBands buckets; the
    // path list must cover exactly (applied commits × touched buckets),
    // never the index's full bucket fan
    val bands = DedupIndex.bandRows(
      batch((9L, "I", "docQ", toks(1))).filter(col("op") === "I"))
    val touched = bands.select("_ibkt").distinct().as[Int].collect().toSet
    assert(touched.size <= graft.functions.DedupOps.NumHashes / graft.functions.DedupOps.BandSize)
    val paths = DedupIndex.indexPaths(dir, p.table.appliedCommitIds, touched)
    assert(paths.nonEmpty)
    assert(paths.forall(pth => touched.exists(b => pth.endsWith(s"_ibkt=$b"))),
      s"probe path outside touched buckets: $paths")
    // an index dir whose commit is NOT in the ledger is invisible
    val ghost = DedupIndex.indexPaths(dir, Set("no-such-commit"), touched)
    assert(ghost.isEmpty)
    // and the all-buckets fan is strictly larger than the probe's slice
    // whenever the batch misses buckets (sanity that pruning is real)
    val all = DedupIndex.indexPaths(
      dir, p.table.appliedCommitIds, (0 until DedupIndex.IndexBuckets).toSet)
    assert(paths.size <= all.size)
  }

  test("index compaction folds applied dirs into one; probe results unchanged") {
    val base = tmpDir("nd-compact")
    val p = mkPipeline(base, "flag")
    (0 until 5).foreach { b =>
      p.applyBatch(batch((b * 10L + 1, "I", s"doc$b", toks(b))), b.toLong)
    }
    val dir = java.nio.file.Paths.get(base, "neardups").toString
    val applied = p.table.appliedCommitIds
    assert(DedupIndex.commitDirCount(dir, applied) == 5)
    val head = p.table.current.get.commitId
    val folded = DedupIndex.compact(spark, dir, applied, head)
    assert(folded == 5)
    assert(DedupIndex.commitDirCount(dir, applied) == 1)
    // a fresh near-dup batch still matches against the folded index
    p.applyBatch(batch((100L, "I", "docDup", toks(2))), 9L)
    val f = p.readNearDups().filter(col("doc_id") === "docDup").collect()
    assert(f.length == 1 && f.head.getAs[String]("dup_of") == "doc2")
  }

  test("update/delete-only batches skip the near-dup stage entirely") {
    val base = tmpDir("nd-skip")
    val p = mkPipeline(base, "flag")
    p.applyBatch(batch((1L, "I", "docA", toks(1))), 0L)
    p.applyBatch(batch((10L, "U", "docA", toks(6))), 1L)
    // only batch 0 wrote index rows
    val idxRoot = java.nio.file.Paths.get(base, "neardups", "index")
    val commits = graft.table.Fs.listDir(idxRoot)
      .flatMap(d => DedupIndex.commitOf(d.getFileName.toString))
    assert(commits == Seq("b0"), s"index commits: $commits")
  }
}
