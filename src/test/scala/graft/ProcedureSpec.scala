package graft

import graft.streaming.{CdcPipeline, PipelineConfig}
import graft.table.SnapshotTable

/** SQL `CALL graft.<proc>(...)` — the ProcedureCatalog maintenance
  * surface ([[graft.sources.GraftProcedures]]). Each procedure is a shim
  * onto the same library entry point the Scala API uses, so these tests
  * assert the SQL verb's *plumbing* (arg unmarshalling, named/default
  * args, result rows, typed errors) against table state, while the
  * operators' own semantics stay covered by PipelineSpec. */
class ProcedureSpec extends SparkSpec {
  import spark.implicits._

  private def mkPipeline(base: String, mode: String = "mor"): CdcPipeline =
    new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table",
      changeLogDir = s"$base/changelog",
      checkpointDir = s"$base/checkpoint",
      errorDir = s"$base/errors",
      lineageDir = s"$base/lineage",
      numBuckets = 4,
      mode = mode))

  test("CALL history / rollback / compact / rebucket drive the table from SQL") {
    val p    = mkPipeline(tmpDir("sqlproc"))
    val root = p.table.root
    p.applyBatch(Seq(
      (1L, "I", "p-a", Some(Seq(1)), Some(1L), "s"),
      (2L, "I", "p-b", Some(Seq(2, 2)), Some(2L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    p.applyBatch(Seq(
      (3L, "U", "p-a", Some(Seq(9)), Some(1L), "x"),
      (4L, "I", "p-c", Some(Seq(3)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 1L)

    // history: one row per commit, oldest first, lineage intact
    val hist = spark.sql(s"CALL graft.history('$root')").collect()
    val vs   = hist.map(_.getAs[Long]("version")).toSeq
    assert(vs == vs.sorted && vs.distinct == vs, s"versions oldest-first: $vs")
    assert(hist.head.isNullAt(hist.head.fieldIndex("parent")),
      "first snapshot has no parent")
    hist.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("parent") == a.getAs[Long]("version"),
        "each commit's parent is its predecessor")
    }
    assert(hist.last.getAs[Long]("watermark_lsn") == 4L)
    // MOR delta commits report the BASE row count; unfolded events show
    // up in delta_rows until compaction resolves them
    assert(hist.last.getAs[Long]("delta_rows") > 0L)
    assert(hist.forall(_.getAs[Long]("commit_ts") > 0L))

    // compact: MOR deltas fold; result row reports the new commit
    val c = spark.sql(s"CALL graft.compact('$root')").head()
    assert(!c.getAs[Boolean]("skipped") && c.getAs[Long]("row_count") == 3L)
    // idempotent second call: clean table → commit-skip, no new version
    val c2 = spark.sql(s"CALL graft.compact('$root')").head()
    assert(c2.getAs[Boolean]("skipped"))
    assert(c2.getAs[Long]("version") == c.getAs[Long]("version"))

    // rollback: restore batch 0's state (the commit at watermark 2,
    // discovered from history) as a NEW commit (O(1))
    val v0 = hist.find(_.getAs[Long]("watermark_lsn") == 2L)
      .get.getAs[Long]("version")
    val rb = spark.sql(s"CALL graft.rollback('$root', $v0)").head()
    assert(rb.getAs[Long]("restored_version") == v0)
    assert(spark.sql(s"SELECT doc_id FROM graft.`$root`")
      .as[String].collect().toSet == Set("p-a", "p-b"))
    assert(spark.sql(s"SELECT tokens FROM graft.`$root` WHERE doc_id = 'p-a'")
      .as[Seq[Int]].head() == Seq(1), "rollback must restore pre-update payload")

    // rebucket: new bucket count lands in the manifest, rows preserved
    val rbk = spark.sql(s"CALL graft.rebucket('$root', 8)").head()
    assert(rbk.getAs[Int]("num_buckets") == 8)
    assert(SnapshotTable.load(spark, root).current.get.numBuckets == 8)
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 2)
  }

  test("CALL vacuum honors named args; clone claims survive it") {
    val p    = mkPipeline(tmpDir("sqlvac"))
    val root = p.table.root
    p.applyBatch(Seq((1L, "I", "v-a", Some(Seq(1)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    p.applyBatch(Seq((2L, "U", "v-a", Some(Seq(2)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 1L)

    // clone: fork claims the source's current version against vacuum
    val fork = s"${tmpDir("sqlvacfork")}/fork"
    val cl = spark.sql(s"CALL graft.clone('$root', '$fork')").head()
    assert(cl.getAs[String]("target") == fork)
    assert(spark.sql(s"SELECT * FROM graft.`$fork`").count() == 1)

    p.applyBatch(Seq((3L, "I", "v-b", Some(Seq(3)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 2L)

    // named + defaulted args through SQL; grace 0 is safe (no writer)
    val v1 = spark.sql(
      s"CALL graft.vacuum('$root', retain_last => 1, orphan_grace_ms => 0)").head()
    assert(v1.getAs[Int]("files_kept") > 0)
    // clone-claimed version 1 survived: the fork still reads
    assert(spark.sql(s"SELECT * FROM graft.`$fork`").count() == 1)
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 2)

    // release the claim, vacuum again: the shared old version reclaims
    assert(spark.sql(s"CALL graft.release_clone('$root', '$fork')")
      .head().getAs[Boolean]("released"))
    spark.sql(s"CALL graft.vacuum('$root', retain_last => 1, orphan_grace_ms => 0)")
      .collect()
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 2,
      "current version must always survive vacuum")
  }

  test("CALL rejects unknown procedures, namespaces, and relative paths typed") {
    val p    = mkPipeline(tmpDir("sqlprocerr"))
    val root = p.table.root
    p.applyBatch(Seq((1L, "I", "e-a", Some(Seq(1)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)

    // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE;
    // the typed message rides the cause chain
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")

    val eName = intercept[Exception] {
      spark.sql(s"CALL graft.defragment('$root')").collect() }
    assert(chain(eName).contains("no graft procedure"), chain(eName))
    assert(chain(eName).contains("compact"), "error must list what exists")

    val eNs = intercept[Exception] {
      spark.sql(s"CALL graft.sys.history('$root')").collect() }
    assert(chain(eNs).contains("catalog root"), chain(eNs))

    val eRel = intercept[Exception] {
      spark.sql("CALL graft.history('relative/path')").collect() }
    assert(eRel.getMessage.contains("absolute"), eRel.getMessage)

    val eMissing = intercept[Exception] {
      spark.sql(s"CALL graft.history('${tmpDir("sqlprocnone")}/none')").collect() }
    assert(eMissing.getMessage.contains("no graft table"), eMissing.getMessage)

    // NULL numeric args must fail typed, never unbox to 0 — rollback(0)
    // would silently wipe the table back to the empty create snapshot,
    // and vacuum grace 0 would disable the in-flight-writer window
    val eNullV = intercept[Exception] {
      spark.sql(s"CALL graft.rollback('$root', NULL)").collect() }
    assert(eNullV.getMessage.contains("must not be NULL"), eNullV.getMessage)
    assert(spark.sql(s"SELECT * FROM graft.`$root`").count() == 1,
      "NULL rollback must not have touched the table")
    val eNullG = intercept[Exception] {
      spark.sql(s"CALL graft.vacuum('$root', orphan_grace_ms => NULL)").collect() }
    assert(eNullG.getMessage.contains("must not be NULL"), eNullG.getMessage)
    val eNullB = intercept[Exception] {
      spark.sql(s"CALL graft.rebucket('$root', NULL)").collect() }
    assert(eNullB.getMessage.contains("must not be NULL"), eNullB.getMessage)

    // clone onto an existing table: typed guard, not a raw
    // FileAlreadyExistsException from mid-copy
    val other = mkPipeline(tmpDir("sqlprocother"))
    other.applyBatch(Seq((1L, "I", "o-a", Some(Seq(1)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    val eExists = intercept[Exception] {
      spark.sql(s"CALL graft.clone('$root', '${other.table.root}')").collect() }
    assert(eExists.getMessage.contains("already a graft table"), eExists.getMessage)
  }
}
