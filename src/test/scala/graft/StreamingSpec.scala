package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.ingest.CdcGenerator
import graft.operators.Conform
import graft.streaming.StreamOps

/** Streaming operator semantics: watermarked event-time windows and
  * mapGroupsWithState keyed state — each checked against its own batch
  * twin over the identical input. */
class StreamingSpec extends SparkSpec {

  private def stageChangeLog(base: String): String = {
    CdcGenerator.writeBatches(spark, sf0001, s"$base/changelog", batches = 3)
    s"$base/changelog"
  }

  // few files per trigger → several micro-batches, so the watermark
  // actually advances (append-mode emission needs a NEXT batch)
  private def readStreamOf(dir: String) =
    spark.readStream.schema(Conform.EventSchema)
      .option("maxFilesPerTrigger", 2)
      .parquet(s"$dir/batch-*")

  test("watermarked tumbling-window agg ≡ batch agg over the same events") {
    val base = tmpDir("win")
    val dir  = stageChangeLog(base)

    val q = StreamOps.opCountsByWindow(readStreamOf(dir)).writeStream
      .format("memory").queryName("win_metrics")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Append mode only emits windows the watermark has CLOSED; compare on
    // the emitted ones — every emitted row must equal its batch twin, and
    // at least one window must have closed.
    val got = spark.table("win_metrics")
      .select("window_start", "op", "n_events", "max_lsn")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty, "no windows closed — watermark never advanced")
    val want = StreamOps.opCountsByWindow(spark.read.schema(Conform.EventSchema)
        .parquet(s"$dir/batch-*"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    got.foreach { case (k, v) =>
      assert(want.get(k).contains(v), s"window $k: stream=$v batch=${want.get(k)}")
    }
  }

  test("event-time TTL evicts idle keyed state and restarts evicted keys") {
    val base = tmpDir("ttl")
    val dir  = stageChangeLog(base)

    // event times jump ~10,000 s between reps (ts = lsn/1000, rep stride
    // 10M), so a 60 s TTL evicts any doc idle across a rep boundary once
    // the watermark moves — deterministically, no wall clock involved
    val q = StreamOps.docProgressWithTtl(spark, readStreamOf(dir), ttlMs = 60000L)
      .writeStream
      .format("memory").queryName("doc_prog_ttl")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("doc_prog_ttl").collect()
    val evicted = rows.filter(_.getAs[Boolean]("evicted")).map(_.getAs[String]("doc_id"))
    assert(evicted.nonEmpty, "no state evicted — TTL never fired")

    // a doc with events AFTER its eviction restarts its count from zero:
    // its max n_events over post-eviction rows < its total event count
    val total = spark.read.schema(Conform.EventSchema).parquet(s"$dir/batch-*")
      .filter(col("doc_id").isNotNull)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reborn = rows.groupBy(_.getAs[String]("doc_id")).collect {
      case (doc, rs) if rs.exists(_.getAs[Boolean]("evicted")) &&
        total.getOrElse(doc, 0L) > 1L =>
        doc -> rs.filterNot(_.getAs[Boolean]("evicted")).map(_.getAs[Long]("n_events")).max
    }
    val split = reborn.filter { case (doc, maxRun) => maxRun < total(doc) }
    assert(split.nonEmpty,
      "expected at least one evicted doc whose later events restarted the count")
    // bounded-state invariant: nothing survives the whole stream uncounted
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") > 0L || r.getAs[Boolean]("evicted"))
    }
  }

  test("mapGroupsWithState doc progress ≡ batch fold over the same events") {
    val base = tmpDir("mgws")
    val dir  = stageChangeLog(base)

    val got = StreamOps.runDocProgress(spark, readStreamOf(dir), s"$base/ckpt", "doc_prog")
      .collect().map(r => r.getAs[String]("doc_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("last_lsn"), r.getAs[Boolean]("deleted"))))
      .toMap

    val want = spark.read.schema(Conform.EventSchema).parquet(s"$dir/batch-*")
      .filter(col("doc_id").isNotNull)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n"),
        max(col("lsn")).as("last"),
        (max_by(col("op"), col("lsn")) === "D").as("del"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    assert(got.keySet == want.keySet,
      s"key drift: +${(got.keySet -- want.keySet).take(3)} -${(want.keySet -- got.keySet).take(3)}")
    got.foreach { case (k, v) =>
      assert(want(k) == v, s"doc $k: stream=$v batch=${want(k)}")
    }
  }

  test("graft changelog stream ≡ batch changesSince; restart resumes exactly") {
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import spark.implicits._
    val base = tmpDir("chstream")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch((1L, "I", "s-a", Some(Seq(1)), Some(1L), "s")), 0L)
    val v1 = p.table.currentVersion.get
    p.applyBatch(batch(
      (2L, "I", "s-b", Some(Seq(2)), Some(1L), "s"),
      (3L, "U", "s-a", Some(Seq(9)), Some(1L), "s")), 1L)
    p.applyBatch(batch((4L, "D", "s-b", None, None, "s")), 2L)

    // foreachBatch sink (checkpoint-recoverable, unlike the memory sink):
    // each run collects only the rows IT processed, so re-delivery of an
    // already-checkpointed window would surface as extra rows
    def runStream(): Set[Seq[Any]] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
      val q = spark.readStream.format("graft")
        .option("startingVersion", v1)
        .load(s"$base/table")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("doc_id", "lsn", "op").collect().foreach(r => got.add(r.toSeq))
          ()
        }
        .start()
      q.awaitTermination()
      import scala.collection.JavaConverters._
      got.iterator().asScala.toSet
    }

    val got1 = runStream()
    val want = MergeOnRead.changesSince(p.table, v1)
      .select("doc_id", "lsn", "op").collect().map(_.toSeq).toSet
    assert(got1 == want && want.nonEmpty, s"streamed ≠ batch: $got1 vs $want")
    // the persisted starting version must live INSIDE the checkpoint
    // (metadataPath arrives as a file: URI — treating it as a relative
    // path would silently anchor the file under the process CWD)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/ckpt/sources/0/graft-initial-version")),
      "initial-version file must be anchored inside the checkpoint dir")

    // restart from the SAME checkpoint after new commits: exactly the
    // new window arrives, nothing re-delivered
    val vMid = p.table.currentVersion.get
    p.applyBatch(batch((5L, "I", "s-c", Some(Seq(3)), Some(1L), "s")), 3L)
    val got2 = runStream()
    val wantTail = MergeOnRead.changesSince(p.table, vMid)
      .select("doc_id", "lsn", "op").collect().map(_.toSeq).toSet
    assert(got2 == wantTail,
      s"restart must deliver exactly the unprocessed window: $got2 vs $wantTail")
    assert(got2.map(_(0)) == Set("s-c"))
  }

  test("changelog stream rate-limits by versions and fails typed on vacuumed windows") {
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import spark.implicits._
    val base = tmpDir("chstream2")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    def batch(lsn: Long, id: String) =
      Seq((lsn, "I", id, Some(Seq(1)), Some(1L), "s"))
        .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch(1, "r-a"), 0L)
    val v1 = p.table.currentVersion.get
    p.applyBatch(batch(2, "r-b"), 1L)
    p.applyBatch(batch(3, "r-c"), 2L)
    p.applyBatch(batch(4, "r-d"), 3L)

    // maxVersionsPerTrigger=1 → one micro-batch per table version
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft")
      .option("startingVersion", v1)
      .option("maxVersionsPerTrigger", 1)
      .load(s"$base/table")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt-rate")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add(df.count()); ()
      }
      .start()
    q.awaitTermination()
    import scala.collection.JavaConverters._
    val counts = batches.iterator().asScala.toSeq
    // one micro-batch PER TABLE VERSION in the range (event-free versions
    // like the MOR auto-fold surface as empty batches — version
    // granularity is the rate-limit contract)
    val versionsInRange = p.table.versions.count(_ > v1)
    assert(counts.size == versionsInRange,
      s"expected $versionsInRange single-version batches, got $counts")
    assert(counts.sum == 3 && counts.forall(_ <= 1L),
      s"three inserts, at most one per version batch: $counts")

    // vacuumed window: the stream fails with the typed exception in the
    // cause chain, not a raw FileNotFound mid-task
    graft.operators.MergeOnRead.compact(p.table, "chs-compact")
    p.table.vacuum(retainVersions = 1, orphanGraceMillis = 0L)
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", v1)
      .load(s"$base/table")
      .writeStream.format("memory").queryName("ch_vac")
      .option("checkpointLocation", s"$base/ckpt-vac")
      .trigger(Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[graft.table.VacuumedVersionException]),
      s"expected VacuumedVersionException in: ${causes(e).map(_.getClass.getSimpleName)}")
  }

  test("changelog stream null-fills pinned columns in windows predating their addition") {
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import spark.implicits._
    val base = tmpDir("chevolve")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    p.applyBatch(Seq((1L, "I", "ev-a", Some(Seq(1)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    val v1 = p.table.currentVersion.get
    p.applyBatch(Seq((2L, "I", "ev-b", Some(Seq(2)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 1L)
    // schema evolution: batch 2 adds an `extra` column
    p.applyBatch(Seq((3L, "I", "ev-c", Some(Seq(3)), Some(1L), "s", "bonus"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source", "extra"), 2L)

    // the stream pins the POST-evolution schema (it starts at head), but
    // rate limiting makes its early micro-batches cover PRE-evolution
    // windows — those must null-fill `extra`, not wedge the stream
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[String])]()
    val q = spark.readStream.format("graft")
      .option("startingVersion", v1)
      .option("maxVersionsPerTrigger", 1)
      .load(s"$base/table")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("doc_id", "extra").collect().foreach(r =>
          rows.add((r.getString(0), Option(r.getString(1)))))
        ()
      }
      .start()
    q.awaitTermination()
    import scala.collection.JavaConverters._
    val got = rows.iterator().asScala.toMap
    assert(got == Map("ev-b" -> None, "ev-c" -> Some("bonus")),
      s"pre-evolution window must null-fill the pinned column: $got")
  }

  test("authenticated connector (S3b): typed pre-flight auth, redaction, stream parity") {
    import graft.ingest.{CdcGenerator, Connector, ConnectorAuthException, ConnectorConfig}
    val base = tmpDir("conn")
    CdcGenerator.writeBatches(spark, sf0001, s"$base/changelog", batches = 2)

    // no secrets file → typed, actionable, secret-free failure
    val cfg0 = ConnectorConfig(s"$base/changelog", "org1", "svc", s"$base/nope.json")
    val e0 = intercept[ConnectorAuthException] { Connector.openBatch(spark, cfg0) }
    assert(e0.getMessage.contains("not found"))

    // wrong user in secrets → typed mismatch, password never in message
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/secrets.json"),
      """{"user": "other", "password": "hunter2"}""")
    val cfg1 = ConnectorConfig(s"$base/changelog", "org1", "svc", s"$base/secrets.json")
    val e1 = intercept[ConnectorAuthException] { Connector.openBatch(spark, cfg1) }
    assert(!e1.getMessage.contains("hunter2"))

    // valid secrets → the source opens and matches a direct read
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/secrets.json"),
      """{"user": "svc", "password": "hunter2"}""")
    val got = Connector.openBatch(spark, cfg1).count()
    val want = spark.read.schema(graft.operators.Conform.EventSchema)
      .parquet(s"$base/changelog/batch-*").count()
    assert(got == want && got > 0)
    assert(Connector.openStream(spark, cfg1).isStreaming)

    // redaction: config renders without path or secret material
    val s = cfg1.toString
    assert(!s.contains("secrets.json") && !s.contains("hunter2") &&
      s.contains("<redacted>"))
  }

  test("changelog stream starts under a checkpoint path with URI-hostile characters") {
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import spark.implicits._
    // Spark passes metadataPath as a Hadoop Path string, which never
    // percent-encodes: a space or '%' in the checkpoint dir blew up the
    // old java.net.URI.create parse before the stream could start
    val base = tmpDir("ch space %dir")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    p.applyBatch(Seq((1L, "I", "sp-a", Some(Seq(1)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    val v0 = p.table.currentVersion.get
    p.applyBatch(Seq((2L, "I", "sp-b", Some(Seq(2)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 1L)
    val q = spark.readStream.format("graft")
      .option("startingVersion", v0)
      .load(s"$base/table")
      .writeStream.format("memory").queryName("ch_space")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("ch_space").count() == 1, "one insert after v0")
    // and the version marker anchored inside the hostile-path checkpoint
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/ckpt/sources/0/graft-initial-version")),
      "initial-version file must be anchored inside the checkpoint dir")
  }

  test("graft streaming sink: exactly-once upserts, cross-batch LWW, ledger-skipped replays") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeOnRead
    import graft.table.SnapshotTable
    import spark.implicits._
    val base = tmpDir("snk")
    val root = s"$base/table"
    SnapshotTable.create(spark, root, StructType(Seq(
      StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", LongType), StructField("source", StringType))), numBuckets = 4)

    def events(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    val evSchema = events().schema

    // wave 1 over two files → two micro-batches at maxFilesPerTrigger=1
    events((1L, "I", "d-a", Some(Seq(1)), Some(1L), "s"),
           (2L, "I", "d-b", Some(Seq(2)), Some(1L), "s"))
      .write.parquet(s"$base/in/w1")
    events((3L, "U", "d-a", Some(Seq(9)), Some(1L), "s2")).write.parquet(s"$base/in/w2")

    def runStream(): Unit = {
      val q = spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in/*")
        .writeStream.format("graft")
        .option("path", root)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def state(): Set[(String, String, Long, String)] =
      MergeOnRead.liveView(SnapshotTable.load(spark, root))
        .select(col("doc_id"), concat_ws(",", col("tokens")).as("t"),
          col("n_tok"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSet
    def version(): Long = SnapshotTable.load(spark, root).currentVersion.get

    runStream()
    assert(state() == Set(("d-a", "9", 1L, "s2"), ("d-b", "2", 1L, "s")),
      s"streamed state drifted: ${state()}")
    val v1 = version()

    // restart, no new data: nothing re-delivered, no new commits
    runStream()
    assert(version() == v1, "empty restart must not commit")

    // wave 2: an out-of-order LOWER-lsn update must NOT win (cross-batch
    // LWW by lsn, the engine's core CDC semantic), and a delete lands
    events((0L, "U", "d-b", Some(Seq(7)), Some(1L), "old"),
           (4L, "D", "d-a", None, None, "s"))
      .write.parquet(s"$base/in/w3")
    runStream()
    assert(state() == Set(("d-b", "2", 1L, "s")),
      s"cross-batch LWW drifted: ${state()}")

    // ledger: a replayed batchId through a FRESH sink instance (= restart
    // re-offering the last batch) applies exactly once
    val params = Map("path" -> root, "checkpointLocation" -> s"$base/ckpt")
    def mkSink(mode: OutputMode = OutputMode.Append()) =
      new graft.sources.GraftDataSource().createSink(spark.sqlContext, params, Nil, mode)
    val replay = events((99L, "I", "d-z", Some(Seq(5)), Some(1L), "s"))
    val v2 = version()
    val s1 = mkSink(); s1.addBatch(1000L, replay)
    assert(version() == v2 + 1)
    s1.addBatch(1000L, replay)               // within-run duplicate
    mkSink().addBatch(1000L, replay)         // cross-run replay → ledger skip
    assert(version() == v2 + 1, "replayed batch must be ledger-skipped")
    assert(state().contains(("d-z", "5", 1L, "s")))

    // outside the dialect fails typed
    intercept[IllegalArgumentException] { mkSink(OutputMode.Complete()) }
    intercept[IllegalArgumentException] {
      new graft.sources.GraftDataSource().createSink(
        spark.sqlContext, params, Seq("source"), OutputMode.Append())
    }
  }

  test("changelog source → upsert sink: one-statement table replication converges") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import graft.table.SnapshotTable
    import spark.implicits._
    val base = tmpDir("repl")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/a", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch((1L, "I", "x-a", Some(Seq(1)), Some(1L), "s"),
                       (2L, "I", "x-b", Some(Seq(2)), Some(1L), "s")), 0L)
    p.applyBatch(batch((3L, "U", "x-a", Some(Seq(9)), Some(1L), "s2"),
                       (4L, "D", "x-b", None, None, "s")), 1L)

    val rootB = s"$base/b"
    SnapshotTable.create(spark, rootB, StructType(Seq(
      StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", LongType), StructField("source", StringType))), numBuckets = 4)

    // the replication one-liner: tail A's changelog, upsert into B —
    // the changelog's (payload, lsn, op) rows ARE the sink's verbatim
    // change-batch contract, so the two streaming halves compose with
    // no glue code
    val fromV = p.table.versions.min
    def replicate(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", fromV)
        .load(s"$base/a")
        .writeStream.format("graft")
        .option("path", rootB)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def live(root: String): Set[(String, String, Long, String)] =
      MergeOnRead.liveView(SnapshotTable.load(spark, root))
        .select(col("doc_id"), concat_ws(",", col("tokens")).as("t"),
          col("n_tok"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSet

    replicate()
    assert(live(rootB) == live(s"$base/a") && live(rootB).nonEmpty,
      s"replica drifted: ${live(rootB)} vs ${live(s"$base/a")}")

    // catch-up run after more commits (delete of a live doc + fresh
    // insert): only the new window streams, and the replica converges
    p.applyBatch(batch((5L, "I", "x-c", Some(Seq(3)), Some(1L), "s"),
                       (6L, "D", "x-a", None, None, "s")), 2L)
    replicate()
    assert(live(rootB) == live(s"$base/a"),
      s"catch-up drifted: ${live(rootB)} vs ${live(s"$base/a")}")
    assert(live(rootB).map(_._1) == Set("x-c"))

    // source-side maintenance that applies NO events (compaction +
    // rebucket) must pass through the stream as empty windows — the
    // replica converges across them without drama
    MergeOnRead.compact(p.table, "repl-rebucket", rebucketTo = Some(16))
    p.applyBatch(batch((7L, "U", "x-c", Some(Seq(8)), Some(1L), "s")), 3L)
    replicate()
    assert(live(rootB) == live(s"$base/a"),
      s"rebucket window drifted: ${live(rootB)} vs ${live(s"$base/a")}")
  }

  test("initialSnapshot replication carries schema evolution across the anchor") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import graft.table.SnapshotTable
    import spark.implicits._
    val base = tmpDir("snapevolve")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/src", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    p.applyBatch(Seq((1L, "I", "se-a", Some(Seq(1)), Some(1L), "s"),
                     (2L, "I", "se-b", Some(Seq(2)), Some(1L), "s"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source"), 0L)
    val vAnchor = p.table.currentVersion.get
    // evolution happens AFTER the anchor: the tail's commits carry the
    // added column, the anchor's snapshot predates it
    p.applyBatch(Seq((3L, "U", "se-a", Some(Seq(9)), Some(1L), "s2", "bonus"),
                     (4L, "I", "se-c", Some(Seq(3)), Some(1L), "s", "extra3"))
      .toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source", "extra"), 1L)

    // replica starts NARROW (pre-evolution payload): the sink's merge
    // must evolve it additively as the stream delivers the wider frames
    val rootB = s"$base/replica"
    SnapshotTable.create(spark, rootB, StructType(Seq(
      StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", LongType), StructField("source", StringType))), numBuckets = 4)
    val q = spark.readStream.format("graft")
      .option("startingVersion", vAnchor)
      .option("initialSnapshot", "true")
      .load(s"$base/src")
      .writeStream.format("graft")
      .option("path", rootB)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def live(root: String): Set[(String, String, Option[String])] =
      MergeOnRead.liveView(SnapshotTable.load(spark, root))
        .select(col("doc_id"), concat_ws(",", col("tokens")).as("t"), col("extra"))
        .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
        .toSet
    assert(live(rootB) == live(s"$base/src"),
      s"evolved replica drifted: ${live(rootB)} vs ${live(s"$base/src")}")
    assert(live(rootB) == Set(("se-a", "9", Some("bonus")),
                              ("se-b", "2", None),
                              ("se-c", "3", Some("extra3"))),
      s"snapshot rows null-fill the post-anchor column, tail rows carry it: ${live(rootB)}")
  }

  test("initialSnapshot ⊕ tail ≡ source live view at EVERY anchor version") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import graft.table.SnapshotTable
    import spark.implicits._
    val base = tmpDir("anchorsweep")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/src", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    // a history that exercises every event shape across the anchor
    // boundary: insert, update, delete, re-insert after delete, and a
    // no-event maintenance commit (compaction) in the middle
    p.applyBatch(batch((1L, "I", "v-a", Some(Seq(1)), Some(1L), "s"),
                       (2L, "I", "v-b", Some(Seq(2)), Some(1L), "s")), 0L)
    p.applyBatch(batch((3L, "U", "v-a", Some(Seq(9)), Some(1L), "s2"),
                       (4L, "D", "v-b", None, None, "s")), 1L)
    MergeOnRead.compact(p.table, "anchorsweep-fold")
    p.applyBatch(batch((5L, "I", "v-b", Some(Seq(7)), Some(1L), "s3"),
                       (6L, "D", "v-a", None, None, "s")), 2L)

    def live(root: String): Set[(String, String, Long, String)] =
      MergeOnRead.liveView(SnapshotTable.load(spark, root))
        .select(col("doc_id"), concat_ws(",", col("tokens")).as("t"),
          col("n_tok"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSet

    // genesis (empty snapshot, full tail) through head (full snapshot,
    // empty tail) — the composition must converge at every cut point
    p.table.versions.foreach { v =>
      val rootB = s"$base/replica-v$v"
      SnapshotTable.create(spark, rootB, StructType(Seq(
        StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
        StructField("n_tok", LongType), StructField("source", StringType))), numBuckets = 4)
      val q = spark.readStream.format("graft")
        .option("startingVersion", v)
        .option("initialSnapshot", "true")
        .load(s"$base/src")
        .writeStream.format("graft")
        .option("path", rootB)
        .option("checkpointLocation", s"$base/ckpt-v$v")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(live(rootB) == live(s"$base/src"),
        s"anchor v$v drifted: ${live(rootB)} vs ${live(s"$base/src")}")
    }
  }

  test("initialSnapshot stream: snapshot batch 0 + tail replicate a vacuum-truncated table") {
    import org.apache.spark.sql.types._
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import graft.table.SnapshotTable
    import spark.implicits._
    val base = tmpDir("snaprepl")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/a", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 8, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch((1L, "I", "n-a", Some(Seq(1)), Some(1L), "s"),
                       (2L, "I", "n-b", Some(Seq(2)), Some(1L), "s")), 0L)
    p.applyBatch(batch((3L, "U", "n-a", Some(Seq(9)), Some(1L), "s2"),
                       (4L, "D", "n-b", None, None, "s")), 1L)
    // truncate the READABLE history: compact + vacuum to the head, so a
    // full-history replay (startingVersion=earliest) fails typed on the
    // vacuumed window — standing up a new replica needs initialSnapshot
    MergeOnRead.compact(p.table, "snaprepl-fold")
    p.table.vacuum(retainVersions = 1, orphanGraceMillis = 0L)

    // the honest failure: earliest WITHOUT the snapshot batch replays
    // into the vacuumed window and fails typed (VacuumedWindow names
    // initialSnapshot as the fix) — not a silently incomplete replica
    val trunc = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "earliest")
        .load(s"$base/a")
        .writeStream.option("checkpointLocation", s"$base/ckpt-earliest-gate")
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName("snaprepl_trunc").start()
      q.awaitTermination()
    }
    assert(Iterator.iterate(trunc: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(c => c.getMessage != null && c.getMessage.contains("initialSnapshot")),
      s"earliest on truncated history must fail typed naming initialSnapshot: $trunc")

    val rootB = s"$base/b"
    SnapshotTable.create(spark, rootB, StructType(Seq(
      StructField("doc_id", StringType), StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", LongType), StructField("source", StringType))), numBuckets = 4)

    // the head the first stream anchors at (default anchor = head at
    // first start); the second-stream discriminator below re-anchors here
    val vAnchor = p.table.currentVersion.get

    def replicate(): Unit = {
      val q = spark.readStream.format("graft")
        .option("initialSnapshot", "true")
        .load(s"$base/a")
        .writeStream.format("graft")
        .option("path", rootB)
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def live(root: String): Set[(String, String, Long, String)] =
      MergeOnRead.liveView(SnapshotTable.load(spark, root))
        .select(col("doc_id"), concat_ws(",", col("tokens")).as("t"),
          col("n_tok"), col("source"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
        .toSet

    replicate()
    assert(live(rootB) == live(s"$base/a") && live(rootB).nonEmpty,
      s"snapshot replica drifted: ${live(rootB)} vs ${live(s"$base/a")}")
    // snapshot rows landed at their ORIGINAL lsns, not re-stamped — the
    // property the bootstrap⊕tail composition argument rests on
    val lsns = MergeOnRead.resolve(SnapshotTable.load(spark, rootB))
      .select(col("doc_id"), col(graft.operators.Merge.LsnCol))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(lsns("n-a") == 3L, s"snapshot row must keep its source lsn: $lsns")
    // anchor + mode pinned atomically inside the checkpoint
    val pin = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/ckpt/sources/0/graft-initial-version")))
    assert(pin.linesIterator.toSeq.map(_.trim).contains("snapshot"),
      s"snapshot mode must be pinned in the checkpoint: '$pin'")

    // catch-up: a fresh insert plus a STALE update of n-a (lsn 2 < its
    // live lsn 3) — the below-watermark leg drops the provably-superseded
    // event SOURCE-side, so the replica converges without ever seeing it
    p.applyBatch(batch((6L, "I", "n-c", Some(Seq(3)), Some(1L), "s"),
                       (2L, "U", "n-a", Some(Seq(5)), Some(1L), "old")), 2L)
    replicate()
    assert(live(rootB) == live(s"$base/a"),
      s"catch-up drifted: ${live(rootB)} vs ${live(s"$base/a")}")
    assert(live(rootB).exists(r => r._1 == "n-a" && r._2 == "9"),
      s"stale lsn-2 update must lose LWW on the replica: ${live(rootB)}")

    // an idle restart re-delivers nothing: no batch, no replica commit
    val vB = SnapshotTable.load(spark, rootB).currentVersion.get
    replicate()
    assert(SnapshotTable.load(spark, rootB).currentVersion.get == vB,
      "idle restart must not re-deliver the snapshot or commit anything")

    // the original-lsn discriminator: advance n-a at the source (lsn 7)
    // and catch the replica up, then run a SECOND stream from a fresh
    // checkpoint anchored back at vAnchor — its batch 0 re-delivers the
    // OLD snapshot (n-a tokens 9 @ lsn 3, stale vs the replica's lsn-7
    // state, and no n-c at all). Only because snapshot rows carry their
    // ORIGINAL lsns does LWW absorb the redelivery: re-stamped rows
    // (w+1 > 7) would roll n-a back to tokens 9 and win over the tail's
    // re-delivered lsn-7 event, and a state-overwrite bootstrap would
    // drop n-c
    p.applyBatch(batch((7L, "U", "n-a", Some(Seq(4)), Some(1L), "s3")), 3L)
    replicate()
    assert(live(rootB).exists(r => r._1 == "n-a" && r._2 == "4"))
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", vAnchor)
      .option("initialSnapshot", "true")
      .load(s"$base/a")
      .writeStream.format("graft")
      .option("path", rootB)
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(live(rootB) == live(s"$base/a"),
      s"stale snapshot redelivery regressed the replica: ${live(rootB)} vs ${live(s"$base/a")}")
    assert(live(rootB).exists(r => r._1 == "n-a" && r._2 == "4"),
      s"re-delivered lsn-3 snapshot row must lose to the replica's lsn-7 state: ${live(rootB)}")
  }

  test("startingVersion=earliest replays retained history; snapshot batch 0 stands alone") {
    import graft.operators.MergeOnRead
    import graft.streaming.{CdcPipeline, PipelineConfig}
    import spark.implicits._
    val base = tmpDir("earliest")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 4, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch((1L, "I", "e-a", Some(Seq(1)), Some(1L), "s")), 0L)
    val v1 = p.table.currentVersion.get
    p.applyBatch(batch((2L, "I", "e-b", Some(Seq(2)), Some(1L), "s")), 1L)
    p.applyBatch(batch((3L, "U", "e-a", Some(Seq(9)), Some(1L), "s")), 2L)

    def collect(opts: Map[String, String], ckpt: String): Seq[Set[(String, Long, String)]] = {
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[(String, Long, String)]]()
      val reader = spark.readStream.format("graft")
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load(s"$base/table")
        .writeStream
        .option("checkpointLocation", s"$base/$ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(df.select("doc_id", "lsn", "op").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet)
          ()
        }
        .start()
      q.awaitTermination()
      import scala.collection.JavaConverters._
      batches.iterator().asScala.toSeq
    }

    // 'earliest' ≡ the oldest retained version — full-history replay
    val earliest = collect(Map("startingVersion" -> "earliest"), "ckpt-earliest")
    val wantAll = MergeOnRead.changesSince(p.table, p.table.versions.min)
      .select("doc_id", "lsn", "op").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(earliest.flatten.toSet == wantAll && wantAll.size == 3,
      s"earliest replay: ${earliest.flatten.toSet} vs $wantAll")

    // initialSnapshot anchored mid-history under a version rate limit:
    // batch 0 is the anchor's live view ALONE (op='U' at original lsns),
    // then exactly one version per batch
    val rated = collect(Map(
      "initialSnapshot" -> "true", "startingVersion" -> v1.toString,
      "maxVersionsPerTrigger" -> "1"), "ckpt-snaprate")
    val versionsAfter = p.table.versions.count(_ > v1)
    assert(rated.size == 1 + versionsAfter,
      s"snapshot batch + one batch per version, got ${rated.size}: $rated")
    assert(rated.head == Set(("e-a", 1L, "U")),
      s"batch 0 must be the anchor live view at original lsns: ${rated.head}")
    assert(rated.tail.flatten.toSet ==
      MergeOnRead.changesSince(p.table, v1)
        .select("doc_id", "lsn", "op").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet,
      s"tail batches must be exactly the post-anchor change set: ${rated.tail}")

    // a numeric-invalid startingVersion fails typed at stream start
    val bad = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "yesterday")
        .load(s"$base/table")
        .writeStream.option("checkpointLocation", s"$base/ckpt-bad")
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName("sv_bad").start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t.asInstanceOf[Throwable])(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(bad).exists(_.getMessage != null) &&
      causes(bad).exists(c => c.getMessage != null &&
        c.getMessage.contains("startingVersion")),
      s"expected a typed startingVersion error: ${causes(bad).map(_.getMessage)}")
  }

  test("onRollback=fail stops an LWW consumer at a rollback window, typed") {
    import graft.operators.{MergeOnRead, TableMaintenance}
    import graft.streaming.{CdcPipeline, GraftChangelogSource, PipelineConfig}
    import spark.implicits._
    val base = tmpDir("rbstream")
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table", changeLogDir = "-", checkpointDir = "-",
      errorDir = s"$base/errors", lineageDir = s"$base/lineage",
      numBuckets = 4, mode = "mor"))
    def batch(rows: (Long, String, String, Option[Seq[Int]], Option[Long], String)*) =
      rows.toSeq.toDF("lsn", "op", "doc_id", "tokens", "n_tok", "source")
    p.applyBatch(batch((1L, "I", "r-a", Some(Seq(1)), Some(1L), "s")), 0L)
    val v1 = p.table.currentVersion.get
    p.applyBatch(batch((2L, "U", "r-a", Some(Seq(9)), Some(1L), "s")), 1L)
    TableMaintenance.rollbackTo(p.table, v1)

    // maxVersionsPerTrigger=1 so the rollback version arrives as its OWN
    // window — the realistic tailing shape (a caught-up consumer sees
    // each commit separately; a fresh full-range catch-up would fold the
    // rollback into a net-empty diff and hide it)
    def run(policy: String): Either[Throwable, Set[(String, Long, String)]] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
      val q = spark.readStream.format("graft")
        .option("startingVersion", v1)
        .option("maxVersionsPerTrigger", 1)
        .option("onRollback", policy)
        .load(s"$base/table")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt-$policy")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("doc_id", "lsn", "op").collect()
            .foreach(r => got.add((r.getString(0), r.getLong(1), r.getString(2))))
          ()
        }
        .start()
      try { q.awaitTermination(); Right({
        import scala.collection.JavaConverters._
        got.iterator().asScala.toSet
      }) }
      catch { case e: Throwable => Left(e) }
    }

    // default policy: the forward window delivers the lsn-2 update, then
    // the rollback window delivers the retraction diff — r-a back to its
    // lsn-1 payload. The retraction's lsn is the ORIGINAL (older) one:
    // exactly why an LWW consumer cannot apply it.
    val retract = run("retract").toOption.get
    assert(retract == Set(("r-a", 2L, "U"), ("r-a", 1L, "U")),
      s"retraction diff: $retract")

    // fail policy: typed error naming the window, nothing delivered
    val failed = run("fail").swap.toOption.get
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    assert(rootCause(failed).isInstanceOf[GraftChangelogSource.RollbackInWindow],
      s"expected RollbackInWindow, got ${rootCause(failed)}")

    // an unknown policy value fails at stream start, typed
    val badPolicy = run("explode").swap.toOption.get
    assert(rootCause(badPolicy).getMessage.contains("onRollback"),
      s"expected option validation error, got ${rootCause(badPolicy)}")

    // once the stream starts PAST the rollback, fail-policy windows flow
    val v3 = p.table.currentVersion.get
    p.applyBatch(batch((3L, "U", "r-a", Some(Seq(7)), Some(1L), "s")), 2L)
    val got = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", v3)
        .option("onRollback", "fail")
        .load(s"$base/table")
        .writeStream
        .option("checkpointLocation", s"$base/ckpt-past")
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName("rb_past")
        .start()
      q.awaitTermination()
      spark.table("rb_past").select("doc_id", "lsn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(got == Set(("r-a", 3L)), s"post-rollback window: $got")
  }
}
