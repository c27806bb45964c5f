package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ingest.CdcGenerator
import graft.operators.MergeOnRead
import graft.streaming.{CdcPipeline, PipelineConfig}

/** Per-round benchmark (driver contract): prints ONE JSON line.
  *
  * Headline metric = BASELINE.json's: change-events/sec applied,
  * end-to-end (conform → validate/route → LWW dedup → MERGE commit →
  * lineage) over a synthetic CDC stream derived from the tier's
  * `documents` table, for BOTH commit modes (copy-on-write and
  * merge-on-read; MOR's timed region includes the final compaction so it
  * pays for a fully folded state).
  *
  * Scaling evidence (north rule: ≥0.8 efficiency from N to 4N executors,
  * no real cluster in this sandbox): the SAME job on the SAME pre-staged
  * change log at `local[2]` (N) and `local[8]` (4N). The pair is 2→8, not
  * 8→32, because measurement shows THIS VM stops scaling memory-intensive
  * workloads beyond ~8 concurrent heavy threads (pure-CPU spin scales
  * 24.5×/32 threads, but Spark aggregate task time inflates ~5× from 8→32
  * with GC <1s — a host memory-subsystem ceiling, not a partitioning
  * property; see BASELINE.md). A third run at local[32] is reported as
  * max-box throughput.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPLICATE
  * (stream multiplier, default 1440 ≈ 16M events at sf0.1),
  * SPARK_GRAFT_CPUS (max parallelism, default 32), SPARK_GRAFT_MODES,
  * SPARK_GRAFT_QUERIES=0 (skip per-query timings), GRAFT_TIMING
  * (per-batch diagnostics).
  */
object Bench {

  /** GRAFT_TIMING diagnostic: aggregate executor task-time vs wall tells
    * whether a phase is compute-bound (scales with cores) or dominated by
    * scheduling/driver latency (doesn't). */
  private final class TaskClock extends org.apache.spark.scheduler.SparkListener {
    val ms    = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      ms.addAndGet(e.taskInfo.duration); tasks.incrementAndGet(); ()
    }
    def snap(): (Long, Long) = (ms.get(), tasks.get())
  }

  private def gcMs(): Long = {
    import scala.collection.JavaConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)

      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .master(s"local[$cores]")
      .appName(s"graft-bench-c$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.table.NoForkLocalFileSystem].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply every batch dir of `changeLog` through the full pipeline on a
    * fresh table; returns wall seconds. Same code path as the streaming
    * foreachBatch body (CdcPipeline.applyBatch). In MOR mode a final
    * compaction is INSIDE the timed region so the measured cost covers a
    * fully folded table state, not just appended deltas. */
  private def runCdc(
      spark: SparkSession, changeLog: String, batches: Int, buckets: Int,
      mode: String): Double = {
    val baseDir = Files.createTempDirectory("graft-bench-run")
    try runCdcAt(spark, changeLog, batches, buckets, mode, baseDir.toString)
    finally graft.table.Fs.deleteRecursively(baseDir)
  }

  private def runCdcAt(
      spark: SparkSession, changeLog: String, batches: Int, buckets: Int,
      mode: String, base: String): Double = {
    val p = new CdcPipeline(spark, PipelineConfig(
      tableRoot = s"$base/table",
      changeLogDir = changeLog,
      checkpointDir = s"$base/checkpoint",
      errorDir = s"$base/errors",
      lineageDir = s"$base/lineage",
      numBuckets = buckets,
      mode = mode,
      // compaction in the bench is the explicit final step below, so the
      // MOR number = N delta commits + one fold (scheduled-maintenance
      // pattern), not a rewrite per batch
      compactThreshold = Double.PositiveInfinity))
    val clock = if (sys.env.contains("GRAFT_TIMING")) {
      val c = new TaskClock; spark.sparkContext.addSparkListener(c); Some(c)
    } else None
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val tb   = System.nanoTime()
      val pre  = clock.map(_.snap())
      val st = p.applyBatch(spark.read.parquet(f"$changeLog/batch-$b%05d"), b.toLong)
      val gc0 = if (clock.isDefined) gcMs() else 0L
      val diag = (clock, pre) match {
        case (Some(c), Some((ms0, n0))) =>
          val (ms1, n1) = c.snap()
          f" taskTime=${(ms1 - ms0) / 1000.0}%.2fs tasks=${n1 - n0} gcTotal=${gc0 / 1000.0}%.1fs"
        case _ => ""
      }
      System.err.println(
        f"[bench] mode=$mode batch=$b wall=${(System.nanoTime() - tb) / 1e9}%.2fs merge=${st.wallMs / 1000.0}%.2fs " +
          f"ins=${st.inserted} upd=${st.updated} del=${st.deleted} rows=${st.rowsAfter}$diag")
    }
    if (mode == "mor") {
      val tc = System.nanoTime()
      MergeOnRead.compact(p.table, "bench-final")
      System.err.println(
        f"[bench] mode=mor compact wall=${(System.nanoTime() - tc) / 1e9}%.2fs")
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Measured ANN-LSH evidence for the round report: recall of the
    * multi-table hyperplane candidates against exact brute-force top-10,
    * plus candidate-pair volume vs n²/2, at several (bits, tables)
    * configs — AND the near-dup regime (variant pairs at cos ≥ 0.98)
    * where LSH is actually selective. These embeddings are ISOTROPIC
    * (pair cosines ~N(0, 0.014)), the theoretical worst case: with p₁ at
    * the top-10 angle ≈ 0.65/bit vs p₂ = 0.5/bit random, the ρ =
    * ln p₁/ln p₂ ≈ 0.66 bound says high top-k recall costs a large
    * candidate fraction no matter the tuning — the study REPORTS that
    * tradeoff rather than hiding it; clustered real-corpus behavior is
    * what the near-dup row demonstrates. */
  private[graft] def annStudy(s: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.functions.Similarity
    graft.plans.CosineSim.register(s)
    graft.plans.HyperplaneSigs.register(s)
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = v.count()
    val qs = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val truth = Similarity.bruteForceTopK(v, qs, 10, Similarity.cosineFast)
      .select(least(col("q_id"), col("vec_id")).as("pa"),
        greatest(col("q_id"), col("vec_id")).as("pb")).cache()
    val nTruth = truth.count()

    def study(bits: Int, tables: Int): String = {
      val banded = v.select(col("vec_id"),
          posexplode(call_function("graft_hyperplane_sigs",
            col("embedding"), lit(bits), lit(tables))))
        .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "sig"))
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("pa"), col("b.vec_id").as("pb"))
        .distinct().cache()
      val cand   = pairs.count()
      val found  = truth.join(pairs, Seq("pa", "pb"), "left_semi").count()
      pairs.unpersist()
      val frac = cand.toDouble / (n.toDouble * (n - 1) / 2)
      f""""b${bits}_L$tables":{"recall_at10":${found.toDouble / nTruth}%.3f,"cand_pairs":$cand,"cand_frac":$frac%.4f}"""
    }
    val topk = Seq((16, 4), (10, 128), (10, 512)).map { case (b, l) => study(b, l) }

    // near-dup regime: every variant pair sits at cos ≥ 0.98; recall of
    // the q_ann_threshold_near config must be 1.0 with tiny candidates
    val corpus = Similarity.variantVectors(v)
    val banded = corpus.select(col("vec_id"),
        posexplode(call_function("graft_hyperplane_sigs",
          col("embedding"), lit(Similarity.NearBits), lit(Similarity.NearTables))))
      .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "sig"))
    val nearPairs = banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("pa"), col("b.vec_id").as("pb"))
      .distinct().cache()
    val nearCand  = nearPairs.count()
    val nVariants = v.filter(col("vec_id") % 5 === 0).count()
    val nearFound = nearPairs
      .filter(col("pb") === col("pa") + 1000000L).count()
    nearPairs.unpersist()
    v.unpersist(); truth.unpersist()
    val m = n + nVariants
    (topk :+
      f""""near_b${Similarity.NearBits}_L${Similarity.NearTables}":{"recall":${nearFound.toDouble / nVariants}%.3f,"cand_pairs":$nearCand,"cand_frac":${nearCand.toDouble / (m.toDouble * (m - 1) / 2)}%.5f}""")
      .mkString("{", ",", "}")
  }

  /** Measured IVF evidence: recall@10 + candidate fraction of
    * multi-probe cell-restricted search vs exact brute force, across
    * cell layouts and probe widths — the FRONTIER the round-4 verdict
    * asked for ("non-seed recall@10 ≥ 0.8 at ≤ 12% candidates, or a
    * documented refutation with the measured frontier"). The target is
    * MET: at every fixed candidate fraction larger K with multi-probe
    * strictly dominates, and following that gradient past the
    * mid-round sweep's edge (an earlier revision of this comment
    * declared the target refuted from a frontier that stopped at
    * K=64/np=16 — kmeans256_np24's 0.788 @ 9.2% in the same JSON
    * already contradicted it) lands kmeans256_np28 at non-seed
    * recall@10 0.82 @ 10.8% candidates — the shipped q_ann_ivf config.
    * The frontier keeps climbing (np32: 0.84 @ 12.3%; K=512/np64: 0.85
    * @ 12.4%) but sub-linearly: the residual gap to 1.0 is the DATA's —
    * near-isotropic embeddings (pair cosines ~N(0, .014)) spread a
    * query's true top-10 across cells, the same wall the LSH study hits
    * (ρ-bound). Two further honesty axes:
    *  - `_nsq` rows: 50 NON-SEED queries (vec_id 100-149) — seeds sit at
    *    their own cell centers and fake recall ≈ 1 (round-4 finding);
    *    the widened set also stabilizes the estimate (±0.02 vs ±0.1 at
    *    5 queries).
    *  - `clustered` row: variant queries (cos ≥ 0.98 to their base) —
    *    on a corpus with real cluster structure the SAME index finds the
    *    near-dup base at tiny candidate fractions with recall ≈ 1,
    *    pinning the low isotropic recall on the data, not the index. */
  private[graft] def ivfStudy(s: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.functions.Similarity
    graft.plans.CosineSim.register(s)
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = v.count()
    case class QuerySet(suffix: String, pred: org.apache.spark.sql.Column, size: Long)
    val querySets = Seq(
      QuerySet("", col("vec_id") < 5, 5L), // init-seed queries (r2/r3 protocol)
      QuerySet("_nsq", col("vec_id") >= 100 && col("vec_id") < 150, 50L))
    val truths = querySets.map { q =>
      val qs = v.filter(q.pred)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      q.suffix -> Similarity.bruteForceTopK(v, qs, 10, Similarity.cosineFast)
        .select(col("q_id"), col("vec_id")).cache()
    }.toMap

    // one cached assignment per CENTROID LAYOUT (assignment is
    // independent of nprobe — recomputing it per probe row wasted two
    // full O(n·k) passes per layout, round-4 review finding)
    def studyLayout(
        label: String, cents: org.apache.spark.sql.DataFrame,
        nprobes: Seq[(String, Int)]): Seq[String] = {
      val assigned = Similarity.ivfAssignWith(v, cents).cache()
      val out = nprobes.flatMap { case (suffix, nprobe) =>
        querySets.map { q =>
          val truth  = truths(q.suffix)
          val nTruth = truth.count()
          // data vectors stay single-assigned; QUERIES probe their top-p
          // cells (multi-probe widening — the recall/cost knob at fixed
          // index)
          val qcells = Similarity.ivfProbe(v.filter(q.pred), cents, nprobe)
            .select(col("vec_id").as("q_id"), col("cent_id"))
          val cand = assigned.as("a")
            .join(qcells.as("q"),
              col("a.cent_id") === col("q.cent_id") && col("a.vec_id") =!= col("q.q_id"))
            .select(col("q.q_id").as("q_id"), col("a.vec_id").as("vec_id"))
          val candN = cand.count()
          val found = truth.join(cand, Seq("q_id", "vec_id"), "left_semi").count()
          f""""$label$suffix${q.suffix}":{"recall_at10":${found.toDouble / nTruth}%.3f,"cand_frac":${candN.toDouble / (q.size * (n - 1))}%.4f}"""
        }
      }
      assigned.unpersist()
      out
    }
    val untrained = v.filter(col("vec_id") < Similarity.IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val k64 = Similarity.kmeansCentroids(s, v, 64, Similarity.IvfIters)
    val k16 = Similarity.kmeansCentroids(s, v, 16, Similarity.IvfIters)
    val k256 = Similarity.kmeansCentroids(s, v, 256, Similarity.IvfIters)
    val sampled = Similarity.kmeansCentroids(
      s, v, 64, Similarity.IvfIters, sampleFraction = 0.25)
    val out =
      studyLayout(s"first${Similarity.IvfK}", untrained, Seq("" -> 1)) ++
        studyLayout("kmeans16", k16, Seq("" -> 1, "_np2" -> 2, "_np4" -> 4)) ++
        studyLayout("kmeans64", k64,
          Seq("" -> 1, "_np4" -> 4, "_np8" -> 8, "_np16" -> 16)) ++
        studyLayout("kmeans256", k256,
          Seq("_np8" -> 8, "_np24" -> 24, "_np28" -> 28, "_np32" -> 32)) ++
        studyLayout("kmeans512",
          Similarity.kmeansCentroids(s, v, 512, Similarity.IvfIters),
          Seq("_np48" -> 48, "_np64" -> 64)) ++
        studyLayout("kmeans64_sample25", sampled, Seq("_np8" -> 8)) ++
        // sampled training at the SHIPPED K: on this 2000-vector fixture
        // a 25% sample leaves ~2 training points per cell and recall
        // craters (0.55 vs 0.82 full-trained — measured 2026-08-21);
        // the scale rule this row documents is points-per-cell, not
        // sample fraction: at 100 TB a 0.1% sample still trains every
        // cell on thousands of vectors. The row stays as the honest
        // fixture-scale number.
        studyLayout("kmeans256_sample25",
          Similarity.kmeansCentroids(s, v, 256, Similarity.IvfIters,
            sampleFraction = 0.25),
          Seq("_np28" -> 28))

    // clustered regime: corpus ∪ near-dup variants, queries = the
    // variants, truth = each variant's base (its exact top-1 at
    // cos ≥ 0.98). High recall at ~1/K candidate fraction here is what
    // a sound index looks like when the data HAS cluster structure.
    val corpus = Similarity.variantVectors(v).cache()
    val m = corpus.count()
    val vc = Similarity.kmeansCentroids(s, corpus, 64, Similarity.IvfIters)
    val vAssigned = Similarity.ivfAssignWith(corpus, vc).cache()
    val clustered = Seq(1, 2).map { nprobe =>
      val qv = corpus.filter(col("vec_id") >= 1000000L)
      val nq = qv.count()
      val qcells = Similarity.ivfProbe(qv, vc, nprobe)
        .select(col("vec_id").as("q_id"), col("cent_id"))
      val cand = vAssigned.as("a")
        .join(qcells.as("q"),
          col("a.cent_id") === col("q.cent_id") && col("a.vec_id") =!= col("q.q_id"))
        .select(col("q.q_id").as("q_id"), col("a.vec_id").as("vec_id"))
      val candN = cand.count()
      val found = cand
        .filter(col("q_id") === col("vec_id") + 1000000L).count()
      f""""clustered_np$nprobe":{"recall_base":${found.toDouble / nq}%.3f,"cand_frac":${candN.toDouble / (nq * (m - 1))}%.4f}"""
    }
    vAssigned.unpersist(); corpus.unpersist()
    v.unpersist(); truths.values.foreach(_.unpersist())
    (out ++ clustered).mkString("{", ",", "}")
  }

  /** Measured MinHash banding S-curve — the empirical version of the
    * (1/b)^(1/r) threshold [[graft.functions.DedupOps.bandConfigFor]]
    * derives from. The natural corpus is BIMODAL (unrelated synthetic
    * docs share no trigrams → J≈0; dup clusters sit at J≈0.9+), which
    * makes every config look identical; the study therefore grades the
    * similarity axis explicitly: each doc gets PREFIX variants at
    * p ∈ {30,50,70,90}% of its text — a p-prefix keeps ≈p of the
    * trigram shingles, so the (doc, variant_p) pair sits at J ≈ p/100.
    * Per band config r (b = 16/r bands): candidate recall within each
    * similarity grade + total candidate volume. Expectation (and what
    * the numbers show): r=2 (t*≈.35) recovers mid-J pairs that r=8
    * (t*≈.92) misses, at higher candidate volume — threshold picks the
    * config, which is bandConfigFor's whole point. */
  private[graft] def minhashStudy(s: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.functions.DedupOps
    graft.plans.ShingleHash.register(s)
    graft.plans.MinHashSig.register(s)
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
    val fracs = Seq(30, 50, 70, 90)
    val corpus = fracs.foldLeft(docs) { (acc, f) =>
      acc.unionByName(docs.select(
        concat(col("doc_id"), lit(s"_p$f")).as("doc_id"),
        expr(s"substring(text, 1, cast(length(text) * $f / 100 AS int))").as("text")))
    }
      .withColumn("sh", DedupOps.shinglesFast(col("text")))
      .select(col("doc_id"), col("sh")).cache()
    val n = corpus.count()
    // ground truth: every (base, prefix-variant) pair with its exact J
    val truth = fracs.map { f =>
      corpus.as("a")
        .join(corpus.as("b"),
          concat(col("a.doc_id"), lit(s"_p$f")) === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"), lit(f).as("grade"),
          DedupOps.jaccard(col("a.sh"), col("b.sh")).as("j"))
    }.reduce(_ unionByName _).cache()
    val gradeStats = truth.groupBy(col("grade"))
      .agg(count(lit(1)).as("n"), round(avg(col("j")), 3).as("mean_j"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap

    def study(r: Int): String = {
      val b = DedupOps.NumHashes / r
      val banded = corpus.select(col("doc_id"),
          explode(DedupOps.bandKeys(
            call_function("graft_minhash", col("sh")), DedupOps.NumHashes, r)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(
          least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct().cache()
      val cand = pairs.count()
      val foundByGrade = truth.join(pairs, Seq("doc_a", "doc_b"), "left_semi")
        .groupBy(col("grade")).agg(count(lit(1)).as("found"))
        .collect().map(r0 => r0.getInt(0) -> r0.getLong(1)).toMap
      pairs.unpersist()
      val tstar = math.pow(1.0 / b, 1.0 / r)
      val recalls = fracs.map { f =>
        val (tot, meanJ) = gradeStats(f)
        f""""j$f":{"mean_j":$meanJ%.3f,"recall":${foundByGrade.getOrElse(f, 0L).toDouble / tot}%.3f}"""
      }.mkString(",")
      f""""b${b}r$r":{"t_star":$tstar%.3f,$recalls,"cand_pairs":$cand,"cand_frac":${cand.toDouble / (n.toDouble * (n - 1) / 2)}%.5f}"""
    }
    val out = Seq(2, 4, 8).map(study)
    corpus.unpersist(); truth.unpersist()
    out.mkString("{", ",", "}")
  }

  /** Hot-key skew study (FIXTURES.md G5; north rule: "hot-key salting
    * ... making the scaling explicit"): times the LWW dedup stage — the
    * one per-batch operator where a hot doc_id concentrates its events —
    * single-phase vs two-phase-salted, across three key distributions on
    * the SAME deterministic 8M-event batch shape (full payload: avg
    * ~40-int token array, so the `max_by` struct carries realistic
    * weight):
    *
    *  - `uniq`:  every event its own doc_id — the official bench's
    *    per-batch shape (~1 event/doc after batch split). Salting's
    *    phase 1 compresses NOTHING here, so phase 2 reshuffles the whole
    *    batch: this regime prices salting's pure overhead.
    *  - `g5`:    20% of events on 1% of the key space (the G5 fixture).
    *  - `hot1`:  50% of all events on ONE doc_id — pathological.
    *
    * What the numbers decide: `max_by` is associative, so the aggregate
    * partial-combines BEFORE the shuffle — each map partition emits at
    * most one pre-aggregated row per locally-seen key, which already
    * caps what the hot key's single reducer receives at
    * (#map partitions) rows. If the study shows single-phase absorbing
    * `hot1` at parity, size-triggered salting (saltThreshold) is a pure
    * extra-shuffle cost on big mostly-unique batches and the default
    * should change; if `hot1` collapses single-phase, the threshold is
    * earning its shuffle. Either way the decision is measured, not
    * asserted (the salted≡unsalted equivalence itself is
    * correctness-gated in PropertySpec — this study is purely the
    * performance axis). Timed via a full-payload hash-sum so column
    * pruning cannot skip the `max_by` materialization; input is
    * persisted and counted before the clock starts; median of 3. */
  private[graft] def skewStudy(s: SparkSession): String = {
    import org.apache.spark.sql.{DataFrame, functions => F}
    import F.{col, lit, when, pmod, xxhash64, concat, sequence, struct, sum}
    val n    = 8000000L
    val keys = 4000000L // g5 key space: 1% of it = 40k docs carry 20% of events
    def batch(regime: String, rows: Long = n): DataFrame = {
      val id = col("id")
      val doc = regime match {
        case "uniq" => concat(lit("d"), id)
        case "g5" => // event 5th: one of keys/100 hot docs; else unique
          when(pmod(id, lit(5L)) === 0,
            concat(lit("h"), pmod(xxhash64(id), lit(keys / 100))))
            .otherwise(concat(lit("d"), id))
        case "hot1" =>
          when(pmod(id, lit(2L)) === 0, lit("h0"))
            .otherwise(concat(lit("d"), id))
      }
      s.range(rows).select(
        doc.as("doc_id"),
        sequence(lit(0),
          pmod(xxhash64(id), lit(64L)).cast("int") + lit(8)).as("tokens"),
        lit("bench").as("source"),
        id.as("lsn"),
        lit("U").as("op"))
        .withColumn("n_tok", F.size(col("tokens")))
    }
    // full-payload hash-sum: forces every max_by struct to materialize
    // (a bare count() would let Catalyst prune the aggregate payload)
    def force(df: DataFrame): Unit = {
      // pmod keeps the ANSI sum far from Long overflow (8M × 1e9 « 2^63)
      df.select(pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
          lit(1000000007L)).as("_h"))
        .agg(sum(col("_h"))).collect(); ()
    }
    import graft.operators.Dedup
    // JIT warm-up on a sliver so no timed sample pays codegen
    Seq("uniq", "hot1").foreach { r =>
      val w = batch(r, 100000L); force(Dedup.lww(w)); force(Dedup.lwwSalted(w, 32))
    }
    val out = Seq("uniq", "g5", "hot1").map { regime =>
      val in = batch(regime).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      in.count() // materialize OUTSIDE the clock: time the dedup, not range()
      // one UNTIMED full-scale pass of each variant first: the 32g heap
      // is lazily committed, so the first full-size aggregations grow it
      // under GC pressure (observed: 40-80 s settling to 2-4 s steady
      // state on identical work) — the sliver warm-up above only covers
      // JIT, not heap growth
      force(Dedup.lww(in)); force(Dedup.lwwSalted(in, 32))
      // samples INTERLEAVED A/B/A/B…: any residual settling trend lands
      // on both variants equally instead of penalizing whichever ran
      // first
      def sample(tag: String, i: Int)(body: => Unit): Double = {
        val t0 = System.nanoTime(); body
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] skew $regime $tag sample=$i sec=$sec%.2f")
        sec
      }
      val pairs = (1 to 3).map { i =>
        (sample("lww", i)(force(Dedup.lww(in))),
          sample("salted", i)(force(Dedup.lwwSalted(in, 32))))
      }
      val plain  = median(pairs.map(_._1))
      val salted = median(pairs.map(_._2))
      in.unpersist()
      f""""$regime":{"lww_sec":$plain%.2f,"salted_sec":$salted%.2f}"""
    }
    out.mkString(s"""{"events":$n,"samples":3,""", ",", "}")
  }

  /** Measured end-to-end REPLICATION: the one-statement replica story
    * (source table → streaming changelog source → streaming upsert sink)
    * is equivalence-tested in StreamingSpec but was never *measured*
    * (round-4 verdict #8). Reference analog: compareSGIDpts.py:34-62 —
    * the replica-equivalence check — run as a measured pipeline.
    *
    * Phases, on the SAME staged change log the headline runs use:
    *  1. fixture (untimed): a MOR source table built from all but the
    *     last batch.
    *  2. catch-up replay (timed): `readStream.format("graft")
    *     .option("startingVersion","earliest")` → `writeStream
    *     .format("graft")` drained with AvailableNow — the replica
    *     replays the source's full history through the real
    *     source/sink pair; throughput = replayed change rows / wall.
    *  3. tail lag (timed): with the SAME standing query re-started on a
    *     short processing-time trigger and already caught up, apply the
    *     held-back batch to the source and clock how long until the
    *     replica's watermark reaches the source's — the steady-state
    *     replication lag a downstream consumer actually experiences
    *     (includes trigger scheduling, by design).
    *  4. equivalence assert: live views must match exactly both ways
    *     (`exceptAll` in each direction) — reported, not assumed. */
  private[graft] def replicationStudy(
      s: SparkSession, changeLog: String, batches: Int, buckets: Int): String = {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-bench-repl")
    try {
      val src = new CdcPipeline(s, PipelineConfig(
        tableRoot = s"$base/src", changeLogDir = changeLog,
        checkpointDir = s"$base/src-ckpt", errorDir = s"$base/src-err",
        lineageDir = s"$base/src-lin", numBuckets = buckets, mode = "mor",
        compactThreshold = Double.PositiveInfinity))
      (0 until batches - 1).foreach { b =>
        src.applyBatch(s.read.parquet(f"$changeLog/batch-$b%05d"), b.toLong); ()
      }
      val replicaRoot = s"$base/replica"
      graft.table.SnapshotTable.create(s, replicaRoot,
        org.apache.spark.sql.types.StructType(
          graft.operators.Conform.EventSchema.fields.filter(f =>
            Set("doc_id", "tokens", "n_tok", "source").contains(f.name))),
        numBuckets = buckets)
      val ckpt = s"$base/repl-ckpt"
      def replicaQuery(trigger: Trigger) = s.readStream.format("graft")
        .option("startingVersion", "earliest")
        .option("onRollback", "fail") // LWW replica: retraction = divergence
        .load(src.table.root)
        .writeStream.format("graft")
        .option("path", replicaRoot)
        .option("checkpointLocation", ckpt)
        .trigger(trigger)
        .start()

      // phase 2: full-history catch-up replay, drained to completion
      val rowsToReplay = src.table.current.get.deltaRows
      val t0 = System.nanoTime()
      val q0 = replicaQuery(Trigger.AvailableNow()); q0.awaitTermination()
      val drainSec = (System.nanoTime() - t0) / 1e9

      // phase 3: standing query (already caught up), then one more source
      // batch; lag = source-commit → replica-watermark-caught-up
      val q1 = replicaQuery(Trigger.ProcessingTime(200L))
      // let the standing query finish its (empty) first trigger; a
      // query that dies at start must fail the study, not spin forever
      val warmDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.isEmpty && q1.isActive &&
          System.nanoTime() < warmDeadline)
        Thread.sleep(50L)
      q1.exception.foreach(throw _)
      val tailBatch = s.read.parquet(f"$changeLog/batch-${batches - 1}%05d")
      val st = src.applyBatch(tailBatch, (batches - 1).toLong)
      val replica = graft.table.SnapshotTable.load(s, replicaRoot)
      val tLag0 = System.nanoTime()
      val deadline = tLag0 + 120L * 1000 * 1000 * 1000
      while (replica.current.map(_.watermarkLsn).getOrElse(-1L) < st.maxLsn &&
          System.nanoTime() < deadline)
        Thread.sleep(50L)
      val lagSec = (System.nanoTime() - tLag0) / 1e9
      q1.stop(); q1.awaitTermination()

      // phase 4: exact live-view equivalence, both directions
      val srcView = MergeOnRead.liveView(src.table)
      val repView = MergeOnRead.liveView(replica)
      val equal = srcView.exceptAll(repView).isEmpty &&
        repView.exceptAll(srcView).isEmpty
      f"""{"rows_replayed":$rowsToReplay,"catchup_sec":$drainSec%.2f,"catchup_rows_per_sec":${rowsToReplay / drainSec}%.1f,"tail_events":${st.batchEvents},"tail_lag_sec":$lagSec%.2f,"replica_equal":$equal}"""
    } finally graft.table.Fs.deleteRecursively(base)
  }

  /** The round-3 lesson (BASELINE.md + VERDICT r3): leaked bench temp
    * trees accumulate in /tmp and degrade EVERY subsequent run on this
    * box uniformly (~30 GB → 1.6-1.7× inflation across pure scans and
    * merges alike — a tmpfs/writeback effect, not a code property). The
    * harness now owns its own reproducibility: every tree it creates is
    * deleted in a finally, and trees leaked by PRIOR crashed bench/verify
    * runs are swept at startup so the first timed run starts clean.
    * Prefixes are exclusively ours; the age gate keeps a concurrently
    * running graft process (e.g. sbt test) safe. SINGLE-BENCH
    * assumption: the bench prefixes are swept unconditionally, so a
    * second concurrent Bench/BenchOne would lose its live trees — by
    * design: concurrent benches already corrupt each other's numbers,
    * and the sweep makes that fail loudly (and kills the documented
    * zombie-forked-JVM leftovers) instead of silently measuring a
    * contended box. */
  private def sweepStaleTmp(): Unit = {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val now = System.currentTimeMillis()
    val benchOwned = Set("graft-bench", "graft-benchone")
    scala.util.Try(graft.table.Fs.listDir(tmp)).getOrElse(Seq.empty).foreach { p =>
      val name = p.getFileName.toString
      val ours = benchOwned.exists(name.startsWith)
      val staleOther = name.startsWith("graft-") &&
        scala.util.Try(Files.getLastModifiedTime(p).toMillis)
          .toOption.exists(now - _ > 2L * 3600 * 1000)
      if (ours || staleOther) {
        System.err.println(s"[bench] sweeping stale temp tree $p")
        graft.table.Fs.deleteRecursively(p)
      }
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** (total, steal) jiffies from /proc/stat's aggregate cpu line.
    * Deltas across a timed phase expose HYPERVISOR STEAL — CPU time the
    * host reclaimed from this VM — turning "the box was noisy" from
    * after-the-fact folklore into a recorded per-phase number: a run
    * whose steal_pct is ≳10 was not measuring this code (round-3/4
    * finding: official runs degraded 2-3× with no code or visible-load
    * change; /proc/stat showed hours of accumulated steal). Linux-only
    * by design (the bench runs on the driver's Linux box); an absent or
    * unparseable /proc/stat reads as (0, 0) → steal 0. */
  private def cpuStat(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        // user nice system idle iowait irq softirq steal …
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        val idle  = (if (f.length > 3) f(3) else 0L) + (if (f.length > 4) f(4) else 0L)
        (f.sum - idle, if (f.length > 7) f(7) else 0L)
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  /** Run `body`, returning (result, steal% of the CPU time the VM
    * actually DEMANDED over the interval — busy incl. steal, idle and
    * iowait excluded). Normalizing against total machine jiffies would
    * dilute the signal ~16× at the 2-core phase (30 idle cores accrue
    * no steal): a 2-busy-core run stolen half the time reads as ~3% of
    * total but ~50% of demand, and only the latter explains a 2×
    * wall-clock inflation. */
  private def stealPctOver[A](body: => A): (A, Double) = {
    val (b0, s0) = cpuStat()
    val a = body
    val (b1, s1) = cpuStat()
    val demanded = b1 - b0
    (a, if (demanded <= 0) 0.0 else 100.0 * (s1 - s0) / demanded)
  }

  /** Fixed single-thread ALU workload (~0.5 s on a healthy core), timed
    * before each phase. Its wall time directly witnesses effective
    * per-core speed: hypervisor frequency throttling or co-tenant
    * memory-bandwidth pressure inflates it 1:1, while steal accounting
    * misses both. A phase whose calib_ms is 2× the run's best was
    * measured on a machine running at half speed. */
  private def calibMs(): Double = {
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < 300000000) {
      x = java.lang.Long.rotateLeft(x * 0x100000001b3L, 31) ^ i
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e6
    if (x == 42L) System.err.println("calib sentinel") // defeat DCE
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir     = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxCpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val hiCpus    = math.min(8, maxCpus) // 4N of the scaling pair
    val loCpus    = math.max(1, hiCpus / 4) // N
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "1440").toInt
    val batches   = 4
    val buckets   = 64
    val modeNames = sys.env.getOrElse("SPARK_GRAFT_MODES", "cow,mor").split(",").toSeq
    // ≥3 samples at the max-cores point (documented ±30% box noise there);
    // the reported sec_max is the per-mode MEDIAN
    val maxSamples = sys.env.getOrElse("SPARK_GRAFT_MAX_SAMPLES", "3").toInt

    sweepStaleTmp()

    // ---- stage the change log once (not timed); fixed file count so
    // every parallelism level reads the identical input layout ----
    val stage     = newSession(maxCpus)
    val changeLog = Files.createTempDirectory("graft-bench-log").toString
    try {
    CdcGenerator.writeBatches(stage, sfDir, changeLog, batches, replicate, filesPerBatch = 32)
    val nEvents = stage.read.parquet(s"$changeLog/batch-*").count()
    // JIT/codegen warm-up on a sliver so no timed run pays it
    val warm = Files.createTempDirectory("graft-bench-warm")
    try {
      CdcGenerator.writeBatches(stage, "/root/testdata/sf0.001", warm.toString, batches = 2)
      modeNames.foreach(m => runCdc(stage, warm.toString, 2, 8, m))
    } finally graft.table.Fs.deleteRecursively(warm)
    stage.stop()

    // ---- same job, same input: N cores, 4N cores, then max cores ----
    // each phase carries its measured hypervisor-steal% so a degraded
    // number is visibly an environment artifact, not a code regression
    def runAt(cores: Int): (Map[String, Double], Double, Double) = {
      val calib = calibMs()
      val s = newSession(cores)
      val (r, steal) = stealPctOver(
        modeNames.map(m => m -> runCdc(s, changeLog, batches, buckets, m)).toMap)
      s.stop(); (r, steal, calib)
    }
    val (lo, loSteal, loCalib) = runAt(loCpus)
    val (hi, hiSteal, hiCalib) = runAt(hiCpus)
    var maxRunsS: Seq[(Map[String, Double], Double, Double)] =
      if (maxCpus > hiCpus) (1 to math.max(1, maxSamples)).map(_ => runAt(maxCpus))
      else Seq((hi, hiSteal, hiCalib))
    // Adaptive outlier defense for the max-cores point: a single noisy
    // sample is absorbed by the median, but a degraded-host window long
    // enough to poison 2 of 3 samples poisons the median too (observed:
    // same-code 32-core MOR samples of 28 s, 30 s, 138 s in one run).
    // Buy up to SPARK_GRAFT_MAX_EXTRA (default 2) extra samples until
    // every mode shows a 3-sample CLUSTER agreeing within 1.5× — a
    // stable neighborhood the median can sit in. (The first cut of this
    // re-checked max/min over ALL samples, which is monotone
    // non-decreasing once an outlier exists: the "adaptive" stop was
    // dead and the loop always bought every extra sample.) Healthy runs
    // never pay this.
    if (maxCpus > hiCpus) {
      val maxExtra = sys.env.getOrElse("SPARK_GRAFT_MAX_EXTRA", "2").toInt
      def stable(xs: Seq[Double]): Boolean =
        if (xs.size < 3) xs.max / math.max(xs.min, 1e-9) <= 1.5
        else xs.sorted.sliding(3)
          .exists(w => w.last / math.max(w.head, 1e-9) <= 1.5)
      var extra = 0
      while (extra < maxExtra && modeNames.exists(m => !stable(maxRunsS.map(_._1(m))))) {
        System.err.println(
          s"[bench] no 3-sample max-core cluster within 1.5x — taking extra sample ${extra + 1}/$maxExtra")
        maxRunsS = maxRunsS :+ runAt(maxCpus)
        extra += 1
      }
    }
    val maxRuns = maxRunsS.map(_._1)
    val max = modeNames.map(m => m -> median(maxRuns.map(_(m)))).toMap
    val stealJson =
      f""""steal_pct":{"n":$loSteal%.1f,"4n":$hiSteal%.1f,"max":${maxRunsS.map(x => f"${x._2}%.1f").mkString("[", ",", "]")}},""" +
        f""""calib_ms":{"n":$loCalib%.0f,"4n":$hiCalib%.0f,"max":${maxRunsS.map(x => f"${x._3}%.0f").mkString("[", ",", "]")}}"""

    case class ModeResult(mode: String) {
      def epsLo: Double  = nEvents / lo(mode)
      def epsHi: Double  = nEvents / hi(mode)
      def epsMax: Double = nEvents / max(mode)
      def eff: Double    = (epsHi / epsLo) / (hiCpus.toDouble / loCpus)
      def json: String =
        f""""$mode":{"sec_n":${lo(mode)}%.2f,"sec_4n":${hi(mode)}%.2f,"sec_max":${max(mode)}%.2f,"sec_max_runs":${maxRuns.map(r => f"${r(mode)}%.2f").mkString("[", ",", "]")},"events_per_sec_n":$epsLo%.1f,"events_per_sec_4n":$epsHi%.1f,"events_per_sec_max":$epsMax%.1f,"scaling_efficiency_n_to_4n":$eff%.3f}"""
    }
    val modes = modeNames.map(ModeResult)
    val best  = modes.maxBy(m => math.max(m.epsHi, m.epsMax))
    val headline = math.max(best.epsHi, best.epsMax)
    // The rule's criterion is per-job, and the two top-level numbers may
    // legitimately come from different jobs: `best_mode` labels the
    // throughput headline, `scaling_mode` labels the mode whose N→4N run
    // demonstrates the ≥0.8 criterion. Both are explicit (no implicit
    // pairing), and every mode's full triple + efficiency is in the JSON.
    val scalingBest = modes.maxBy(_.eff)

    // ---- per-operator query timings on the tier (at max cores) ----
    // SPARK_GRAFT_QUERIES=0 skips them (fast CDC-only iteration)
    val sQ = newSession(maxCpus)
    val runQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "0"
    val queries =
      (if (runQueries) SparkEntry.queries.toSeq.sortBy(_._1) else Seq.empty).map {
        case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(sQ, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
          finally SparkEntry.releaseCaches()
          name -> (System.nanoTime() - t0) / 1e9
      }
    val qJson = queries.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val annJson  = if (runQueries) annStudy(sQ, sfDir) else "{}"
    val ivfJson  = if (runQueries) ivfStudy(sQ, sfDir) else "{}"
    val mhJson   = if (runQueries) minhashStudy(sQ, sfDir) else "{}"
    val skewJson = if (runQueries) skewStudy(sQ) else "{}"
    // SPARK_GRAFT_REPL=1 forces the replication study even under
    // SPARK_GRAFT_QUERIES=0 (fast CDC-only iteration); =0 skips it
    val replJson =
      if (sys.env.getOrElse("SPARK_GRAFT_REPL",
          if (runQueries) "1" else "0") != "0")
        replicationStudy(sQ, changeLog, batches, buckets)
      else "{}"

    println(
      f"""{"metric":"change-events/sec applied (end-to-end MERGE throughput)","value":$headline%.1f,"unit":"events/sec","sf":"$sfDir","queries":$qJson,"cdc":{"events":$nEvents,"batches":$batches,"buckets":$buckets,"replicate":$replicate,"cores_n":$loCpus,"cores_4n":$hiCpus,"cores_max":$maxCpus,"max_samples":${maxRuns.size},$stealJson,"best_mode":"${best.mode}","scaling_mode":"${scalingBest.mode}","scaling_efficiency":${scalingBest.eff}%.3f,${modes.map(_.json).mkString(",")}},"ann_lsh_study":$annJson,"ivf_study":$ivfJson,"minhash_study":$mhJson,"skew_study":$skewJson,"replication_study":$replJson,"query_total_sec":${queries.map(_._2).sum}%.2f}""")
    // Compact headline as the FINAL stdout line (round-4 verdict "what's
    // wrong" #1): the driver's artifact retains only the tail of bench
    // output, and the grown study blocks pushed the cdc block out of that
    // window — the one external perf signal became unreadable from the
    // driver's own file. Everything the ≥0.8-scaling north rule needs
    // (per-mode ev/s + wall at every core count, N→4N efficiency, the
    // noise instrumentation that qualifies the run) fits in one short
    // line, so ANY tail-truncated capture keeps it.
    val maxSteal = (Seq(loSteal, hiSteal) ++ maxRunsS.map(_._2)).max
    val calibs   = Seq(loCalib, hiCalib) ++ maxRunsS.map(_._3)
    println(
      f"""{"headline":{"value":$headline%.1f,"unit":"events/sec","best_mode":"${best.mode}","scaling_mode":"${scalingBest.mode}","scaling_efficiency_n_to_4n":${scalingBest.eff}%.3f,"events":$nEvents,"cores":[$loCpus,$hiCpus,$maxCpus],${modes.map(m => f""""${m.mode}":{"ev_s_max":${m.epsMax}%.1f,"sec_max":${max(m.mode)}%.2f,"ev_s_4n":${m.epsHi}%.1f,"eff":${m.eff}%.3f}""").mkString(",")},"max_steal_pct":$maxSteal%.1f,"calib_ms_spread":[${calibs.min}%.0f,${calibs.max}%.0f],"query_total_sec":${queries.map(_._2).sum}%.2f}}""")
    sQ.stop()
    } finally graft.table.Fs.deleteRecursively(java.nio.file.Paths.get(changeLog))
  }
}
