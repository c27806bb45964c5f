package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import graft.table.{Manifest, SnapshotTable}

/** Merge-on-read commit path for a [[SnapshotTable]] (the other half of
  * the north star's "copy-on-write/merge-on-read commit").
  *
  * Where [[Merge]] (COW) pays the full rewrite of every touched bucket at
  * WRITE time, MOR appends the deduped change batch as bucketed DELTA
  * files — commit cost O(|batch|), independent of table size — and defers
  * the fold to READ time: base ∪ deltas → LWW by LSN → drop deletes.
  * [[compact]] folds accumulated deltas back into base files; the pipeline
  * triggers it when deltaRows outgrow a configured fraction of the base
  * (Iceberg's positional-delete compaction played role-equivalently).
  *
  * Trickle batches are the motivating case: measured at sf0.1×90, a
  * 9k-event batch against a 430k-row table rewrites 48× its volume under
  * COW; under MOR it writes exactly its own volume.
  *
  * Exactly-once: same commit-id ledger as COW; additionally a replayed
  * delta (same lsn, same payload) collapses in the LWW fold, so even a
  * bypassed ledger cannot change the resolved state.
  */
object MergeOnRead {

  import Merge.LsnCol

  private val DeltaCols = Seq("lsn", "op")

  /** Append one deduped change batch as delta files and commit.
    * @param requireWatermarkBelow abort with a typed
    *   [[Merge.CommitConflict]] (BEFORE committing — the staged delta
    *   files become vacuum-swept orphans) if the head's watermark has
    *   reached this LSN by commit time. Callers that STAMP their events
    *   with a watermark-derived LSN (SQL MERGE INTO) pass their stamped
    *   LSN here: a concurrent commit landing an event at the identical
    *   LSN for the same doc would otherwise make the LWW fold's winner
    *   an undefined tie; the guard turns that window into a retryable
    *   typed failure instead (round-4 review finding). */
  /** @param preCommitBarrier invoked after the delta files are written
    *   and observed, immediately BEFORE the first commit attempt — the
    *   pipeline passes a barrier that joins its concurrently-running
    *   side-table staging job (guide §2.6: overlap independent jobs),
    *   so the staged-before-commit crash contract holds unchanged; a
    *   barrier failure aborts the batch pre-commit, exactly like the
    *   old synchronous staging failure. */
  def apply(
      table: SnapshotTable,
      dedupedBatch: DataFrame,
      commitId: String,
      batchId: Long,
      requireWatermarkBelow: Option[Long] = None,
      preCommitBarrier: () => Unit = () => ()): MergeStats = {
    val t0  = System.nanoTime()
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot; create() first"))

    if (table.appliedCommitIds.contains(commitId)) {
      return MergeStats(commitId, cur.version, skipped = true, 0, cur.rowCount,
        cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1,
        (System.nanoTime() - t0) / 1000000, Seq.empty)
    }

    // schema gate / evolution — identical rules to COW
    val targetPayload = StructType(cur.schema.fields.filterNot(f =>
      Merge.InternalCols.contains(f.name)))
    val batchPayload = StructType(dedupedBatch.schema.fields.filterNot(f =>
      (DeltaCols :+ "ingest_ts").contains(f.name)))
    val (evolvedPayload, changes) = SchemaEvolution.evolve(targetPayload, batchPayload)

    val numBuckets = cur.numBuckets
    val present    = dedupedBatch.columns.toSet
    val delta = dedupedBatch.select(
      evolvedPayload.fields.toIndexedSeq.map { f =>
        if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } ++ Seq(
        col("lsn"), col("op"),
        pmod(xxhash64(col("doc_id")), lit(numBuckets.toLong)).cast("int").as("_bucket")): _*)

    val obs = Observation(s"mor-$commitId")
    val observed = delta.observe(
      obs,
      sum(when(col("op") === "I", 1L).otherwise(0L)).as("inserted"),
      sum(when(col("op") === "U", 1L).otherwise(0L)).as("updated"),
      sum(when(col("op") === "D", 1L).otherwise(0L)).as("deleted"),
      count(lit(1)).as("batch_events"),
      min(col("lsn")).as("min_lsn"),
      max(col("lsn")).as("max_lsn"))

    // `.d` marks delta (change-event) files; the writer-unique nonce —
    // twin-process safety — is appended by writeDataFiles itself (dir =
    // c-<id>.d.<nonce>), uniformly for every commit path since round 5.
    val newDeltas = table.writeDataFiles(observed, s"$commitId.d", numBuckets)
    val m         = obs.get
    def g(k: String): Long = m.get(k) match {
      case Some(null)      => -1L
      case Some(v: Long)   => v
      case Some(v: Number) => v.longValue()
      case _               => -1L
    }

    val maxLsn = g("max_lsn")
    val minEventLsn = { val lo = g("min_lsn"); if (lo < 0) Long.MaxValue else lo }
    preCommitBarrier()
    // Optimistic concurrency: a delta APPEND commutes with any commit
    // that landed since we read `cur` — the data files are already on
    // disk under this commit's unique c-<id>.d prefix, so losing the
    // version CAS race costs only a manifest rebase, never a data
    // rewrite (Iceberg fast-append retry analog). Schema is re-evolved
    // against the new head each attempt; a now-incompatible evolution
    // aborts loudly. Bounded attempts: unbounded contention means the
    // deployment violates the documented writer topology — fail, don't
    // spin.
    var attempt  = 0
    var committed = false
    var committedVersion = -1L
    var twinLanded = false
    // schema changes of the attempt that ACTUALLY commits — a rebase onto
    // a head that already evolved reports the residual changes, not the
    // pre-loop evolution computed against the stale head
    var committedChanges = changes
    while (!committed) {
      val head = table.current.get
      if (attempt > 0 && table.appliedCommitIds.contains(commitId)) {
        // the same logical commit landed from a twin process — OUR data
        // files (unique nonce dir) are orphans; vacuum sweeps them.
        // This writer committed nothing: report it as a ledger skip.
        committed = true
        twinLanded = true
        committedVersion = head.version
      } else {
        require(head.numBuckets == numBuckets,
          s"concurrent rebucket: table now has ${head.numBuckets} buckets, batch bucketed for $numBuckets")
        requireWatermarkBelow.filter(_ <= head.watermarkLsn).foreach { l =>
          throw Merge.CommitConflict(commitId, Set.empty,
            s"a concurrent commit advanced the watermark to ${head.watermarkLsn}, " +
              s"at or past this batch's stamped LSN $l — the events' LSNs are no " +
              "longer unique; retry the statement to re-derive them")
        }
        val headPayload = StructType(head.schema.fields.filterNot(f =>
          Merge.InternalCols.contains(f.name)))
        val (rebasedPayload, rebasedChanges) = SchemaEvolution.evolve(headPayload, batchPayload)
        val rebasedSchema = StructType(rebasedPayload.fields ++ Seq(
          StructField(LsnCol, LongType, nullable = false),
          StructField(Merge.TombCol, BooleanType, nullable = true)))
        try {
          table.commit(Manifest(
            version = head.version + 1,
            parent = head.version,
            commitId = commitId,
            batchId = batchId,
            schemaJson = rebasedSchema.json,
            numBuckets = numBuckets,
            watermarkLsn = math.max(head.watermarkLsn, maxLsn),
            rowCount = head.rowCount,
            files = head.files,
            deltaFiles = head.deltaFiles ++ newDeltas,
            deltaRows = head.deltaRows + newDeltas.map(_.rows).sum,
            minEventLsn = minEventLsn))
          committed = true
          committedVersion = head.version + 1
          committedChanges = rebasedChanges
        } catch {
          case _: java.nio.file.FileAlreadyExistsException if attempt < 20 =>
            attempt += 1 // lost the CAS — rebase onto the new head
        }
      }
    }

    if (twinLanded)
      MergeStats(commitId, committedVersion, skipped = true, 0,
        cur.rowCount, cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1,
        (System.nanoTime() - t0) / 1000000, Seq.empty)
    else
      // I/U/D counts here are the batch's op mix, not net effect on the
      // table (unknowable without the fold MOR defers by design).
      // version = the ACTUALLY committed version (post-rebase), not the
      // pre-loop head + 1 — changesSince(stats.version) depends on it.
      MergeStats(
        commitId, committedVersion, skipped = false,
        newDeltas.map(_.bucket).distinct.size,
        cur.rowCount, cur.rowCount,
        inserted = g("inserted"), updated = g("updated"), deleted = g("deleted"),
        deleteNoops = 0, staleEvents = 0,
        batchEvents = g("batch_events"), minLsn = g("min_lsn"), maxLsn = maxLsn,
        wallMs = (System.nanoTime() - t0) / 1000000,
        schemaChanges = committedChanges.map(_.toString))
  }

  /** Resolved (fully merged) view of a snapshot: base ∪ deltas → LWW by
    * LSN per doc_id. Both sides shuffle on doc_id once; base rows act as
    * events at their stored `_lsn` (op = D for persisted tombstones).
    * The result RETAINS winning tombstones as `_tombstone = true` rows —
    * readers filter them, [[compact]] persists them (so late lower-LSN
    * events can never resurrect a deleted doc), vacuum/expiry drops them
    * below the applied-LSN frontier. */
  def resolve(table: SnapshotTable, version: Option[Long] = None): DataFrame =
    resolveBuckets(table, buckets = None, version)

  /** [[resolve]] restricted to a bucket subset: both base and delta file
    * lists prune BEFORE any IO (point lookups touch 1/numBuckets of the
    * table). Correct because doc_id fully determines its bucket. */
  def resolveBuckets(
      table: SnapshotTable, buckets: Set[Int]): DataFrame =
    resolveBuckets(table, Some(buckets), None)

  /** Point-lookup read path: hash-bucket pruning (doc_id determines its
    * bucket) AND zone-map pruning (skip files whose footer min/max doc_id
    * range cannot contain the key — [[graft.table.DataFile.mayContain]]).
    * At many commits per bucket the zone map skips the commit files the
    * key never landed in; stat-less files are never pruned.
    *
    * The result is valid ONLY for rows with doc_id = docId (other keys in
    * surviving files may fold against a pruned subset of their events) —
    * callers must filter on the key, as [[graft.streaming.CdcPipeline.lookup]]
    * does. */
  def resolveKey(table: SnapshotTable, docId: String): DataFrame = {
    val m = table.current.getOrElse(
      throw new IllegalStateException(s"no snapshot at ${table.root}"))
    resolveBuckets(
      table, Some(Set(bucketOfValue(docId, m.numBuckets))), None, Some(docId))
  }

  /** Dirty-bucket counts up to this size resolve as one plan branch PER
    * BUCKET (scan → coalesce(1) → in-task sort+fold): zero exchanges.
    * Above it the plan would bloat, so the dirty slice takes ONE exchange
    * keyed on the bucket id (exact identity partitioner) — never on
    * doc_id, and never covering clean buckets. */
  private val PerBucketPlanLimit = 64

  /** Target rows per bucket-local fold task (scale-adaptive branch
    * sizing — see the group fold in [[foldDirtyBuckets]]). Parameterised
    * for clusters via `graft.fold.rowsPerTask`; the default keeps a
    * branch's external sort comfortably in one task's memory (~250k
    * full-payload rows ≈ 50 MB) while a fixture-scale fold collapses to
    * a single small-plan branch. */
  private def FoldRowsPerTask: Long =
    sys.props.get("graft.fold.rowsPerTask").map(_.toLong).getOrElse(262144L)

  private[graft] def resolveBuckets(
      table: SnapshotTable,
      buckets: Option[Set[Int]],
      version: Option[Long],
      key: Option[String] = None): DataFrame = {
    val m = version.map(table.manifest).orElse(table.current).getOrElse(
      throw new IllegalStateException(s"no snapshot at ${table.root}"))
    def prune(fs: Seq[graft.table.DataFile]) = {
      val byBucket = buckets match {
        case Some(bs) => fs.filter(f => bs.contains(f.bucket))
        case None     => fs
      }
      key match {
        case Some(k) => byBucket.filter(_.mayContain(k))
        case None    => byBucket
      }
    }
    val baseFiles  = prune(m.files)
    val deltaFiles = prune(m.deltaFiles)
    // explicit-version reads (time travel, changelog windows) fail typed
    // when files vacuum reclaimed are needed, not with a mid-task
    // FileNotFound — checked AFTER pruning, so a bucket- or key-pruned
    // read of a partially vacuumed old version succeeds whenever every
    // file it will actually touch still exists (vacuum routinely leaves
    // carried-forward files of old versions intact; only the unpruned
    // read needs the whole manifest)
    if (version.exists(v => !table.currentVersion.contains(v)))
      table.verifyReadable(m, baseFiles ++ deltaFiles)
    if (deltaFiles.isEmpty) return table.readFiles(baseFiles, m.schema)

    // Bucket-aligned fold. Both sides are bucketed by the SAME
    // pmod(xxhash64(doc_id), B), so the LWW fold never needs a doc_id
    // shuffle: buckets WITHOUT deltas stream straight from base files
    // (zero IO amplification, zero shuffle — the common trickle case
    // leaves most of the table here), and only delta-carrying buckets
    // fold, each inside a single task over its own files.
    val dirtySet = deltaFiles.map(_.bucket).toSet
    val clean = table.readFiles(
      baseFiles.filterNot(f => dirtySet.contains(f.bucket)), m.schema)
    val folded = foldDirtyBuckets(
      table, m,
      baseFiles.filter(f => dirtySet.contains(f.bucket)), deltaFiles,
      classified = false)
    clean.unionByName(folded)
  }

  /** Action column emitted by the classified fold: the NET transition per
    * key, matching the per-row action taxonomy of the round-1 join-based
    * merge (keep / stale / insert / update / delete / delete_noop). */
  private[operators] val ActionCol = "_action"

  /** Folded rows for delta-carrying buckets ONLY (callers union clean
    * buckets or carry their files by reference). Up to
    * [[PerBucketPlanLimit]] buckets fold as one narrow branch each
    * (scan → coalesce(1) → in-task sort+fold — no exchange anywhere);
    * beyond that, one exchange over the dirty slice keyed on the bucket
    * id via [[graft.table.SnapshotTable.routeByBucket]] — never on
    * doc_id. Either way each bucket's rows land whole in one partition
    * (singly, or as a capped-width residue class of buckets — both
    * satisfy writeDataFiles' prePartitioned contract).
    * @param classified append [[ActionCol]] for stats observation. */
  private def foldDirtyBuckets(
      table: SnapshotTable,
      m: Manifest,
      baseFiles: Seq[graft.table.DataFile],
      deltaFiles: Seq[graft.table.DataFile],
      classified: Boolean): DataFrame = {
    val dirtyBuckets = deltaFiles.map(_.bucket).distinct.sorted
    val payloadCols =
      m.schema.fieldNames.filterNot(Merge.InternalCols.contains).toSeq
    val payloadFields =
      m.schema.fields.filter(f => payloadCols.contains(f.name)).toSeq
    val deltaSchema = StructType(
      payloadFields ++
        Seq(StructField("lsn", LongType, nullable = false),
          StructField("op", StringType, nullable = false)))
    val baseOp = when(coalesce(col(Merge.TombCol), lit(false)), lit("D"))
      .otherwise(lit("I")).as("op")
    def eventsOf(base: DataFrame, deltas: DataFrame): DataFrame =
      base.select(payloadCols.map(col) :+ col(LsnCol).as("lsn") :+ baseOp :+
          lit(true).as("_from_base"): _*)
        .unionByName(deltas.select(
          payloadCols.map(col) :+ col("lsn") :+ col("op") :+
            lit(false).as("_from_base"): _*))

    if (dirtyBuckets.size <= PerBucketPlanLimit) {
      // One narrow branch per BUCKET GROUP; the union schedules as ONE
      // stage with one task per group — no exchange anywhere. Groups are
      // data-sized (round-6, guide §1.2/§7.3): the round-4 shape used
      // one branch per bucket unconditionally, so a trickle fold over a
      // 16-bucket fixture built a 16-branch union plan whose per-branch
      // analysis + codegen dominated wall time (measured: fixture-query
      // wall ≈ 2× summed job time, the gap all driver-side planning).
      // Branch count now tracks the DATA — ceil(rows / FoldRowsPerTask),
      // floored at one branch, capped at one per bucket — so a tiny fold
      // is one task under one small plan while a full-table fold keeps
      // per-bucket parallelism. Buckets pack into groups by descending
      // row count (LPT) for balance; a group is a deterministic set of
      // whole buckets, so every doc_id still folds inside one task (the
      // same residue-class contract as the routed path below).
      val rowsByBucket: Map[Int, Long] =
        (baseFiles ++ deltaFiles).groupBy(_.bucket)
          .map { case (b, fs) => b -> fs.map(_.rows).sum }
      val totalRows = rowsByBucket.values.sum
      val nGroups = math.max(1, math.min(
        dirtyBuckets.size.toLong,
        (totalRows + FoldRowsPerTask - 1) / FoldRowsPerTask).toInt)
      val groups: Seq[Seq[Int]] =
        if (nGroups == dirtyBuckets.size) dirtyBuckets.map(Seq(_))
        else {
          val bins = Array.fill(nGroups)(
            (0L, scala.collection.mutable.ArrayBuffer[Int]()))
          dirtyBuckets
            .sortBy(b => (-rowsByBucket.getOrElse(b, 0L), b))
            .foreach { b =>
              val i = bins.indices.minBy(j => bins(j)._1)
              bins(i) = (bins(i)._1 + rowsByBucket.getOrElse(b, 0L),
                bins(i)._2 += b)
            }
          bins.toSeq.map(_._2.toSeq).filter(_.nonEmpty)
        }
      groups.map { bs =>
        val set = bs.toSet
        localLww(
          eventsOf(
            table.readFiles(baseFiles.filter(f => set.contains(f.bucket)), m.schema),
            table.readFiles(deltaFiles.filter(f => set.contains(f.bucket)), deltaSchema))
            .coalesce(1),
          payloadFields, classified)
      }.reduce(_ unionByName _)
    } else {
      // many dirty buckets: one exchange over the dirty slice only,
      // keyed on the bucket id through the identity-probe remap (equal
      // bucket → one partition slot; doc_id is never a shuffle key).
      // Width is capped like the write path: at high bucket counts a
      // 1:1 bucket→task fold schedules thousands of near-empty tasks;
      // a residue-class slot still co-locates every row of a doc_id
      // (bucket → slot is a function of the bucket), which is all the
      // partition-local LWW needs.
      val withB = eventsOf(
        table.readFiles(baseFiles, m.schema),
        table.readFiles(deltaFiles, deltaSchema))
        .withColumn("_b", bucketOf(col("doc_id"), m.numBuckets))
      localLww(
        graft.table.SnapshotTable.routeByBucket(withB, col("_b"), m.numBuckets)
          .drop("_b"),
        payloadFields, classified)
    }
  }

  /** Last-writer-wins fold WITHIN each partition (callers guarantee all
    * rows of a doc_id share a partition — the bucket invariant): external
    * sort by (doc_id, lsn), then keep the last row of every doc_id run.
    * Same result as groupBy(doc_id).agg(max_by(…, lsn)) without the hash
    * aggregate or its exchange; O(1) state per task beyond the sort.
    * Input layout: payload…, lsn, op, _from_base. */
  private[operators] def localLww(
      events: DataFrame, payloadFields: Seq[StructField],
      classified: Boolean): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = StructType(payloadFields ++ Seq(
      StructField(LsnCol, LongType, nullable = false),
      StructField(Merge.TombCol, BooleanType, nullable = true)) ++
      (if (classified) Seq(StructField(ActionCol, StringType, nullable = false))
       else Seq.empty))
    val nPayload = payloadFields.size
    val docIdIdx = payloadFields.indexWhere(_.name == "doc_id")
    val lsnIdx   = nPayload
    val opIdx    = nPayload + 1
    val fromIdx  = nPayload + 2
    events
      // _from_base last in the sort = base wins LSN ties (keep-last fold),
      // matching the strict `batch.lsn > target._lsn` contract: a replayed
      // event at its already-applied LSN is a stale no-op, not an update
      .sortWithinPartitions(col("doc_id"), col("lsn"), col("_from_base"))
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[Row] {
          override def hasNext: Boolean = in.hasNext
          override def next(): Row = {
            var cur       = in.next()
            var baseLive  = false // run contains a live (non-tombstone) base row
            var batchSeen = false
            def note(r: Row): Unit = {
              if (r.getBoolean(fromIdx)) baseLive = r.getString(opIdx) != "D"
              else batchSeen = true
            }
            note(cur)
            while (in.hasNext &&
                java.util.Objects.equals(in.head.get(docIdIdx), cur.get(docIdIdx))) {
              cur = in.next(); note(cur)
            }
            val winnerIsDelete = cur.getString(opIdx) == "D"
            val vals = new Array[Any](outSchema.size)
            var i = 0
            while (i < nPayload) { vals(i) = cur.get(i); i += 1 }
            vals(lsnIdx) = cur.getLong(lsnIdx)
            vals(opIdx)  = winnerIsDelete
            if (classified)
              vals(fromIdx) =
                if (cur.getBoolean(fromIdx)) { if (batchSeen) "stale" else "keep" }
                else if (!winnerIsDelete) { if (baseLive) "update" else "insert" }
                else { if (baseLive) "delete" else "delete_noop" }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Eagerly fold ALL pending deltas back into base files — the write
    * half of the copy-on-write path ([[Merge]] = delta commit + this).
    * Unlike [[compact]], only delta-CARRYING buckets are read and
    * rewritten (untouched base files carry by manifest reference), the
    * fold is bucket-local (≤[[PerBucketPlanLimit]] dirty buckets → zero
    * exchanges; beyond → one bucket-keyed exchange over the dirty slice
    * — doc_id is never a shuffle key), and the write skips the routing
    * exchange entirely (the fold output is already one-bucket-per-
    * partition). Net-effect action counts (insert/update/delete/
    * delete_noop/stale) come from an exactly-once Observation on the
    * single write pass. */
  def foldTouched(
      table: SnapshotTable, commitId: String, batchId: Long): MergeStats = {
    val t0  = System.nanoTime()
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot"))
    if (cur.deltaFiles.isEmpty)
      return MergeStats(commitId, cur.version, skipped = true, 0, cur.rowCount,
        cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1,
        (System.nanoTime() - t0) / 1000000, Seq.empty)

    val touched = cur.deltaFiles.map(_.bucket).toSet
    val touchedBase = cur.files.filter(f => touched.contains(f.bucket))
    // fold choice mirrors compact()'s measured A/B: below the per-bucket
    // plan limit the bucket-local fold runs with ZERO exchanges
    // (plan-gated — the trickle case's precious property); above it the
    // sort path would pay a bucket-keyed exchange + external sort + row
    // codec anyway, and the hash-agg fold beats that by ~2× (BASELINE.md
    // round-4). GRAFT_FOLD=agg|sort forces either for studies.
    val payloadFields =
      cur.schema.fields.filterNot(f => Merge.InternalCols.contains(f.name)).toSeq
    val choice = sys.env.get("GRAFT_FOLD")
      .getOrElse(if (touched.size > PerBucketPlanLimit) "agg" else "sort")
    val useAgg = choice != "sort"
    val folded = choice match {
      case "agg" => aggLww(
        eventsFrame(table, cur, touchedBase, cur.deltaFiles),
        payloadFields, classified = true)
      case "sort" => foldDirtyBuckets(
        table, cur, touchedBase, cur.deltaFiles, classified = true)
      case _ => aggLwwViaWinners(
        eventsFrame(table, cur, touchedBase, cur.deltaFiles),
        payloadFields, classified = true)
    }
    val obs = Observation(s"fold-$commitId")
    def cnt(a: String) = sum(when(col(ActionCol) === a, 1L).otherwise(0L)).as(a)
    val observed = folded.observe(
      obs, cnt("insert"), cnt("update"), cnt("delete"), cnt("delete_noop"), cnt("stale"))
    val out = observed
      .drop(ActionCol)
      .withColumn("_bucket", bucketOf(col("doc_id"), cur.numBuckets))
    val newFiles =
      table.writeDataFiles(out, commitId, cur.numBuckets, prePartitioned = !useAgg)
    val m = obs.get
    def g(k: String): Long = m.get(k) match {
      case Some(null)      => 0L
      case Some(v: Number) => v.longValue()
      case _               => 0L
    }
    val carried = cur.files.filterNot(f => touched.contains(f.bucket))
    val newRows = newFiles.map(_.rows).sum + carried.map(_.rows).sum
    table.commit(Manifest(
      version = cur.version + 1,
      parent = cur.version,
      commitId = commitId,
      batchId = batchId,
      schemaJson = cur.schemaJson,
      numBuckets = cur.numBuckets,
      watermarkLsn = cur.watermarkLsn,
      rowCount = newRows,
      files = carried ++ newFiles,
      minEventLsn = Long.MaxValue)) // fold: no new events
    MergeStats(
      commitId, cur.version + 1, skipped = false, touched.size,
      cur.rowCount, newRows,
      inserted = g("insert"), updated = g("update"), deleted = g("delete"),
      deleteNoops = g("delete_noop"), staleEvents = g("stale"),
      batchEvents = 0, minLsn = -1, maxLsn = cur.watermarkLsn,
      wallMs = (System.nanoTime() - t0) / 1000000, Seq.empty)
  }

  /** CDC-out: the change events applied BETWEEN two snapshot versions,
    * as (payload…, lsn, op) rows with UPSERT semantics — op is 'U'
    * (upsert: insert-or-update) or 'D' (delete), never 'I', because the
    * snapshot-diff fallback below cannot reconstruct insert-vs-update
    * and both paths must emit identical change sets. The engine's own
    * changelog view
    * (Iceberg incremental-scan analog), letting downstream consumers tail
    * this table the way this engine tails its source.
    *
    * Cost model: commits that went through the delta path (MOR applies —
    * their manifests reference `c-*.d` files) replay exactly from those
    * files at O(changes); delta files stay on disk after folding until
    * `vacuum` expires their versions, so the recent-history window this
    * serves is the vacuum retention window. COW join commits write no
    * delta files, so a range containing one falls back to a snapshot
    * DIFF: new-version rows whose `_lsn` is above the old version's
    * watermark — O(newer table scan) with the `_lsn > w` predicate pushed
    * to parquet (row-group pruning), exact because every applied change
    * bumps the row's `_lsn` and LSNs are monotonic across commits.
    * Deletes surface as op='D' tombstone rows in both paths.
    *
    * Path-equivalence contract: LWW-folding either path's output onto
    * the from-version's live view yields the to-version's live view.
    * REPLAY paths emit every APPLIED event (one that advanced its doc's
    * stored `_lsn`) plus, when several commits touched one doc,
    * superseded intermediates — including delete events for docs not
    * live at `from` (a tombstone advance, or a delete of an absent doc
    * the commit persisted). Such delete rows fold to "not live", which
    * the doc already was: fold-harmless. The DIFF paths emit only net
    * live-view changes and never those rows. Emitting applied deletes
    * unconditionally is load-bearing, not sloppiness: whether a D is a
    * "no-op" CANNOT be decided against the from-state — a range that
    * inserts a doc and then deletes it in later commits has a D that is
    * absent-at-from yet essential (dropping it would fold the doc LIVE);
    * only provably-unapplied events (lsn ≤ the doc's from `_lsn`, a
    * floor that never decreases) are safe to drop. Whether an event at
    * or below the from-watermark was applied is decided PER DOC against
    * the from-state (never the global watermark, which would drop
    * genuinely applied out-of-order updates); the cheap watermark-keyed
    * fast paths run only when the range's recorded minEventLsn proves no
    * such event exists.
    *
    * Rollback contract ([[TableMaintenance.rollbackTo]]): a range
    * containing a rollback (batchId == -3, or — for pre-marker
    * manifests — a commit that decreased the watermark) is a
    * retraction — neither replay path above can express it (the rolled-
    * back rows' LSNs sit below the from-watermark). Such ranges resolve
    * by exact STATE DIFF of the two snapshots: docs live in `to` whose
    * winning `_lsn` differs from their `from` state emit op='U' at the
    * to-state's `_lsn` (which may be BELOW from's watermark — that is
    * what retraction means); docs live in `from` but not in `to` emit
    * op='D' at the deleting event's LSN when `to` holds a tombstone, else
    * at the retracted row's own `_lsn`. Pinned by PipelineSpec
    * "changesSince across a rollback emits the retraction diff". */
  /** Does any commit in `range` roll the table back? Detection contract
    * documented at the changesSince call site (explicit batchId -3
    * marker + watermark-decrease backstop). Exposed for the streaming
    * changelog source's `onRollback=fail` policy. */
  private[graft] def rangeContainsRollback(
      table: SnapshotTable, range: Seq[Long]): Boolean =
    range.exists { v =>
      val m = table.manifest(v)
      m.batchId == -3L || m.watermarkLsn < table.manifest(m.parent).watermarkLsn
    }

  private[graft] def rangeContainsRollback(
      table: SnapshotTable, fromVersion: Long, to: Long): Boolean =
    rangeContainsRollback(table, table.versions.filter(v => v > fromVersion && v <= to))

  def changesSince(
      table: SnapshotTable, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.orElse(table.currentVersion).getOrElse(
      throw new IllegalStateException(s"no snapshot at ${table.root}"))
    require(fromVersion <= to, s"fromVersion $fromVersion > toVersion $to")
    val mFrom = table.manifest(fromVersion)
    val mTo   = table.manifest(to)
    val payloadCols =
      mTo.schema.fieldNames.filterNot(Merge.InternalCols.contains).toSeq
    val range = table.versions.filter(v => v > fromVersion && v <= to)

    // a rollback in the range forces the exact state diff — replay
    // cannot express retraction. Detected by the rollback commit's
    // explicit batchId marker (-3, stamped by rollbackTo), NOT by
    // watermark decrease alone: a rollback undoing a commit that applied
    // only below-watermark events is watermark-NEUTRAL, and (because
    // rollbackTo copies the TARGET manifest verbatim) may inherit
    // minEventLsn == MaxValue from a fold target — which would otherwise
    // classify the retraction as event-free and replay it as empty.
    // The watermark-decrease check stays as a backstop for manifests
    // predating the marker.
    if (rangeContainsRollback(table, range))
      return snapshotDiff(table, fromVersion, to, payloadCols)

    // delta files INTRODUCED by each commit in the range (newer manifests
    // carry older delta files forward until compaction — diff per step),
    // tagged with their version so a vacuumed-window failure can name it
    val steps: Seq[(Long, Seq[graft.table.DataFile])] = range.map { v =>
      val m      = table.manifest(v)
      val before = table.manifest(m.parent).deltaFiles.map(_.path).toSet
      v -> m.deltaFiles.filterNot(f => before.contains(f.path))
    }
    val stepFiles = steps.flatMap(_._2)
    // A commit is coverable by delta replay iff it ADDED delta files or
    // provably applied NO events (minEventLsn == MaxValue — folds and
    // rejects record it explicitly; rollbacks inherit the TARGET's value
    // but never reach this classification — hasRollback above already
    // routed them to the state diff). The round-3 heuristic
    // "no deltas added AND watermark unchanged ⇒ event-free" was WRONG:
    // a COW commit applying only below-watermark (out-of-order) events
    // leaves the watermark unchanged too, and the range silently
    // replayed as empty (found by the round-4 fold-equivalence property
    // test). Unknown minEventLsn (pre-round-3 manifests, -1) reads as
    // "may have applied events" → snapshot-diff fallback, conservative.
    val deltaOnly = range.forall { v =>
      val m      = table.manifest(v)
      val prev   = table.manifest(m.parent)
      val added  = m.deltaFiles.map(_.path).toSet
        .diff(prev.deltaFiles.map(_.path).toSet).nonEmpty
      added || m.minEventLsn == Long.MaxValue
    }
    // Did any commit in the range apply an event at or below from's
    // watermark? If provably not (every commit's recorded minEventLsn is
    // above it; event-free commits record MaxValue), the cheap
    // watermark-keyed replay/diff is EXACT: an event with lsn > w beats
    // any from-state row (whose _lsn ≤ w by definition of watermark).
    // Otherwise out-of-order events may have changed docs whose _lsn
    // stayed ≤ w — the global watermark can neither keep nor drop them
    // correctly, and only a PER-DOC comparison against the from state
    // is exact. Manifests predating minEventLsn read as "maybe"
    // (conservative → slow path).
    val w = mFrom.watermarkLsn
    val maybeBelow = range.exists { v =>
      val lo = table.manifest(v).minEventLsn
      lo < 0 || lo <= w
    }
    val deltaSchema = StructType(
      mTo.schema.fields.filter(f => payloadCols.contains(f.name)) ++
        Seq(StructField("lsn", LongType, nullable = false),
          StructField("op", StringType, nullable = false)))
    if (deltaOnly) {
      // typed vacuum check ONLY here — the snapshot-diff branch never
      // reads the delta files, so missing ones must not fail it
      steps.foreach { case (v, fs) =>
        fs.find(f => !java.nio.file.Files.exists(java.nio.file.Paths.get(f.path)))
          .foreach(f => throw graft.table.VacuumedVersionException(v, f.path))
      }
      // op is normalized to the UPSERT contract (U | D) on BOTH paths:
      // the snapshot-diff fallback cannot distinguish an insert from an
      // update (state carries no was-insert flag), so the delta replay
      // must not either — the two paths must emit identical change sets
      // for the same range regardless of which commits happen to be in it
      val replay = table.readFiles(stepFiles, deltaSchema)
        .select(payloadCols.map(col) :+ col("lsn") :+
          when(col("op") === "D", lit("D")).otherwise(lit("U")).as("op"): _*)
      if (!maybeBelow) replay // every event provably beat the from state
      else {
        // out-of-order events possible: keep an at-or-below-watermark
        // event only if it beat ITS OWN doc's from-state lsn (it was a
        // state change) — never the global watermark, which would drop
        // genuinely applied updates (round-3 review finding). The from
        // state is read bucket-pruned to the below-slice's keys, so the
        // common mostly-monotonic stream pays O(below), not O(table).
        val above = replay.filter(col("lsn") > w)
        val below = replay.filter(col("lsn") <= w)
        // the probe re-scans the delta files but reads ONLY doc_id
        // (column pruning) — the payload is read once per output leg
        val bs = below
          .select(bucketOf(col("doc_id"), mFrom.numBuckets).as("_b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val fromState = resolveBuckets(table, Some(bs), Some(fromVersion))
          .select(col("doc_id").as("_f_doc"), col(LsnCol).as("_f_lsn"))
        // drop ONLY provably-unapplied events (lsn ≤ the doc's from-state
        // `_lsn` floor). Deletes are NOT liveness-filtered: a from-state
        // check cannot tell an ignorable delete-noop from the delete of a
        // doc an earlier in-range commit inserted — dropping the latter
        // would fold the doc live (round-4 fix; see the path-equivalence
        // contract above). Over-emitting a fold-harmless D is safe;
        // under-emitting an applied one is wrong.
        val belowKept = below
          .join(fromState, col("doc_id") === col("_f_doc"), "left")
          .filter(col("_f_lsn").isNull || col("lsn") > col("_f_lsn"))
          .drop("_f_doc", "_f_lsn")
        above.unionByName(belowKept)
      }
    } else {
      // COW commits in range left no replayable change records.
      // Fast path (provably exact when nothing landed at/below w): the
      // to-state rows whose _lsn exceeds from's watermark. Otherwise an
      // applied out-of-order event can hide at _lsn ≤ w, and only the
      // full snapshot state diff is exact.
      if (maybeBelow) snapshotDiff(table, fromVersion, to, payloadCols)
      else
        resolveBuckets(table, None, Some(to))
          .filter(col(Merge.LsnCol) > w)
          .select(payloadCols.map(col) :+ col(Merge.LsnCol).as("lsn") :+
            when(coalesce(col(Merge.TombCol), lit(false)), lit("D"))
              .otherwise(lit("U")).as("op"): _*)
    }
  }

  /** Tail the table's changelog: poll the manifest chain and hand each
    * new version range to `onBatch` as a [[changesSince]] frame — the
    * downstream-consumer loop that lets another pipeline tail THIS
    * table exactly the way this engine tails its source (the engine's
    * own events are its consumers' change log). Ranges containing a
    * rollback arrive as retraction state diffs; a vacuumed window fails
    * typed (both per the [[changesSince]] contracts). Single reader
    * loop — parallelism lives inside each frame, not across polls.
    * @param onBatch (frame, fromVersion, toVersion) → keep following?
    * @param maxIdlePolls stop after this many consecutive empty polls
    *   (drain-then-exit, the AvailableNow shape); -1 = follow forever
    *   (until `onBatch` returns false)
    * @return the last version handed to `onBatch` */
  def followChanges(
      table: SnapshotTable, fromVersion: Long,
      pollMs: Long = 1000L, maxIdlePolls: Int = -1)(
      onBatch: (DataFrame, Long, Long) => Boolean): Long = {
    var from = fromVersion
    var idle = 0
    var go   = true
    while (go) {
      val head = table.currentVersion.getOrElse(from)
      if (head > from) {
        idle = 0
        go = onBatch(changesSince(table, from, Some(head)), from, head)
        from = head
      } else {
        idle += 1
        // the Nth consecutive empty poll exits WITHOUT a trailing sleep
        if (maxIdlePolls >= 0 && idle >= maxIdlePolls) go = false
        else Thread.sleep(pollMs)
      }
    }
    from
  }

  /** Exact state diff between two snapshot versions, for ranges replay
    * cannot express: rollback retraction (see [[changesSince]]'s
    * rollback contract) and COW ranges that may have applied
    * out-of-order events at or below the from-watermark. One full-outer
    * join of the two resolved snapshots on doc_id; rows whose live
    * state is identical (same winning `_lsn`, same liveness) drop out.
    * Equal `_lsn` implies an identical row: the payload is a pure
    * function of the winning event, and LWW means `_lsn` names that
    * event. */
  private def snapshotDiff(
      table: SnapshotTable, fromVersion: Long, toVersion: Long,
      payloadCols: Seq[String]): DataFrame = {
    val from = resolve(table, Some(fromVersion)).select(
      col("doc_id").as("_f_doc"),
      col(LsnCol).as("_f_lsn"),
      coalesce(col(Merge.TombCol), lit(false)).as("_f_tomb"))
    val to = resolve(table, Some(toVersion)).select(
      payloadCols.map(col) :+ col(LsnCol).as("_t_lsn") :+
        coalesce(col(Merge.TombCol), lit(false)).as("_t_tomb"): _*)
    val fLive = col("_f_doc").isNotNull && !col("_f_tomb")
    val tLive = col("doc_id").isNotNull && !col("_t_tomb")
    to.join(from, to("doc_id") === from("_f_doc"), "full_outer")
      .filter(
        (tLive && (!fLive || col("_f_lsn") =!= col("_t_lsn"))) ||
          (fLive && !tLive))
      .select(
        payloadCols.map { c =>
          if (c == "doc_id") coalesce(col("doc_id"), col("_f_doc")).as("doc_id")
          // D rows carry key + lsn only, like every other tombstone
          else when(tLive, col(c)).otherwise(lit(null)).as(c)
        } :+
          when(tLive, col("_t_lsn"))
            .otherwise(coalesce(col("_t_lsn"), col("_f_lsn"))).as("lsn") :+
          when(tLive, lit("U")).otherwise(lit("D")).as("op"): _*)
  }

  /** Fold all deltas into fresh base files (one rewrite), emptying the
    * delta list; tombstones persist through compaction. A no-op commit
    * when there are no deltas.
    * @param expireTombstonesBelow drop tombstones with `_lsn` strictly
    *   below this LSN (safe once the source can no longer replay events
    *   older than it — the applied-LSN frontier). */
  /** @param rebucketTo rewrite into this many hash buckets instead of the
    *   table's current count — the bucket-count migration a growing table
    *   eventually needs (file count and size per bucket track table
    *   volume; at 100× the data the original count leaves each bucket
    *   file 100× too large). One full rewrite, same cost shape as any
    *   compaction; every later commit/lookup uses the new count from the
    *   manifest. */
  def compact(
      table: SnapshotTable, commitId: String,
      expireTombstonesBelow: Long = Long.MinValue,
      rebucketTo: Option[Int] = None): MergeStats = {
    val t0  = System.nanoTime()
    val cur = table.current.getOrElse(
      throw new IllegalStateException("table has no snapshot"))
    if (cur.deltaFiles.isEmpty && expireTombstonesBelow == Long.MinValue &&
        rebucketTo.forall(_ == cur.numBuckets))
      return MergeStats(commitId, cur.version, skipped = true, 0, cur.rowCount,
        cur.rowCount, 0, 0, 0, 0, 0, 0, -1, -1,
        (System.nanoTime() - t0) / 1000000, Seq.empty)

    val buckets = rebucketTo.getOrElse(cur.numBuckets)
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    // Fold choice, decided from manifest metadata (free): the measured
    // round-4 A/B (BASELINE.md, 4M events / 64 buckets) put the hash-agg
    // full fold at 1.9×/2.4× the sort+run-fold's speed at 2/8 cores with
    // better 2→8 scaling (0.59 vs 0.46) — external sort of full payload
    // rows is the bandwidth hog, not the exchange. But agg drags the
    // WHOLE table through a doc_id exchange, so a mostly-CLEAN table
    // (scheduled compact after a trickle) keeps the bucket-local fold,
    // where clean buckets stream by without folding at all.
    // GRAFT_FOLD=agg|sort forces either (the study knob).
    val dirtyFrac =
      cur.deltaFiles.map(_.bucket).distinct.size.toDouble / cur.numBuckets
    // round-6 re-measure: the winner-attach fold (GRAFT_FOLD=wa,
    // guide-§8 decide-narrow/attach-once) was built and A/B'd against
    // this agg on the 16M-event bench table — interleaved noop-sink
    // medians agg 5.2-5.7 s best-case vs wa 7.9 s: the payload rows here
    // are narrow enough that two sorts beat an extra scan + join. The
    // one-pass agg stays the mostly-dirty default; wa remains the
    // equivalence-gated study knob (OPTIMIZATION_r06.md).
    val base = sys.env.get("GRAFT_FOLD")
        .getOrElse(if (dirtyFrac >= 0.5) "agg" else "sort") match {
      case "agg"  => resolveViaAgg(table, cur)
      case "sort" => resolve(table)
      case _      => resolveViaWinners(table, cur)
    }
    val resolved = base
      .filter(
        !coalesce(col(Merge.TombCol), lit(false)) ||
          col(LsnCol) >= expireTombstonesBelow)
      .withColumn("_bucket",
        pmod(xxhash64(col("doc_id")), lit(buckets.toLong)).cast("int"))
    val newFiles = table.writeDataFiles(resolved, commitId, buckets)
    val newRows  = newFiles.map(_.rows).sum
    table.commit(cur.copy(
      version = cur.version + 1,
      parent = cur.version,
      commitId = commitId,
      batchId = -1L,
      numBuckets = buckets,
      rowCount = newRows,
      files = newFiles,
      deltaFiles = Seq.empty,
      deltaRows = 0L,
      minEventLsn = Long.MaxValue)) // compaction: no new events
    MergeStats(commitId, cur.version + 1, skipped = false, buckets,
      cur.rowCount, newRows, 0, 0, 0, 0, 0, 0, -1, cur.watermarkLsn,
      (System.nanoTime() - t0) / 1000000, Seq.empty)
  }

  /** The full-table LWW fold as ONE hash aggregation — the A/B
    * alternative to [[resolve]]'s sort+run-fold for whole-table
    * compaction: `groupBy(doc_id).agg(max_by(row, (lsn, from_base)))`
    * pays one doc_id exchange + an (Object)HashAggregate instead of a
    * bucket-keyed exchange + external sort + row-codec fold. Tie
    * semantics match [[localLww]] exactly: struct ordering on
    * (lsn, _from_base) makes the base row beat a same-LSN delta (false <
    * true). Semantically ≡ resolve() by construction (PipelineSpec gate);
    * kept env-gated (GRAFT_FOLD=agg) for the measured scaling study. */
  private[graft] def resolveViaAgg(table: SnapshotTable, m: Manifest): DataFrame = {
    val payloadFields =
      m.schema.fields.filterNot(f => Merge.InternalCols.contains(f.name)).toSeq
    aggLww(
      eventsFrame(table, m, m.files, m.deltaFiles), payloadFields,
      classified = false)
  }

  /** base ∪ delta rows in [[localLww]]'s input layout
    * (payload…, lsn, op, _from_base). */
  private def eventsFrame(
      table: SnapshotTable, m: Manifest,
      baseFiles: Seq[graft.table.DataFile],
      deltaFiles: Seq[graft.table.DataFile]): DataFrame = {
    val payloadCols =
      m.schema.fieldNames.filterNot(Merge.InternalCols.contains).toSeq
    val payloadFields =
      m.schema.fields.filter(f => payloadCols.contains(f.name)).toSeq
    val deltaSchema = StructType(
      payloadFields ++
        Seq(StructField("lsn", LongType, nullable = false),
          StructField("op", StringType, nullable = false)))
    val baseOp = when(coalesce(col(Merge.TombCol), lit(false)), lit("D"))
      .otherwise(lit("I")).as("op")
    table.readFiles(baseFiles, m.schema)
      .select(payloadCols.map(col) :+ col(LsnCol).as("lsn") :+ baseOp :+
        lit(true).as("_from_base"): _*)
      .unionByName(table.readFiles(deltaFiles, deltaSchema).select(
        payloadCols.map(col) :+ col("lsn") :+ col("op") :+
          lit(false).as("_from_base"): _*))
  }

  /** The [[localLww]] fold as ONE hash aggregation — same input layout,
    * same output contract (payload…, _lsn, _tombstone [, _action]), same
    * tie semantics (struct ordering on (lsn, _from_base): the base row
    * beats a same-LSN delta). Pays a doc_id exchange instead of the
    * external sort + row-codec run-fold; the measured winner for folds
    * covering most of the table (BASELINE.md round-4 A/B). */
  private def aggLww(
      events: DataFrame, payloadFields: Seq[StructField],
      classified: Boolean): DataFrame = {
    val payloadCols = payloadFields.map(_.name)
    val rowStruct = struct(
      payloadCols.filterNot(_ == "doc_id").map(col) ++
        Seq(col("lsn"), col("op"), col("_from_base")): _*)
    val agged = events
      .groupBy(col("doc_id"))
      .agg(
        max_by(rowStruct, struct(col("lsn"), col("_from_base"))).as("_w"),
        // per-doc facts the classification needs: a live base row exists
        // (base holds ≤1 row per doc), and any batch/delta row was seen
        max(when(col("_from_base") && col("op") =!= "D", 1).otherwise(0)).as("_bl"),
        max(when(!col("_from_base"), 1).otherwise(0)).as("_bs"))
    val baseLive = col("_bl") === 1
    val action =
      when(col("_w._from_base"),
        when(col("_bs") === 1, lit("stale")).otherwise(lit("keep")))
        .otherwise(when(col("_w.op") =!= "D",
          when(baseLive, lit("update")).otherwise(lit("insert")))
          .otherwise(when(baseLive, lit("delete")).otherwise(lit("delete_noop"))))
    agged.select(
      payloadFields.toIndexedSeq.map { f =>
        if (f.name == "doc_id") col("doc_id")
        else col(s"_w.${f.name}").as(f.name)
      } ++
        Seq(col("_w.lsn").as(LsnCol), (col("_w.op") === "D").as(Merge.TombCol)) ++
        (if (classified) Seq(action.as(ActionCol)) else Seq.empty): _*)
  }

  /** The full-table LWW fold in the decide-narrow/attach-once shape
    * (guide §8; round-6): [[aggLww]]'s one-pass `max_by` is a
    * SortAggregate — the struct-with-array buffer disqualifies hash
    * aggregation — so the whole payload (token arrays included) pays a
    * partial sort, a doc_id exchange, and a final sort. Here the winner
    * is DECIDED on narrow columns first: per-doc max lsn, the
    * base-at-max flag, and both classification facts are all
    * fixed-width-buffer aggregates (HashAggregateExec, map-side partial
    * combine, parquet scan pruned to doc_id/lsn/op — the token arrays
    * are never read in this pass). The payload then moves ONCE: a
    * shuffled-hash join (hint — no sort on either side; build side is
    * the narrow winners) attaches the winner key, a filter keeps exactly
    * the argmax rows, and the residual collapse of duplicate survivor
    * copies (at-least-once redelivery can land the same (doc, lsn) delta
    * under several commits) runs the SAME `max_by`/tie order as
    * [[aggLww]] — but over winners only, and with NO new exchange: the
    * join already clustered rows by doc_id, which satisfies the
    * aggregate's required distribution. Semantics ≡ [[aggLww]] by
    * construction (argmax-row filter: lsn = max lsn, from_base ⟺ a base
    * row exists at that lsn — base wins ties exactly like the
    * struct-ordering on (lsn, _from_base)); classification facts are
    * computed over ALL of a doc's rows in the narrow pass, never over
    * survivors. Gated by PipelineSpec's fold-equivalence tests (the
    * resolveViaAgg ≡ resolve suite and the foldTouched state+stats
    * cross-check). */
  private[operators] def aggLwwViaWinners(
      events: DataFrame, payloadFields: Seq[StructField],
      classified: Boolean): DataFrame = {
    val payloadCols = payloadFields.map(_.name)
    val winners = events
      .groupBy(col("doc_id"))
      .agg(
        max(col("lsn")).as("_g_wl"),
        max(when(col("_from_base"), col("lsn"))).as("_g_wlb"),
        max(when(col("_from_base") && col("op") =!= "D", 1).otherwise(0)).as("_g_bl"),
        max(when(!col("_from_base"), 1).otherwise(0)).as("_g_bs"))
    val joined = events
      .join(winners.hint("shuffle_hash"), Seq("doc_id"))
      .filter(col("lsn") === col("_g_wl") &&
        (col("_from_base") === (col("_g_wlb") <=> col("_g_wl"))))
    val rowStruct = struct(
      payloadCols.filterNot(_ == "doc_id").map(col) ++
        Seq(col("lsn"), col("op"), col("_from_base")): _*)
    val agged = joined
      .groupBy(col("doc_id"))
      .agg(
        max_by(rowStruct, struct(col("lsn"), col("_from_base"))).as("_w"),
        max(col("_g_bl")).as("_g_blf"),
        max(col("_g_bs")).as("_g_bsf"))
    val baseLive = col("_g_blf") === 1
    val action =
      when(col("_w._from_base"),
        when(col("_g_bsf") === 1, lit("stale")).otherwise(lit("keep")))
        .otherwise(when(col("_w.op") =!= "D",
          when(baseLive, lit("update")).otherwise(lit("insert")))
          .otherwise(when(baseLive, lit("delete")).otherwise(lit("delete_noop"))))
    agged.select(
      payloadFields.toIndexedSeq.map { f =>
        if (f.name == "doc_id") col("doc_id")
        else col(s"_w.${f.name}").as(f.name)
      } ++
        Seq(col("_w.lsn").as(LsnCol), (col("_w.op") === "D").as(Merge.TombCol)) ++
        (if (classified) Seq(action.as(ActionCol)) else Seq.empty): _*)
  }

  /** [[resolveViaAgg]]'s winner-attach twin (A/B knob GRAFT_FOLD=wa;
    * measured SLOWER than the one-pass agg on the 16M-event bench table
    * — see OPTIMIZATION_r06.md — and kept only as the measured-off
    * study variant, same discipline as Dedup.lwwSalted). */
  private[graft] def resolveViaWinners(table: SnapshotTable, m: Manifest): DataFrame = {
    val payloadFields =
      m.schema.fields.filterNot(f => Merge.InternalCols.contains(f.name)).toSeq
    aggLwwViaWinners(
      eventsFrame(table, m, m.files, m.deltaFiles), payloadFields,
      classified = false)
  }


  /** The authoritative LOGICAL view of a table (at a version): resolved
    * (base ∪ deltas, LWW), winning tombstones filtered, internal columns
    * stripped. The single definition of "the live table" — pipeline
    * reads, time travel, and bare-table forks all route through it. */
  def liveView(table: SnapshotTable, version: Option[Long] = None): DataFrame =
    resolve(table, version)
      .filter(!coalesce(col(Merge.TombCol), lit(false)))
      .drop(Merge.InternalCols: _*)

  /** Column helper shared with tests. */
  def bucketOf(docId: Column, numBuckets: Int): Column =
    pmod(xxhash64(docId), lit(numBuckets.toLong)).cast("int")

  /** Driver-side twin of [[bucketOf]] — MUST hash identically to Spark's
    * `xxhash64` (XXH64 over UTF-8 bytes, seed 42) so point lookups prune
    * to the right bucket. */
  def bucketOfValue(docId: String, numBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(docId),
      org.apache.spark.sql.types.StringType, 42L)
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }
}
