package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.operators.MergeOnRead
import graft.sources.GraftDataSource
import graft.table.SnapshotTable

/** `spark.readStream.format("graft").load(root)` — the engine's
  * changelog as a real Structured Streaming source, so downstream
  * pipelines tail THIS table exactly the way this engine tails its own
  * source (checkpointed offsets, restart recovery, AvailableNow), not
  * via the driver-side [[MergeOnRead.followChanges]] poll loop.
  *
  * Offsets are TABLE VERSIONS; each micro-batch delivers
  * [[MergeOnRead.changesSince]](from, to] under that operator's full
  * contract — rollback-containing ranges surface as retraction state
  * diffs, vacuumed windows fail typed, and the per-batch read is the
  * same native plan the batch call builds (delta-file replay with no
  * exchange on the fast path — gated in PlanSpec). The V1 `Source` API
  * is the deliberate vehicle, NOT the DSv2 `MicroBatchStream`: V1's
  * `getBatch` returns a DataFrame, so the batch plan IS the native
  * changesSince plan (pushdown, pruning, codegen intact) — a DSv2
  * micro-batch scan would force the row-granular reader shim this
  * engine's batch path deliberately avoids; Delta Lake's streaming
  * source ships on the same V1 trait for the same reason.
  *
  * Options:
  *  - `startingVersion`: emit changes AFTER this committed version
  *    (default: the head version when the stream first starts — new
  *    changes only). `earliest` names the table's oldest version
  *    (full-history replay; on a vacuum-truncated table the replay
  *    fails typed once it reaches reclaimed data files —
  *    [[GraftChangelogSource.VacuumedWindow]], naming `initialSnapshot`
  *    as the full-state fix), `latest` spells the default
  *    explicitly. Persisted under the checkpoint's source-metadata
  *    dir so restarts replay the identical window even after the head
  *    moves.
  *  - `initialSnapshot`: `true` makes batch 0 the table's LIVE VIEW at
  *    the anchor version — every live row as an op='U' upsert carrying
  *    its ORIGINAL `_lsn` — before the tail of changes begins. With the
  *    graft upsert sink (which applies (lsn, op) frames by LWW) this
  *    makes snapshot-plus-tail replication ONE standing statement, no
  *    separate [[CdcPipeline.bootstrap]] step: snapshot rows land at
  *    their true lsns, so later change events beat them and re-delivered
  *    snapshot rows are recognized as stale, exactly the bootstrap⊕tail
  *    composition argument. The mode is pinned in the checkpoint next to
  *    the anchor version (changing the option on restart is ignored —
  *    the checkpoint's contract wins). Because the mode exists for LWW
  *    replicas — the consumer for whom rollback retraction diffs
  *    silently diverge — it flips `onRollback`'s default to `fail`
  *    (set the option explicitly to opt back into `retract`).
  *    Default `false`.
  *  - `maxVersionsPerTrigger`: cap how many table versions one
  *    micro-batch may cover (rate limiting; default unbounded). The
  *    snapshot batch is version-atomic (it is "version anchor itself")
  *    and always delivered whole, as its own batch 0.
  *  - `onRollback`: `retract` (default without `initialSnapshot`)
  *    delivers a rollback window as an
  *    exact retraction state diff — right for state consumers (sync to
  *    a warehouse, rebuild an index). `fail` throws typed
  *    ([[GraftChangelogSource.RollbackInWindow]]) instead — REQUIRED for
  *    LWW-keyed consumers such as the graft upsert sink: retraction rows
  *    carry their original (older) lsns, which last-writer-wins drops as
  *    stale, silently diverging the replica.
  *
  * Exactly-once: `changesSince` is a pure function of the immutable
  * manifest chain, so a checkpoint-replayed (start, end] re-delivers
  * byte-identical rows. Schema is pinned at stream start; columns a
  * later evolution ADDS are not surfaced until the stream restarts
  * (emitting frames are aligned to the pinned schema), and a pinned
  * column ABSENT from a window's schema null-fills rather than failing:
  * that covers both windows predating the column's addition (the common
  * rate-limited-catch-up case) and the rarer mid-stream narrowing (a
  * rollback restoring a pre-evolution schema) — consumers that must
  * distinguish "null value" from "column did not exist yet" should
  * restart the stream after an evolution rather than read through it.
  */
final class GraftChangelogSource(
    spark: SparkSession,
    root: String,
    metadataPath: String,
    startingVersion: Option[String],
    maxVersionsPerTrigger: Option[Int],
    onRollback: String = "retract",
    initialSnapshot: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(Seq("retract", "fail").contains(onRollback),
    s"onRollback must be 'retract' or 'fail', got '$onRollback'")

  private val table = SnapshotTable.load(spark, root)

  /** The stream's from-version plus the initial-snapshot mode, fixed at
    * FIRST start and persisted together in the source-metadata dir:
    * batch 0's range start is not in Spark's offset log (its `start` is
    * None), so without this file a restart before batch 0 committed
    * would silently re-anchor at the new head and drop the window in
    * between — and a restart with a CHANGED initialSnapshot option would
    * re-interpret an already-logged batch-0 offset as a different batch.
    * One file carries both (line 1: version; line 2, if present:
    * `snapshot`) so the pin is atomic; single-line files from pre-
    * snapshot-mode checkpoints parse as mode-off. */
  private val (initialVersion: Long, snapshotMode: Boolean) = {
    // metadataPath arrives as a Hadoop-style URI ("file:/tmp/.../sources/0");
    // Paths.get on the raw string would treat it as a RELATIVE path and
    // silently anchor the file under the process CWD — discovered when
    // stray `file:` trees appeared in the working directory. Parse with
    // Hadoop's Path, which accepts the UNENCODED form Spark actually
    // passes (Path.toString never percent-encodes, so a checkpoint dir
    // containing a space or '%' blows up java.net.URI.create), then
    // strip the scheme down to a filesystem path (local-only sandbox; a
    // real deployment would go through the checkpoint FileSystem API).
    val metaUri = new org.apache.hadoop.fs.Path(metadataPath).toUri
    val scheme = metaUri.getScheme
    val metaDir =
      if (scheme == null) Paths.get(metadataPath)
      else if (scheme == "file") Paths.get(metaUri.getPath)
      else throw new IllegalArgumentException(
        s"graft changelog stream supports only local (file:) checkpoints in " +
          s"this build; got $metadataPath — a non-file scheme would silently " +
          "anchor the starting-version marker as a RELATIVE local path")
    val p = metaDir.resolve("graft-initial-version")
    def parse(): (Long, Boolean) = {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      (lines.head.toLong, lines.drop(1).contains("snapshot"))
    }
    if (Files.exists(p)) parse()
    else {
      val head = table.currentVersion.getOrElse(throw new IllegalStateException(
        s"no graft snapshot at $root — cannot stream its changelog"))
      val v = startingVersion match {
        case None | Some("latest") => head
        case Some("earliest")      => table.versions.min
        case Some(n) =>
          val v = try n.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"startingVersion must be a version number, 'earliest' or 'latest'; got '$n'")
          }
          require(table.versions.contains(v),
            s"startingVersion $v is not a committed version of $root " +
              s"(have ${table.versions.headOption.getOrElse(-1L)}..$head)")
          v
      }
      Files.createDirectories(p.getParent)
      val tmp = Files.createTempFile(p.getParent, ".graft-init-", ".tmp")
      Files.write(tmp, (v.toString + (if (initialSnapshot) "\nsnapshot" else ""))
        .getBytes(StandardCharsets.UTF_8))
      try Files.createLink(p, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () } // racing twin
      finally Files.deleteIfExists(tmp)
      parse()
    }
  }

  /** Schema pinned at stream start (payload + lsn + op). */
  override val schema: StructType = GraftDataSource.changesSchema(table, None)

  // highest version already handed out (offset monotonicity + the base
  // for rate limiting); getBatch raises it on checkpoint recovery
  @volatile private var lastEnd: Long = initialVersion

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json.toLong
  }

  override def getOffset: Option[V1Offset] = {
    val head = table.currentVersion.getOrElse(return None)
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(head, lastEnd + m)
      case None    => head
    }
    // snapshot mode: the anchor version ITSELF is batch 0's payload (the
    // live view), so the offset floor admits it; a committed batch at the
    // same offset compares equal and plans nothing (no re-delivery)
    val floor = if (snapshotMode) initialVersion - 1 else initialVersion
    if (capped <= floor) None else Some(LongOffset(capped))
  }

  // ---- admission control (rate limiting + Trigger.AvailableNow) ----
  // With SupportsAdmissionControl the engine calls latestOffset(start,
  // limit) instead of getOffset; AvailableNow pins the drain target at
  // prepare time and keeps triggering until the stream reaches it (the
  // engine's fallback for sources WITHOUT this is one single batch —
  // which silently strands data beyond a maxVersionsPerTrigger cap).

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = table.currentVersion
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset = {
    // snapshot mode, nothing in the offset log yet (start == null exactly
    // means batch 0 is unplanned — after it lands in the WAL, start is
    // always the logged offset, across restarts too): plan batch 0 as the
    // snapshot ALONE (end = anchor), keeping its cost the live view's and
    // leaving the change tail to normally rate-limited later batches
    if (snapshotMode && start == null) return LongOffset(initialVersion)
    val base = Option(start).map(o => o.json.trim.toLong)
      .getOrElse(math.max(lastEnd, initialVersion))
    val head0 = table.currentVersion.getOrElse(return null)
    val head  = availableNowCap.fold(head0)(math.min(head0, _))
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(head, base + m)
      case None    => head
    }
    if (capped <= base || capped <= initialVersion) null else LongOffset(capped)
  }

  /** Batch 0 of `initialSnapshot` mode: the live view AT the anchor
    * version, each row an op='U' upsert at its ORIGINAL `_lsn` — so an
    * LWW consumer replaying the snapshot then the tail converges on the
    * source state by the same argument as bootstrap ⊕ tail ≡ replay
    * (later events carry higher lsns and win; re-delivered snapshot rows
    * read as stale). A pure function of the immutable manifest chain,
    * like changesSince — checkpoint replays re-deliver identical rows. */
  private def snapshotFrame(): DataFrame = {
    val resolved = MergeOnRead.resolve(table, Some(initialVersion))
      .filter(!org.apache.spark.sql.functions.coalesce(
        col(graft.operators.Merge.TombCol), lit(false)))
    val payload = resolved.columns
      .filterNot(graft.operators.Merge.InternalCols.contains)
    resolved.select(payload.toIndexedSeq.map(col) :+
      col(graft.operators.Merge.LsnCol).as("lsn") :+ lit("U").as("op"): _*)
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(initialVersion)
    val to   = versionOf(end)
    lastEnd = math.max(lastEnd, to)
    // onRollback=fail: a rollback window emits retraction STATE-DIFF rows
    // whose lsn is the retracted row's own (older) lsn — correct for
    // state consumers, but an LWW-keyed consumer (e.g. the graft upsert
    // sink replicating this table) drops them as stale and silently
    // diverges. Consumers that apply by LWW must opt into failing loudly
    // here, fix the replica (roll it back / re-bootstrap), and restart
    // past the rollback with a fresh checkpoint.
    if (onRollback == "fail" && to > from &&
        MergeOnRead.rangeContainsRollback(table, from, to))
      throw GraftChangelogSource.RollbackInWindow(root, from, to)
    // align to the pinned schema: evolution-added columns are dropped
    // until restart, and a pinned column MISSING from the window is
    // null-filled, not an error — the engine's evolution is add/widen
    // only, so a missing column means the window's end version PREDATES
    // its addition (a rate-limited or restart-lagging stream pinned at a
    // newer head replaying an older window); throwing here would wedge
    // the stream on the same checkpointed batch forever (round-4 review
    // finding). The snapshot frame (anchored at the pinned-or-older
    // schema) aligns through the same select.
    def align(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      df.select(schema.fields.toIndexedSeq.map { f =>
        if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    // start.isEmpty ⇔ batch 0 (Spark logs every later batch's start):
    // in snapshot mode it opens with the anchor's live view; the change
    // tail is usually a later batch (latestOffset plans batch 0 as the
    // snapshot alone) but a legacy getOffset-planned batch 0 may span
    // both, so the union keeps the two planners equivalent
    val parts =
      try {
        (if (snapshotMode && start.isEmpty) Seq(align(snapshotFrame())) else Seq.empty) ++
        (if (to > from) Seq(align(MergeOnRead.changesSince(table, from, Some(to)))) else Seq.empty)
      } catch {
        // surface the stream-level recovery next to the storage-level
        // fact: a replay window that reaches vacuumed history (earliest
        // on a truncated table, or vacuum outrunning a lagging stream)
        // cannot deliver — the replication fix is a fresh checkpoint
        // anchored at a readable version with the snapshot batch
        case e: graft.table.VacuumedVersionException =>
          throw GraftChangelogSource.VacuumedWindow(root, from, to, e)
      }
    require(parts.nonEmpty, s"empty changelog batch planned: ($from, $to]")
    org.apache.spark.sql.classic.GraftSqlBridge.asStreamingBatch(
      parts.reduce(_ unionByName _))
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangelogSource[$root, from=$initialVersion" +
      (if (snapshotMode) ", initialSnapshot" else "") + "]"
}

object GraftChangelogSource {
  /** `option("onRollback", "fail")` tripped: the stream's next window
    * contains a rollback commit, whose retraction diff an LWW-keyed
    * consumer cannot apply (retracted rows carry their original, OLDER
    * lsns and lose last-writer-wins against the already-replicated
    * state). Fix the downstream replica to the source's rolled-back
    * state (roll it back too, or re-bootstrap it), then restart the
    * stream past the rollback with a fresh checkpoint/startingVersion. */
  case class RollbackInWindow(root: String, from: Long, to: Long)
      extends RuntimeException(
        s"changelog window ($from, $to] of $root contains a rollback and " +
          "onRollback=fail is set: retraction diffs carry pre-rollback lsns " +
          "that LWW consumers drop as stale (silent replica divergence). " +
          "Re-point the replica at the rolled-back state, then restart the " +
          "stream past the rollback with a fresh checkpoint.")

  /** The planned window replays history whose data files
    * [[graft.table.SnapshotTable.vacuum]] reclaimed — `earliest` on a
    * vacuum-truncated table, or maintenance outrunning a lagging /
    * rate-limited stream. The retained changelog alone cannot rebuild
    * that state; re-anchor with a FRESH checkpoint at a retained
    * version, with initialSnapshot=true if the consumer needs full
    * state (the snapshot batch stands in for the truncated prefix). */
  case class VacuumedWindow(root: String, from: Long, to: Long,
      cause: graft.table.VacuumedVersionException)
      extends RuntimeException(
        s"changelog window ($from, $to] of $root replays vacuumed history " +
          s"(${cause.getMessage}). Restart with a fresh checkpoint anchored " +
          "at a retained version — with initialSnapshot=true if the consumer " +
          "needs full table state (snapshot batch 0 stands in for the " +
          "truncated prefix).", cause)
}
