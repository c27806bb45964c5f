package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{MergeOnRead, TableMaintenance}
import graft.table.SnapshotTable

/** SQL maintenance surface: `CALL graft.<procedure>('/table/root', ...)`.
  *
  * Every table-maintenance operation the library exposes — compaction,
  * vacuum, rollback, rebucket, clone / clone release — plus commit-history
  * introspection, callable from plain SQL through Spark 4's
  * `ProcedureCatalog` (the API Iceberg's `CALL cat.system.*` rides).
  * Each procedure is a thin argument-unmarshalling shim onto the SAME
  * library entry point the Scala API uses ([[MergeOnRead.compact]],
  * [[SnapshotTable.vacuum]], [[TableMaintenance.rollbackTo]], ...), so
  * SQL and Scala callers share one behavior, one test surface, and one
  * set of typed errors; results come back as rows (a [[LocalScan]] —
  * all driver-side metadata, never a distributed job of its own).
  *
  * {{{
  *   CALL graft.compact('/data/docs')
  *   CALL graft.vacuum('/data/docs', retain_last => 3)
  *   CALL graft.rollback('/data/docs', 7)
  *   CALL graft.history('/data/docs')     -- one row per commit
  * }}}
  *
  * Reference analog: the scheduled maintenance scripts operators run
  * alongside the nightly loads (archiving, compaction of the statewide
  * table, error-table cleanup — UpdateAddressPointsSDE.py:24-48,
  * CountyAddressPointETL.py:242-250), here as first-class SQL verbs
  * instead of out-of-band jobs. */
object GraftProcedures {

  /** All procedures, keyed by lower-case name. */
  val byName: Map[String, UnboundProcedure] = Seq(
    History, Vacuum, Compact, Rollback, Rebucket, Clone, ReleaseClone
  ).map(p => p.name().toLowerCase(java.util.Locale.ROOT) -> (p: UnboundProcedure)).toMap

  /** One procedure: unbound and bound are the same object (argument
    * shapes here are static — nothing to specialize at bind time).
    * `call` runs the body on the driver and wraps the result rows in a
    * [[LocalScan]], the shape `MultiResultExec` turns into a local
    * relation — procedure output behaves like any query result
    * (`spark.sql("CALL ...").collect()`). */
  private[sources] sealed abstract class Proc(
      procName: String, doc: String,
      params: Array[ProcedureParameter], val outSchema: StructType)
      extends UnboundProcedure with BoundProcedure {

    protected def run(spark: SparkSession, args: InternalRow): Seq[InternalRow]

    override def name(): String = procName
    override def description(): String = doc
    override def parameters(): Array[ProcedureParameter] = params
    override def bind(inputType: StructType): BoundProcedure = this
    // mutates table state / reads mutable state — never constant-fold
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): JIterator[Scan] = {
      val result = run(SparkSession.active, input).toArray
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft.$procName"
      }).iterator()
    }
  }

  private def in(n: String, dt: DataType, comment: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).comment(comment).build()
  private def inDefault(
      n: String, dt: DataType, default: String, comment: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(default).comment(comment).build()

  // def, not val: `byName` above forces the procedure objects during
  // THIS object's init, before a later val would have been assigned
  private def tableParam: ProcedureParameter =
    in("table", StringType, "absolute table root path, e.g. '/data/docs'")

  /** First argument of every procedure: the table root (same
    * path-as-identity contract as the catalog's backticked identifiers —
    * absolute, never CWD-relative). */
  private def tableAt(spark: SparkSession, args: InternalRow): SnapshotTable = {
    require(!args.isNullAt(0), "table path must not be null")
    val root = args.getUTF8String(0).toString
    require(root.startsWith("/"),
      s"table must be an absolute table-root path, got '$root'")
    val t = SnapshotTable.load(spark, root)
    require(t.currentVersion.isDefined, s"no graft table at $root")
    t
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** Typed non-null numeric read: `getLong`/`getInt` on a null slot
    * silently unboxes to 0 — which for rollback would mean "wipe back to
    * the empty v0" and for vacuum's grace "disable the in-flight-writer
    * window". An explicit NULL argument is always a caller bug here. */
  private def requiredLong(args: InternalRow, i: Int, name: String): Long = {
    require(!args.isNullAt(i), s"$name must not be NULL")
    args.getLong(i)
  }
  private def requiredInt(args: InternalRow, i: Int, name: String): Int = {
    require(!args.isNullAt(i), s"$name must not be NULL")
    args.getInt(i)
  }

  /** `CALL graft.history('/root')` — one row per commit, oldest first:
    * the time-travel / rollback / changesSince discovery surface ("which
    * version do I pin? where did the bad batch land?"). Pure manifest
    * metadata — O(versions) driver-side JSON reads, no data IO. */
  object History extends Proc(
    "history",
    "one row per commit (oldest first): version lineage, commit id, " +
      "batch id, commit wall time, LWW watermark, row/file counts " +
      "(row_count is the BASE count on MOR delta commits; unfolded " +
      "events ride delta_rows until compaction)",
    Array(tableParam),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("parent", LongType, nullable = true), // null on the first snapshot
      StructField("commit_id", StringType, nullable = false),
      StructField("batch_id", LongType, nullable = false),
      StructField("commit_ts", LongType, nullable = true), // epoch ms; null pre-round-3
      StructField("watermark_lsn", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("delta_rows", LongType, nullable = false),
      StructField("num_buckets", IntegerType, nullable = false),
      StructField("base_files", IntegerType, nullable = false),
      StructField("delta_files", IntegerType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t = tableAt(spark, args)
      t.versions.map { v =>
        val m = t.manifest(v)
        InternalRow(
          m.version,
          if (m.parent < 0) null else m.parent,
          utf8(m.commitId), m.batchId,
          if (m.commitTs < 0) null else m.commitTs,
          m.watermarkLsn, m.rowCount, m.deltaRows, m.numBuckets,
          m.files.size, m.deltaFiles.size)
      }
    }
  }

  /** `CALL graft.vacuum('/root', retain_last => 3)` — the library
    * vacuum verbatim: keeps the last `retain_last` versions plus every
    * clone-claimed and younger-than-`retain_ms` version, deletes files
    * only they referenced, sweeps aged orphans (crashed writes) outside
    * the in-flight grace window. */
  object Vacuum extends Proc(
    "vacuum",
    "delete data files only expired versions reference; keeps clone-" +
      "claimed and recent versions, honors the in-flight-writer grace window",
    Array(
      tableParam,
      inDefault("retain_last", IntegerType, "1", "versions to keep (>=1)"),
      inDefault("retain_ms", LongType, "0",
        "also keep every version younger than this many milliseconds"),
      inDefault("orphan_grace_ms", LongType, "-1",
        "age an unreferenced file must reach before it sweeps as a " +
          "crashed-write orphan; -1 = engine default (1h)")),
    StructType(Seq(
      StructField("files_deleted", IntegerType, nullable = false),
      StructField("files_kept", IntegerType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t = tableAt(spark, args)
      val grace = requiredLong(args, 3, "orphan_grace_ms")
      val (deleted, kept) = t.vacuum(
        retainVersions = requiredInt(args, 1, "retain_last"),
        retainMillis = requiredLong(args, 2, "retain_ms"),
        orphanGraceMillis =
          if (grace < 0) SnapshotTable.OrphanGraceMillis else grace)
      Seq(InternalRow(deleted, kept))
    }
  }

  /** `CALL graft.compact('/root')` — fold MOR deltas into the base
    * (no-op commit-skip on a clean table, like the scheduled path). */
  object Compact extends Proc(
    "compact",
    "fold merge-on-read delta files into the base; skipped=true when " +
      "the table is already clean",
    Array(
      tableParam,
      inDefault("expire_tombstones_below", LongType, "NULL",
        "drop tombstones with LSN below this watermark during the fold " +
          "(only safe when no event at-or-below it can still arrive)")),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("skipped", BooleanType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("wall_ms", LongType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t = tableAt(spark, args)
      val expire = if (args.isNullAt(1)) Long.MinValue else args.getLong(1)
      val s = MergeOnRead.compact(t, "sql-compact-" + graft.table.Fs.nonce,
        expireTombstonesBelow = expire)
      Seq(InternalRow(s.version, s.skipped, s.rowsAfter, s.wallMs))
    }
  }

  /** `CALL graft.rollback('/root', 7)` — O(1) manifest commit restoring
    * version 7's state; history and ledger never rewritten. */
  object Rollback extends Proc(
    "rollback",
    "roll the table back to an earlier version (new commit whose state " +
      "is the target's; O(1), no data movement)",
    Array(tableParam, in("version", LongType, "target version to restore")),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("restored_version", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t  = tableAt(spark, args)
      val to = requiredLong(args, 1, "version")
      val s  = TableMaintenance.rollbackTo(t, to)
      Seq(InternalRow(s.version, to, s.rowsAfter))
    }
  }

  /** `CALL graft.rebucket('/root', 256)` — bucket-count migration (one
    * full rewrite; every later commit and pruned read uses the new
    * count from the manifest). */
  object Rebucket extends Proc(
    "rebucket",
    "rewrite the table into a new hash-bucket count (the growth knob: " +
      "per-bucket file size tracks table volume)",
    Array(tableParam, in("num_buckets", IntegerType, "new bucket count (>0)")),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("num_buckets", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("wall_ms", LongType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t = tableAt(spark, args)
      val n = requiredInt(args, 1, "num_buckets")
      val s = TableMaintenance.rebucket(t, n, "sql-rebucket-" + graft.table.Fs.nonce)
      Seq(InternalRow(s.version, n, s.rowsAfter, s.wallMs))
    }
  }

  /** `CALL graft.clone('/root', '/fork')` — manifest-copy fork, data
    * shared by reference; registers a claim so the source's vacuum
    * retains the shared files. */
  object Clone extends Proc(
    "clone",
    "shallow-clone the table (copy manifests, share data files by " +
      "reference; registers a vacuum claim on the source)",
    Array(tableParam, in("target", StringType, "absolute root for the clone")),
    StructType(Seq(
      StructField("target", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t   = tableAt(spark, args)
      require(!args.isNullAt(1), "clone target must not be null")
      val dst = args.getUTF8String(1).toString
      require(dst.startsWith("/"), s"clone target must be an absolute path, got '$dst'")
      val c = t.shallowClone(dst)
      Seq(InternalRow(utf8(dst), c.currentVersion.getOrElse(-1L)))
    }
  }

  /** `CALL graft.release_clone('/root', '/fork')` — drop the fork's
    * vacuum claim on the source once the fork no longer needs the
    * shared files (dropped, deep-copied, or vacuumed itself). */
  object ReleaseClone extends Proc(
    "release_clone",
    "release a shallow clone's vacuum claim on this source table",
    Array(tableParam, in("target", StringType, "the clone's root path")),
    StructType(Seq(StructField("released", BooleanType, nullable = false)))) {
    override protected def run(
        spark: SparkSession, args: InternalRow): Seq[InternalRow] = {
      val t = tableAt(spark, args)
      require(!args.isNullAt(1), "clone target must not be null")
      Seq(InternalRow(t.releaseClone(args.getUTF8String(1).toString)))
    }
  }
}
