package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.SnapshotTable

/** Path-addressed [[TableCatalog]] so plain SQL can NAME a graft table:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.sql("SELECT * FROM graft.`/data/token_docs`")
  *   spark.sql("MERGE INTO graft.`/data/token_docs` t USING src s ON ...")
  * }}}
  *
  * The identifier's (backticked) name IS the table root — the same
  * path-as-identity model Delta's `delta.`/path`` uses. `loadTable`
  * returns the same [[GraftTable]] handle as `spark.read.format("graft")`,
  * so the [[GraftRelationResolution]] rule gives catalog reads the
  * identical expanded resolve plan, and MERGE INTO targets resolve to a
  * rewriteable relation.
  *
  * DDL surface (round-4):
  * {{{
  *   CREATE TABLE graft.`/data/docs`
  *     (doc_id STRING, tokens ARRAY<INT>, n_tok BIGINT, source STRING)
  *     TBLPROPERTIES ('numBuckets' = '16')
  *   INSERT INTO graft.`/data/docs` SELECT ...   -- LWW upsert commit
  *   INSERT OVERWRITE graft.`/data/docs` ...     -- replace-with-history
  * }}}
  * CREATE TABLE compiles onto [[SnapshotTable.create]] (the declared
  * columns become the payload schema; the engine appends its internal
  * `_lsn`/`_tombstone` columns, and `numBuckets` fixes the hash-bucket
  * layout). INSERT resolves through the V2 write capability to the same
  * [[GraftDataSource.insertInto]] LWW-upsert path as
  * `df.write.format("graft")` — never a bare file append; an exactly-once
  * commit id can ride the session conf `graft.sql.commitId`.
  * `ALTER TABLE ... ADD COLUMN` / `ALTER COLUMN ... TYPE wider` commit
  * schema-only evolutions (see [[alterTable]]); `CREATE TABLE ... AS
  * SELECT` composes [[createTable]] with the same insert write path;
  * `TRUNCATE TABLE` is an empty-state commit
  * ([[GraftTable.truncateTable]]); `DROP TABLE` deletes the tree with
  * clone-safety in both directions (see [[dropTable]]). Everything
  * else (partition transforms, other ALTER forms, RENAME) keeps
  * failing typed.
  *
  * Maintenance is SQL-callable too: `CALL graft.compact('/root')`,
  * `vacuum`, `rollback`, `rebucket`, `clone`, `release_clone`, and
  * `history` — see [[GraftProcedures]]. */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = "graft"

  // reserved payload names, shared by CREATE TABLE and ALTER TABLE ADD
  // COLUMN (one list — a name added to only one site would let ALTER
  // smuggle in a column CREATE rejects): the engine's internal state
  // columns AND the change-batch metadata names — a payload column named
  // lsn/op would make every INSERT look like an explicit change batch to
  // the write path (hasMeta detection), silently reinterpreting rows as
  // events; _bucket/ingest_ts collide with merge internals the same way
  private val reservedCols = graft.operators.Merge.InternalCols ++
    Seq("lsn", "op", "_bucket", "ingest_ts")

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  /** The identifier IS the table root and must be ONE backticked
    * absolute path: an unquoted multi-part name like `graft.data.docs`
    * would otherwise silently join to the RELATIVE path "data/docs" and
    * resolve CWD-dependently — a wrong-table hazard, so it is rejected
    * with the correct spelling instead (round-4 review finding). */
  private def rootOf(ident: Identifier): String = {
    val joined = (ident.namespace() :+ ident.name()).mkString("/")
    if (ident.namespace().nonEmpty || !joined.startsWith("/"))
      throw new IllegalArgumentException(
        s"graft table identifiers are single backticked absolute paths — " +
          s"write $catalogName.`/abs/path/to/table`, got '$joined'")
    // the filesystem root as a table root would make DROP TABLE a
    // recursive delete of '/' — no legitimate deployment wants that
    if (java.nio.file.Paths.get(joined).normalize().toString == "/")
      throw new IllegalArgumentException(
        "'/' cannot be a graft table root; use a dedicated directory")
    joined
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    val t    = SnapshotTable.load(SparkSession.active, root)
    if (t.currentVersion.isEmpty) throw new NoSuchTableException(ident)
    GraftTable(root, None, GraftDataSource.logicalSchema(t, None))
  }

  /** `VERSION AS OF <v>` — the SQL spelling of the reader's
    * `option("version", v)` pin; the expanded read is the identical
    * snapshot-resolve plan at that version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val t    = SnapshotTable.load(SparkSession.active, root)
    if (t.currentVersion.isEmpty) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric table version; got '$version'")
    }
    if (!t.versions.contains(v))
      throw new IllegalArgumentException(
        s"version $v is not a committed version of $root " +
          s"(have ${t.versions.minOption.getOrElse(-1L)}..${t.currentVersion.getOrElse(-1L)})")
    GraftTable(root, Some(v), GraftDataSource.logicalSchema(t, Some(v)))
  }

  /** `TIMESTAMP AS OF <ts>` — resolves to the LATEST version whose
    * commit wall-clock is at or before the timestamp (Spark hands the
    * literal down in microseconds). Pre-round-3 manifests carry no
    * commitTs and never qualify — a table whose whole history predates
    * the field fails typed rather than guessing. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    val t    = SnapshotTable.load(SparkSession.active, root)
    if (t.currentVersion.isEmpty) throw new NoSuchTableException(ident)
    val ms   = timestamp / 1000L
    val v = t.versions
      .filter { v => val ts = t.manifest(v).commitTs; ts >= 0 && ts <= ms }
      .maxOption
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version of $root at or before timestamp ${ms}ms; " +
          "the earliest timestamped commit is " +
          t.versions.flatMap(v => Some(t.manifest(v).commitTs).filter(_ >= 0))
            .minOption.fold("unknown (pre-commitTs manifests)")(x => s"${x}ms")))
    GraftTable(root, Some(v), GraftDataSource.logicalSchema(t, Some(v)))
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.load(SparkSession.active, rootOf(ident)).currentVersion.isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] =
    throw new NoSuchNamespaceException(
      namespace :+ "(graft tables are path-addressed; listing is not supported)")

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val root = rootOf(ident)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tables are hash-bucketed by doc_id internally; " +
          "PARTITIONED BY is not supported (set TBLPROPERTIES('numBuckets'='N'))")
    if (!schema.fields.exists(f =>
        f.name == "doc_id" && f.dataType == org.apache.spark.sql.types.StringType))
      throw new IllegalArgumentException(
        "graft tables require a `doc_id STRING` column (the merge key)")
    schema.fieldNames.find(n => reservedCols.exists(_.equalsIgnoreCase(n))).foreach(c =>
      throw new IllegalArgumentException(
        s"column name $c is reserved (engine state / change-batch metadata); " +
          "rename the payload column"))
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val buckets = Option(properties.get("numBuckets")).map(_.toInt).getOrElse(16)
    require(buckets > 0, s"numBuckets must be positive, got $buckets")
    // declared columns = payload; the engine's LWW/tombstone state rides
    // the same internal columns every pipeline-created table carries
    val physical = StructType(schema.fields)
      .add(graft.operators.Merge.LsnCol, org.apache.spark.sql.types.LongType,
        nullable = false)
      .add(graft.operators.Merge.TombCol, org.apache.spark.sql.types.BooleanType,
        nullable = true)
    SnapshotTable.create(SparkSession.active, root, physical, buckets)
    GraftTable(root, None, schema)
  }

  /** `ALTER TABLE graft.`/root`` ADD COLUMN name TYPE` and
    * `ALTER COLUMN name TYPE wider` — the explicit DDL spellings of the
    * two evolutions the write path performs implicitly (the
    * union-lattice AddColumn and WidenColumn cases; the north-star's
    * "widened n_tok" is exactly the latter). Both compile onto a
    * SCHEMA-ONLY commit: the child manifest carries the same
    * files/watermark/rowCount under the evolved schema, and every
    * reader null-fills added columns in (and upcasts narrower columns
    * of) files predating the change — the documented readFiles
    * contract, exercised by the write-path evolution since round 1.
    * The commit publishes through the same hard-link CAS as data
    * commits — a racing writer surfaces as a typed CommitConflict,
    * never a clobber. In dialect: top-level nullable ADD COLUMN
    * (default position, no DEFAULT value) and top-level lossless type
    * widening per [[graft.operators.SchemaEvolution.canWiden]];
    * everything else keeps failing typed. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.types.StructField
    val root = rootOf(ident)
    val t    = SnapshotTable.load(SparkSession.active, root)
    val cur  = t.current.getOrElse(throw new NoSuchTableException(ident))
    val adds   = Seq.newBuilder[(String, org.apache.spark.sql.types.DataType)]
    val widens = Seq.newBuilder[(String, org.apache.spark.sql.types.DataType)]
    changes.foreach {
      case a: TableChange.AddColumn
          if a.fieldNames().length == 1 && a.isNullable &&
            a.position() == null && a.defaultValue() == null =>
        adds += a.fieldNames()(0) -> a.dataType()
      case w: TableChange.UpdateColumnType if w.fieldNames().length == 1 =>
        widens += w.fieldNames()(0) -> w.newDataType()
      // Spark spells array-element evolution `ALTER COLUMN col.element
      // TYPE t` (CheckAnalysis rejects the whole-array spelling); it is
      // the same WidenColumn case — normalize to a whole-array widen of
      // the parent so one gate covers both spellings
      case w: TableChange.UpdateColumnType
          if w.fieldNames().length == 2 && w.fieldNames()(1) == "element" =>
        widens += w.fieldNames()(0) ->
          org.apache.spark.sql.types.ArrayType(w.newDataType())
      case c => throw new UnsupportedOperationException(
        "graft ALTER TABLE supports only top-level nullable ADD COLUMN " +
          "at the default position with no DEFAULT value, and top-level " +
          s"ALTER COLUMN ... TYPE lossless widening; got $c")
    }
    val addList   = adds.result()
    val widenList = widens.result()
    addList.foreach { case (n, _) =>
      if (reservedCols.exists(_.equalsIgnoreCase(n)))
        throw new IllegalArgumentException(
          s"column name $n is reserved (engine state / change-batch metadata)")
      if (cur.schema.fieldNames.exists(_.equalsIgnoreCase(n)))
        throw new IllegalArgumentException(s"column $n already exists in $root")
    }
    if (addList.map(_._1.toLowerCase(java.util.Locale.ROOT)).distinct.size != addList.size)
      throw new IllegalArgumentException(
        s"duplicate column in ALTER TABLE: ${addList.map(_._1).mkString(", ")}")
    // widen targets: existing PAYLOAD columns only (the merge key and the
    // engine's state columns have fixed types), and the cast must be
    // lossless — the same gate the write path's union lattice applies
    val widenByName = widenList.map { case (n, to0) =>
      val f = cur.schema.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(s"no column $n in $root to widen"))
      if (f.name.equalsIgnoreCase("doc_id") ||
          reservedCols.exists(_.equalsIgnoreCase(f.name)))
        throw new IllegalArgumentException(
          s"cannot alter the type of ${f.name} (merge key / engine state)")
      // an element widen only changes the element type — keep the
      // existing array's containsNull
      val to = (f.dataType, to0) match {
        case (org.apache.spark.sql.types.ArrayType(_, cn),
              org.apache.spark.sql.types.ArrayType(e, _)) =>
          org.apache.spark.sql.types.ArrayType(e, cn)
        case _ => to0
      }
      if (!graft.operators.SchemaEvolution.canWiden(f.dataType, to))
        throw new IllegalArgumentException(
          s"ALTER COLUMN ${f.name} TYPE ${to.sql} is not a lossless widening " +
            s"of ${f.dataType.sql}; only widening casts evolve a graft schema")
      f.name.toLowerCase(java.util.Locale.ROOT) -> to
    }.toMap
    if (widenByName.size != widenList.size)
      throw new IllegalArgumentException(
        s"duplicate column in ALTER COLUMN: ${widenList.map(_._1).mkString(", ")}")
    // payload columns first (widened in place), engine internals at the end
    val internals = cur.schema.fields.filter(f =>
      graft.operators.Merge.InternalCols.contains(f.name))
    val payload = cur.schema.fields
      .filterNot(f => graft.operators.Merge.InternalCols.contains(f.name))
      .map { f =>
        widenByName.get(f.name.toLowerCase(java.util.Locale.ROOT))
          .fold(f)(to => f.copy(dataType = to))
      }
    val evolved = StructType(payload ++
      addList.map { case (n, dt) => StructField(n, dt, nullable = true) } ++ internals)
    val m = cur.copy(version = cur.version + 1, parent = cur.version,
      commitId = "alter-" + graft.table.Fs.nonce, batchId = -5L,
      schemaJson = evolved.json,
      // schema-only: provably applied NO events. Inheriting the parent's
      // real minEventLsn would make changesSince classify this commit as
      // maybe-carrying-events forever, demoting every window that spans
      // an ALTER from the pure delta replay to the O(table) snapshotDiff
      minEventLsn = Long.MaxValue)
    try t.commit(m) catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw graft.operators.Merge.CommitConflict(m.commitId, Set.empty,
          s"concurrent commit while altering $root; re-run ALTER TABLE against the new head")
    }
    GraftTable(root, None, StructType(evolved.fields.filterNot(f =>
      graft.operators.Merge.InternalCols.contains(f.name))))
  }

  /** `DROP TABLE graft.`/root`` — deletes the whole table tree
    * (manifests, data, side tables). Clone safety, both directions:
    *  - a table with REGISTERED clones refuses typed — live clones
    *    share its data files, and deleting them would break every
    *    clone's reads (release or drop the clones first);
    *  - a table that IS a clone releases its claim on every source
    *    root its manifests reference, so the sources' vacuums stop
    *    retaining files on its behalf.
    * `DROP TABLE IF EXISTS` on a missing table is a no-op (false). */
  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    val t    = SnapshotTable.load(SparkSession.active, root)
    if (t.currentVersion.isEmpty) return false
    val claims = t.registeredClones
    if (claims.nonEmpty)
      throw new IllegalStateException(
        s"cannot DROP $root: ${claims.size} registered clone(s) share its data " +
          s"files (${claims.map(_._1).mkString(", ")}); drop the clones or " +
          "releaseClone them first")
    // any referenced data file OUTSIDE this root marks a clone source;
    // match claims by normalized path so a spelling difference between
    // the clone-time dstRoot and this identifier cannot strand a claim
    val selfData = java.nio.file.Paths.get(root, "data").toString + "/"
    val norm     = java.nio.file.Paths.get(root).normalize()
    t.versions.iterator
      .flatMap { v => val m = t.manifest(v); m.files ++ m.deltaFiles }
      .map(_.path).filterNot(_.startsWith(selfData))
      .flatMap { p =>
        val i = p.lastIndexOf("/data/")
        if (i <= 0) None else Some(p.substring(0, i))
      }.toSet[String]
      .foreach { srcRoot =>
        val src = SnapshotTable.load(SparkSession.active, srcRoot)
        src.registeredClones
          .collect { case (d, _)
            if java.nio.file.Paths.get(d).normalize() == norm => d }
          .foreach(src.releaseClone)
      }
    graft.table.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    true
  }

  /** `CALL graft.<name>(...)` — the maintenance procedures. Unlike
    * tables (whose identifier is a path), procedures are plain
    * single-part names in the catalog's root namespace. */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val key = ident.name().toLowerCase(java.util.Locale.ROOT)
    if (ident.namespace().nonEmpty)
      throw new IllegalArgumentException(
        s"graft procedures live in the catalog root: CALL $catalogName.${ident.name()}(...)")
    GraftProcedures.byName.getOrElse(key,
      throw new IllegalArgumentException(
        s"no graft procedure '${ident.name()}'; available: " +
          GraftProcedures.byName.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else GraftProcedures.byName.keys.toSeq.sorted
      .map(n => Identifier.of(Array.empty, n)).toArray

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
}
