package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{Merge, MergeOnRead}
import graft.table.SnapshotTable

/** SQL/catalog surface for a [[graft.table.SnapshotTable]]:
  *
  * {{{
  *   spark.read.format("graft").load(tableRoot)                    // live view
  *   spark.read.format("graft").option("version", 3).load(root)    // time travel
  * }}}
  *
  * A DataSource V2 [[TableProvider]] supplies discovery (short name
  * "graft" via the service registry) and the table's logical schema; the
  * companion analyzer rule [[GraftRelationResolution]] — injected by
  * [[graft.plans.GraftExtensions]] — expands the V2 relation into the
  * library's snapshot-resolve plan ([[MergeOnRead.liveView]]): base ∪
  * delta parquet scans, bucket-local LWW fold, tombstone filter. The
  * same expand-at-resolution pattern Delta Lake uses for its file-index
  * views: readers get the full native parquet scan path (vectorization,
  * whole-stage codegen, filter/column pushdown into the scan — PlanSpec
  * "V2 read" gates) instead of a row-at-a-time connector shim, and every
  * plan gate that holds for the library path holds verbatim through SQL.
  *
  * Reference analog: the authoritative table is queryable by any ArcGIS
  * client, not only the ETL scripts (compareSGIDpts.py:21,
  * UpdateAddressPointsSDE.py:24) — this is the engine's equivalent
  * open-to-all-readers surface.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source requires a path: spark.read.format(\"graft\").load(<tableRoot>)"))

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("version")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.logicalSchema(
      SnapshotTable.load(SparkSession.active, rootOf(options)), versionOf(options))

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    GraftTable(rootOf(opts), versionOf(opts), schema)
  }
}

object GraftDataSource {
  /** The reader-visible schema: payload columns only (internal `_lsn` /
    * `_tombstone` stripped — same contract as [[MergeOnRead.liveView]]). */
  def logicalSchema(table: SnapshotTable, version: Option[Long]): StructType = {
    val m = version.map(table.manifest).orElse(table.current).getOrElse(
      throw new IllegalStateException(s"no graft snapshot at ${table.root}"))
    StructType(m.schema.fields.filterNot(f => Merge.InternalCols.contains(f.name)))
  }
}

/** V2 table handle: carries the root + pinned version for the analyzer
  * rule. Scans never come from here — [[GraftRelationResolution]]
  * replaces the relation before scan planning; the [[ScanBuilder]] below
  * only fires when the extensions are not installed, and then fails with
  * the actionable message instead of a silent wrong answer. */
case class GraftTable(root: String, pinnedVersion: Option[Long], tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"graft.`$root`" + pinnedVersion.fold("")(v => s"@v$v")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      "graft tables read through the GraftExtensions analyzer rule; install it with " +
        "spark.sql.extensions=graft.plans.GraftExtensions " +
        "(or SparkSession.builder().withExtensions(new graft.plans.GraftExtensions))")
}

/** Analyzer rule: expand every [[GraftTable]] V2 relation into the
  * library's resolve plan for that (root, version), re-aliased to the
  * relation's output attribute ids so references above it stay bound. */
case class GraftRelationResolution(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t        = r.table.asInstanceOf[GraftTable]
      val st       = SnapshotTable.load(session, t.root)
      val expanded = MergeOnRead.liveView(st, t.pinnedVersion).queryExecution.analyzed
      val byName   = expanded.output.map(a => a.name -> a).toMap
      Project(
        r.output.map { o =>
          val src = byName.getOrElse(o.name, throw new IllegalStateException(
            s"graft table ${t.root} no longer has column ${o.name}; re-read the table"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        },
        expanded)
  }
}
