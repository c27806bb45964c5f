package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, LogicalPlan, Project, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{BooleanType, LongType}

import graft.operators.MergeOnRead
import graft.table.SnapshotTable

/** `DELETE FROM graft.`<root>` [WHERE …]` and
  * `UPDATE graft.`<root>` SET col = expr, … [WHERE …]` — the row-level
  * SQL DML pair, compiled by [[GraftRelationResolution]] into a
  * [[GraftDmlCommand]] that routes through the standard MOR commit
  * (ledger, LWW ordering, lineage) exactly like the library's
  * `TableMaintenance.deleteWhere` / `enrichRewrite` twins:
  *
  *  - DELETE tombstones every live row matching the predicate at one
  *    fresh LSN just above the watermark — late CDC events below the
  *    watermark cannot resurrect the rows;
  *  - UPDATE rewrites matching live rows, evaluating the assignment
  *    expressions against the CURRENT row (self-referencing
  *    `SET n_tok = n_tok + 1` works); unassigned columns keep their
  *    values. Assignment keys must be plain payload columns — the key
  *    column `doc_id` and nested fields fail typed.
  *
  * Scale shape: one resolve-plan scan filtered by the (pushdown-
  * eligible) predicate produces O(matches) change events and an
  * O(matches) MOR commit — never a table rewrite. The target relation
  * is expanded INSIDE the compiled command with the relation's own
  * attribute ids, so the analyzed condition/assignment expressions stay
  * bound without any name-based rebinding.
  *
  * Reference analog: delete_by_query (DeletePoints.py:42-48) and the
  * field-recalculation pass (update_address_point_grids.py:9-21) —
  * both reachable by any SQL client here, not only the library.
  */
object GraftDml {

  final case class DmlUnsupported(detail: String)
      extends RuntimeException(s"graft DML: $detail")

  /** Claim the target and fix the commit's LSN stamp NOW: the read
    * snapshot is pinned at analysis time (expand below bakes the
    * manifest's file list into the command), so the stamp and its
    * CommitConflict guard must anchor to the SAME instant — stamping at
    * run time against a head a concurrent writer advanced would pass
    * the guard and silently clobber (review finding). The stamp is read
    * BEFORE expand(), so a commit racing the two loads can only make
    * the guard stricter, never looser. */
  private def claim(
      session: SparkSession, p: LogicalPlan): (DataSourceV2Relation, GraftTable, Long) = {
    val (rel, t) = GraftMergeInto.graftTargetOf(p).get
    if (t.pinnedVersion.nonEmpty || t.changesFrom.nonEmpty)
      throw DmlUnsupported(
        "cannot modify a version-pinned or changelog read; load the table without options")
    val cur = SnapshotTable.load(session, t.root).current.getOrElse(
      throw new IllegalStateException(s"no graft table at ${t.root}"))
    (rel, t, cur.watermarkLsn + 1)
  }

  /** Subqueries in DML conditions would need their own analysis pass
    * through the claimed command — out of dialect, typed. */
  private def checkNoSubquery(e: Expression): Unit =
    if (e.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION))
      throw DmlUnsupported(s"subqueries are not supported in DML conditions; got ${e.sql}")

  def translateDelete(session: SparkSession, d: DeleteFromTable): LogicalPlan = {
    val (rel, t, stampLsn) = claim(session, d.table)
    checkNoSubquery(d.condition)
    val expanded = GraftRelationResolution.expand(session, rel)
    val docId = rel.output.find(_.name.equalsIgnoreCase("doc_id")).getOrElse(
      throw new IllegalStateException(s"graft table ${t.root} has no doc_id column"))
    // only the matched keys flow to the commit — payload is irrelevant
    // to a tombstone event
    GraftDmlCommand(t.root, Project(Seq(docId),
      Filter(d.condition, expanded)), op = "D", stampLsn)
  }

  def translateUpdate(session: SparkSession, u: UpdateTable): LogicalPlan = {
    val (rel, t, stampLsn) = claim(session, u.table)
    u.condition.foreach(checkNoSubquery)
    val assigns: Seq[(String, Expression)] = u.assignments.map { a =>
      val name = GraftMergeInto.stripWraps(a.key) match {
        case k: AttributeReference if rel.outputSet.contains(k) => k.name
        case other => throw DmlUnsupported(
          s"UPDATE SET keys must be plain target columns; got ${other.sql}")
      }
      if (name.equalsIgnoreCase("doc_id"))
        throw DmlUnsupported("cannot assign to the key column doc_id")
      checkNoSubquery(a.value)
      if (!a.value.references.subsetOf(rel.outputSet))
        throw DmlUnsupported(
          s"UPDATE SET values may reference only the table's columns; got ${a.value.sql}")
      name.toLowerCase -> a.value
    }
    // ANSI (and Spark's own aligned path) reject duplicate assignments;
    // a silent last-wins Map would violate the never-silently-wrong bar
    assigns.groupBy(_._1).collect { case (n, as) if as.size > 1 => n }
      .headOption.foreach(n =>
        throw DmlUnsupported(s"duplicate UPDATE SET assignment to column $n"))
    val byKey = assigns.toMap
    if (byKey.isEmpty) throw DmlUnsupported("UPDATE with no assignments")
    val expanded = GraftRelationResolution.expand(session, rel)
    // each payload column: the assignment expression (cast back to the
    // column's type — Spark's ResolveRowLevelCommandAssignments is
    // bypassed by the claim, so the cast is on us) or the current value
    val cols = rel.output.map { o =>
      byKey.get(o.name.toLowerCase) match {
        case Some(v) if v.dataType == o.dataType => Alias(v, o.name)()
        case Some(v) => Alias(Cast(v, o.dataType), o.name)()
        case None    => o
      }
    }
    GraftDmlCommand(t.root, Project(cols,
      Filter(u.condition.getOrElse(Literal(true, BooleanType)), expanded)), op = "U",
      stampLsn)
  }
}

/** The compiled DELETE/UPDATE: evaluate the filtered (and for UPDATE,
  * rewritten) live rows, stamp them as one batch of 'D'/'U' change
  * events at a fresh LSN, and apply through the standard MOR commit —
  * ledgered and O(matches). The stamped LSN is guarded: a concurrent
  * commit reaching it turns into a typed retryable CommitConflict, never
  * an undefined same-LSN LWW tie. */
case class GraftDmlCommand(
    root: String,
    source: LogicalPlan, // resolved; doc_id (+ full payload when op=U)
    op: String,          // "U" | "D"
    stampLsn: Long)      // fixed at ANALYSIS time, same instant as `source`
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("affected", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    val table = SnapshotTable.load(session, root)
    val events = org.apache.spark.sql.classic.GraftSqlBridge.ofRows(session, source)
      .withColumn("lsn", lit(stampLsn))
      .withColumn("op", lit(op))
    val stats = MergeOnRead(
      table, events, s"sqldml-${graft.table.Fs.nonce}", batchId = -6L,
      requireWatermarkBelow = Some(stampLsn))
    // MergeOnRead's observed counters are null-sum -1 over an empty
    // batch — a zero-match statement must report 0, not -1
    val affected = (if (op == "D") stats.deleted else stats.updated).max(0L)
    Seq(Row(stats.version, affected))
  }
}
