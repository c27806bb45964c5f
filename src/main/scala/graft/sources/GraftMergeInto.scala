package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.operators.{Merge, MergeOnRead}
import graft.table.SnapshotTable

/** `MERGE INTO graft.`<root>` t USING src s ON t.doc_id = s.<key> …` —
  * the SQL spelling of the engine's upsert, compiled by
  * [[GraftRelationResolution]] into a [[GraftMergeIntoCommand]] that
  * routes through the standard MOR merge (ledger, LWW, schema
  * evolution, lineage).
  *
  * Supported dialect (the engine's upsert trio, ANSI-ordered):
  *  - `ON target.doc_id = source.<column>` (single key equality);
  *  - `WHEN MATCHED [AND cond] THEN UPDATE SET *` / `THEN DELETE`;
  *  - `WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, …` —
  *    expression assignments (round-4 widening); unassigned payload
  *    columns keep their target values, so the classification join
  *    carries the matched target payload for these;
  *  - MATCHED-side conditions and assignment values may reference BOTH
  *    source and target columns (`AND t.n_tok < s.n_tok`,
  *    `SET n_tok = t.n_tok + s.delta` — the LWW-if-newer upsert);
  *    source-only expressions pre-evaluate in a Project over the
  *    source, target-referencing ones defer to AFTER the
  *    classification join, where the matched target payload rides as
  *    `_graft_t_<col>` columns;
  *  - `WHEN NOT MATCHED [AND cond] THEN INSERT *` — conditions over
  *    SOURCE columns only (ANSI: the target side of an unmatched source
  *    row is all-null);
  *  - `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE /
  *    UPDATE SET col = expr, …` — any number of actions, first match
  *    wins; conditions and assignment values may reference TARGET
  *    columns only (those rows have no source match, so source refs
  *    are meaningless — ANSI agrees); DELETE alone is the
  *    full-snapshot-sync retraction, UPDATE the bulk target-side
  *    touch-up (evaluated over the live view, O(unmatched live rows));
  *  - first matching action wins, in declaration order;
  *  - duplicate source keys raise the ANSI cardinality violation,
  *    duplicate SET columns the ANSI duplicate-assignment error.
  * Anything else fails with a typed [[GraftMergeInto.MergeUnsupported]]
  * naming the construct — never a silently-wrong merge: assignment to
  * the merge key and nested-field assignment stay rejected (the
  * library change-batch API expresses those with explicit LSNs).
  */
object GraftMergeInto {

  final case class MergeUnsupported(detail: String)
      extends RuntimeException(s"graft MERGE INTO: $detail")

  /** One MERGE action: op kind ('U' | 'D' | 'I'), which side of the
    * match it applies to, the index of its condition column
    * (`_graft_c<i>` in the projected source), if any, and — for
    * expression-assignment updates — the assigned payload columns as
    * (name → `_graft_v<j>` value-column index); None = star semantics
    * (payload copied by name from the source). */
  final case class ActionSpec(
      kind: String, matchedSide: Boolean, condIdx: Option[Int],
      assigns: Option[Seq[(String, Int)]] = None)

  /** One NOT MATCHED BY SOURCE action ('D' | 'U'). Its condition and
    * assignment values reference TARGET columns only, rewritten to
    * plain names that resolve against the live-view retraction frame
    * the command builds at run time. Expressions ride inside tuples so
    * `TreeNode.expressions` cannot collect them (see
    * [[GraftMergeIntoCommand.deferredCols]] for why). */
  final case class NmsAction(
      kind: String,
      cond: Option[(String, Expression)],
      assigns: Seq[(String, Expression)] = Seq.empty)

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case other                   => other
  }

  /** Unwrap the Alias/Cast shells analysis adds around assignment
    * keys and values (shared with [[GraftDml]]). */
  private[sources] def stripWraps(e: Expression): Expression = e match {
    case al: Alias => stripWraps(al.child)
    case c: Cast   => stripWraps(c.child)
    case other     => other
  }

  def graftTargetOf(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    stripAlias(p) match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        Some((r, r.table.asInstanceOf[GraftTable]))
      case _ => None
    }

  def translate(m: MergeIntoTable): LogicalPlan = {
    val (rel, t) = graftTargetOf(m.targetTable).get
    if (t.pinnedVersion.nonEmpty || t.changesFrom.nonEmpty)
      throw MergeUnsupported("cannot merge into a version-pinned or changelog read")

    val srcOut = m.sourceTable.outputSet
    val tgtOut = rel.outputSet

    // NOT MATCHED BY SOURCE: any ordered mix of DELETE and
    // UPDATE SET actions, first match wins. These rows have no source
    // match, so conditions and assignment values may reference TARGET
    // columns only (ANSI agrees); everything is rewritten to plain
    // names and evaluated over the live-view retraction leg at run time.
    def toNmsExpr(e: Expression, what: String): Expression = {
      if (!e.references.subsetOf(tgtOut)) throw MergeUnsupported(
        s"WHEN NOT MATCHED BY SOURCE $what may reference only " +
          s"target columns; got ${e.sql}")
      e.transform {
        case a: AttributeReference if tgtOut.contains(a) =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
      }
    }
    val nmsActions: Seq[NmsAction] = m.notMatchedBySourceActions.map {
      case DeleteAction(c) =>
        NmsAction("D", c.map(e => "_graft_nms" -> toNmsExpr(e, "conditions")))
      case UpdateAction(c, as, _) =>
        val assigns = as.map { a =>
          val name = stripWraps(a.key) match {
            case k: AttributeReference if tgtOut.contains(k) => k.name
            case other => throw MergeUnsupported(
              s"assignment keys must be plain target columns; got ${other.sql}")
          }
          if (name.equalsIgnoreCase("doc_id"))
            throw MergeUnsupported("cannot assign to the merge key doc_id")
          name -> toNmsExpr(a.value, "assignment values")
        }
        assigns.groupBy(_._1.toLowerCase(java.util.Locale.ROOT))
          .collect { case (n, dups) if dups.size > 1 => n }
          .headOption.foreach(n =>
            throw MergeUnsupported(s"duplicate UPDATE SET assignment to column $n"))
        NmsAction("U", c.map(e => "_graft_nms" -> toNmsExpr(e, "conditions")), assigns)
      case other => throw MergeUnsupported(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }

    val key: Attribute = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tgtOut.contains(l) && l.name == "doc_id" && srcOut.contains(r) => r
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tgtOut.contains(r) && r.name == "doc_id" && srcOut.contains(l) => l
      case other =>
        throw MergeUnsupported(
          s"ON must be a single equality target.doc_id = source.<column>; got ${other.sql}")
    }

    def strip(e: Expression): Expression = stripWraps(e)

    // target refs rewrite to the joined frame's carried-payload columns
    // (`_graft_t_<col>`; the merge key itself to the joined live key),
    // source refs to their plain names — the joined frame is rebuilt
    // with fresh exprIds at run time, so resolution is by NAME, which
    // the `_graft_` prefix keeps unambiguous
    def rewriteRefs(e: Expression): Expression = e.transform {
      case a: AttributeReference if tgtOut.contains(a) =>
        val n = if (a.name.equalsIgnoreCase("doc_id")) "_graft_tgt"
                else s"_graft_t_${a.name}"
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n))
      case a: AttributeReference if srcOut.contains(a) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    }
    // a resolved star action arrives as by-name assignments (possibly
    // cast/aliased) COVERING every target payload column; shape alone is
    // not enough — a partial by-name list like `SET n_tok = s.n_tok`
    // must take the expression path (unassigned columns keep target
    // values), or star semantics would silently null/overwrite them
    // (round-4 review finding). Non-star shapes likewise fall through.
    val targetPayloadNames = rel.output.map(_.name.toLowerCase)
      .filterNot(_ == "doc_id").toSet
    def isStarShaped(assignments: Seq[Assignment]): Boolean = {
      val byName = assignments.forall { a =>
        (strip(a.key), strip(a.value)) match {
          case (k: AttributeReference, v: AttributeReference) =>
            srcOut.contains(v) && v.name.equalsIgnoreCase(k.name)
          case _ => false
        }
      }
      byName && targetPayloadNames.subsetOf(
        assignments.map(a => strip(a.key)).collect {
          case k: AttributeReference => k.name.toLowerCase
        }.toSet)
    }

    // source-only expressions pre-evaluate in a Project over the source
    // (resolved, no run-time bridge needed); target-referencing
    // MATCHED-side expressions defer to after the classification join,
    // where the carried target payload is in scope. Both kinds share
    // one `_graft_c<i>` / `_graft_v<j>` index space so the downstream
    // column plumbing never cares which path computed a column.
    val conds    = scala.collection.mutable.ArrayBuffer[(Int, Expression)]()
    val values   = scala.collection.mutable.ArrayBuffer[(Int, Expression)]()
    val deferred = scala.collection.mutable.ArrayBuffer[(String, Expression)]()
    var nCond = 0
    var nVal  = 0

    def condIdx(c: Option[Expression], matchedSide: Boolean): Option[Int] =
      c.map { e =>
        val i = nCond; nCond += 1
        if (e.references.subsetOf(srcOut)) conds += (i -> e)
        else if (matchedSide && e.references.subsetOf(srcOut ++ tgtOut))
          deferred += (s"_graft_c$i" -> rewriteRefs(e))
        else if (!matchedSide) throw MergeUnsupported(
          "WHEN NOT MATCHED conditions may reference only source columns " +
            s"(the target side of an unmatched row is all-null); got ${e.sql}")
        else throw MergeUnsupported(
          s"action conditions may reference only the source and target tables; got ${e.sql}")
        i
      }

    // expression assignments: key must be a plain target payload column
    // (never the merge key; nested fields are out of dialect), the value
    // any expression over source and/or target columns
    def exprAssigns(assignments: Seq[Assignment]): Seq[(String, Int)] = {
      val out = assignments.map { a =>
        val name = strip(a.key) match {
          case k: AttributeReference if tgtOut.contains(k) => k.name
          case other => throw MergeUnsupported(
            s"assignment keys must be plain target columns; got ${other.sql}")
        }
        if (name.equalsIgnoreCase("doc_id"))
          throw MergeUnsupported("cannot assign to the merge key doc_id")
        val j = nVal; nVal += 1
        if (a.value.references.subsetOf(srcOut)) values += (j -> a.value)
        else if (a.value.references.subsetOf(srcOut ++ tgtOut))
          deferred += (s"_graft_v$j" -> rewriteRefs(a.value))
        else throw MergeUnsupported(
          s"assignment values may reference only the source and target tables; got ${a.value.sql}")
        name -> j
      }
      // ANSI rejects duplicate assignments; a silent first-wins lookup
      // would violate the never-silently-wrong bar (same rule as DML
      // UPDATE)
      out.groupBy(_._1.toLowerCase(java.util.Locale.ROOT))
        .collect { case (n, as) if as.size > 1 => n }
        .headOption.foreach(n =>
          throw MergeUnsupported(s"duplicate UPDATE SET assignment to column $n"))
      out
    }

    val specs = scala.collection.mutable.ArrayBuffer[ActionSpec]()
    m.matchedActions.foreach {
      case DeleteAction(c) =>
        specs += ActionSpec("D", matchedSide = true, condIdx(c, matchedSide = true))
      case UpdateStarAction(c) =>
        specs += ActionSpec("U", matchedSide = true, condIdx(c, matchedSide = true))
      case UpdateAction(c, as, fromStar) =>
        val assigns =
          if (fromStar || isStarShaped(as)) None else Some(exprAssigns(as))
        specs += ActionSpec("U", matchedSide = true, condIdx(c, matchedSide = true), assigns)
      case other => throw MergeUnsupported(s"unsupported WHEN MATCHED action: $other")
    }
    m.notMatchedActions.foreach {
      case InsertStarAction(c) =>
        specs += ActionSpec("I", matchedSide = false, condIdx(c, matchedSide = false))
      case InsertAction(c, as) =>
        if (!isStarShaped(as))
          throw MergeUnsupported(
            s"INSERT supports only star (by-name) assignments; got ${as.map(_.sql).mkString(", ")}")
        specs += ActionSpec("I", matchedSide = false, condIdx(c, matchedSide = false))
      case other => throw MergeUnsupported(s"unsupported WHEN NOT MATCHED action: $other")
    }
    if (specs.isEmpty && nmsActions.isEmpty)
      throw MergeUnsupported("no merge actions given")

    // evaluate the source-only action conditions and assignment values
    // as named columns over the source NOW (resolved expressions in a
    // Project); the deferred (target-referencing) ones ride the command
    // and evaluate after the classification join
    val projected = Project(
      m.sourceTable.output ++
        conds.map { case (i, c) => Alias(c, s"_graft_c$i")() } ++
        values.map { case (j, v) => Alias(v, s"_graft_v$j")() },
      m.sourceTable)

    GraftMergeIntoCommand(t.root, projected, key.name, specs.toSeq,
      nmsActions, deferred.toSeq)
  }
}

/** The compiled MERGE: classify each source row against the live key
  * set (one left join), emit I/U/D change events at one fresh LSN, and
  * apply them through the standard MOR commit — ledgered, idempotent at
  * the row level, O(source) commit cost. */
case class GraftMergeIntoCommand(
    root: String,
    source: LogicalPlan, // Project carrying _graft_c<i> condition columns; resolved
    sourceKey: String,
    specs: Seq[GraftMergeInto.ActionSpec],
    /** NOT MATCHED BY SOURCE actions, first match wins; their
      * conditions/assignments are target-only expressions rewritten to
      * plain names for the live-view retraction leg. */
    nmsActions: Seq[GraftMergeInto.NmsAction] = Seq.empty,
    /** Target-referencing `_graft_c<i>`/`_graft_v<j>` columns, rewritten
      * to resolve by name against the classification join's frame.
      * Expressions ride inside tuples deliberately: `TreeNode.expressions`
      * collects bare/`Some`-wrapped Expression fields and CheckAnalysis
      * would then demand these deliberately-unresolved by-name
      * expressions resolve against THIS plan — but they resolve against
      * frames the command builds at run time. A non-Expression tuple is
      * invisible to that walk (same for [[GraftMergeInto.NmsAction]]'s
      * fields). */
    deferredCols: Seq[(String, Expression)] = Seq.empty) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("inserted", LongType, nullable = false)(),
    AttributeReference("updated", LongType, nullable = false)(),
    AttributeReference("deleted", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    val table = SnapshotTable.load(session, root)
    val cur = table.current.getOrElse(
      throw new IllegalStateException(s"no graft table at $root"))
    // persisted: the command evaluates the source three times (key
    // guard, bucket probe, classification join) — an unpinned
    // nondeterministic source could yield keys in the join whose bucket
    // the probe never saw, silently misrouting matched-ness (round-3
    // second-pass review); the cache pins one evaluation for all three
    val src = org.apache.spark.sql.classic.GraftSqlBridge.ofRows(session, source)
      .withColumn("_graft_key", col(sourceKey).cast("string"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // ONE probe job guards BOTH key invariants — the ANSI cardinality
    // rule (a source key may match at most one action) and non-null keys
    // (a null never matches the ON equality, so ANSI would route it to
    // INSERT, but doc_id is the table's non-nullable primary key and a
    // null row must be rejected typed, not smuggled in — review finding)
    // — AND collects the touched hash buckets (bounded: ≤ numBuckets
    // ints) in the same pass: the guard and the bucket probe each paid a
    // full aggregation job over the source before (guide §1.2: remove
    // passes first).
    val keyProbe = src
      .groupBy(col("_graft_key"))
      .agg(count(lit(1)).as("_c"))
      .agg(
        sum(when(col("_graft_key").isNull, 1L).otherwise(0L)).as("_nulls"),
        max(col("_c")).as("_maxc"),
        collect_set(
          MergeOnRead.bucketOf(col("_graft_key"), cur.numBuckets)).as("_bks"))
      .head()
    if (!keyProbe.isNullAt(0) && keyProbe.getLong(0) > 0)
      throw new IllegalArgumentException(
        "MERGE INTO source has a null join key; doc_id is non-nullable — " +
          "filter null keys or route them through the validation path")
    if (!keyProbe.isNullAt(1) && keyProbe.getLong(1) > 1)
      throw new IllegalArgumentException(
        "MERGE INTO source has duplicate join keys (cardinality violation); " +
          "deduplicate the source or use the change-batch API with explicit LSNs")

    val payload = cur.schema.fields
      .filterNot(f => Merge.InternalCols.contains(f.name))
      .filterNot(_.name == "doc_id")
    specs.flatMap(_.assigns).flatten.map(_._1).foreach { a =>
      if (!payload.exists(_.name == a))
        throw new IllegalArgumentException(
          s"MERGE INTO assigns unknown target column $a")
    }

    // matched-ness needs only the LIVE KEY SET — and only from the hash
    // buckets the source keys can land in: one bounded driver probe
    // (≤ numBuckets values) prunes the table read to the touched slice,
    // so a small MERGE source never scans the whole table (the same
    // pruning shape as the COW merge's touched-bucket read). Expression
    // assignments additionally need the matched TARGET PAYLOAD (their
    // unassigned columns keep target values) — carried on the same
    // pruned join only when such an action exists.
    val needTargetPayload =
      specs.exists(_.assigns.isDefined) || deferredCols.nonEmpty
    // touched buckets came free with the key-guard probe above
    lazy val touched: Set[Int] = keyProbe.getSeq[Int](2).toSet
    lazy val live = MergeOnRead.resolveBuckets(table, touched)
      .filter(!coalesce(col(Merge.TombCol), lit(false)))
      .select(
        Seq(col("doc_id").as("_graft_tgt"), lit(true).as("_graft_matched")) ++
          (if (needTargetPayload)
             payload.toSeq.map(f => col(f.name).as(s"_graft_t_${f.name}"))
           else Seq.empty): _*)
    // deferred target-referencing conditions/values evaluate here, with
    // the matched payload in scope; unmatched rows see them as null
    // (never armed / never selected — their action can't be matched-side)
    lazy val joined = deferredCols.foldLeft(
      src.join(live, col("_graft_key") === col("_graft_tgt"), "left")) {
        case (df, (n, e)) =>
          df.withColumn(n, org.apache.spark.sql.classic.GraftSqlBridge.column(e))
      }
    val matched = coalesce(col("_graft_matched"), lit(false))
    def armed(s: GraftMergeInto.ActionSpec) = {
      val side = if (s.matchedSide) matched else !matched
      s.condIdx.map(i => side && col(s"_graft_c$i")).getOrElse(side)
    }
    // first armed action wins, by declaration order (ANSI); rows no
    // action claims fall to null and are dropped (lazy: empty-spec
    // statements never evaluate it)
    lazy val actExpr = specs.indices.tail
      .foldLeft(when(armed(specs.head), lit(0))) {
        (acc, i) => acc.when(armed(specs(i)), lit(i))
      }

    val srcCols = src.columns.toSet
    // payload column value under action i: star actions copy by name
    // from the source; expression updates take the evaluated `_graft_v<j>`
    // for assigned columns and the target's value for the rest
    def valueUnder(s: GraftMergeInto.ActionSpec, f: org.apache.spark.sql.types.StructField) =
      s.assigns match {
        case Some(as) => as.find(_._1 == f.name) match {
          case Some((_, j)) => col(s"_graft_v$j").cast(f.dataType)
          case None         => col(s"_graft_t_${f.name}")
        }
        case None =>
          if (srcCols.contains(f.name)) col(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType)
      }
    def payloadCol(f: org.apache.spark.sql.types.StructField) =
      specs.indices.tail
        .foldLeft(when(col("_graft_act") === 0, valueUnder(specs.head, f))) {
          (acc, i) => acc.when(col("_graft_act") === i, valueUnder(specs(i), f))
        }.as(f.name)
    // a pure NOT-MATCHED-BY-SOURCE statement has no source-driven
    // actions: the src leg is empty (the retraction leg below carries
    // the whole statement) — built off `src`, not `joined`, so the
    // lazy bucket probe and pruned target read are never forced
    val events =
      if (specs.isEmpty)
        src.limit(0).select(
          col("_graft_key").as("doc_id") +:
            payload.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)) :+
            lit(cur.watermarkLsn + 1).as("lsn") :+ lit("D").as("op"): _*)
      else {
        val kinds = typedLit(specs.map(_.kind))
        joined
          .withColumn("_graft_act", actExpr)
          .filter(col("_graft_act").isNotNull)
          .select(
            col("_graft_key").as("doc_id") +:
              payload.toSeq.map(payloadCol) :+
              lit(cur.watermarkLsn + 1).as("lsn") :+
              element_at(kinds, col("_graft_act") + 1).as("op"): _*)
      }

    // NOT MATCHED BY SOURCE actions: every LIVE target doc absent from
    // the source keys is classified by the first armed action (D →
    // retraction tombstone, U → target-side rewrite with unassigned
    // columns keeping their values); unclaimed rows stay untouched.
    // The construct inspects every target row by definition, so this
    // leg reads the full live view — the ONLY unpruned read in the
    // command, paid only when the clause is present. Its keys are
    // anti-joined against the source's, so the two legs never stamp
    // the same doc at the shared LSN.
    val allEvents =
      if (nmsActions.isEmpty) events
      else {
        val bridge = org.apache.spark.sql.classic.GraftSqlBridge
        val unmatchedLive = MergeOnRead.liveView(table)
          .join(src.select(col("_graft_key").as("doc_id")), Seq("doc_id"), "left_anti")
        def nmsArmed(a: GraftMergeInto.NmsAction) =
          a.cond.map { case (_, c) => bridge.column(c) }.getOrElse(lit(true))
        val nmsAct = nmsActions.indices.tail
          .foldLeft(when(nmsArmed(nmsActions.head), lit(0))) {
            (acc, i) => acc.when(nmsArmed(nmsActions(i)), lit(i))
          }
        val nmsKinds = typedLit(nmsActions.map(_.kind))
        def nmsValue(a: GraftMergeInto.NmsAction, f: org.apache.spark.sql.types.StructField) =
          if (a.kind == "D") lit(null).cast(f.dataType)
          else a.assigns.find(_._1 == f.name)
            .map { case (_, e) => bridge.column(e).cast(f.dataType) }
            .getOrElse(col(f.name))
        def nmsPayloadCol(f: org.apache.spark.sql.types.StructField) =
          nmsActions.indices.tail
            .foldLeft(when(col("_graft_act") === 0, nmsValue(nmsActions.head, f))) {
              (acc, i) => acc.when(col("_graft_act") === i, nmsValue(nmsActions(i), f))
            }.as(f.name)
        events.unionByName(
          unmatchedLive
            .withColumn("_graft_act", nmsAct)
            .filter(col("_graft_act").isNotNull)
            .select(
              col("doc_id") +:
                payload.toSeq.map(nmsPayloadCol) :+
                lit(cur.watermarkLsn + 1).as("lsn") :+
                element_at(nmsKinds, col("_graft_act") + 1).as("op"): _*))
      }

    // the stamped LSN is read BEFORE the commit loop; the guard makes a
    // concurrent commit reaching it a typed retryable CommitConflict
    // instead of an undefined same-LSN LWW tie
    val stats = MergeOnRead(
      table, allEvents, s"sqlmerge-${graft.table.Fs.nonce}", batchId = -5L,
      requireWatermarkBelow = Some(cur.watermarkLsn + 1))
    Seq(Row(stats.version, stats.inserted, stats.updated, stats.deleted))
    } finally { src.unpersist(); () }
  }
}
