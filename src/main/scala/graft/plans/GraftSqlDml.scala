package graft.plans

import graft.operators.{GraftTable, ZoneMap}
import graft.sources.GraftTableV2
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{CatalystBridge, ColumnBridge, PlanBridge}

/** The SQL DML front door for graft-catalog tables: Spark's connector
  * API has no non-row-level contract for `UPDATE` and `MERGE INTO` (a
  * table must implement `SupportsRowLevelOperations` and accept the
  * engine's group-rewrite plans), so this POST-HOC RESOLUTION rule —
  * injected by [[GraftExtensions]] — rewrites the RESOLVED
  * `UpdateTable`/`MergeIntoTable` plans over a [[GraftTableV2]] into
  * commands on the table's own transactional machinery
  * ([[GraftTable!.update]]'s pruned rewrite, [[GraftTable!.mergeCond]]'s
  * pruned conditional merge). The analyzer's own row-level rewrites run
  * in the Resolution batch but leave non-row-level tables untouched, so
  * by post-hoc time these plans are exactly what the user wrote,
  * resolved. `DELETE FROM` never reaches here — [[GraftTableV2]] serves
  * it natively through `SupportsDelete`.
  *
  * Supported MERGE shapes (the engine's merge semantics; anything else
  * refuses loudly with the API route):
  *  - `WHEN MATCHED [AND c] THEN UPDATE SET …  WHEN NOT MATCHED THEN
  *    INSERT …` — conditional/partial update + unconditional insert
  *    ([[GraftTable!.mergeCond]]; update-only MERGE, with no insert
  *    clause, pre-restricts the source to existing keys).
  *  - `WHEN MATCHED THEN DELETE` (alone) — key-membership delete
  *    (tombstone merge).
  * The ON condition must be a single target-key = source-key equality —
  * the merge key is the table's pruning axis, exactly the API contract.
  */
object GraftSqlDml extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition) if u.resolved =>
        graftTarget(table) match {
          case Some((rel, v2)) =>
            GraftUpdateCommand(v2.tablePath, rel.output, assignments,
              condition)
          case None => u
        }
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable) match {
          case Some((rel, v2)) =>
            require(!m.withSchemaEvolution,
              "MERGE WITH SCHEMA EVOLUTION is not supported on graft " +
                "tables — append/merge through the API evolve additively")
            GraftMergeCommand(v2.tablePath, rel.output, m.sourceTable,
              m.mergeCondition, m.matchedActions, m.notMatchedActions,
              m.notMatchedBySourceActions)
          case None => m
        }
    }

  private def graftTarget(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftTableV2)] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] =>
      Some((r, r.table.asInstanceOf[GraftTableV2]))
    case _ => None
  }
}

private[plans] object DmlExpr {

  /** Re-anchor a resolved expression on plain column names so it can
    * evaluate against the table's stored DataFrame (fresh exprIds).
    */
  def toCol(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** Scala-space literal value (Catalyst internals like UTF8String must
    * not leak into `lit()`/[[ZoneMap.Pred]]s).
    */
  private def scalaV(l: Literal): Any =
    CatalystBridge.toScala(l.value, l.dataType)

  /** Best-effort prunable conjuncts of a resolved condition — strict
    * bounds widen (conservative), non-literal comparisons and OR trees
    * contribute nothing; exactness always rides the full residual.
    */
  def toPreds(e: Expression): Seq[ZoneMap.Pred] = e match {
    case And(l, r) => toPreds(l) ++ toPreds(r)
    case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
      Seq(ZoneMap.Point(a.name, scalaV(l)))
    case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
      Seq(ZoneMap.Point(a.name, scalaV(l)))
    case GreaterThan(a: AttributeReference, l: Literal)
        if l.value != null => Seq(ZoneMap.Range(a.name, lo = scalaV(l)))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal)
        if l.value != null => Seq(ZoneMap.Range(a.name, lo = scalaV(l)))
    case LessThan(a: AttributeReference, l: Literal)
        if l.value != null => Seq(ZoneMap.Range(a.name, hi = scalaV(l)))
    case LessThanOrEqual(a: AttributeReference, l: Literal)
        if l.value != null => Seq(ZoneMap.Range(a.name, hi = scalaV(l)))
    case GreaterThan(l: Literal, a: AttributeReference)
        if l.value != null => Seq(ZoneMap.Range(a.name, hi = scalaV(l)))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference)
        if l.value != null => Seq(ZoneMap.Range(a.name, hi = scalaV(l)))
    case LessThan(l: Literal, a: AttributeReference)
        if l.value != null => Seq(ZoneMap.Range(a.name, lo = scalaV(l)))
    case LessThanOrEqual(l: Literal, a: AttributeReference)
        if l.value != null => Seq(ZoneMap.Range(a.name, lo = scalaV(l)))
    case _ => Nil
  }

  /** The assigned top-level column's name; nested-field assignment has
    * no graft analogue.
    */
  def keyName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => sys.error(s"unsupported assignment target $other — " +
      "graft DML assigns top-level columns only")
  }
}

/** `UPDATE graft.t SET … WHERE …` → [[GraftTable!.dmlWhere]]: the WHERE
  * prunes files through its literal conjuncts and applies EXACTLY as the
  * residual; SET expressions evaluate against each stored row (all
  * columns addressable), cast to the stored type — the
  * [[GraftTable!.update]] contract, now reachable as SQL text.
  */
final case class GraftUpdateCommand(path: String,
    targetOutput: Seq[Attribute], assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftTable.open(spark, path)
    val set = assignments
      .map(a => DmlExpr.keyName(a) -> DmlExpr.toCol(a.value)).toMap
    val extra = condition.map(DmlExpr.toCol).getOrElse(lit(true))
    val preds = condition.map(DmlExpr.toPreds).getOrElse(Nil)
    val (rewritten, carried) = tbl.dmlWhere(preds, extra, Some(set))
    Seq(Row(rewritten, carried))
  }

  override val output: Seq[Attribute] = {
    import org.apache.spark.sql.types.LongType
    Seq(AttributeReference("files_rewritten", LongType, nullable = false)(),
      AttributeReference("files_carried", LongType, nullable = false)())
  }
}

/** `MERGE INTO graft.t USING src ON t.k = s.k WHEN …` →
  * [[GraftTable!.mergeCond]] / tombstone [[GraftTable!.merge]]. The
  * resolved source sub-plan is planned back into a DataFrame
  * ([[PlanBridge.ofRows]]) and projected through the INSERT assignments
  * into the batch the engine's merge expects (target-named columns);
  * the matched condition and partial SET list ride as `mergeCond`'s
  * `t`/`s` condition and `updateCols`.
  */
final case class GraftMergeCommand(path: String,
    targetOutput: Seq[Attribute], source: LogicalPlan, cond: Expression,
    matched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    notMatched: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    notMatchedBySource: Seq[
      org.apache.spark.sql.catalyst.plans.logical.MergeAction])
  extends LeafRunnableCommand {

  private def refuse(why: String): Nothing = sys.error(
    s"unsupported MERGE shape on graft table $path: $why — supported: " +
      "WHEN MATCHED [AND c] THEN UPDATE SET … [WHEN NOT MATCHED THEN " +
      "INSERT …], or WHEN MATCHED THEN DELETE alone; use the " +
      "GraftTable API (merge/mergeCond with opCol) for CDC shapes")

  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftTable.open(spark, path)
    val targetIds = targetOutput.map(_.exprId).toSet
    val srcById = source.output.map(a => a.exprId -> a.name).toMap

    // ON: exactly one target-key = source-key equality
    val (tKey, sKeyExpr) = cond match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if targetIds(l.exprId) && srcById.contains(r.exprId) =>
        (l.name, r)
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if targetIds(r.exprId) && srcById.contains(l.exprId) =>
        (r.name, l)
      case other => refuse(s"ON must be a single target-key = source-key " +
        s"equality (the merge key is the pruning axis), got $other")
    }
    if (notMatchedBySource.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")

    val sourceDf = PlanBridge.ofRows(spark, source)

    (matched, notMatched) match {
      // WHEN MATCHED THEN DELETE (alone): key-membership tombstones
      case (Seq(DeleteAction(None)), Seq()) =>
        val opCol = "_graft_op"
        val batch = sourceDf
          .select(DmlExpr.toCol(sKeyExpr).as(tKey)).distinct()
          .withColumn(opCol, lit(GraftTable.DeleteOp))
        val (rewritten, carried) = tbl.merge(batch, tKey, opCol)
        Seq(Row(rewritten, carried))

      // WHEN MATCHED [AND c] THEN UPDATE SET … [+ INSERT]
      case (Seq(UpdateAction(updCond, updAssigns, _)), ins) =>
        val insAssigns = ins match {
          case Seq() => Nil
          case Seq(InsertAction(None, as)) => as
          case Seq(InsertAction(Some(_), _)) =>
            refuse("conditional INSERT is not supported")
          case other => refuse(s"unsupported not-matched actions $other")
        }
        // batch columns: target-named projections of the source. With an
        // INSERT clause those are its assignments; update-only merges
        // project the UPDATE's sources and pre-restrict to existing keys.
        val baseAssigns = if (insAssigns.nonEmpty) insAssigns else updAssigns
        val names = baseAssigns.map(DmlExpr.keyName)
        require(names.distinct.size == names.size,
          s"duplicate assignment targets: $names")
        val byName = baseAssigns.map(a => DmlExpr.keyName(a) -> a.value)
          .toMap
        require(insAssigns.isEmpty || byName.get(tKey).exists(
          _.semanticEquals(sKeyExpr)),
          s"INSERT must set the merge key $tKey from the ON condition's " +
            "source key")
        val projected = (if (byName.contains(tKey)) byName
          else byName + (tKey -> (sKeyExpr: Expression))).toSeq
          .map { case (n, e) => DmlExpr.toCol(e).as(n) }
        var batch = sourceDf.select(projected: _*)
        if (insAssigns.isEmpty)
          // update-only MERGE: unmatched source rows must do NOTHING —
          // restrict to keys present at the head snapshot
          batch = batch.join(
            tbl.read().select(tKey).distinct(), Seq(tKey), "left_semi")

        // updateCols: each UPDATE assignment must set its column from the
        // same source expression the batch carries for it
        val updateCols = updAssigns.filterNot(a =>
          DmlExpr.keyName(a) == tKey).map { a =>
          val n = DmlExpr.keyName(a)
          val carried = byName.getOrElse(n, refuse(
            s"UPDATE sets $n but the batch (INSERT projection) does not " +
              "carry it"))
          if (!a.value.semanticEquals(carried))
            refuse(s"UPDATE SET $n = ${a.value.sql} differs from the " +
              s"INSERT value for $n (${carried.sql}); the engine's merge " +
              "updates matched rows FROM the batch row")
          n
        }

        // matched condition over t (stored) / s (batch): source attrs
        // must be carried by the batch under their target name
        val srcToBatch = byName.collect {
          case (n, ar: AttributeReference) => ar.exprId -> n
        }
        val mc = updCond.map { c =>
          ColumnBridge.column(c.transform {
            case a: AttributeReference if targetIds(a.exprId) =>
              UnresolvedAttribute(Seq("t", a.name))
            case a: AttributeReference if srcToBatch.contains(a.exprId) =>
              UnresolvedAttribute(Seq("s", srcToBatch(a.exprId)))
            case a: AttributeReference if srcById.contains(a.exprId) =>
              refuse(s"matched condition references source column " +
                s"${a.name} which the INSERT projection does not carry")
          })
        }.getOrElse(ColumnBridge.column(Literal(true)))
        val (rewritten, carried) =
          tbl.mergeCond(batch, tKey, mc, updateCols)
        Seq(Row(rewritten, carried))

      case other => refuse(s"actions $other")
    }
  }

  override val output: Seq[Attribute] = {
    import org.apache.spark.sql.types.LongType
    Seq(AttributeReference("files_rewritten", LongType, nullable = false)(),
      AttributeReference("files_carried", LongType, nullable = false)())
  }
}
