package graft.sources

import graft.operators.TxLogTable
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftshim.GraftSqlShim

/** SQL ROW-LEVEL DML on `graftlog` tables — `UPDATE`, `DELETE FROM`,
  * and `MERGE INTO` as plain `spark.sql` statements, routed to the
  * engine's existing ACID copy-on-write surface
  * ([[TxLogTable.updateWhere]] / [[TxLogTable.deleteWhere]] /
  * [[TxLogTable.mergeByKeyCols]]) by an analyzer post-hoc resolution
  * rule installed through [[graft.plans.GraftExtensions]].
  *
  * Architecture note (vs the DSv2 `SupportsRowLevelOperations` shape):
  * the rule-rewrite-to-runnable-command integration is the original
  * public Delta-on-Spark design (DeltaAnalysis rewrote exactly these
  * plans into Delete/Update/MergeCommands over a V1 relation), chosen
  * here deliberately — the read path stays the log-backed
  * `HadoopFsRelation`, so every DML probe scan and every post-DML read
  * keeps the vectorized `FileSourceScanExec` + listing-level pruning a
  * V2 `TableProvider` batch read would forfeit. The analyzer resolves
  * the statement's expressions against the relation as usual; this
  * rule re-anchors them BY NAME onto the engine's own snapshot scan
  * (fresh exprIds), and the command executes one file-pruned ACID
  * commit with history intact.
  *
  * Supported MERGE surface (clear errors otherwise): conjunctive
  * equi-key ON clauses (`t.k = s.k …`, same column name both sides —
  * [[TxLogTable.mergeByKeyCols]] is keyed by name), at most one
  * UPDATE and one DELETE matched clause with DELETE declared first
  * when both appear (the engine evaluates delete-then-update, Delta's
  * clause order), at most one INSERT clause (star or explicit
  * projection covering every target column), no
  * NOT-MATCHED-BY-SOURCE clauses, no schema evolution. */
object GraftSqlDml {

  /** Unwrap a resolved DML target to its graftlog relation:
    * (table path, pinned time-travel version). */
  private[sources] def graftTarget(plan: LogicalPlan)
      : Option[(String, Option[Long])] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case v: View => graftTarget(v.child)
    // the DELETION-VECTOR read rewrite ([[GraftDmlResolution
    // .rewriteDvRead]]) wraps the relation in Project(s) over a
    // LeftAnti join whose LEFT side is the approved, version-pinned
    // scan — a DML statement over such a view still targets the table
    // (the live head when the original relation was live:
    // dvLivePinned). ONLY the approved-index shape unwraps; an
    // arbitrary user query with a Project/anti-join never resolves to
    // a DML target.
    case Project(_, child) =>
      def fromLeft(p: LogicalPlan): Option[(String, Option[Long])] =
        p match {
          case Project(_, lr: LogicalRelation) => fromLeft(lr)
          case lr: LogicalRelation => lr.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => h.location match {
              case idx: GraftLogFileIndex if idx.dvApproved =>
                Some((idx.path,
                  if (idx.dvLivePinned) None else idx.pinned))
              case _ => None
            }
            case _ => None
          }
          case _ => None
        }
      def fromJoin(p: LogicalPlan): Option[(String, Option[Long])] =
        p match {
          case j: Join
              if j.joinType == org.apache.spark.sql.catalyst.plans
                .LeftAnti => fromLeft(j.left)
          // clean-files ∪ (masked-files anti-join) — the split shape;
          // the clean side is Project over the approved relation
          case u: Union => u.children.headOption.flatMap(fromLeft)
          // the pure COLUMN-MAPPING rewrite (no dvs) is Project(s) over
          // the approved relation directly — no join/union layer
          case lr: LogicalRelation => fromLeft(lr)
          case Project(_, inner) => fromJoin(inner)
          case _ => None
        }
      fromJoin(child)
    case lr: LogicalRelation => lr.relation match {
      case r: GraftLogRelation => Some((r.path, r.pinned))
      case r: GraftLogRowRelation => Some((r.path, r.pinned))
      // STRUCTURAL detection, not subclass identity: HadoopFsRelation
      // is a case class, and catalyst/catalog plumbing (the session
      // catalog's relation cache among them) can `copy()` it — which
      // rebuilds the BASE case class and silently drops the
      // GraftLogRelation subtype. The log-backed FileIndex survives
      // every copy, so it is the identity that matters.
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location match {
          case idx: GraftLogFileIndex => Some((idx.path, idx.pinned))
          case _ => None
        }
      case _ => None
    }
    // a CATALOG table's DML target resolves through the V2SessionCatalog
    // as a DataSourceV2Relation over the V1Table adapter — recover the
    // provider + path/options from the underlying CatalogTable
    case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2Relation =>
      GraftSqlShim.v1CatalogTable(r.table).flatMap { ct =>
        if (!ct.provider.exists(_.equalsIgnoreCase("graftlog"))) None
        else {
          val opts = ct.storage.properties
          opts.get("path").orElse(ct.storage.locationUri.map(_.toString))
            .map(p => (p, opts.get("versionAsOf").map(_.toLong)))
        }
      }
    case _ => None
  }

  private[sources] def requireHead(pinned: Option[Long], op: String,
      path: String): Unit =
    require(pinned.isEmpty,
      s"cannot $op a time-travel graftlog view (pinned at version " +
        s"${pinned.get} of $path) — DML targets the live head")

  /** Re-anchor a resolved expression by NAME: the analyzer resolved it
    * against the statement's relation instance, but the command
    * replays it over the engine's own snapshot scan with fresh
    * exprIds — unresolved-by-name attributes rebind there, exactly the
    * contract updateWhere/deleteWhere document for caller-supplied
    * Columns. */
  private[sources] def unresolve(e: Expression): Expression = {
    // bare-name rebinding is sound for every supported single-table
    // statement shape, but a correlated subquery's inner references
    // would rebind against the OUTER snapshot scan — silently wrong
    // rows, not an analysis error. Refuse loudly instead (the merge
    // path rebinds by provenance and is unaffected).
    e.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw new UnsupportedOperationException(
          "graftlog DELETE/UPDATE: subqueries in the WHERE/SET clause " +
            s"are not supported (found ${s.getClass.getSimpleName}); " +
            "materialize the subquery into a source table and use " +
            "MERGE INTO instead")
      case _ => ()
    }
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }
  }

  private[sources] def columnOf(e: Expression): Column =
    GraftSqlShim.columnOf(unresolve(e))

  /** Merge-clause expressions re-anchor with the engine's `t` (target
    * row) / `s` (incoming row) aliases, resolved by attribute
    * PROVENANCE — the analyzer already decided which side each
    * reference binds to, so a same-named column on both sides stays
    * unambiguous. */
  private def mergeColumnOf(e: Expression, tgt: AttributeSet,
      src: AttributeSet): Column =
    GraftSqlShim.columnOf(e.transform {
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
    })

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graftlog MERGE INTO: $what")

  /** Equi-key extraction from the ON clause: conjunction of
    * `t.k = s.k` with the SAME name both sides. */
  private def mergeKeys(cond: Expression, tgt: AttributeSet,
      src: AttributeSet): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference) =>
        val (t, s) =
          if (tgt.contains(l) && src.contains(r)) (l, r)
          else if (tgt.contains(r) && src.contains(l)) (r, l)
          else unsupported(s"ON conjunct compares within one side: $l = $r")
        if (t.name != s.name) unsupported(
          s"ON keys must share a column name (got t.${t.name} = " +
            s"s.${s.name}); alias the source column to the target's name")
        t.name
      case other => unsupported(
        s"ON clause must be a conjunction of bare-column equi-keys " +
          s"(t.k = s.k); got: ${other.sql}")
    }.distinct
  }

  case class MergeSpec(keyCols: Seq[String], updIf: Option[Column],
      delIf: Option[Column], set: Option[Seq[(String, Column)]],
      insert: Boolean, insIf: Option[Column],
      insProj: Option[Seq[(String, Column)]],
      setStar: Boolean = false, insertStar: Boolean = false)

  /** Was this clause the analyzer's expansion of a STAR form
    * (`UPDATE SET *` / `INSERT *`)? The parse-tree marker is gone by
    * resolution time (star actions resolve to per-column assignments),
    * so detection is two-tier. The distinction gates Delta's schema-
    * evolution contract — only star clauses auto-assign freshly
    * widened columns; an explicit list writes exactly what it says.
    *
    * Tier 1: the action node's parse ORIGIN — Catalyst records the
    * statement text + this node's start/stop indices at parse time and
    * `transformUp` carries them through resolution, so the clause's
    * own source fragment still reads `… UPDATE SET *` / `… INSERT *`.
    * Definitive when present (an explicit `INSERT (k, x) VALUES
    * (s.k, s.x)` over a 2-column target is shape-identical to the
    * star expansion — only the text tells them apart).
    *
    * Tier 2 (no origin text — e.g. a plan-built merge): the expansion
    * shape — one assignment per TARGET column, each a direct copy of
    * the same-named SOURCE attribute (modulo type coercion). */
  private def clauseIsStar(node: MergeAction,
      assignments: Seq[Assignment],
      tgt: AttributeSet, src: AttributeSet,
      targetCols: Seq[String]): Boolean = {
    // the action node's recorded origin spans the whole statement, so
    // match the clause KIND's star spelling anywhere in the text (the
    // surface allows at most one UPDATE and one INSERT clause, so the
    // spelling is unambiguous)
    val starRe = node match {
      case _: UpdateAction => """(?is).*\bUPDATE\s+SET\s*\*.*""".r
      case _ => """(?is).*\bINSERT\s*\*.*""".r
    }
    node.origin.sqlText match {
      case Some(text) => starRe.matches(text)
      case None => clauseShapeIsStar(assignments, tgt, src, targetCols)
    }
  }

  private def clauseShapeIsStar(assignments: Seq[Assignment],
      tgt: AttributeSet, src: AttributeSet,
      targetCols: Seq[String]): Boolean = {
    def strip(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        strip(c.child)
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        strip(a.child)
      case other => other
    }
    val assigned = scala.collection.mutable.Set.empty[String]
    val allCopies = assignments.forall { a =>
      (a.key, strip(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
            if tgt.contains(k) && src.contains(v) &&
              k.name.equalsIgnoreCase(v.name) =>
          assigned += k.name.toLowerCase; true
        case _ => false
      }
    }
    allCopies && targetCols.forall(c => assigned(c.toLowerCase))
  }

  /** Map the analyzer's merge actions onto the engine's clause model. */
  private[sources] def mergeSpec(m: MergeIntoTable): MergeSpec = {
    val tgt = m.targetTable.outputSet
    val src = m.sourceTable.outputSet
    val keyCols = mergeKeys(m.mergeCondition, tgt, src)
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
    val mc = (e: Expression) => mergeColumnOf(e, tgt, src)

    val targetCols = m.targetTable.output.map(_.name)
    var delIf: Option[Column] = None
    var updIf: Option[Column] = None
    var set: Option[Seq[(String, Column)]] = None
    var setStar = false; var insertStar = false
    var sawUpdate = false; var sawDelete = false
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        if (sawDelete) unsupported("at most one WHEN MATCHED … DELETE")
        if (sawUpdate) unsupported(
          "DELETE clause must be declared before the UPDATE clause " +
            "(the engine evaluates delete-then-update; a row matching " +
            "both must delete)")
        sawDelete = true
        delIf = Some(cond.map(mc).getOrElse(
          GraftSqlShim.columnOf(
            org.apache.spark.sql.catalyst.expressions.Literal(true))))
      case ua: UpdateAction =>
        if (sawUpdate) unsupported("at most one WHEN MATCHED … UPDATE")
        sawUpdate = true
        val assignments = ua.assignments
        setStar = clauseIsStar(ua, assignments, tgt, src, targetCols)
        updIf = ua.condition.map(mc)
        set = Some(assignments.map { a =>
          val name = a.key match {
            case k: AttributeReference => k.name
            case other => unsupported(
              s"UPDATE SET target must be a top-level column, got $other")
          }
          name -> mc(a.value)
        }.filterNot { case (n, _) => keyCols.contains(n) })
        // key self-assignments (SET * expands keys as t.k == s.k on a
        // matched row) are dropped above; a key reassignment to a NEW
        // value is not expressible through a keyed merge
        assignments.foreach { a =>
          a.key match {
            case k: AttributeReference if keyCols.contains(k.name) =>
              a.value match {
                case v: AttributeReference if v.name == k.name => ()
                case _ => unsupported(
                  s"UPDATE may not reassign merge key ${k.name}")
              }
            case _ => ()
          }
        }
      case other => unsupported(s"matched action $other")
    }
    // SQL semantics: a merge with NO update clause leaves non-deleted
    // matched rows untouched. The engine's updIf = None default means
    // UNCONDITIONAL whole-row update (the upsert shape) — mapping the
    // absent clause through unchanged would overwrite matched rows
    // with source values on a delete-only or insert-only MERGE. An
    // always-false update condition + an empty column-level SET pins
    // carry-unchanged semantics and keeps narrow sources legal (no
    // whole-row schema requirement).
    if (!sawUpdate) {
      updIf = Some(GraftSqlShim.columnOf(
        org.apache.spark.sql.catalyst.expressions.Literal(false)))
      set = Some(Seq.empty)
    }

    var insert = false
    var insIf: Option[Column] = None
    var insProj: Option[Seq[(String, Column)]] = None
    m.notMatchedActions.foreach {
      case ia @ InsertAction(cond, assignments) =>
        if (insert) unsupported("at most one WHEN NOT MATCHED … INSERT")
        insert = true
        insertStar = clauseIsStar(ia, assignments, tgt, src, targetCols)
        insIf = cond.map(mc)
        insProj = Some(assignments.map { a =>
          val name = a.key match {
            case k: AttributeReference => k.name
            case other => unsupported(
              s"INSERT target must be a top-level column, got $other")
          }
          name -> mc(a.value)
        })
      case other => unsupported(s"not-matched action $other")
    }
    MergeSpec(keyCols, updIf, delIf, set, insert, insIf, insProj,
      setStar = setStar, insertStar = insertStar)
  }

  // ---- the runnable commands (payloads are Columns, not Expressions:
  // they carry name-anchored rebindables, and a Column field keeps the
  // command node `resolved` for checkAnalysis) ----

  /** The delta contract shared by all three DML forms: with the table
    * property enabled, SQL row-level statements take the merge-on-read
    * deletion-vector path (O(changed rows) written); otherwise the
    * copy-on-write rewrite. */
  private def dvEnabled(path: String): Boolean =
    TxLogTable.tableProperties(path)
      .get(TxLogTable.PropEnableDv).exists(_.equalsIgnoreCase("true"))

  case class GraftDeleteCommand(path: String, cond: Column)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      if (dvEnabled(path)) TxLogTable.deleteWhereDv(spark, path, cond)
      else TxLogTable.deleteWhere(spark, path, cond)
      Nil
    }
  }

  case class GraftUpdateCommand(path: String,
      set: Seq[(String, Column)], cond: Column)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      if (dvEnabled(path))
        TxLogTable.updateWhereDv(spark, path, set.toMap, cond)
      else TxLogTable.updateWhere(spark, path, set.toMap, cond)
      Nil
    }
  }

  /** ACID INSERT for CATALOG graftlog tables. Temp-view inserts route
    * through `InsertableRelation` (DataSourceAnalysis checks it before
    * the file-write command), but a CATALOG table's INSERT resolves to
    * `InsertIntoHadoopFsRelationCommand` — a direct parquet write into
    * the table dir that would BYPASS the commit log (files no snapshot
    * references; silent data loss). The rule below intercepts that
    * command whenever its FileIndex is the log-backed one and re-routes
    * to the same ACID commit path, with the query already
    * column-coerced by Spark's own PreprocessTableInsertion. */
  case class GraftInsertCommand(path: String, pinned: Option[Long],
      query: LogicalPlan, overwrite: Boolean) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      val df = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, query)
      GraftLogRelation.acidInsert(spark, path, pinned, df, overwrite)
      Nil
    }
  }

  /** SQL `ALTER TABLE … ADD COLUMNS` for CATALOG graftlog tables:
    * stock Spark's `AlterTableAddColumnsCommand` rejects unknown
    * providers outright ("you must drop and re-create the table"), so
    * the rule below re-routes it to [[TxLogTable.addColumns]] — ONE
    * metadata-only rebase commit, zero data bytes — and then updates
    * the session catalog's schema + drops the cached relation, so a
    * `SELECT … BY NAME` in this or any later session serves the
    * widened schema immediately. Both schema stores stay authoritative
    * for their readers: the LOG for path-addressed reads (the commit
    * is the source of truth), the catalog for name resolution. */
  case class GraftAddColumnsCommand(path: String,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      cols: Seq[org.apache.spark.sql.types.StructField])
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      TxLogTable.addColumns(spark, path, cols)
      val cat = spark.sessionState.catalog
      val t = cat.getTableMetadata(ident)
      cat.alterTableDataSchema(ident,
        org.apache.spark.sql.types.StructType(t.dataSchema.fields ++ cols))
      cat.refreshTable(ident)
      Nil
    }
  }

  /** SQL `ALTER TABLE … RENAME COLUMN` / `DROP COLUMN` for CATALOG
    * graftlog tables, routed by [[GraftSqlParser]] AT PARSE TIME —
    * Spark's ResolveSessionCatalog throws "does not support RENAME/
    * DROP COLUMN" for every v1 table during the main resolution batch,
    * before any post-hoc rule could rewrite the plan. The commands run
    * the metadata-only column-mapping commits
    * ([[TxLogTable.renameColumn]]/[[TxLogTable.dropColumn]]) and then
    * update the session catalog's schema so name resolution serves
    * the new spelling immediately. */
  case class GraftRenameColumnCommand(path: String,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      from: String, to: String) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val v = TxLogTable.renameColumn(spark, path, from, to)
      syncCatalogSchema(spark, ident, path, v)
      Nil
    }
  }

  case class GraftDropColumnCommand(path: String,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      name: String) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val v = TxLogTable.dropColumn(spark, path, name)
      syncCatalogSchema(spark, ident, path, v)
      Nil
    }
  }

  private def syncCatalogSchema(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      path: String, v: Long): Unit = {
    val cat = spark.sessionState.catalog
    // alterTableDataSchema refuses renames/drops ("we don't support
    // dropping columns yet"); replacing the whole CatalogTable does not
    TxLogTable.schemaAt(path, v).foreach { s =>
      val ct = cat.getTableMetadata(ident)
      cat.alterTable(ct.copy(schema = s))
    }
    cat.refreshTable(ident)
  }

  case class GraftMergeCommand(path: String, source: LogicalPlan,
      spec: MergeSpec, schemaEvolution: Boolean = false)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(spark: SparkSession): Seq[Row] = {
      val src = org.apache.spark.sql.graft.DatasetShim.ofRows(spark, source)
      TxLogTable.mergeByKeyCols(spark, path, src, spec.keyCols,
        whenMatchedUpdateIf = spec.updIf,
        whenMatchedDeleteIf = spec.delIf,
        insertUnmatched = spec.insert,
        commit = graft.operators.CommitPoint.Auto,
        whenMatchedSet = spec.set,
        txn = None,
        checkDuplicateKeys = true,
        nullSafeKeys = false,
        whenNotMatchedInsertIf = spec.insIf,
        insertProjection = spec.insProj,
        useDv = dvEnabled(path),
        schemaEvolution = schemaEvolution,
        setFromStar = spec.setStar,
        insertFromStar = spec.insertStar)
      Nil
    }
  }
}

/** The analyzer rule: rewrite resolved row-level DML over graftlog
  * relations into the runnable commands above, BEFORE checkAnalysis
  * would reject them as non-v2 (post-hoc resolution placement, the
  * public Delta-1.x integration point). Non-graftlog targets pass
  * through untouched. */
case class GraftDmlResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftSqlDml._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      // catalog-table INSERT: DataSourceAnalysis (an earlier post-hoc
      // rule) already rewrote it into the direct file-write command —
      // re-route to the ACID commit path when the target is log-backed
      case c: org.apache.spark.sql.execution.datasources
          .InsertIntoHadoopFsRelationCommand
          if c.fileIndex.exists(_.isInstanceOf[GraftLogFileIndex]) =>
        val idx = c.fileIndex.get.asInstanceOf[GraftLogFileIndex]
        GraftSqlDml.GraftInsertCommand(idx.path, idx.pinned, c.query,
          overwrite = c.mode == org.apache.spark.sql.SaveMode.Overwrite)
      // catalog-table ALTER ADD COLUMNS: stock Spark's v1 command
      // rejects non-builtin providers in run(); re-route to the
      // metadata-only log commit + catalog schema update
      case a: org.apache.spark.sql.execution.command
          .AlterTableAddColumnsCommand =>
        val ct = spark.sessionState.catalog.getTableMetadata(a.table)
        if (!ct.provider.exists(_.equalsIgnoreCase("graftlog"))) a
        else {
          val opts = ct.storage.properties
          require(!opts.contains("versionAsOf"),
            s"cannot ALTER a time-travel graftlog table ${a.table} — " +
              "DDL targets the live head")
          val path = opts.get("path")
            .orElse(ct.storage.locationUri.map(_.toString))
            .getOrElse(throw new IllegalStateException(
              s"graftlog catalog table ${a.table} records no path"))
          GraftSqlDml.GraftAddColumnsCommand(path, a.table, a.colsToAdd)
        }
      case d @ DeleteFromTable(target, condition) if d.resolved =>
        graftTarget(target) match {
          case Some((path, pinned)) =>
            requireHead(pinned, "DELETE FROM", path)
            GraftDeleteCommand(path, columnOf(condition))
          case None => d
        }
      case u @ UpdateTable(target, assignments, condition) if u.resolved =>
        graftTarget(target) match {
          case Some((path, pinned)) =>
            requireHead(pinned, "UPDATE", path)
            val set = assignments.map { a =>
              val name = a.key match {
                case k: AttributeReference => k.name
                case other => throw new UnsupportedOperationException(
                  s"graftlog UPDATE: SET target must be a top-level " +
                    s"column, got $other")
              }
              name -> columnOf(a.value)
            }
            GraftUpdateCommand(path, set,
              condition.map(columnOf).getOrElse(
                org.apache.spark.sql.functions.lit(true)))
          case None => u
        }
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable) match {
          case Some((path, pinned)) =>
            requireHead(pinned, "MERGE INTO", path)
            // WITH SCHEMA EVOLUTION: the engine widens the target first
            // through the metadata-only addColumns commit, then merges
            // with Delta-autoMerge clause semantics (source-only SET
            // columns, NULL-filled inserts) — TxLogTable.mergeByKeyCols'
            // schemaEvolution path
            GraftMergeCommand(path, m.sourceTable, mergeSpec(m),
              schemaEvolution = m.withSchemaEvolution)
          case None => m
        }
      // DELETION-VECTOR read rewrite: a graftlog relation whose serving
      // snapshot carries dvs must not scan raw (the FileIndex guard
      // would throw) — rebuild the read as the SAME vectorized scan
      // (over a dvApproved, version-pinned copy of the index) minus a
      // (file, row_index) anti-join against the dv rows, output
      // attributes re-anchored to the original exprIds so every parent
      // operator resolves unchanged. The scan + its dv view pin to one
      // version — per-query snapshot isolation, the same contract
      // TxLogTable.read gives. Dv-free snapshots pass through with one
      // cached map lookup.
      case lr: LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            h.location match {
              case idx: GraftLogFileIndex if !idx.dvApproved =>
                val v = idx.resolvedVersion
                val dvs = idx.dvsAt(v)
                // renamed columns (logical ≠ physical) force the
                // physical-scan rewrite; a drop-only mapping needs none
                // (the relation's dataSchema already excludes dropped
                // columns, and parquet reads by name)
                val mapping = idx.mappingAt(v).getOrElse(Map.empty)
                  .filter { case (l, p) => l != p }
                if (dvs.isEmpty && mapping.isEmpty) lr
                else rewriteRead(lr, h, idx, v, dvs, mapping)
              case _ => lr
            }
          case _ => lr
        }
    }

  /** The read rewrite shared by DELETION VECTORS and COLUMN MAPPING: a
    * graftlog relation whose serving snapshot carries dvs or renamed
    * columns must not scan raw (the FileIndex guard would throw) —
    * rebuild the read as the SAME vectorized scan over a dvApproved,
    * version-pinned copy of the index, with (a) the scan asked for the
    * PHYSICAL column spelling and projected back to logical (mapping),
    * and (b) a (file, row_index) anti-join subtracting the dv rows,
    * output attributes re-anchored to the original exprIds so every
    * parent operator resolves unchanged. The scan + its dv/mapping view
    * pin to one version — per-query snapshot isolation, the same
    * contract TxLogTable.read gives; dvLivePinned remembers the
    * relation was a live head, so DML target detection still routes
    * statements over it to the head. Under dvs the table SPLITS: clean
    * files keep the untouched vectorized relation, ONLY the masked
    * files' relation pays the lineage columns + anti-join. */
  private def rewriteRead(lr: LogicalRelation,
      h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
      idx: GraftLogFileIndex, v: Long,
      dvs: Map[String, (String, Long)],
      mapping: Map[String, String]): LogicalPlan = {
    import org.apache.spark.sql.functions.col
    val physData =
      if (mapping.isEmpty) h.dataSchema
      else org.apache.spark.sql.types.StructType(h.dataSchema.fields
        .map(f => f.copy(name = mapping.getOrElse(f.name, f.name))))
    def subIdx(keep: Option[Set[String]]) = new GraftLogFileIndex(spark,
      idx.path, Some(v), idx.partitionSchema, dvApproved = true,
      dvLivePinned = idx.pinned.isEmpty, restrictTo = keep)
    def baseRel(keep: Option[Set[String]]) =
      spark.baseRelationToDataFrame(
        h.copy(location = subIdx(keep), dataSchema = physData)(spark))
    // select by the PHYSICAL spelling; the final Project aliases back
    // to the logical names (and original exprIds)
    val names = lr.output.map(a =>
      col(s"`${mapping.getOrElse(a.name, a.name)}`"))
    val joined =
      if (dvs.isEmpty) baseRel(None).select(names: _*)
      else {
        val masked = dvs.keySet
        val allFiles = TxLogTable.filesAt(idx.path, v).toSet
        val clean = allFiles -- masked
        val withLineage = baseRel(Some(masked)).select(col("*"),
          col("_metadata.file_path").as("__f"),
          col("_metadata.row_index").as("__ri"))
        // shared dictionary-encoded anti-join (int file ids,
        // byte-budgeted broadcast) — same primitive the Scala read
        // path uses
        val maskedSide = TxLogTable.dvAntiJoin(spark, idx.path,
            withLineage, dvs)
          .select(names: _*)
        if (clean.isEmpty) maskedSide
        else baseRel(Some(clean)).select(names: _*).unionByName(maskedSide)
      }
    val plan = joined.queryExecution.analyzed
    org.apache.spark.sql.catalyst.plans.logical.Project(
      lr.output.zip(plan.output).map { case (o, n) =>
        org.apache.spark.sql.catalyst.expressions.Alias(n, o.name)(
          exprId = o.exprId, qualifier = o.qualifier)
      }, plan)
  }

}
