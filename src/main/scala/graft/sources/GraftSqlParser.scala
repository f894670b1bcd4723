package graft.sources

import graft.operators.TxLogTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** SQL spellings for the OPERATIONAL surface — the statements the delta
  * world exposes beyond DML, parsed by a delegating session parser
  * (the public `injectParser` extension point; the same integration
  * the delta SQL extension uses for its own VACUUM/OPTIMIZE grammar):
  *
  *  - `DESCRIBE HISTORY <t>`            → [[TxLogTable.historyDf]]
  *  - `DESCRIBE DETAIL <t>`             → [[TxLogTable.tableDetail]]
  *  - `VACUUM <t> [RETAIN n HOURS]`     → [[TxLogTable.vacuumRetain]]
  *  - `OPTIMIZE <t> [ZORDER BY (c,…)]`  → [[TxLogTable.compact]]
  *  - `REORG TABLE <t> APPLY (PURGE)`   → [[TxLogTable.purgeDeletes]]
  *  - `ALTER TABLE <t> RENAME COLUMN a TO b` / `DROP COLUMN a` on
  *    CATALOG graftlog tables → the metadata-only column-mapping DDL
  *    ([[TxLogTable.renameColumn]]/[[TxLogTable.dropColumn]]). These
  *    must intercept at PARSE time: Spark's ResolveSessionCatalog
  *    throws "does not support RENAME COLUMN" for every v1 table
  *    during the main resolution batch, before any post-hoc rule can
  *    run. Non-graftlog targets delegate untouched (the catalog probe
  *    decides).
  *
  * `<t>` is a catalog table or temp view over graftlog, or the
  * path-literal form `graftlog.`/table/path``. Everything else
  * delegates verbatim to Spark's parser. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftOpsSql.parse(session, sqlText).getOrElse(
      GraftOpsSql.rewriteTableChanges(session,
        GraftOpsSql.rewriteTimeTravel(session, delegate.parsePlan(sqlText))))

  override def parseExpression(s: String): Expression =
    delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
}

object GraftOpsSql {

  /** A statement target: a path literal or an identifier to resolve at
    * RUN time (catalog table or temp view over graftlog). */
  case class Target(path: Option[String], ident: Option[String]) {
    def resolve(spark: SparkSession): String = path.getOrElse {
      val raw = ident.get
      val ti = spark.sessionState.sqlParser.parseTableIdentifier(raw)
      val fromCatalog =
        try {
          val ct = spark.sessionState.catalog.getTableMetadata(ti)
          if (!ct.provider.exists(_.equalsIgnoreCase("graftlog"))) None
          else ct.storage.properties.get("path")
            .orElse(ct.storage.locationUri.map(_.toString))
        } catch { case scala.util.control.NonFatal(_) => None }
      fromCatalog.orElse {
        // temp view over a graftlog relation (incl. the dv/mapping
        // read-rewrite shapes — graftTarget unwraps them)
        try GraftSqlDml.graftTarget(
          spark.table(raw).queryExecution.analyzed).map(_._1)
        catch { case scala.util.control.NonFatal(_) => None }
      }.getOrElse(throw new IllegalArgumentException(
        s"$raw is not a graftlog catalog table or view (and no " +
          "graftlog.`/path` literal was given)"))
    }
  }

  private val T = """(graftlog\.`[^`]+`|`[^`]+`|[\w.]+)"""
  private def targetOf(raw: String): Target = {
    val PathForm = "(?i)^graftlog\\.`(.+)`$".r
    raw match {
      case PathForm(p) => Target(Some(p), None)
      case other => Target(None, Some(other))
    }
  }

  private val DescHistory =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*$$""".r
  private val DescDetail =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*$$""".r
  private val Vacuum =
    s"""(?is)^\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""".r
  private val CloneStmt =
    s"""(?is)^\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?$T\\s+SHALLOW\\s+CLONE\\s+$T(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?(?:\\s+LOCATION\\s+'([^']+)')?\\s*;?\\s*$$""".r
  private val Optimize =
    s"""(?is)^\\s*OPTIMIZE\\s+$T(\\s+FULL)?(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s+\\(?\\s*([\\w`,\\s]+?)\\s*\\)?)?\\s*;?\\s*$$""".r
  private val ConvertStmt =
    """(?is)^\s*CONVERT\s+TO\s+GRAFTLOG\s+parquet\s*\.\s*`([^`]+)`(?:\s+PARTITIONED\s+BY\s*\(\s*([\w`,\s]+?)\s*\))?\s*;?\s*$""".r
  private val ConvertTableStmt =
    """(?is)^\s*CONVERT\s+TO\s+GRAFTLOG\s+([\w.]+)(?:\s+PARTITIONED\s+BY\s*\(\s*([\w`,\s]+?)\s*\))?\s*;?\s*$""".r
  private val Reorg =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$T\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""".r
  private val RenameCol =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+RENAME\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+TO\\s+(`[^`]+`|\\w+)\\s*;?\\s*$$""".r
  private val DropCol =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+COLUMNS?\\s+\\(?\\s*(`[^`]+`|\\w+)\\s*\\)?\\s*;?\\s*$$""".r
  private val Restore =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""".r
  private val RestoreTs =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""".r
  private val SetProps =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+SET\\s+TBLPROPERTIES\\s*\\((.+?)\\)\\s*;?\\s*$$""".r
  private val UnsetProps =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+?)\\)\\s*;?\\s*$$""".r
  private val ShowProps =
    s"""(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+$T\\s*;?\\s*$$""".r
  private val AddConstraint =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""".r
  private val DropConstraint =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+CONSTRAINT\\s+(?:IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*$$""".r
  private val SetNotNull =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+SET\\s+NOT\\s+NULL\\s*;?\\s*$$""".r
  private val DropNotNull =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+DROP\\s+NOT\\s+NULL\\s*;?\\s*$$""".r
  private val PropPair =
    """\s*['"`]?([\w.-]+)['"`]?\s*=\s*(?:'([^']*)'|"([^"]*)"|([^,'"\s]+))\s*""".r

  private def unquote(s: String): String =
    if (s.startsWith("`") && s.endsWith("`")) s.substring(1, s.length - 1)
    else s

  /** Try to parse one of the graft operational statements; None →
    * delegate to Spark's parser. The ALTER COLUMN forms additionally
    * require the target to BE a catalog graftlog table — any other
    * table keeps Spark's own (unsupported-for-v1) behavior. */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      // every statement Spark has no grammar for still probes
      // isGraftTarget at PARSE time: a non-graft target falls through
      // to the delegate and raises Spark's own parse error instead of
      // a graft run-time refusal — and a Delta-style extension that
      // DOES own these spellings is never shadowed for its tables
      case DescHistory(t) if isGraftTarget(session, t) =>
        Some(DescribeHistoryCommand(targetOf(t)))
      case DescDetail(t) if isGraftTarget(session, t) =>
        Some(DescribeDetailCommand(targetOf(t)))
      case Vacuum(t, hours, dry) if isGraftTarget(session, t) =>
        Some(VacuumCommand(targetOf(t), Option(hours).map(_.toDouble),
          dryRun = dry != null))
      case CloneStmt(dest, src, ver, loc) if isGraftTarget(session, src) =>
        Some(CloneCommand(targetOf(dest), Option(loc), targetOf(src),
          Option(ver).map(_.toLong)))
      case Optimize(t, full, whereSql, zcols) if isGraftTarget(session, t) =>
        Some(OptimizeCommand(targetOf(t),
          Option(zcols).map(_.split(",").toSeq.map(c => unquote(c.trim))
            .filter(_.nonEmpty)).getOrElse(Seq.empty),
          Option(whereSql).map(_.trim).filter(_.nonEmpty),
          full = full != null))
      case Reorg(t) if isGraftTarget(session, t) =>
        Some(ReorgPurgeCommand(targetOf(t)))
      // CONVERT targets a PLAIN parquet dir (not yet a graft table),
      // spelled explicitly — Delta's `CONVERT TO DELTA parquet.\`p\``
      // shape — so no isGraftTarget probe: convert() itself refuses
      // an existing log or a non-parquet layout
      case ConvertStmt(p, partCols) =>
        Some(ConvertCommand(p,
          Option(partCols).map(_.split(",").toSeq
            .map(c => unquote(c.trim)).filter(_.nonEmpty))
            .getOrElse(Seq.empty)))
      // CONVERT on a CATALOG parquet table (Delta's `CONVERT TO DELTA
      // db.tbl`): converts the table's location in place AND re-points
      // the catalog entry's provider to graftlog, so reads/DML by name
      // route through the ACID surface from then on. Only fires for a
      // resolvable catalog table whose provider is parquet — anything
      // else falls through to Spark's own parse error.
      case ConvertTableStmt(t, partCols) if catalogParquetTable(
          session, t).isDefined =>
        Some(ConvertTableCommand(t,
          Option(partCols).map(_.split(",").toSeq
            .map(c => unquote(c.trim)).filter(_.nonEmpty))
            .getOrElse(Seq.empty)))
      case RenameCol(t, from, to) =>
        catalogGraftTable(session, t).map { case (path, ti) =>
          requireHeadDdl(session, t)
          GraftSqlDml.GraftRenameColumnCommand(path, ti,
            unquote(from), unquote(to))
        }
      case DropCol(t, colName) =>
        catalogGraftTable(session, t).map { case (path, ti) =>
          requireHeadDdl(session, t)
          GraftSqlDml.GraftDropColumnCommand(path, ti, unquote(colName))
        }
      case Restore(t, v) if isGraftTarget(session, t) =>
        Some(RestoreCommand(targetOf(t), Some(v.toLong), None))
      case RestoreTs(t, ts) if isGraftTarget(session, t) =>
        Some(RestoreCommand(targetOf(t), None, Some(ts)))
      case AddConstraint(t, name, check) if isGraftTarget(session, t) =>
        Some(AddConstraintCommand(targetOf(t), name, check.trim))
      case DropConstraint(t, name) if isGraftTarget(session, t) =>
        Some(DropConstraintCommand(targetOf(t), name))
      case SetNotNull(t, colName) if isGraftTarget(session, t) =>
        Some(NotNullCommand(targetOf(t), unquote(colName), set = true))
      case DropNotNull(t, colName) if isGraftTarget(session, t) =>
        Some(NotNullCommand(targetOf(t), unquote(colName), set = false))
      // TBLPROPERTIES route to the LOG's property store (the store the
      // dv routing consults — the delta posture, where TBLPROPERTIES
      // live in the transaction log, not the metastore). Intercept
      // ONLY graftlog targets: other tables keep Spark's native
      // catalog-property semantics.
      case SetProps(t, pairs) if isGraftTarget(session, t) =>
        // write DDL: a time-travel-pinned catalog alias must not
        // mutate the LIVE table's property store (e.g. flip dv
        // routing for all writers); SHOW stays unguarded
        requireHeadDdl(session, t)
        Some(SetPropertiesCommand(targetOf(t), parsePairs(pairs)))
      case UnsetProps(t, keys) if isGraftTarget(session, t) =>
        requireHeadDdl(session, t)
        Some(UnsetPropertiesCommand(targetOf(t),
          keys.split(",").toSeq.map(k =>
            unquote(k.trim.stripPrefix("'").stripSuffix("'")
              .stripPrefix("\"").stripSuffix("\""))).filter(_.nonEmpty)))
      case ShowProps(t) if isGraftTarget(session, t) =>
        Some(ShowPropertiesCommand(targetOf(t)))
      case _ => None
    }

  /** SQL time travel — `SELECT … FROM t VERSION AS OF n` /
    * `TIMESTAMP AS OF 'ts'` on graftlog tables and views: the parser
    * rewrites each `RelationTimeTravel` node whose target resolves to
    * a graftlog table into a version-pinned relation (the same
    * `versionAsOf`/`timestampAsOf` read options the DataFrame surface
    * uses), BEFORE analysis — Spark's own resolution supports time
    * travel only for v2 tables and would throw UNSUPPORTED_FEATURE.
    * Non-graft targets and non-literal timestamps pass through
    * untouched (Spark's error stands). */
  def rewriteTimeTravel(session: SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    plan transformUp {
      case tt: RelationTimeTravel =>
        val pinnedPlan = tt.relation match {
          case ur: UnresolvedRelation =>
            val raw = ur.multipartIdentifier.map(p => s"`$p`").mkString(".")
            graftPathOf(session, raw).flatMap { path =>
              val reader = session.read.format("graftlog")
              val pinned = (tt.version, tt.timestamp) match {
                case (Some(v), _) if v.matches("\\d+") =>
                  Some(reader.option("versionAsOf", v.toLong))
                case (None, Some(e)) => literalMillis(e)
                  .map(ms => reader.option("timestampAsOf", ms))
                case _ => None
              }
              pinned.map(r =>
                org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
                  ur.multipartIdentifier.last,
                  r.load(path).queryExecution.logical))
            }
          case _ => None
        }
        pinnedPlan.getOrElse(tt)
    }
  }

  /** Epoch millis from a parsed time-travel literal: integer epoch
    * millis, or a `yyyy-MM-dd[ HH:mm:ss]` string read as UTC (the same
    * session-independent anchor the log's commit timestamps use). */
  private def literalMillis(e: org.apache.spark.sql.catalyst.expressions
      .Expression): Option[Long] = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal =>
      val s = String.valueOf(l.value)
      if (s.matches("\\d+") && s.length >= 12) Some(s.toLong)
      else try {
        val t = if (s.contains(" ") || s.contains("T"))
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        else java.time.LocalDate.parse(s).atStartOfDay()
        Some(t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      } catch { case scala.util.control.NonFatal(_) => None }
    case _ => None
  }

  /** Parse-time path resolution shared by the time-travel rewrite:
    * catalog graftlog table or temp view over a graftlog relation. */
  private def graftPathOf(session: SparkSession, raw: String)
      : Option[String] =
    catalogGraftTable(session, raw).map(_._1).orElse {
      try GraftSqlDml.graftTarget(
        session.table(raw).queryExecution.analyzed).map(_._1)
      catch { case scala.util.control.NonFatal(_) => None }
    }

  private def parsePairs(s: String): Seq[(String, String)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map {
      case PropPair(k, v1, v2, v3) =>
        k -> Seq(Option(v1), Option(v2), Option(v3)).flatten
          .headOption.getOrElse("")
      case other => throw new IllegalArgumentException(
        s"cannot parse TBLPROPERTIES pair: $other (values with commas " +
          "are not supported)")
    }

  /** Parse-time probe: is this target a graftlog table (path literal,
    * catalog table, or temp view over a graftlog relation)? Decides
    * interception for statements Spark also understands natively. */
  private def isGraftTarget(session: SparkSession, raw: String): Boolean =
    raw.toLowerCase.startsWith("graftlog.") ||
      catalogGraftTable(session, raw).isDefined || {
        try GraftSqlDml.graftTarget(
          session.table(raw).queryExecution.analyzed).isDefined
        catch { case scala.util.control.NonFatal(_) => false }
      }

  /** A resolvable catalog table whose provider is PARQUET — the only
    * legal target of the catalog-name CONVERT form. */
  private def catalogParquetTable(session: SparkSession, raw: String)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] =
    try {
      val ti = session.sessionState.sqlParser.parseTableIdentifier(raw)
      Some(session.sessionState.catalog.getTableMetadata(ti))
        .filter(_.provider.exists(_.equalsIgnoreCase("parquet")))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def catalogGraftTable(session: SparkSession, raw: String)
      : Option[(String, TableIdentifier)] = {
    val ctOpt =
      try {
        val ti = session.sessionState.sqlParser.parseTableIdentifier(raw)
        Some(session.sessionState.catalog.getTableMetadata(ti))
      } catch { case scala.util.control.NonFatal(_) => None }
    ctOpt.flatMap { ct =>
      if (!ct.provider.exists(_.equalsIgnoreCase("graftlog"))) None
      else ct.storage.properties.get("path")
        .orElse(ct.storage.locationUri.map(_.toString))
        .map(p => (p, ct.identifier))
    }
  }

  /** The versionAsOf guard for the WRITE DDL arms (ALTER COLUMN,
    * SET/UNSET TBLPROPERTIES) — [[catalogGraftTable]] is also called
    * from read-only probes (SHOW TBLPROPERTIES, the SELECT time-travel
    * rewrite), which must serve a pinned table, not refuse it. */
  private def requireHeadDdl(session: SparkSession, raw: String): Unit = {
    val pinned =
      try {
        val ti = session.sessionState.sqlParser.parseTableIdentifier(raw)
        session.sessionState.catalog.getTableMetadata(ti)
          .storage.properties.contains("versionAsOf")
      } catch { case scala.util.control.NonFatal(_) => false }
    require(!pinned,
      s"cannot ALTER a time-travel graftlog table $raw — DDL targets " +
        "the live head")
  }

  private def attrs(fs: (String, DataType)*): Seq[Attribute] =
    fs.map { case (n, t) => AttributeReference(n, t, nullable = true)() }

  case class DescribeHistoryCommand(t: Target) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "version" -> LongType, "timestamp" -> TimestampType,
      "operation" -> StringType, "is_rebase" -> BooleanType,
      "num_files" -> IntegerType)
    override def run(spark: SparkSession): Seq[Row] =
      TxLogTable.historyDf(spark, t.resolve(spark)).collect().toSeq
  }

  case class DescribeDetailCommand(t: Target) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "path" -> StringType, "version" -> LongType,
      "num_files" -> LongType, "size_bytes" -> LongType,
      "dv_masked_files" -> LongType, "dv_masked_rows" -> LongType,
      "partition_columns" -> StringType, "num_constraints" -> LongType,
      "num_properties" -> LongType, "op_counts" -> StringType)
    override def run(spark: SparkSession): Seq[Row] =
      TxLogTable.tableDetail(spark, t.resolve(spark)).collect().toSeq
  }

  /** Default retention mirrors the delta world's 168h. `DRY RUN`
    * reports the dirs a real pass would reap, deleting nothing — the
    * blast-radius check before the irreversible vacuum. */
  case class VacuumCommand(t: Target, retainHours: Option[Double],
      dryRun: Boolean = false) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("reaped" -> StringType)
    override def run(spark: SparkSession): Seq[Row] = {
      val ms = (retainHours.getOrElse(168.0) * 3600 * 1000).toLong
      val path = t.resolve(spark)
      val dirs =
        if (dryRun) TxLogTable.vacuumRetainDryRun(path, ms)
        else TxLogTable.vacuumRetain(path, ms)
      dirs.map(Row(_))
    }
  }

  /** `CREATE TABLE dest SHALLOW CLONE src [VERSION AS OF n]
    * [LOCATION 'path']` — Delta's clone spelling over
    * [[TxLogTable.shallowClone]]: zero data rewritten (hard links), the
    * clone evolves independently. `dest` is a `graftlog.`/path``
    * literal, or a catalog name with a LOCATION clause — the command
    * then registers the catalog table over the cloned path so name
    * resolution works immediately. */
  case class CloneCommand(dest: Target, destLoc: Option[String],
      src: Target, version: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val srcPath = src.resolve(spark)
      val destPath = dest.path.orElse(destLoc).getOrElse(
        throw new IllegalArgumentException(
          "SHALLOW CLONE needs a destination path — use the " +
            "graftlog.`/path` literal form or add LOCATION '/path'"))
      val v = TxLogTable.shallowClone(spark, srcPath, destPath, version)
      dest.ident.foreach { name =>
        spark.sql(s"CREATE TABLE $name USING graftlog " +
          s"OPTIONS (path '${destPath.replace("'", "''")}')")
      }
      Seq(Row(v))
    }
  }

  /** `OPTIMIZE t [WHERE <pred>] [ZORDER BY (c, …)]` — the WHERE form is
    * the scoped compaction you actually run at scale: only stats/
    * partition-pruned in-scope files rewrite, everything else carries
    * by reference ([[TxLogTable.compact]]'s `where`). Returns -1 when
    * nothing is in scope (no commit, no log churn).
    *
    * With the table property `graft.optimize.minFileMB` set (the
    * delta-style posture where compaction policy lives in table
    * config), a plain `OPTIMIZE t` routes to
    * [[TxLogTable.compactIncremental]] — bin-packed, one durable
    * conflict-revalidated commit per partition-aligned bin, files at
    * or over the threshold untouched; the command returns the LAST
    * bin's version (or -1 when nothing was under target). ZORDER and
    * WHERE forms keep the explicit single-commit semantics. */
  /** SQL OPTIMIZE routing — the Delta-parity defaults:
    *  - plain `OPTIMIZE t` is BIN-PACKED SMALL-FILES-ONLY
    *    ([[TxLogTable.compactIncremental]]): at-target files are never
    *    rewritten, each bin commits durably on its own. The size cut
    *    comes from the `graft.optimize.minFileMB` table property when
    *    set, else half the 256 MB target — Delta's own posture, where
    *    plain OPTIMIZE never rewrites already-compacted data;
    *  - `OPTIMIZE t FULL` is the explicit whole-table rewrite opt-in;
    *  - `ZORDER BY` / `WHERE` forms keep the single-commit scoped
    *    rewrite (clustering and predicate scoping ARE rewrite asks). */
  case class OptimizeCommand(t: Target, zorderBy: Seq[String],
      whereSql: Option[String] = None, full: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      if (zorderBy.isEmpty && whereSql.isEmpty && !full) {
        val minProp = TxLogTable.tableProperties(path)
          .get("graft.optimize.minFileMB").map(_.toInt)
        val vs = TxLogTable.compactIncremental(spark, path,
          minFileMB = minProp.getOrElse(128))
        return Seq(Row(vs.lastOption.getOrElse(-1L)))
      }
      val parts = TxLogTable.snapshotFiles(path,
        TxLogTable.currentVersion(path))
        .flatMap(f => TxLogTable.partitionValuesOf(f).map(_._1)).distinct
      Seq(Row(TxLogTable.compact(spark, path, zorderBy = zorderBy,
        partitionBy = parts,
        where = whereSql.map(org.apache.spark.sql.functions.expr))))
    }
  }

  case class ReorgPurgeCommand(t: Target) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(TxLogTable.purgeDeletes(spark, t.resolve(spark))))
  }

  /** SQL `CONVERT TO GRAFTLOG parquet.`path` [PARTITIONED BY (cols)]`
    * — [[TxLogTable.convert]]: one metadata-only v0 commit referencing
    * the existing parquet files in place. Returns the created version
    * (always 0). */
  case class ConvertCommand(path: String, partitionBy: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(TxLogTable.convert(spark, path, partitionBy)))
  }

  /** `CONVERT TO GRAFTLOG db.tbl` — the catalog form: converts the
    * parquet table's LOCATION in place, then re-points the catalog
    * entry (provider → graftlog, path in storage properties) and
    * refreshes, so every later read/INSERT/DML by name routes through
    * the ACID surface. Partition columns default to the catalog's own
    * recording; an explicit PARTITIONED BY must agree with the files
    * (validated inside [[TxLogTable.convert]]). */
  case class ConvertTableCommand(table: String,
      partitionBy: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = spark.sessionState.catalog
      val ti = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val ct = cat.getTableMetadata(ti)
      require(ct.provider.exists(_.equalsIgnoreCase("parquet")),
        s"CONVERT TO GRAFTLOG targets a parquet table; $table is " +
          s"${ct.provider.getOrElse("unknown")}")
      val path = ct.storage.locationUri.map(_.toString).getOrElse(
        throw new IllegalStateException(
          s"catalog table $table records no location"))
      val parts =
        if (partitionBy.nonEmpty) partitionBy
        else ct.partitionColumnNames
      // the catalog schema IS the read-back contract: its declared
      // partition types override path inference (a string partition
      // column must not come back INT after the convert)
      val v = TxLogTable.convert(spark, path, parts,
        schemaHint = Some(ct.schema))
      cat.alterTable(ct.copy(
        provider = Some("graftlog"),
        storage = ct.storage.copy(
          properties = ct.storage.properties + ("path" -> path))))
      cat.refreshTable(ti)
      Seq(Row(v))
    }
  }

  /** `RESTORE TABLE t TO VERSION AS OF n` / `TO TIMESTAMP AS OF 'ts'`
    * — [[TxLogTable.restore]]: the log re-points, nothing copies. The
    * timestamp form accepts epoch millis or `yyyy-MM-dd HH:mm:ss`
    * (session-independent UTC, same anchor as timestampAsOf reads). */
  case class RestoreCommand(t: Target, version: Option[Long],
      timestamp: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      val v = version.getOrElse {
        // same literal surface as the SELECT time-travel path: epoch
        // millis, 'yyyy-MM-dd HH:mm:ss', or date-only 'yyyy-MM-dd'
        // (midnight UTC)
        val raw = timestamp.get
        val ms =
          if (raw.matches("\\d+")) raw.toLong
          else {
            val t = if (raw.contains(" ") || raw.contains("T"))
              java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
            else java.time.LocalDate.parse(raw).atStartOfDay()
            t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          }
        TxLogTable.versionAsOf(path, ms)
      }
      Seq(Row(TxLogTable.restore(spark, path, v)))
    }
  }

  case class SetPropertiesCommand(t: Target, pairs: Seq[(String, String)])
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      pairs.foreach { case (k, v) =>
        TxLogTable.setTableProperty(path, k, v) }
      Nil
    }
  }

  case class UnsetPropertiesCommand(t: Target, keys: Seq[String])
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      keys.foreach(TxLogTable.unsetTableProperty(path, _))
      Nil
    }
  }

  case class ShowPropertiesCommand(t: Target) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs(
      "key" -> StringType, "value" -> StringType)
    override def run(spark: SparkSession): Seq[Row] =
      TxLogTable.tableProperties(t.resolve(spark)).toSeq.sorted
        .map { case (k, v) => Row(k, v) }
  }

  /** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — the SQL
    * spelling of [[TxLogTable.addCheckConstraint]] (the current
    * snapshot must already satisfy it; later staged writes validate
    * pre-publish). */
  case class AddConstraintCommand(t: Target, name: String,
      checkSql: String) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      TxLogTable.addCheckConstraint(spark, t.resolve(spark), name, checkSql)
      Nil
    }
  }

  case class DropConstraintCommand(t: Target, name: String)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      TxLogTable.dropCheckConstraint(t.resolve(spark), name)
      Nil
    }
  }

  /** `ALTER TABLE t ALTER COLUMN c SET/DROP NOT NULL` — the NOT NULL
    * column invariant ([[TxLogTable.setNotNull]]): unlike a CHECK
    * constraint (which passes NULL by the SQL rule), this is exactly
    * the rejection of NULL, including a staged frame that omits the
    * column entirely. */
  case class NotNullCommand(t: Target, column: String, set: Boolean)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      if (set) TxLogTable.setNotNull(spark, path, column)
      else TxLogTable.dropNotNull(path, column)
      Nil
    }
  }

  /** SQL `table_changes(t, start[, end])` — Delta's change-feed
    * table-valued function, rewritten AT PARSE TIME into the batch
    * readChangeFeed relation (stock Spark has no such TVF, so the
    * unresolved node would fail analysis). `t` is a string literal
    * (catalog table, view, or graftlog.`/path`); `start`/`end` are
    * version numbers, epoch-millis, or timestamp string literals —
    * a timestamp start resolves to the EARLIEST version at-or-after
    * it ([[TxLogTable.versionSince]]), an end to the latest at-or-
    * before ([[TxLogTable.versionAsOf]]), Delta's boundary contract.
    * `end` defaults to the current head. Both bounds INCLUSIVE
    * (the readChangeFeed contract). Non-graft or non-literal targets
    * pass through untouched — Spark's own error stands. */
  def rewriteTableChanges(session: SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
    import org.apache.spark.sql.catalyst.expressions.Literal
    plan transformUp {
      case tvf: UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase) == Seq("table_changes") &&
            tvf.functionArgs.size >= 2 && tvf.functionArgs.size <= 3 =>
        val rewritten = tvf.functionArgs.head match {
          case Literal(t, StringType) =>
            val raw = String.valueOf(t)
            val target = targetOf(raw)
            target.path.orElse(graftPathOf(session, raw)).flatMap { path =>
              def bound(e: org.apache.spark.sql.catalyst.expressions
                  .Expression, isEnd: Boolean): Option[Long] = e match {
                case Literal(v, IntegerType | LongType) =>
                  Some(String.valueOf(v).toLong)
                case l @ Literal(_, StringType)
                    if String.valueOf(l.value).matches("\\d+") &&
                      String.valueOf(l.value).length < 12 =>
                  Some(String.valueOf(l.value).toLong)
                case l: Literal => literalMillis(l).map(ms =>
                  if (isEnd) TxLogTable.versionAsOf(path, ms)
                  else TxLogTable.versionSince(path, ms))
                case _ => None
              }
              for {
                start <- bound(tvf.functionArgs(1), isEnd = false)
                end <- tvf.functionArgs.drop(2).headOption
                  .map(e => bound(e, isEnd = true))
                  .getOrElse(Some(TxLogTable.currentVersion(path)))
              } yield org.apache.spark.sql.catalyst.plans.logical
                .SubqueryAlias("table_changes",
                  session.read.format("graftlog")
                    .option("readChangeFeed", "true")
                    .option("startingVersion", start)
                    .option("endingVersion", end)
                    .load(path).queryExecution.logical)
            }
          case _ => None
        }
        rewritten.getOrElse(tvf)
    }
  }
}
