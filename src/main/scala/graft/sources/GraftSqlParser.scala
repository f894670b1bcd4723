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
    GraftOpsSql.parse(session, sqlText).getOrElse(delegate.parsePlan(sqlText))

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
    s"""(?is)^\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS)?\\s*;?\\s*$$""".r
  private val Optimize =
    s"""(?is)^\\s*OPTIMIZE\\s+$T(?:\\s+ZORDER\\s+BY\\s+\\(?\\s*([\\w`,\\s]+?)\\s*\\)?)?\\s*;?\\s*$$""".r
  private val Reorg =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$T\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""".r
  private val RenameCol =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+RENAME\\s+COLUMN\\s+(`[^`]+`|\\w+)\\s+TO\\s+(`[^`]+`|\\w+)\\s*;?\\s*$$""".r
  private val DropCol =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+DROP\\s+COLUMNS?\\s+\\(?\\s*(`[^`]+`|\\w+)\\s*\\)?\\s*;?\\s*$$""".r

  private def unquote(s: String): String =
    if (s.startsWith("`") && s.endsWith("`")) s.substring(1, s.length - 1)
    else s

  /** Try to parse one of the graft operational statements; None →
    * delegate to Spark's parser. The ALTER COLUMN forms additionally
    * require the target to BE a catalog graftlog table — any other
    * table keeps Spark's own (unsupported-for-v1) behavior. */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case DescHistory(t) => Some(DescribeHistoryCommand(targetOf(t)))
      case DescDetail(t) => Some(DescribeDetailCommand(targetOf(t)))
      case Vacuum(t, hours) => Some(VacuumCommand(targetOf(t),
        Option(hours).map(_.toDouble)))
      case Optimize(t, zcols) => Some(OptimizeCommand(targetOf(t),
        Option(zcols).map(_.split(",").toSeq.map(c => unquote(c.trim))
          .filter(_.nonEmpty)).getOrElse(Seq.empty)))
      case Reorg(t) => Some(ReorgPurgeCommand(targetOf(t)))
      case RenameCol(t, from, to) =>
        catalogGraftTable(session, t).map { case (path, ti) =>
          GraftSqlDml.GraftRenameColumnCommand(path, ti,
            unquote(from), unquote(to))
        }
      case DropCol(t, colName) =>
        catalogGraftTable(session, t).map { case (path, ti) =>
          GraftSqlDml.GraftDropColumnCommand(path, ti, unquote(colName))
        }
      case _ => None
    }

  private def catalogGraftTable(session: SparkSession, raw: String)
      : Option[(String, TableIdentifier)] = {
    val ctOpt =
      try {
        val ti = session.sessionState.sqlParser.parseTableIdentifier(raw)
        Some(session.sessionState.catalog.getTableMetadata(ti))
      } catch { case scala.util.control.NonFatal(_) => None }
    ctOpt.flatMap { ct =>
      if (!ct.provider.exists(_.equalsIgnoreCase("graftlog"))) None
      else {
        require(!ct.storage.properties.contains("versionAsOf"),
          s"cannot ALTER a time-travel graftlog table $raw — DDL " +
            "targets the live head")
        ct.storage.properties.get("path")
          .orElse(ct.storage.locationUri.map(_.toString))
          .map(p => (p, ct.identifier))
      }
    }
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

  /** Default retention mirrors the delta world's 168h. */
  case class VacuumCommand(t: Target, retainHours: Option[Double])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("reaped" -> StringType)
    override def run(spark: SparkSession): Seq[Row] = {
      val ms = (retainHours.getOrElse(168.0) * 3600 * 1000).toLong
      TxLogTable.vacuumRetain(t.resolve(spark), ms).map(Row(_))
    }
  }

  case class OptimizeCommand(t: Target, zorderBy: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] = {
      val path = t.resolve(spark)
      val parts = TxLogTable.snapshotFiles(path,
        TxLogTable.currentVersion(path))
        .flatMap(f => TxLogTable.partitionValuesOf(f).map(_._1)).distinct
      Seq(Row(TxLogTable.compact(spark, path, zorderBy = zorderBy,
        partitionBy = parts)))
    }
  }

  case class ReorgPurgeCommand(t: Target) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = attrs("version" -> LongType)
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(TxLogTable.purgeDeletes(spark, t.resolve(spark))))
  }
}
