package graft.sources

import graft.operators.TxLogTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Standard Spark DataSource over [[TxLogTable]] — the connector that
  * makes the ACID table a first-class citizen of `spark.read` and SQL:
  *
  * {{{
  * spark.read.format("graftlog").load(path)                      // head
  * spark.read.format("graftlog").option("versionAsOf", 2).load(path)
  * spark.read.format("graftlog").option("timestampAsOf", ts).load(path)
  * spark.sql("CREATE TEMPORARY VIEW t USING graftlog OPTIONS (path '…')")
  * }}}
  *
  * Registered as short name `graftlog` via the
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * entry, exactly like Spark's own formats. Implements
  * [[PrunedFilteredScan]], so Catalyst's pushed-down filters reach the
  * table's LOG-LEVEL data skipping ([[TxLogTable.readWhere]]): a file
  * whose recorded min/max interval provably excludes the predicate
  * never opens a footer. Pushdown is advisory (`unhandledFilters`
  * returns every filter), so Spark re-applies the exact predicates —
  * pruning can only skip provably-unmatching files, never change
  * results. Column pruning projects before the scan's row conversion.
  *
  * The delta world ships exactly this shape (a DataSource with
  * versionAsOf/timestampAsOf options); here it is ~100 lines over the
  * existing snapshot/pruning machinery, no new read path. */
class GraftLogSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graftlog"

  /** The write side — `df.write.format("graftlog").mode(…).save(path)`
    * mapping SaveMode onto the log's commit forms: Append → ACID
    * [[TxLogTable.append]]; Overwrite → atomic [[TxLogTable.overwrite]]
    * (one rebase commit, history intact); ErrorIfExists → append only
    * into an empty table; Ignore → no-op when the table has a version.
    * `option("partitionBy", "a,b")` routes to hive-partitioned
    * commits (`DataFrameWriter.partitionBy` is not forwarded to V1
    * sources, hence the option). CHECK constraints and SetTransaction
    * semantics apply unchanged — this is the same commit path every
    * other writer uses, behind the standard API. */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode._
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlog needs a path — df.write.format(\"graftlog\").save(path)"))
    val parts = opts.get("partitionby")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val spark = sqlContext.sparkSession
    val exists = TxLogTable.currentVersion(path) >= 0
    mode match {
      case Append => TxLogTable.append(spark, data, path, partitionBy = parts)
      case Overwrite =>
        TxLogTable.overwrite(spark, data, path, partitionBy = parts)
      case ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graftlog table at $path already has commits (ErrorIfExists)")
        else TxLogTable.append(spark, data, path, partitionBy = parts)
      case Ignore =>
        if (!exists) TxLogTable.append(spark, data, path, partitionBy = parts)
    }
    GraftLogRelation(sqlContext, path, TxLogTable.currentVersion(path))
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    // DataFrameReader hands a CaseInsensitiveMap, but SQL `USING …
    // OPTIONS` paths may not — normalize ourselves
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException(
        "graftlog needs a path — spark.read.format(\"graftlog\").load(path)"))
    val byVersion = opts.get("versionasof").map(_.toLong)
    val byTs = opts.get("timestampasof").map(_.toLong)
    require(byVersion.isEmpty || byTs.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = byVersion
      .orElse(byTs.map(TxLogTable.versionAsOf(path, _)))
      .getOrElse(TxLogTable.currentVersion(path))
    require(version >= 0, s"no committed version at $path")
    GraftLogRelation(sqlContext, path, version)
  }
}

case class GraftLogRelation(sqlContext: SQLContext, path: String,
    version: Long) extends BaseRelation with PrunedFilteredScan {

  override val schema: StructType =
    TxLogTable.readVersion(sqlContext.sparkSession, path, version).schema

  /** Translate Catalyst's pushed [[Filter]]s into a Column predicate
    * for the stats-pruning pass. Partial by design: an untranslatable
    * filter contributes no pruning (conservative — the file set only
    * ever shrinks on provable exclusion, and Spark re-applies every
    * filter exactly because [[unhandledFilters]] keeps them all). */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) if vs.nonEmpty =>
      Some(vs.map(v => col(a) === lit(v)).reduce(_ || _))
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other) => one.orElse(other) // partial AND still prunes
    }
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case _ => None // IsNull/Not/… — no stats story, scan those files
  }

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters // pruning is advisory; Spark re-applies everything exactly

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = sqlContext.sparkSession
    val base = filters.flatMap(toColumn).reduceOption(_ && _) match {
      case Some(pred) => TxLogTable.readWhere(spark, path, pred, Some(version))
      case None => TxLogTable.readVersion(spark, path, version)
    }
    base.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}
