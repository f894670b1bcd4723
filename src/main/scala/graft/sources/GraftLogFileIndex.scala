package graft.sources

import graft.operators.TxLogTable
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** LOG-BACKED [[FileIndex]] — the architecture the delta world ships
  * for its read path (a transaction-log snapshot exposed as the file
  * listing of an ordinary `HadoopFsRelation`): the planner sees a
  * standard parquet relation, so the scan is Spark's OWN
  * `FileSourceScanExec` — vectorized columnar parquet, whole-stage
  * codegen, parquet footer/row-group pushdown — while `listFiles`
  * answers from the COMMIT LOG: only the snapshot's live files exist,
  * and the planner's partition+data filters run through the table's
  * log-level skipping ([[TxLogTable.pruneFilesWith]]: hive-segment
  * bounds first, then the `_stats.json` min/max sidecars), so a file
  * whose recorded interval provably excludes the predicate never even
  * reaches the scan's listing. Pruning is advisory as everywhere else
  * — the scan re-applies every filter exactly.
  *
  * `pinned = Some(v)` serves time travel; `None` is LIVE — every
  * planner listing resolves the then-current version, so a long-lived
  * SQL view tracks the table (including its own `INSERT INTO`s).
  * File statuses cache forever: committed data files are immutable by
  * the log's construction. */
class GraftLogFileIndex(spark: SparkSession, val path: String,
    val pinned: Option[Long], override val partitionSchema: StructType,
    val dvApproved: Boolean = false, val dvLivePinned: Boolean = false,
    val restrictTo: Option[Set[String]] = None)
    extends FileIndex {

  private val statusCache =
    new scala.collection.concurrent.TrieMap[String, FileStatus]()

  // per-version snapshot (listing + log-recorded sizes + deletion
  // vectors), cached: a committed version's listing is immutable by the
  // log's construction, and a LIVE index re-resolving the head on every
  // planner call must not pay a log re-read per already-seen version
  private val snapshotCache = new scala.collection.concurrent
    .TrieMap[Long, (Seq[String], Map[String, Long],
      Map[String, (String, Long)])]()

  private def version: Long =
    pinned.getOrElse(TxLogTable.currentVersion(path))

  private def snapshotAt(v: Long)
      : (Seq[String], Map[String, Long], Map[String, (String, Long)]) = {
    val (files, sizes, dvs) =
      snapshotCache.getOrElseUpdate(v, TxLogTable.snapshotState(path, v))
    // file-subset view of the snapshot — the deletion-vector read
    // rewrite splits a table into a clean-files relation (plain
    // vectorized scan) and a masked-files relation (scan + anti-join)
    restrictTo match {
      case None => (files, sizes, dvs)
      case Some(keep) => (files.filter(keep), sizes, dvs)
    }
  }

  private def snapshot: Seq[String] = snapshotAt(version)._1

  /** The serving version's deletion-vector map (cached with the
    * snapshot) — what [[graft.sources.GraftDmlResolution]]'s read
    * rewrite consults per analysis. */
  private[sources] def dvsAt(v: Long): Map[String, (String, Long)] =
    snapshotAt(v)._3

  // per-version logical→physical column map (column-mapping DDL);
  // immutable once committed, so cached like the snapshot
  private val mappingCache = new scala.collection.concurrent
    .TrieMap[Long, Option[Map[String, String]]]()

  /** The serving version's column mapping when RENAME/DROP COLUMN has
    * run (None otherwise) — the read rewrite scans physical and
    * projects logical; the guard below refuses raw scans. */
  private[sources] def mappingAt(v: Long): Option[Map[String, String]] =
    mappingCache.getOrElseUpdate(v, TxLogTable.schemaMappingAt(path, v))

  private[sources] def resolvedVersion: Long = version

  /** `FileStatus` served FROM THE LOG: the commit entry records each
    * file's size, so planning (split sizing, `sizeInBytes` join
    * estimates) performs ZERO per-file filesystem calls — the metadata
    * shape Delta's `add.size` gives its readers; without it a fresh
    * relation over a 100k-file object-store table would pay ~100k
    * serial HEAD requests before its first plan. The mtime is synthetic
    * (0): committed data files are immutable, and nothing downstream of
    * a scan consumes it except the `_metadata.file_modification_time`
    * column, which this connector does not expose. One real
    * `getFileStatus` remains as the fallback for files whose committing
    * entry predates size recording. */
  private def statusOf(sizes: Map[String, Long])(rel: String): FileStatus =
    statusCache.getOrElseUpdate(rel, sizes.get(rel) match {
      case Some(len) =>
        // fully QUALIFIED, like every real listing API returns — the
        // rendering `_metadata.file_path` serves is this path's
        // toString, and the deletion-vector anti-join keys on it
        val (fs, _) = TxLogTable.fsFor(path)
        new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
          fs.makeQualified(new HPath(s"$path/$rel")))
      case None =>
        val (fs, _) = TxLogTable.fsFor(path)
        fs.getFileStatus(new HPath(s"$path/$rel"))
    })

  override def rootPaths: Seq[HPath] = Seq(new HPath(path))

  override def refresh(): Unit = { statusCache.clear(); snapshotCache.clear() }

  override def inputFiles: Array[String] =
    snapshot.map(f => s"$path/$f").toArray

  override def sizeInBytes: Long = {
    val (files, sizes, _) = snapshotAt(version)
    files.map(f => statusOf(sizes)(f).getLen).sum
  }

  /** Hive-partition path values cast to the declared partition types —
    * the same string→type conversion partition discovery performs
    * (session time zone for temporal casts); a
    * `__HIVE_DEFAULT_PARTITION__` segment is NULL. */
  private def partitionRow(rel: String): InternalRow = {
    val vals = TxLogTable.partitionValuesOf(rel).toMap
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      vals.get(f.name).flatten match {
        case None => null
        case Some(s) => Cast(
          Literal(UTF8String.fromString(s), StringType), f.dataType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
      }
    })
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val (fs, root) = TxLogTable.fsFor(path)
    val (snap, sizes, dvs) = snapshotAt(version)
    // DELETION-VECTOR guard: a raw file scan of a dv-carrying snapshot
    // would RESURRECT the masked rows. The session's
    // [[GraftDmlResolution]] rule (installed by GraftExtensions)
    // rewrites every read over this index into the scan + dv anti-join
    // and marks the rewritten index `dvApproved`; a session WITHOUT the
    // extensions must fail loudly here, never answer wrong.
    if (dvs.nonEmpty && !dvApproved)
      throw new IllegalStateException(
        s"graftlog table at $path carries deletion vectors " +
          "(merge-on-read deletes); a raw scan would resurrect deleted " +
          "rows. Install graft.plans.GraftExtensions " +
          "(spark.sql.extensions) so reads rewrite with the dv " +
          "anti-join, read through TxLogTable.read, or fold the masks " +
          "with TxLogTable.purgeDeletes")
    // COLUMN-MAPPING guard, same contract: a raw scan of a table with
    // RENAMED columns would serve them as all-NULL (parquet reads by
    // name; the files spell the physical name). The rewrite (which
    // sets dvApproved on its inner index) scans physical names and
    // projects to logical. Drop-only mappings need no rewrite: the
    // relation's dataSchema already excludes dropped columns.
    if (!dvApproved &&
        mappingAt(version).exists(_.exists { case (l, p) => l != p }))
      throw new IllegalStateException(
        s"graftlog table at $path uses column mapping (RENAME COLUMN " +
          "ran); a raw scan would read renamed columns as NULL. " +
          "Install graft.plans.GraftExtensions (spark.sql.extensions) " +
          "so reads rewrite physical→logical, or read through " +
          "TxLogTable.read")
    val status = statusOf(sizes) _
    // layout guard for LIVE head indexes: the relation chose this fast
    // path from the layout at VIEW CREATION. If a later commit mixes
    // layouts (partition evolution — a file carrying the column
    // in-file instead of in its path), reading that column as a path
    // constant would yield nulls silently; fail loudly instead and the
    // recreated view takes the row fallback.
    val expected = partitionSchema.fieldNames.toSeq
    snap.find(f => TxLogTable.partitionValuesOf(f).map(_._1) != expected)
      .foreach { f =>
        throw new IllegalStateException(
          s"graftlog view over $path: file $f does not match the " +
            s"partition layout ${expected.mkString("[", ",", "]")} the " +
            "view was created with (partition evolution after view " +
            "creation) — recreate the view to pick up the new layout")
      }
    // partition pruning is EXACT, not interval-based: bind the
    // planner's partition filters to each directory's typed values and
    // evaluate — this also prunes the cases a min/max model cannot
    // express (IsNotNull against a __HIVE_DEFAULT_PARTITION__ dir,
    // null-safe equality, Not). NULL or false both exclude, standard
    // WHERE semantics.
    val keepDir: InternalRow => Boolean =
      partitionFilters.reduceOption(And) match {
        case None => _ => true
        case Some(cond) =>
          val bound = cond.transform {
            case a: org.apache.spark.sql.catalyst.expressions
                .AttributeReference =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                partitionSchema.fieldIndex(a.name), a.dataType, a.nullable)
          }
          row => java.lang.Boolean.TRUE == bound.eval(row)
      }
    val dataCond = dataFilters.reduceOption(And)
    snap.groupBy(f => TxLogTable.partitionValuesOf(f).map(_._2)).toSeq
      .sortBy(_._1.toString)
      .flatMap { case (_, fsOfDir) =>
        val row = partitionRow(fsOfDir.head)
        if (!keepDir(row)) None
        else {
          // data-column skipping via the _stats.json sidecars, only
          // for partition survivors
          val (kept, _) =
            TxLogTable.pruneFilesWith(fs, root, fsOfDir, dataCond)
          if (kept.isEmpty) None
          else Some(PartitionDirectory(row, kept.map(status).toArray))
        }
      }
  }
}
