package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Minimal transaction-logged append table ("graft-log") — restores the
  * ACID properties the reference gets from Delta Lake (delta_writer.py:
  * 88-94) in an environment without delta jars:
  *
  *  - every commit writes parquet files into the table dir, then
  *    atomically publishes a version file `_log/<v>.json` listing them
  *    through a [[CommitPoint]] (hard link locally; conditional put on
  *    object stores)
  *  - readers resolve the current snapshot from the log, so half-written
  *    commits are invisible (no dirty reads) and time travel is
  *    `readVersion(v)`
  *  - concurrent committers race on the rename; the loser retries with
  *    the next version — optimistic concurrency, serialized appends
  *
  * This deliberately implements the subset the reference uses (append +
  * read-back; no UPDATE/DELETE/MERGE, matching SURVEY §2.C), with file
  * listing kept in the log exactly like the delta protocol so readers
  * never list directories at scale.
  */
object TxLogTable {

  private def logDir(path: String) = Paths.get(path, "_log")

  /** Every `CheckpointInterval` commits, the full cumulative file list is
    * rolled into `<v>.checkpoint.json`, so a snapshot read opens one
    * checkpoint + at most CheckpointInterval-1 incremental entries — O(1)
    * in table age, like the delta protocol's checkpoint parquet. */
  val CheckpointInterval = 10

  private def listLog(path: String, suffix: String): Seq[Long] = {
    val d = logDir(path)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(suffix) &&
          (suffix != ".json" || !n.endsWith(".checkpoint.json")))
        .map(_.stripSuffix(suffix).toLong)
        .toSeq.sorted
      finally s.close()
    }
  }

  private def versions(path: String): Seq[Long] = listLog(path, ".json")

  /** Stage a DataFrame's files under a unique data subdir (invisible to
    * readers until the log names them); returns the relative file list. */
  private def stage(df: DataFrame, path: String, prefix: String): Seq[String] = {
    Files.createDirectories(logDir(path))
    val stageId = s"$prefix${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = s"$path/data-$stageId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    new java.io.File(dataDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => s"data-$stageId/${f.getName}")
      .sorted.toSeq
  }

  /** Publish one atomic commit. `rebase = true` marks the entry as a full
    * replacement of the accumulated file list (compaction); rebase
    * commits require the log to still be at `expectedVersion` — the
    * commit point either wins the exact next version or the rebase
    * aborts, because retrying at a later number would silently drop
    * whatever a concurrent append just published. */
  private def commitEntry(path: String, files: Seq[String], rebase: Boolean,
      expectedVersion: Option[Long], maxRetries: Int, cp: CommitPoint): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val v = versions(path).lastOption.getOrElse(-1L) + 1
      expectedVersion.foreach { exp =>
        if (v != exp + 1)
          throw new java.util.ConcurrentModificationException(
            s"table advanced to ${v - 1} during compaction (snapshot was $exp)")
      }
      val flag = if (rebase) """"rebase":true,""" else ""
      val entry = files.map(f => "\"" + f + "\"").mkString(
        s"""{"version":$v,$flag"files":[""", ",", "]}")
      // the commit point: publish-iff-absent (hard link locally,
      // conditional put on object stores — see CommitPoint)
      if (cp.putIfAbsent(logDir(path), s"$v.json", entry)) {
        maybeCheckpoint(path, v)
        return v
      }
      if (expectedVersion.isDefined)
        throw new java.util.ConcurrentModificationException(
          s"lost the commit race at version $v during compaction")
      attempt += 1 // lost the race; retry at the next version
    }
    throw new IllegalStateException(s"could not commit to $path after $maxRetries attempts")
  }

  /** Append a batch as one atomic commit; returns the committed version.
    * `commit` selects the atomic-publish primitive for the table's
    * storage (hard link locally; conditional put on object stores).
    * Each commit also mirrors a Delta-protocol `_delta_log` entry for
    * external readers ([[DeltaInterop]]); the native `_log` remains the
    * source of truth. */
  def append(spark: SparkSession, df: DataFrame, path: String,
      maxRetries: Int = 20, commit: CommitPoint = CommitPoint.HardLink): Long = {
    val files = stage(df, path, "")
    val v = commitEntry(path, files, rebase = false, None, maxRetries, commit)
    DeltaInterop.mirror(spark, path, v, files, Seq.empty, df.schema.json, commit)
    v
  }

  /** Compact the current snapshot's many small data dirs into
    * ~targetFileMB-sized files, published as a REBASE commit (the entry
    * replaces the accumulated listing; `filesUpTo` resets at it). Time
    * travel to pre-compaction versions still works — old data dirs stay
    * on disk until `vacuumCompacted`. Aborts with
    * ConcurrentModificationException if anything commits between the
    * snapshot read and the rebase publish (optimistic, like append). */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 256,
      commit: CommitPoint = CommitPoint.HardLink): Long = {
    val v0 = currentVersion(path)
    val snapshot = readVersion(spark, path, v0)
    val sizeBytes = filesUpTo(path, v0)
      .map(f => new java.io.File(s"$path/$f").length()).sum
    val parts = math.max(1, (sizeBytes / (targetFileMB * 1024L * 1024L)).toInt)
    val files = stage(snapshot.repartition(parts), path, "compact-")
    val v = commitEntry(path, files, rebase = true, Some(v0), maxRetries = 1, commit)
    // the rebase is a remove-all + add-all in Delta terms
    DeltaInterop.mirror(spark, path, v, files, filesUpTo(path, v0),
      snapshot.schema.json, commit)
    v
  }

  /** Delete data dirs referenced ONLY by versions older than
    * `sinceVersion` (post-compaction cleanup; forfeits time travel
    * earlier than that, keeps every snapshot at-or-after it intact). */
  def vacuumCompacted(path: String, sinceVersion: Long): Seq[String] = {
    // the closure of every reachable snapshot >= sinceVersion
    val live = versions(path).filter(_ >= sinceVersion)
      .flatMap(v => filesUpTo(path, v))
      .map(_.split('/').head).toSet
    val root = Paths.get(path)
    val s = Files.list(root)
    val stale = try s.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("data-") &&
        !live(p.getFileName.toString))
      .toSeq
    finally s.close()
    stale.foreach { dir =>
      val files = Files.walk(dir)
      try files.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
      finally files.close()
    }
    stale.map(_.getFileName.toString)
  }

  private def fileList(txt: String): Seq[String] =
    """"(data-[^"]+)"""".r.findAllMatchIn(txt).map(_.group(1)).toSeq

  private def isRebase(txt: String): Boolean = txt.contains(""""rebase":true""")

  private def filesUpTo(path: String, v: Long): Seq[String] = {
    val ckpt = listLog(path, ".checkpoint.json").filter(_ <= v).lastOption
    var acc = ckpt.toSeq.flatMap { c =>
      fileList(Files.readString(logDir(path).resolve(s"$c.checkpoint.json")))
    }
    versions(path)
      .filter(ver => ver <= v && ckpt.forall(ver > _))
      .foreach { ver =>
        val txt = Files.readString(logDir(path).resolve(s"$ver.json"))
        // a rebase entry (compaction) REPLACES the accumulated listing
        if (isRebase(txt)) acc = fileList(txt)
        else acc = acc ++ fileList(txt)
      }
    acc
  }

  /** Roll the cumulative listing into a checkpoint file. Best-effort and
    * idempotent: a failed or racing checkpoint changes nothing for
    * correctness (readers fall back to the incremental entries). */
  private def maybeCheckpoint(path: String, v: Long): Unit =
    if (v > 0 && v % CheckpointInterval == 0) {
      try {
        val entry = filesUpTo(path, v).map(f => "\"" + f + "\"").mkString(
          s"""{"version":$v,"files":[""", ",", "]}")
        val tmp = logDir(path).resolve(s".$v.ckpt.tmp")
        Files.writeString(tmp, entry, StandardOpenOption.CREATE_NEW)
        Files.move(tmp, logDir(path).resolve(s"$v.checkpoint.json"),
          StandardCopyOption.ATOMIC_MOVE)
      } catch { case _: java.io.IOException => () }
    }

  /** Snapshot read of the latest committed version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, versions(path).lastOption.getOrElse(-1L))

  /** Time travel: read the table as of `version`. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = filesUpTo(path, version).map(f => s"$path/$f")
    if (fs.isEmpty) spark.emptyDataFrame
    else spark.read.option("mergeSchema", true).parquet(fs: _*)
  }

  def currentVersion(path: String): Long = versions(path).lastOption.getOrElse(-1L)

  // ---- log introspection for the Delta mirror backfill (DeltaInterop.sync) ----
  private[operators] def allVersions(path: String): Seq[Long] = versions(path)
  private[operators] def versionIsRebase(path: String, v: Long): Boolean =
    isRebase(Files.readString(logDir(path).resolve(s"$v.json")))
  private[operators] def versionFiles(path: String, v: Long): Seq[String] =
    fileList(Files.readString(logDir(path).resolve(s"$v.json")))
  private[operators] def filesAt(path: String, v: Long): Seq[String] = filesUpTo(path, v)

  /** Vacuum: delete staging dirs never published by any commit (the
    * garbage a crash between parquet write and log link leaves behind —
    * appends never unreference a file, so published data is untouchable).
    * `graceMs` protects in-flight commits: only dirs older than it go. */
  def vacuum(path: String, graceMs: Long = 3600 * 1000L): Seq[String] = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return Seq.empty
    // referenced by ANY version (not just the head): pre-compaction dirs
    // stay time-travelable until vacuumCompacted explicitly drops them
    val referenced = versions(path)
      .flatMap(v => filesUpTo(path, v))
      .map(_.split('/').head).toSet // data-<stageId> dir component
    val cutoff = System.currentTimeMillis() - graceMs
    val s = Files.list(root)
    val stray = try s.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("data-"))
      .filter(p => !referenced(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .toSeq
    finally s.close()
    stray.foreach { dir =>
      val files = Files.walk(dir)
      try files.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
      finally files.close()
    }
    stray.map(_.getFileName.toString)
  }
}
