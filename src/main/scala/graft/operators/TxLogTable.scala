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
  *    (write-temp + ATOMIC_MOVE rename = the commit point)
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

  /** Append a batch as one atomic commit; returns the committed version. */
  def append(spark: SparkSession, df: DataFrame, path: String,
      maxRetries: Int = 20): Long = {
    Files.createDirectories(logDir(path))
    // stage data files under a unique subdir (never visible to readers
    // until the log names them)
    val stageId = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$path/data-$stageId"
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    val files = new java.io.File(dataDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => s"data-$stageId/${f.getName}")
      .sorted

    var attempt = 0
    while (attempt < maxRetries) {
      val v = versions(path).lastOption.getOrElse(-1L) + 1
      val entry = files.map(f => "\"" + f + "\"").mkString(
        s"""{"version":$v,"files":[""", ",", "]}")
      val tmp = logDir(path).resolve(s".$v-$stageId.tmp")
      Files.writeString(tmp, entry, StandardOpenOption.CREATE_NEW)
      try {
        // the commit point: hard-link is atomic AND fails if the version
        // exists (POSIX rename would silently replace a racing commit)
        Files.createLink(logDir(path).resolve(s"$v.json"), tmp)
        Files.deleteIfExists(tmp)
        maybeCheckpoint(path, v)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException =>
          Files.deleteIfExists(tmp)
          attempt += 1 // lost the race; retry at the next version
      }
    }
    throw new IllegalStateException(s"could not commit to $path after $maxRetries attempts")
  }

  private def fileList(txt: String): Seq[String] =
    """"(data-[^"]+)"""".r.findAllMatchIn(txt).map(_.group(1)).toSeq

  private def filesUpTo(path: String, v: Long): Seq[String] = {
    val ckpt = listLog(path, ".checkpoint.json").filter(_ <= v).lastOption
    val base = ckpt.toSeq.flatMap { c =>
      fileList(Files.readString(logDir(path).resolve(s"$c.checkpoint.json")))
    }
    val incremental = versions(path)
      .filter(ver => ver <= v && ckpt.forall(ver > _))
      .flatMap(ver => fileList(Files.readString(logDir(path).resolve(s"$ver.json"))))
    base ++ incremental
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

  /** Vacuum: delete staging dirs never published by any commit (the
    * garbage a crash between parquet write and log link leaves behind —
    * appends never unreference a file, so published data is untouchable).
    * `graceMs` protects in-flight commits: only dirs older than it go. */
  def vacuum(path: String, graceMs: Long = 3600 * 1000L): Seq[String] = {
    val root = Paths.get(path)
    if (!Files.exists(root)) return Seq.empty
    val referenced = filesUpTo(path, currentVersion(path))
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
