package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The atomic publish primitive behind every [[TxLogTable]] commit — the
  * single operation a backing store must provide for optimistic
  * concurrency to serialize appends: create the log entry iff no entry
  * with that name exists, and make a lost race observable.
  *
  * All variants speak Hadoop's `FileSystem` API, so a table's commit log
  * lives on WHATEVER store backs the table path (`file:`, `hdfs://`,
  * `s3a://`, …) — the reference's own contract (delta_writer.py:88-94
  * writes Delta to whatever store backs the lake). Store mapping (the
  * reference has no ACID at all — delta_writer.py:94 blind-appends — so
  * this is strictly stronger than what it replaces):
  *
  *  - local paths: [[CommitPoint.HardLink]] — CREATE_NEW temp + hard
  *    link; the link is the commit point (atomic, fails on an existing
  *    target, unlike POSIX rename which silently replaces).
  *  - HDFS posture: [[CommitPoint.Fs]] — stage the full entry, then
  *    publish via create-with-overwrite=false / no-replace rename, the
  *    primitive HDFS guarantees atomically at the namenode.
  *  - S3: conditional `PUT` with `If-None-Match: *` (412 Precondition
  *    Failed = lost the race).
  *  - GCS: JSON-API insert with `ifGenerationMatch=0`.
  *  - Azure Blob: `Put Blob` with `If-None-Match: *`.
  *
  * [[CommitPoint.ConditionalPut]] implements that object-store shape with
  * the store's existence check arbitrated in-process (no cloud SDK in this
  * environment); a real S3 impl replaces only the arbitration call with
  * the HTTP conditional write. [[CommitPoint.Auto]] (the default) picks
  * HardLink for local schemes and Fs for everything else.
  */
trait CommitPoint {
  /** Atomically publish `content` as `<logDir>/<name>` on `fs` iff no
    * entry with that name exists. Returns true iff THIS call created the
    * entry. Must never replace an existing entry. */
  def putIfAbsent(fs: FileSystem, logDir: Path, name: String,
      content: String): Boolean
}

object CommitPoint {

  /** Scheme dispatch: local filesystems get the hard-link commit (POSIX
    * atomicity), everything else the Hadoop-FS no-replace publish. */
  object Auto extends CommitPoint {
    def putIfAbsent(fs: FileSystem, logDir: Path, name: String,
        content: String): Boolean =
      (if (fs.getScheme == "file") HardLink else Fs)
        .putIfAbsent(fs, logDir, name, content)
  }

  /** Write-temp + hard link: the link either wins atomically or throws
    * because the version exists — the POSIX equivalent of a conditional
    * put. Local paths only (hard links don't exist in the Hadoop API);
    * [[Auto]] routes non-local schemes to [[Fs]]. */
  object HardLink extends CommitPoint {
    def putIfAbsent(fs: FileSystem, logDir: Path, name: String,
        content: String): Boolean = {
      require(fs.getScheme == "file",
        s"HardLink needs a local path, got scheme ${fs.getScheme}; use CommitPoint.Fs")
      val dir = java.nio.file.Paths.get(logDir.toUri.getPath)
      val tmp = dir.resolve(s".$name-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      java.nio.file.Files.writeString(tmp, content,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      try {
        java.nio.file.Files.createLink(dir.resolve(name), tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.nio.file.FileSystemException =>
          // createLink throws FileSystemException for more than a taken
          // name (EPERM/EOPNOTSUPP on link-less mounts): only an existing
          // target is a lost race — anything else must surface, or the
          // retry loop would wait out its winner-visibility window and
          // re-fail 20 times against a store that can never link (the
          // same exists-recheck [[Fs]] does after a refused rename)
          if (java.nio.file.Files.exists(dir.resolve(name))) false else throw e
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** HDFS-posture commit through the Hadoop FileSystem API: the entry is
    * staged complete (create-with-overwrite=false on a dot-temp — so a
    * concurrent lister never sees a half entry), then renamed to the
    * version name. HDFS rename REFUSES an existing destination, decided
    * atomically at the namenode — that refusal is the conditional. On
    * stores whose rename silently replaces (raw local FS), the preceding
    * existence check narrows but does not close the race; local tables
    * should (and by [[Auto]] do) use [[HardLink]] instead. */
  object Fs extends CommitPoint {
    def putIfAbsent(fs: FileSystem, logDir: Path, name: String,
        content: String): Boolean = {
      val target = new Path(logDir, name)
      if (fs.exists(target)) return false
      val tmp = new Path(logDir,
        s".$name-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, false)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val won =
        try fs.rename(tmp, target)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      if (!won) {
        fs.delete(tmp, false)
        // rename can fail for reasons other than a lost race; only an
        // existing target is a race — anything else must surface, or the
        // retry loop would burn versions against a broken store
        if (!fs.exists(target))
          throw new java.io.IOException(s"commit rename failed: $tmp -> $target")
      }
      won
    }
  }

  /** Object-store commit shape: a conditional-write check decides the
    * winner, then the winner uploads the entry. The check here is an
    * in-process compare-and-set standing in for the store's
    * `If-None-Match: *` / `ifGenerationMatch=0` semantics (no cloud SDK
    * in this environment); everything else — TxLogTable's retry loop,
    * rebase abort, reader visibility — runs unchanged against it, which
    * is what the concurrency spec exercises. The arbiter must be shared
    * by all writers of a table (as the store itself would be). */
  final class ConditionalPut(
      arbiter: java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean] =
        new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
      extends CommitPoint {
    def putIfAbsent(fs: FileSystem, logDir: Path, name: String,
        content: String): Boolean = {
      val key = s"${fs.makeQualified(logDir)}/$name"
      // the conditional write: exactly one caller transitions absent→present
      if (arbiter.putIfAbsent(key, java.lang.Boolean.TRUE) != null) false
      else {
        val target = new Path(logDir, name)
        try {
          // an entry published out-of-band (a different CommitPoint impl
          // writing the same log) means the version is taken: a lost race,
          // and the claim correctly stays — the store has the entry
          if (fs.exists(target)) return false
          // the winner's upload (PUT body): a real S3 PUT is atomic, so the
          // stand-in must be too — stage the body and rename it to the
          // final name, so a concurrent log lister never reads a half entry
          val tmp = new Path(logDir,
            s".$name-${java.util.UUID.randomUUID().toString.take(8)}.put")
          val out = fs.create(tmp, false)
          try out.write(content.getBytes("UTF-8")) finally out.close()
          if (!fs.rename(tmp, target)) {
            fs.delete(tmp, false)
            throw new java.io.IOException(s"upload rename failed: $tmp -> $target")
          }
          true
        } catch {
          case e: Throwable =>
            // a failed upload must not leave the version claimed but never
            // published — that would wedge every retry of this version.
            // Release the claim so a later attempt can win it again.
            arbiter.remove(key)
            throw e
        }
      }
    }
  }
}
