package graft.operators

import java.nio.file.{Files, Path, StandardOpenOption}

/** The atomic publish primitive behind every [[TxLogTable]] commit — the
  * single operation a backing store must provide for optimistic
  * concurrency to serialize appends: create the log entry iff no entry
  * with that name exists, and make a lost race observable.
  *
  * Store mapping (the reference has no ACID at all — delta_writer.py:94
  * blind-appends — so this is strictly stronger than what it replaces):
  *
  *  - local / NFS / HDFS-posture FS: [[CommitPoint.HardLink]] — CREATE_NEW
  *    temp + hard link; the link is the commit point (atomic, fails on an
  *    existing target, unlike POSIX rename which silently replaces).
  *  - S3: conditional `PUT` with `If-None-Match: *` (412 Precondition
  *    Failed = lost the race).
  *  - GCS: JSON-API insert with `ifGenerationMatch=0`.
  *  - Azure Blob: `Put Blob` with `If-None-Match: *`.
  *
  * [[CommitPoint.ConditionalPut]] implements that object-store shape with
  * the store's existence check arbitrated in-process (no cloud SDK in this
  * environment); a real S3 impl replaces only the arbitration call with
  * the HTTP conditional write.
  */
trait CommitPoint {
  /** Atomically publish `content` as `<logDir>/<name>` iff no entry with
    * that name exists. Returns true iff THIS call created the entry.
    * Must never replace an existing entry. */
  def putIfAbsent(logDir: Path, name: String, content: String): Boolean
}

object CommitPoint {

  /** Write-temp + hard link: the link either wins atomically or throws
    * because the version exists — the POSIX equivalent of a conditional
    * put. Default for local/HDFS-like table paths. */
  object HardLink extends CommitPoint {
    def putIfAbsent(logDir: Path, name: String, content: String): Boolean = {
      val tmp = logDir.resolve(s".$name-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      Files.writeString(tmp, content, StandardOpenOption.CREATE_NEW)
      try {
        Files.createLink(logDir.resolve(name), tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException => false
      } finally Files.deleteIfExists(tmp)
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
    def putIfAbsent(logDir: Path, name: String, content: String): Boolean = {
      val key = s"${logDir.toAbsolutePath}/$name"
      // the conditional write: exactly one caller transitions absent→present
      if (arbiter.putIfAbsent(key, java.lang.Boolean.TRUE) != null) false
      else {
        val target = logDir.resolve(name)
        try {
          // an entry published out-of-band (a different CommitPoint impl
          // writing the same log) means the version is taken: a lost race,
          // and the claim correctly stays — the store has the entry
          if (Files.exists(target)) return false
          // the winner's upload (PUT body): a real S3 PUT is atomic, so the
          // stand-in must be too — stage the body and ATOMIC_MOVE it to the
          // final name, so a concurrent log lister never reads a half entry
          val tmp = logDir.resolve(
            s".$name-${java.util.UUID.randomUUID().toString.take(8)}.put")
          try {
            Files.writeString(tmp, content, StandardOpenOption.CREATE_NEW)
            Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          } finally Files.deleteIfExists(tmp)
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
