package graft.operators

import java.net.URI

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Local disk under a NON-"file" scheme (`graftfs://`): every byte it
  * moves goes through the Hadoop FileSystem API. Code under test that
  * escaped to java.nio would mis-resolve the scheme-qualified string
  * ("graftfs:///tmp/x" is a relative nio path named "graftfs:") and the
  * round-trip assertions would fail — so a green end-to-end cycle on
  * this scheme proves the component is scheme-agnostic. Registered via
  * `fs.graftfs.impl` on the SparkContext hadoopConfiguration. */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** Local disk under `countfs://`, counting every `getFileStatus` and
  * `open` that touches a PARQUET file — the per-data-file metadata
  * calls a log-backed reader must never issue (the commit log records
  * names, sizes, and schema; planning that stats or opens data files
  * is the O(N) object-store storm the log exists to kill). Counters
  * are static: Hadoop caches FileSystem instances per scheme, and
  * local-mode executors share the JVM. */
class CountingFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("countfs:///")
  override def getScheme: String = "countfs"
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    if (f.getName.endsWith(".parquet")) CountingFs.parquetStats.incrementAndGet()
    super.getFileStatus(f)
  }
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.endsWith(".parquet")) CountingFs.parquetOpens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object CountingFs {
  val parquetStats = new java.util.concurrent.atomic.AtomicLong()
  val parquetOpens = new java.util.concurrent.atomic.AtomicLong()
  def reset(): Unit = { parquetStats.set(0); parquetOpens.set(0) }
}

/** Every create throws — drives CommitPoint.ConditionalPut's
  * claim-release path (an upload failure after the arbiter claim). */
class FailingCreateFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("file:///")
  // RawLocalFileSystem routes FileSystem.create(Path, boolean) through
  // the permissionless overload, so both must be intercepted
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("injected create failure")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("injected create failure")
}
