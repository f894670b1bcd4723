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
