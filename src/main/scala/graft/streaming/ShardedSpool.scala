package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Identity-sharded append spool: all lines for one shard key land in one
  * append-only file in arrival order (the per-stream ordering the
  * reference's per-stream Kafka partition gives), while different keys
  * append in parallel across `shards` files — a single append file
  * serializes every writer through one lock and caps single-node ingress.
  *
  * Each shard keeps its channel open (no per-message open/close
  * syscalls). Durability: when `append` returns the line is in the file's
  * OS page cache — durable against process crash, NOT against power/OS
  * crash. Pass `fsyncOnAppend = true` to force each append to stable
  * storage before it returns (power-crash durable, at syscall cost per
  * message). The consumer ([[StreamingOps.startIngest]]) reads the whole
  * directory, so shard count is invisible downstream.
  *
  * `close()` is final: it drains no queue (appends are synchronous) and
  * any append after close fails with IllegalStateException instead of
  * lazily re-opening a channel that would leak.
  */
final class ShardedSpool(dir: String, shards: Int = 8,
    fsyncOnAppend: Boolean = false) {
  require(shards > 0, "shards must be positive")
  Files.createDirectories(Paths.get(dir))

  private val spoolId = java.util.UUID.randomUUID().toString.take(8)
  private val paths = Array.tabulate(shards)(i =>
    Paths.get(dir, s"ingest-$spoolId-s$i.jsonl"))
  private val channels = new Array[java.nio.channels.FileChannel](shards)
  private val locks = Array.fill(shards)(new Object)
  @volatile private var closed = false

  def append(shardKey: String, line: String): Unit = {
    val i = math.floorMod(shardKey.hashCode, shards)
    locks(i).synchronized {
      if (closed) throw new IllegalStateException("spool is closed")
      if (channels(i) == null)
        channels(i) = java.nio.channels.FileChannel.open(paths(i),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      channels(i).write(java.nio.ByteBuffer.wrap((line + "\n").getBytes(UTF_8)))
      if (fsyncOnAppend) channels(i).force(false)
    }
  }

  def close(): Unit = {
    closed = true // appends racing for a shard lock fail the closed check
    locks.indices.foreach { i =>
      locks(i).synchronized {
        if (channels(i) != null) { channels(i).close(); channels(i) = null }
      }
    }
  }
}
