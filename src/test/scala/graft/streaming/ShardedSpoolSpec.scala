package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** ShardedSpool lifecycle: close() is final (no lazy re-open / fd leak
  * after close), and the opt-in fsync path appends correctly. */
class ShardedSpoolSpec extends AnyFunSuite {

  test("append after close fails — including on a shard that never opened") {
    val dir = Files.createTempDirectory("graft-spool-close").toString
    val spool = new ShardedSpool(dir, shards = 4)
    spool.append("stream-a", """{"seq":1}""")
    spool.close()
    // the previously-open shard refuses…
    intercept[IllegalStateException] { spool.append("stream-a", """{"seq":2}""") }
    // …and so does a shard whose channel was never lazily opened (the old
    // code would silently open a brand-new FileChannel here and leak it)
    val keys = (0 until 64).map(i => s"k$i")
    keys.foreach { k =>
      intercept[IllegalStateException] { spool.append(k, "{}") }
    }
    spool.close() // idempotent
    // exactly the pre-close line is on disk
    import scala.jdk.CollectionConverters._
    val lines = Files.list(Paths.get(dir)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines == Seq("""{"seq":1}"""))
  }

  test("fsyncOnAppend: lines land intact and in per-key order") {
    val dir = Files.createTempDirectory("graft-spool-fsync").toString
    val spool = new ShardedSpool(dir, shards = 2, fsyncOnAppend = true)
    (1 to 5).foreach(i => spool.append("s1", s"""{"seq":$i}"""))
    spool.close()
    import scala.jdk.CollectionConverters._
    val lines = Files.list(Paths.get(dir)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines == (1 to 5).map(i => s"""{"seq":$i}"""))
  }
}
