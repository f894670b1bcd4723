package graft.operators

import graft.SparkSpec
import java.nio.file.Files

class ConfigServiceSpec extends SparkSpec {

  private def svc = new ConfigService(Files.createTempDirectory("graft-cfg").toString)

  private val base = StreamConfig("", "alt-x", active = true, "t", 1, "f",
    2, 1, Seq("ingester"))

  test("A25: create assigns a UUID and persists one file per stream") {
    val s = svc
    val created = s.create(base)
    assert(created.streamId.matches("[0-9a-f-]{36}"))
    val all = s.getAll(spark)
    assert(all.map(_.streamId) == Seq(created.streamId))
    assert(all.head.streamAltId == "alt-x")
    assert(all.head.functions == Seq("ingester"))
  }

  test("A25: update / activate / deactivate / delete round-trip") {
    val s = svc
    val c = s.create(base)
    s.update(c.copy(messageType = "t2"))
    assert(s.get(spark, c.streamId).get.messageType == "t2")
    s.setActive(spark, c.streamId, active = false)
    assert(s.getAllActive(spark).isEmpty)
    s.setActive(spark, c.streamId, active = true)
    assert(s.getAllActive(spark).map(_.streamId) == Seq(c.streamId))
    assert(s.delete(c.streamId))
    assert(s.getAll(spark).isEmpty)
  }

  test("A25: validation mirrors validateStream (ids in range)") {
    intercept[IllegalArgumentException](svc.create(base.copy(fileStoreTypeId = 9)))
    intercept[IllegalArgumentException](svc.create(base.copy(partitionTimeId = 0)))
    intercept[IllegalArgumentException](svc.create(base.copy(compressionTypeId = 4)))
  }
}
