package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .collect().toSeq

  test("round-trip: parquet / orc / json / csv preserve rows and values") {
    val src = Tables.lineitem(spark, sf).filter(col("l_orderkey") <= 50)
    val expected = canon(src)
    Formats.supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-fmt-$fmt").toString + "/t"
      Formats.write(src, dir, fmt)
      val back = Formats.read(spark, dir, fmt,
        // csv/json lose exact types without a schema; supply the source's
        schema = if (fmt == "csv" || fmt == "json") Some(src.schema) else None)
      assert(canon(back) == expected, s"format $fmt mismatch")
    }
  }

  test("orc writes are columnar-compressed and predicate-pushdown capable") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    Formats.write(Tables.lineitem(spark, sf), dir, "orc")
    val df = Formats.read(spark, dir, "orc").filter(col("l_orderkey") === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"), plan.take(1200))
    assert(df.count() > 0)
  }
}
