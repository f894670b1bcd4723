package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimePartitionsSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(ts: String, id: Int): String =
    Seq(ts).toDF("s").select(TimePartitions.bucket(to_timestamp(col("s")), id).as("b"))
      .as[String].head()

  test("A10: hourly / daily / monthly / quarterly formats") {
    assert(bucketOf("2026-08-12 14:30:00", TimePartitions.Hourly) == "2026-08-12-14")
    assert(bucketOf("2026-08-12 14:30:00", TimePartitions.Daily) == "2026-08-12")
    assert(bucketOf("2026-08-12 14:30:00", TimePartitions.Monthly) == "2026-08")
    assert(bucketOf("2026-08-12 14:30:00", TimePartitions.Quarterly) == "2026-3")
    assert(bucketOf("2026-01-15 00:00:00", TimePartitions.Quarterly) == "2026-1")
  }

  test("A10: ISO week uses ISO year at year boundaries (Go ISOWeek parity)") {
    // 2024-12-30 is a Monday of ISO week 1 of 2025 (Go: 2025, 1)
    assert(bucketOf("2024-12-30 10:00:00", TimePartitions.Weekly) == "2025-1")
    // 2027-01-01 is a Friday of ISO week 53 of 2026
    assert(bucketOf("2027-01-01 10:00:00", TimePartitions.Weekly) == "2026-53")
    // mid-year sanity
    assert(bucketOf("2026-08-12 10:00:00", TimePartitions.Weekly) == "2026-33")
  }

  test("A10: unknown id throws") {
    intercept[IllegalArgumentException] {
      TimePartitions.bucket(current_timestamp(), 9)
    }
  }
}
