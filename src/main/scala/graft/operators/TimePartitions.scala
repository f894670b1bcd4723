package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A10 — time-partition derivation (ingester.go:522-548).
  *
  * partition_time_id → folder bucket format (Go reference formats):
  *   1 hourly    "2006-01-02-15"  → yyyy-MM-dd-HH
  *   2 daily     "2006-01-02"     → yyyy-MM-dd
  *   3 weekly    ISOyear-ISOweek  (unpadded week, per strconv.Itoa)
  *   4 monthly   "2006-01"        → yyyy-MM
  *   5 quarterly "2006"-quarter   (we emit "2026-3"; the reference's
  *     `string(quarter)` emits a control rune — a latent bug we fix,
  *     ingester.go:543-544)
  *
  * The reference buckets by *arrival* time (time.Now()). For reproducibility
  * the column is derived from an explicit timestamp column — pass
  * `current_timestamp()` for arrival-time semantics or an event-time column
  * for proper event-time partitioning (a deliberate improvement; gives
  * partition pruning on event-time predicates).
  *
  * ISO year has no direct Spark builtin: the ISO year of ts is the calendar
  * year of the Thursday in ts's ISO week (date_trunc('week') is Monday).
  */
object TimePartitions {

  def isoYear(ts: Column): Column =
    year(date_add(to_date(date_trunc("week", ts)), 3))

  def isoWeek(ts: Column): Column = weekofyear(ts)

  /** Partition bucket string for a partition_time_id. */
  def bucket(ts: Column, partitionTimeId: Int): Column = partitionTimeId match {
    case 1 => date_format(ts, "yyyy-MM-dd-HH")
    case 2 => date_format(ts, "yyyy-MM-dd")
    case 3 => concat_ws("-", isoYear(ts).cast("string"), isoWeek(ts).cast("string"))
    case 4 => date_format(ts, "yyyy-MM")
    case 5 => concat_ws("-", date_format(ts, "yyyy"), quarter(ts).cast("string"))
    case other => throw new IllegalArgumentException(s"unknown partition_time_id $other")
  }

  val Hourly = 1; val Daily = 2; val Weekly = 3; val Monthly = 4; val Quarterly = 5
}
