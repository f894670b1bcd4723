package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's surface: a Spark implementation plus an
  * optional DuckDB-dialect oracle SQL (run by the driver over the same
  * parquet tables). `oracle = None` → driver records a rows-only check
  * (used for ops whose semantics aren't ANSI-SQL-expressible, e.g. LSH).
  *
  * Column names of the Spark result and the oracle MUST match: the driver
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def entries: Seq[QueryDef]
}
