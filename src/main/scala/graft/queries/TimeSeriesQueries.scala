package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.{AsOfJoin, Skew}
import org.apache.spark.sql.functions._

/** Time-series + skew operators beyond the reference's surface: as-of
  * join (oracle: DuckDB's native ASOF JOIN — an independent
  * implementation of the same semantics) and salted aggregation (oracle:
  * the plain GROUP BY it must exactly equal). */
object TimeSeriesQueries extends QueryModule {

  /** Point-in-time join: each purchase matched to the user's latest
    * signup at-or-before the purchase timestamp. */
  private val q72 = QueryDef(
    "q72_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_event"), col("value").as("signup_value"))
      AsOfJoin.asof(purchases, signups, "user_id",
          leftTs = "ts", rightTs = "signup_ts",
          payload = Seq("signup_event", "signup_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("signup_event"), col("signup_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      signups AS (
        SELECT user_id, ts AS signup_ts, event_id AS signup_event, value AS signup_value
        FROM events WHERE event_type = 'signup')
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             s.signup_event, s.signup_value
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.user_id = s.user_id AND p.ts >= s.signup_ts
      ORDER BY p.event_id"""))

  /** Salted two-phase aggregation over a deliberately skewed key (10% of
    * users collapse onto key 0) — must exactly equal the plain GROUP BY. */
  private val q73 = QueryDef(
    "q73_salted_agg",
    (s, d) => {
      val skewed = Tables.events(s, d)
        .withColumn("skew_key",
          when(col("user_id") % 10 === 0, lit(0L)).otherwise(col("user_id")))
      Skew.saltedCountSum(skewed, "skew_key", "value", salt = 16)
        .select(col("skew_key"), col("n"), round(col("total"), 2).as("total"))
        .orderBy(col("skew_key"))
    },
    Some("""
      SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS skew_key,
             count(*) AS n, round(sum(value), 2) AS total
      FROM events
      GROUP BY 1
      ORDER BY skew_key"""))

  override val entries: Seq[QueryDef] = Seq(q72, q73)
}
