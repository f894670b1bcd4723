package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining §2.B collection/JSON surface: collect_list / collect_set
  * (sorted for cross-engine determinism — collection order inside a group
  * is undefined in any distributed engine), flatten, to_json round-trip,
  * from_json with explicit schema. */
object CollectionQueries extends QueryModule {

  private val q39 = QueryDef(
    "q39_collect_flatten_json",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") <= 100)
      li.groupBy(col("l_orderkey"))
        .agg(
          concat_ws(",", array_sort(collect_list(col("l_quantity")))).as("qtys"),
          concat_ws(",", array_sort(collect_set(col("l_returnflag")))).as("flags"),
          concat_ws(",", array_sort(flatten(collect_list(
            array(col("l_quantity"), col("l_tax")))))).as("flat_vals"),
          count(lit(1)).as("n"))
        .withColumn("as_json",
          to_json(struct(col("l_orderkey"), col("flags"), col("n"))))
        .withColumn("k_back",
          from_json(col("as_json"), StructType(Seq(
            StructField("l_orderkey", LongType),
            StructField("flags", StringType),
            StructField("n", LongType)))).getField("n"))
        .orderBy(col("l_orderkey"))
    },
    Some("""
      SELECT l_orderkey,
             array_to_string(list_sort(list(l_quantity)), ',') AS qtys,
             array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
             array_to_string(list_sort(flatten(list([l_quantity, l_tax]))), ',') AS flat_vals,
             count(*) AS n,
             to_json(struct_pack(
               l_orderkey := l_orderkey,
               flags := array_to_string(list_sort(list(DISTINCT l_returnflag)), ','),
               n := count(*))) AS as_json,
             count(*) AS k_back
      FROM lineitem
      WHERE l_orderkey <= 100
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""))

  /** Typed Aggregator (UDAF): discount-weighted mean price per flag —
    * custom mergeable-buffer aggregate, partial-aggregated map-side like
    * any built-in. */
  private val q71 = QueryDef(
    "q71_weighted_mean_udaf",
    (s, d) => {
      val wmean = udaf(graft.functions.WeightedMean)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(Rnd.halfUp(wmean(col("l_extendedprice"), col("l_discount")), 2).as("wavg_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             floor((sum(l_extendedprice * l_discount) / sum(l_discount)) * 100.0 + 0.5) / 100.0
               AS wavg_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Pivot (wide aggregation): order counts + totals per priority,
    * pivoted on status. Oracle uses FILTER-based manual pivot. */
  private val q77 = QueryDef(
    "q77_pivot",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS n_f,
             count(*) FILTER (o_orderstatus = 'O') AS n_o,
             count(*) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Edit-distance near-dup pairs (levenshtein ≤ 3) within brand buckets —
    * the string-similarity tier of dedup. The join key is
    * (brand, length-band): lev ≤ 3 implies length diff ≤ 3, so width-4
    * bands replicated to {band, band+1} cover every true pair — an EXACT
    * (lossless) sub-bucketing that bounds per-bucket pair counts at scale
    * instead of going quadratic in brand size. Oracle stays the plain
    * exact join, since the candidate set is a provable superset. */
  private val q78 = QueryDef(
    "q78_levenshtein_pairs",
    (s, d) => {
      val p = Tables.part(s, d).filter(col("p_partkey") <= 2000)
        .withColumn("band", floor(length(col("p_name")) / 4).cast("long"))
        .withColumn("bkey", explode(array(col("band"), col("band") + 1)))
      val a = p.select(col("p_brand"), col("bkey"), col("p_partkey").as("id_a"), col("p_name").as("n_a"))
      val b = p.select(col("p_brand"), col("bkey"), col("p_partkey").as("id_b"), col("p_name").as("n_b"))
      a.join(b, Seq("p_brand", "bkey")).filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b") // adjacent-band pairs share two keys
        .withColumn("lev", levenshtein(col("n_a"), col("n_b")))
        .filter(col("lev") <= 3 && col("lev") > 0)
        .select(col("p_brand"), col("id_a"), col("id_b"), col("lev"))
        .orderBy(col("p_brand"), col("id_a"), col("id_b"))
    },
    Some("""
      SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
             levenshtein(a.p_name, b.p_name) AS lev
      FROM (SELECT * FROM part WHERE p_partkey <= 2000) a
      JOIN (SELECT * FROM part WHERE p_partkey <= 2000) b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
      ORDER BY a.p_brand, id_a, id_b"""))

  override val entries: Seq[QueryDef] = Seq(q39, q71, q77, q78)
}
