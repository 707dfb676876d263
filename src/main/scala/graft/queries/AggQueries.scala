package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import QueryPack._

/** SURVEY.md §2.5 — aggregations (A1–A10).
  *
  * All groupBys here hash-aggregate with map-side partial aggregation
  * (Spark's default two-phase HashAggregate), so the shuffle carries one row
  * per (partition, group), not per input row — the property that keeps these
  * plans viable at 100 TB. Money sums use the cents trick (see QueryPack)
  * for cross-engine bit-exactness.
  */
object AggQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // A1 — additive hash group-by (team totals, fact_team_game_stats.sql:34-51).
    "a1_sum_groupby" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"), // quantities are integral doubles: exact
          centsSum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
    },

    // A2 — AVG/SUM/COUNT + min/max derived stats (player_shot_metrics.sql:114-170).
    "a2_avg_derived" -> { (s, dir) =>
      Tables.supplier(s, dir)
        .groupBy("s_nationkey")
        .agg(
          count(lit(1)).as("n"),
          centsAvg(col("s_acctbal")).as("avg_bal"),
          min("s_acctbal").as("min_bal"),
          max("s_acctbal").as("max_bal"))
    },

    // A3 — conditional aggregation SUM(CASE WHEN ...) (rpt_sog_props_performance.sql:26-118).
    "a3_conditional_agg" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          (sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L)) / 100.0).as("purchase_value"))
    },

    // A4 — pivot via MAX(CASE) → Over/Under columns (fact_player_sog_props_v2.sql:57-72).
    "a4_pivot_maxcase" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("purchase", "click"))
        .agg(max("value"))
    },

    // A5 — DISTINCT set projection (dim_team.sql:13-29).
    "a5_distinct" -> { (s, dir) =>
      Tables.orders(s, dir).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // A6 — COUNT(DISTINCT) — exact, as the reference's validators use
    // (query/validate_bronze.py:65-96). At 100 TB scale the approx_count_distinct
    // variant is the right default; exact is what the oracle checks.
    "a6_count_distinct" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
    },

    // A7 — GROUP BY + HAVING min-sample gate (HAVING COUNT(*) >= 5,
    // rpt_sog_props_performance.sql:73).
    "a7_having" -> { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 250)
    },

    // A9 — group-by over computed bins (heatmap cells, player_shot_locations.sql:37-80).
    "a9_binned_groupby" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_bin", (floor(col("value") / 50) * 50).cast("int"))
        .groupBy("event_type", "value_bin")
        .agg(count(lit(1)).as("n"), centsSum(col("value")).as("sum_value"))
    },

    // ROLLUP (beyond the reference — SURVEY notes grouping sets absent;
    // a complete engine has them): subtotals per (status, priority),
    // per status, and grand total.
    "a11_rollup" -> { (s, dir) =>
      Tables.orders(s, dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), centsSum(col("o_totalprice")).as("total"))
    },

    // CUBE (beyond the reference): all grouping-set combinations.
    "a12_cube" -> { (s, dir) =>
      Tables.events(s, dir)
        .cube(col("event_type"), pmod(col("user_id"), lit(10)).as("user_mod"))
        .agg(count(lit(1)).as("n"))
    },

    // Percentiles (beyond the reference): exact interpolated median/p90 —
    // both engines sort the same exact 2-decimal doubles and interpolate
    // with the same IEEE arithmetic.
    "a13_percentile" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"))
    },

    // A10 — programmatic per-column null-drift aggregate
    // (time_travel_validator.py:129-149): one SUM(CASE WHEN col IS NULL) per column.
    "a10_null_drift" -> { (s, dir) =>
      val df = Tables.events(s, dir)
      df.agg(
        count(lit(1)).as("n_rows"),
        df.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls")): _*)
    },

    // Distributed OLS via exact sufficient statistics (beyond the
    // reference): per event_type, the five integer sums (n, Σx, Σy, Σxy,
    // Σx²) from which slope/intercept/R² are a driver-side 2×2 solve —
    // the 100 TB formulation of regression: the data pays ONE map-side-
    // combined hash agg and only k rows leave the cluster, and because x
    // is hours (exact BIGINT) and y is cents (exact BIGINT), the sums are
    // associative integers — no float summation order to diverge on.
    // x is ANCHORED (hours since 2020-01-01, a fixed constant both
    // engines share) rather than absolute epoch hours: slope/intercept
    // shift trivially, but Σx² headroom goes from overflowing BIGINT at
    // ~4·10⁷ rows per group (epoch hours ≈ 4.7·10⁵, x² ≈ 2.2·10¹¹) to
    // safe past 10¹¹ rows — the scale the comment above claims.
    "a14_ols_suffstats" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000 - 438288").as("x"),
          round(col("value") * 100, 0).cast("long").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sum_x"),
          sum(col("y")).as("sum_y"),
          sum(col("x") * col("y")).as("sum_xy"),
          sum(col("x") * col("x")).as("sum_x2"))
    },

    // Join-key skew audit (beyond the reference): per candidate shuffle
    // key of the fact table, the distribution facts that decide salting /
    // AQE skew handling BEFORE a 100 TB join is planned — row count,
    // distinct keys, the hottest key's mass, and its corpus share in
    // exact ppm. Two-level aggregation per key (per-key counts, then a
    // 4-long-column rollup), all integers; the per-column results union
    // into one audit table.
    "a15_skew_audit" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      def audit(keyCol: String) =
        li.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("kn"))
          .agg(sum(col("kn")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("kn")).as("max_key_n"))
          .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_key_n"),
            expr("(max_key_n * 1000000L) div n_rows").as("top_share_ppm"))
      audit("l_orderkey")
        .unionByName(audit("l_partkey"))
        .unionByName(audit("l_suppkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "a1_sum_groupby" ->
      s"""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
         |${centsSumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n
         |FROM lineitem GROUP BY 1,2""".stripMargin,
    "a2_avg_derived" ->
      s"""SELECT s_nationkey, COUNT(*) AS n, ${centsAvgSql("s_acctbal")} AS avg_bal,
         |MIN(s_acctbal) AS min_bal, MAX(s_acctbal) AS max_bal
         |FROM supplier GROUP BY 1""".stripMargin,
    "a3_conditional_agg" ->
      """SELECT user_id,
        |CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END)/100.0 AS purchase_value
        |FROM events GROUP BY 1""".stripMargin,
    "a4_pivot_maxcase" ->
      """SELECT user_id,
        |MAX(CASE WHEN event_type='purchase' THEN value END) AS purchase,
        |MAX(CASE WHEN event_type='click' THEN value END) AS click
        |FROM events GROUP BY 1""".stripMargin,
    "a5_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "a6_count_distinct" ->
      "SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n FROM events GROUP BY 1",
    "a7_having" ->
      "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1 HAVING COUNT(*) >= 250",
    "a13_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_price,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "a11_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |${centsSumSql("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "a12_cube" ->
      """SELECT event_type, user_id % 10 AS user_mod, COUNT(*) AS n
        |FROM events GROUP BY CUBE (event_type, user_id % 10)""".stripMargin,
    "a9_binned_groupby" ->
      s"""SELECT event_type, CAST(floor(value/50)*50 AS INTEGER) AS value_bin,
         |COUNT(*) AS n, ${centsSumSql("value")} AS sum_value
         |FROM events GROUP BY 1,2""".stripMargin,
    "a10_null_drift" ->
      """SELECT COUNT(*) AS n_rows,
        |CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
        |CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_nulls,
        |CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
        |CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
        |CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
        |CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls
        |FROM events""".stripMargin,
    // mirrors a14: x = event-time hours since the 2020-01-01 anchor
    // (BIGINT floor), y = exact cents; epoch_us // is DuckDB's integer
    // floor-div twin of Spark's `div`
    "a14_ols_suffstats" ->
      """WITH e AS (SELECT event_type,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 - 438288 AS x,
        |        CAST(round(value * 100, 0) AS BIGINT) AS y
        |      FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(x) AS BIGINT) AS sum_x,
        |       CAST(sum(y) AS BIGINT) AS sum_y,
        |       CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |       CAST(sum(x * x) AS BIGINT) AS sum_x2
        |FROM e GROUP BY 1""".stripMargin,
    "a15_skew_audit" ->
      """WITH k1 AS (SELECT l_orderkey AS k, count(*) AS kn FROM lineitem GROUP BY 1),
        |k2 AS (SELECT l_partkey AS k, count(*) AS kn FROM lineitem GROUP BY 1),
        |k3 AS (SELECT l_suppkey AS k, count(*) AS kn FROM lineitem GROUP BY 1),
        |a AS (
        |  SELECT 'l_orderkey' AS key_col, CAST(sum(kn) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(kn) AS BIGINT) AS max_key_n FROM k1
        |  UNION ALL
        |  SELECT 'l_partkey', CAST(sum(kn) AS BIGINT), CAST(count(*) AS BIGINT),
        |         CAST(max(kn) AS BIGINT) FROM k2
        |  UNION ALL
        |  SELECT 'l_suppkey', CAST(sum(kn) AS BIGINT), CAST(count(*) AS BIGINT),
        |         CAST(max(kn) AS BIGINT) FROM k3)
        |SELECT key_col, n_rows, n_keys, max_key_n,
        |       (max_key_n * 1000000) // n_rows AS top_share_ppm
        |FROM a""".stripMargin
  )
}
