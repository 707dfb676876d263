package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2.2 — projections / filters / predicates (P1–P10).
  *
  * Each query is a declarative DataFrame plan so Catalyst pushes the
  * predicate and the column projection into the parquet scan (visible as
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`) — at 100 TB the
  * scan, not the filter operator, is what must shrink.
  */
object FilterQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // P1 — JSON path projection + cast-at-extraction (schema-on-read analog
    // of `payload:homeTeam.id::INT`, stg_games.sql:11-30). from_json once,
    // then typed field access; missing keys → null, same as Snowflake `:`.
    "p1_json_path" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("j.k").as("k_val"))
        .filter(col("j.k").isNotNull)
    },

    // P1b — Spark 4 VariantType path: parse_json once, typed variant_get
    // (SURVEY §1.2's alternative to from_json for pass-through payloads
    // when the contract isn't pinned).
    "p11_variant_path" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_val"))
        .filter(col("k_val").isNotNull)
    },

    // P2 — equality filter on a status column (gameState='OFF' analog,
    // fact_game_results.sql:83).
    "p2_filter_eq" -> { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    },

    // P3 — IN-list filter (typeDescKey IN (...), fact_shot_events.sql:80-84).
    "p3_filter_in" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    },

    // P4 — numeric constant filter (game_type = 2, fact_shot_events.sql:178).
    "p4_filter_numeric" -> { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size") <= 10)
        .select("p_partkey", "p_name", "p_size")
    },

    // P5 — null-guard + range predicate (playerId IS NOT NULL,
    // stg_player_game_stats.sql:78).
    "p5_null_guard" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("value").isNotNull && col("value") > 400)
        .select("event_id", "user_id", "value")
    },

    // P6 — NOT IN anti-filter as a null-safe left_anti join
    // (stg_player_name_crosswalk.sql:91,108-109; SURVEY §7.4.6).
    "p6_not_in_anti" -> { (s, dir) =>
      val openCust = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
        .distinct()
      Tables.customer(s, dir)
        .join(openCust, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // P7 — boolean OR/AND combination filter (bruins_shot_events.sql:10-12).
    "p7_bool_combo" -> { (s, dir) =>
      Tables.orders(s, dir)
        .filter((col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH")
          && col("o_totalprice") > 300000)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    },

    // P8 — single-market filter (market='player_shots_on_goal',
    // fact_player_sog_props_v2.sql:46).
    "p8_type_filter" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "event_type", "value")
    },

    // P9 — date-window filter (DATEADD(day,-180,...) analog with an injected
    // anchor instead of wall-clock, SURVEY §7.4.5).
    "p9_date_window" -> { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
    },

    // P10 — tuple-IN latest-row filter ((team_id, MAX(game_date)) IN ...,
    // team_shot_example_queries.sql:98-103) via join against a groupBy-max.
    "p10_latest_tuple" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val latest = o.groupBy("o_custkey").agg(max("o_orderdate").as("o_orderdate"))
      o.join(latest, Seq("o_custkey", "o_orderdate"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"))
    }
  )

  val oracles: Map[String, String] = Map(
    "p1_json_path" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k_val
        |FROM events WHERE json_extract_string(props,'$.k') IS NOT NULL""".stripMargin,
    "p11_variant_path" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS INTEGER) AS k_val
        |FROM events WHERE json_extract_string(props,'$.k') IS NOT NULL""".stripMargin,
    "p2_filter_eq" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'",
    "p3_filter_in" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag IN ('A','R')",
    "p4_filter_numeric" ->
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size <= 10",
    "p5_null_guard" ->
      "SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL AND value > 400",
    "p6_not_in_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin,
    "p7_bool_combo" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') AND o_totalprice > 300000""".stripMargin,
    "p8_type_filter" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'",
    "p9_date_window" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-06-01' AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "p10_latest_tuple" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice FROM orders o
        |WHERE o_orderdate = (SELECT max(x.o_orderdate) FROM orders x
        |                     WHERE x.o_custkey = o.o_custkey)""".stripMargin
  )
}
