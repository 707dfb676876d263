package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Skew

/** SURVEY.md §2.7 sorts/limits/top-k (O-ops) and §2.8 set operations (U-ops).
  *
  * ORDER BY + LIMIT compiles to TakeOrderedAndProject — each task keeps only
  * its local top-k and the driver merges k·p rows, so a global top-k never
  * global-sorts 100 TB. Every ordering has a unique tiebreaker: the driver
  * compares result SETS, but a LIMIT without a total order is
  * nondeterministic in WHICH rows survive.
  */
object SortSetQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // O1 — global top-1 (latest snapshot pick, bruins_next_opponent.sql:14-17).
    "o1_top1" -> { (s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(1)
        .select("event_id", "value")
    },

    // O3/O4 — top-k by metric (odds_matching_queries.sql:117-131).
    "o4_topk" -> { (s, dir) =>
      Tables.customer(s, dir)
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // O3 — plain LIMIT-N capping with a total order (analysis queries,
    // odds_matching_queries.sql:29-176).
    "o3_limit" -> { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    },

    // O5 — order-preserving dedup then cap (first event per user, earliest 30
    // users; gamecenter_selection.py:51-72).
    "o5_capped_dedup" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .orderBy(col("ts").asc, col("event_id").asc)
        .limit(30)
        .select("user_id", "event_id")
    },

    // Skew-safe grouped top-k (beyond the reference): top-3 events by value
    // per event_type. Only 5 groups × ~20k rows each at sf0.1 — exactly the
    // hot-group shape where the single-window form serializes each group
    // onto one task; ops.Skew.saltedTopK ranks within (group, salt) first
    // so the final per-group task sees <= salt*k rows (ScaleOpsSpec pins
    // equivalence to the single-window form and the bounded phase-2 input).
    "o6_grouped_topk" -> { (s, dir) =>
      Skew.saltedTopK(
        Tables.events(s, dir).select("event_type", "event_id", "value"),
        groupCols = Seq("event_type"),
        order = Seq(col("value").desc, col("event_id").asc),
        tieCol = "event_id", k = 3, salt = 8)
        .select("event_type", "rank", "event_id", "value")
    },

    // U1 — UNION ALL bag union of two differently-sourced branches
    // (fact_team_game_stats.sql:56-110 home+away rows).
    "u1_union_all" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select(lit("customer").as("kind"), col("c_custkey").as("entity_key"),
          col("c_acctbal").as("balance"))
      val su = Tables.supplier(s, dir)
        .select(lit("supplier").as("kind"), col("s_suppkey").as("entity_key"),
          col("s_acctbal").as("balance"))
      c.unionByName(su)
    },

    // U2 — deduplicating UNION (dim_team.sql:21).
    "u2_union_distinct" -> { (s, dir) =>
      Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    // U3 — set difference (EXCEPT; the reference's NOT IN anti-pattern,
    // stg_player_name_crosswalk.sql:91).
    "u3_except" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    },

    // INTERSECT (beyond the reference — completes the set-op family).
    "u4_intersect" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "error").select(col("user_id")))
    },

    // EXCEPT ALL — bag difference with multiplicity (each F-status
    // occurrence cancels ONE occurrence of the key, not all): a customer
    // with 3 orders of which 1 is F keeps 2 rows. The multiset semantics
    // u3's set EXCEPT flattens.
    "u5_except_all" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.select(col("o_custkey"))
        .exceptAll(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    },

    // INTERSECT ALL — bag intersection (min of multiplicities per key).
    "u6_intersect_all" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersectAll(ev.filter(col("event_type") === "error").select(col("user_id")))
    }
  )

  val oracles: Map[String, String] = Map(
    "o1_top1" ->
      "SELECT event_id, value FROM events ORDER BY value DESC, event_id ASC LIMIT 1",
    "o4_topk" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""".stripMargin,
    "o3_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "o5_capped_dedup" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id, ts, row_number() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC LIMIT 30""".stripMargin,
    "o6_grouped_topk" ->
      """SELECT event_type, rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events) WHERE rank <= 3""".stripMargin,
    "u1_union_all" ->
      """SELECT 'customer' AS kind, c_custkey AS entity_key, c_acctbal AS balance FROM customer
        |UNION ALL
        |SELECT 'supplier' AS kind, s_suppkey AS entity_key, s_acctbal AS balance FROM supplier""".stripMargin,
    "u2_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "u3_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "u4_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin,
    "u5_except_all" ->
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "u6_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin
  )
}
