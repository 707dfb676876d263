package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{AsOf, IntervalJoin}
import QueryPack._

/** SURVEY.md §2.4 — joins (J1–J10 + semi).
  *
  * Strategy notes for scale: dimension sides get explicit `broadcast()`
  * hints (J1/J3/J8) so no shuffle of the fact side ever happens for
  * enrichment; fact-fact joins shuffle on their equi keys and rely on AQE
  * for skew splitting; the as-of join (J7) is the union+window form that
  * avoids candidate-pair fanout entirely (see graft.ops.AsOf).
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // J1 — dim enrichment: left equi join, broadcast the small side
    // (fact_player_game_stats.sql:139-140).
    "j1_broadcast_dim" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"), "left")
        .select("l_orderkey", "l_linenumber", "p_brand", "p_type")
    },

    // J2 — multi-key left join (fact_team_game_stats.sql:158).
    "j2_multikey_left" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val agg = li.groupBy("l_orderkey", "l_partkey").agg(sum("l_quantity").as("tot_qty"))
      li.join(agg, Seq("l_orderkey", "l_partkey"), "left")
        .select("l_orderkey", "l_partkey", "l_linenumber", "tot_qty")
    },

    // J3 — 4-way inner equi chain (fact_player_sog_props_v2.sql:82-86).
    "j3_4way_chain" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .select("l_orderkey", "l_linenumber", "c_name", "n_name")
    },

    // J4 — generated date spine LEFT JOIN daily counts (dim_date.sql:112-113).
    "j4_spine_left" -> { (s, dir) =>
      val spine = s.range(1).select(explode(sequence(
        to_date(lit("1995-01-01")), to_date(lit("1998-12-31")),
        expr("interval 1 day"))).as("d"))
      val perDay = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("od"))
        .agg(count(lit(1)).as("n"))
      spine.join(perDay, col("d") === col("od"), "left")
        .select(col("d"), coalesce(col("n"), lit(0L)).as("n_orders"))
    },

    // J5 — expression-key equi join on precomputed normalized keys
    // (stg_player_name_crosswalk.sql:76,89-90): normalize THEN equi-join so
    // Catalyst can hash-partition on the derived key.
    "j5_exprkey_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val a = c.select(col("c_custkey"), upper(trim(col("c_name"))).as("k"))
      val b = c.select(col("c_custkey").as("matched_custkey"), upper(trim(col("c_name"))).as("k"))
      a.join(b, "k").select("c_custkey", "matched_custkey")
    },

    // J6 — theta join: equi key + non-equi OR residual evaluated post-probe
    // (fact_player_sog_props.sql:121-127).
    "j6_theta_residual" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            (col("o_orderstatus") === "F" || col("l_extendedprice") > col("o_totalprice") * 0.5))
        .select("l_orderkey", "l_linenumber", "o_orderstatus")
    },

    // J7 — as-of join: each event gets the latest signup of the same user at
    // or before its timestamp (the reference's rank-over-candidates pick,
    // fact_player_sog_props_v2.sql:115-144, in the scale-safe form).
    "j7_asof" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("signup_event_id"))
      AsOf.asOfJoin(
        left = ev.select("event_id", "user_id", "ts"),
        right = signups,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("signup_event_id"))
        .select("event_id", "user_id", "signup_event_id")
    },

    // J8 — 1-row cross join to attach scalar context (dim_player.sql:79).
    "j8_cross_scalar" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val per = li.groupBy("l_returnflag").agg(centsAvg(col("l_extendedprice")).as("avg_price"))
      val glob = li.agg(centsAvg(col("l_extendedprice")).as("global_avg"))
      per.crossJoin(broadcast(glob))
        .select(col("l_returnflag"), col("avg_price"), col("global_avg"),
          (col("avg_price") / col("global_avg")).as("ratio"))
    },

    // J9 — anti join (NOT IN set difference, stg_player_name_crosswalk.sql:91).
    "j9_anti" -> { (s, dir) =>
      val heavy = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("p_partkey")).distinct()
      Tables.part(s, dir).join(heavy, Seq("p_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    },

    // J10 — join of two derivations of the same table
    // (player_shot_metrics.sql:71-81).
    "j10_self_derived" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase").select("event_id", "user_id")
      val counts = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      purchases.join(counts, Seq("user_id"))
        .select("user_id", "event_id", "n_events")
    },

    // Semi join — EXISTS (not in the reference's surface but part of a
    // complete join family; Spark left_semi never duplicates the left side).
    "j11_semi" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      Tables.customer(s, dir).join(urgent, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // Interval join (beyond the reference — SURVEY §2.4 lists range/interval
    // joins as absent; a 100 TB event pipeline needs them): shipments inside
    // a sampled set of 7-day order windows. The range-only predicate would
    // plan as a nested loop; graft.ops.IntervalJoin buckets it into an
    // equi-join + residual (see its scaladoc). IntervalJoinSpec pins
    // naive-equality and the no-nested-loop plan property.
    "j12_interval_bucket" -> { (s, dir) =>
      val pts = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      val ivs = Tables.orders(s, dir)
        .filter(col("o_custkey") % 1000 === 0)
        .select(col("o_orderkey").as("iv_key"), col("o_orderdate").as("iv_start"),
          (col("o_orderdate") + expr("INTERVAL 6 DAYS")).as("iv_end"))
      IntervalJoin.pointInInterval(pts, "l_shipdate", ivs, "iv_start", "iv_end",
          bucketDays = 7)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "iv_key", "iv_start")
    },

    // Bloom-prefiltered semi join (runtime row-level filtering as an
    // operator): build side -> one broadcast bloom sketch pruning the
    // probe scan, exact semi join after. Output == the plain semi join.
    "j13_bloom_semi" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      graft.ops.RuntimeFilter.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
    },

    // Fuzzy (edit-distance) join via deletion-neighborhood signatures
    // (FastSS): part names vs deterministically corrupted copies (one char
    // deleted at position p_partkey % len), all pairs within Levenshtein 1.
    // The signature stage is an equi-join — no nested loop (FuzzyJoinSpec
    // pins the plan) — and the levenshtein verify makes it exact, so the
    // naive banded cross join is a valid oracle. The % 10 sample bounds the
    // ORACLE's quadratic (DuckDB has no signature path); the operator
    // itself takes the full table (FuzzyJoinSpec).
    "j14_fuzzy_join" -> { (s, dir) =>
      val base = Tables.part(s, dir).filter(col("p_partkey") % 10 === 0)
      val corrupted = base.select(col("p_partkey").as("bk"),
          expr("concat(substring(p_name, 1, cast(p_partkey % length(p_name) as int)), " +
            "substring(p_name, cast(p_partkey % length(p_name) as int) + 2, length(p_name)))")
            .as("b_name"))
      graft.ops.FuzzyJoin.editDistanceJoin(
        base.select(col("p_partkey").as("ak"), col("p_name")), "ak", "p_name",
        corrupted, "bk", "b_name", maxDist = 1)
        .select(col("a_key"), col("b_key"), col("dist"))
    },

    // Sorted-neighborhood blocking join (Hernández–Stolfo SNM), TWO
    // passes with independent keys as the method prescribes: pass 1
    // blocked by (lang, first char) sorted by text, pass 2 blocked by
    // (lang, LAST char) sorted by reverse(text) — a shared-suffix dup
    // pair separated by pass 1's prefix ordering lands adjacent in pass
    // 2. Candidates unioned + deduped with n_passes consensus; each
    // verified with exact integer 3-gram Jaccard. Still O(n·w) per pass
    // instead of O(n²) (Linkage scaladoc on the recall-bounded contract
    // and its multi-pass repair).
    "j15_sorted_neighborhood" -> { (s, dir) =>
      graft.ops.Linkage.multiPassPairs(
        Tables.documents(s, dir), "doc_id", "text",
        passes = Seq(
          (Seq(col("lang"), substring(col("text"), 1, 1)), col("text")),
          (Seq(col("lang"), substring(reverse(col("text")), 1, 1)),
            reverse(col("text")))),
        window = 2, n = 3, thresholdPct = 50L)
    }
  )

  val oracles: Map[String, String] = Map(
    "j1_broadcast_dim" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_type
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey""".stripMargin,
    "j2_multikey_left" ->
      """WITH agg AS (SELECT l_orderkey, l_partkey, SUM(l_quantity) AS tot_qty
        |             FROM lineitem GROUP BY 1,2)
        |SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, a.tot_qty
        |FROM lineitem l LEFT JOIN agg a
        |  ON l.l_orderkey = a.l_orderkey AND l.l_partkey = a.l_partkey""".stripMargin,
    "j3_4way_chain" ->
      """SELECT l_orderkey, l_linenumber, c_name, n_name
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "j4_spine_left" ->
      """SELECT s.d, COALESCE(o.n, 0) AS n_orders
        |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1998-12-31',
        |                                         INTERVAL 1 DAY)) AS DATE) AS d) s
        |LEFT JOIN (SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS n
        |           FROM orders GROUP BY 1) o ON s.d = o.od""".stripMargin,
    "j5_exprkey_join" ->
      """SELECT a.c_custkey, b.c_custkey AS matched_custkey
        |FROM customer a JOIN customer b ON upper(trim(a.c_name)) = upper(trim(b.c_name))""".stripMargin,
    "j6_theta_residual" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND (o_orderstatus = 'F' OR l_extendedprice > o_totalprice * 0.5)""".stripMargin,
    "j7_asof" ->
      """SELECT e.event_id, e.user_id, s.event_id AS signup_event_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        |ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |                FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts""".stripMargin,
    "j8_cross_scalar" ->
      s"""WITH per AS (SELECT l_returnflag, ${centsAvgSql("l_extendedprice")} AS avg_price
         |             FROM lineitem GROUP BY 1),
         |     g AS (SELECT ${centsAvgSql("l_extendedprice")} AS global_avg FROM lineitem)
         |SELECT l_returnflag, avg_price, global_avg, avg_price/global_avg AS ratio
         |FROM per CROSS JOIN g""".stripMargin,
    "j9_anti" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_quantity > 45 AND l_partkey = p.p_partkey)""".stripMargin,
    "j10_self_derived" ->
      """SELECT e.user_id, e.event_id, c.n_events
        |FROM (SELECT event_id, user_id FROM events WHERE event_type='purchase') e
        |JOIN (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1) c
        |  ON e.user_id = c.user_id""".stripMargin,
    "j11_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderpriority = '1-URGENT' AND o_custkey = c.c_custkey)""".stripMargin,
    "j12_interval_bucket" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate,
        |       o.o_orderkey AS iv_key, o.o_orderdate AS iv_start
        |FROM lineitem l
        |JOIN orders o
        |  ON o.o_custkey % 1000 = 0
        | AND l.l_shipdate BETWEEN o.o_orderdate
        |                      AND o.o_orderdate + INTERVAL 6 DAY""".stripMargin,
    "j13_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderpriority = '1-URGENT'
        |                AND o.o_orderkey = l.l_orderkey)""".stripMargin,
    // naive banded nested loop — the length band (|lev|<=1 implies length
    // diff <=1) keeps the oracle tractable; semantics identical to the
    // signature join by the FastSS losslessness argument
    "j14_fuzzy_join" ->
      """WITH base AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0),
        |r AS (SELECT p_partkey AS b_key,
        |             substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT)) ||
        |             substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2) AS b_name
        |      FROM base)
        |SELECT l.p_partkey AS a_key, r.b_key, levenshtein(l.p_name, r.b_name) AS dist
        |FROM base l, r
        |WHERE abs(length(l.p_name) - length(r.b_name)) <= 1
        |  AND levenshtein(l.p_name, r.b_name) <= 1""".stripMargin,
    // mirrors Linkage.multiPassPairs: pass 1 (lang, first char, text
    // order), pass 2 (lang, last char, reversed-text order), canonical
    // pair union with n_passes consensus, same integer Jaccard test
    "j15_sorted_neighborhood" ->
      """WITH r0 AS (SELECT doc_id, lang, substr(text, 1, 1) AS c1,
        |        substr(reverse(text), 1, 1) AS cz, text, reverse(text) AS xet,
        |        list_distinct(list_transform(
        |          range(greatest(len(string_split(text,' '))-2, 0)),
        |          i -> string_split(text,' ')[i+1] || ' ' ||
        |               string_split(text,' ')[i+2] || ' ' ||
        |               string_split(text,' ')[i+3])) AS tset
        |      FROM documents),
        |r1 AS (SELECT doc_id, lang, c1, tset,
        |        row_number() OVER (PARTITION BY lang, c1
        |                           ORDER BY text, doc_id) AS rn
        |      FROM r0),
        |r2 AS (SELECT doc_id, lang, cz, tset,
        |        row_number() OVER (PARTITION BY lang, cz
        |                           ORDER BY xet, doc_id) AS rn
        |      FROM r0),
        |cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |         greatest(a.doc_id, b.doc_id) AS id_b,
        |         a.tset AS ta, b.tset AS tb
        |  FROM r1 a JOIN r1 b
        |    ON a.lang = b.lang AND a.c1 = b.c1
        |   AND b.rn > a.rn AND b.rn <= a.rn + 2
        |  UNION ALL
        |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |         a.tset, b.tset
        |  FROM r2 a JOIN r2 b
        |    ON a.lang = b.lang AND a.cz = b.cz
        |   AND b.rn > a.rn AND b.rn <= a.rn + 2),
        |v AS (SELECT id_a, id_b,
        |        CAST(len(list_intersect(ta, tb)) AS BIGINT) AS inter,
        |        CAST(len(ta) + len(tb)
        |             - len(list_intersect(ta, tb)) AS BIGINT) AS uni
        |      FROM cand)
        |SELECT id_a, id_b, max(inter) AS inter, max(uni) AS uni,
        |       bool_or(uni > 0 AND 100 * inter >= 50 * uni) AS is_match,
        |       CAST(count(*) AS BIGINT) AS n_passes
        |FROM v GROUP BY 1, 2""".stripMargin
  )
}
