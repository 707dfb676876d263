package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import QueryPack._

/** Headline composite queries — TPC-H-shaped pricing/revenue workloads over
  * the testdata star schema, combining the §2 operators end-to-end (scan →
  * pushdown filter → broadcast/shuffle joins → partial+final hash agg →
  * top-k). These are the bench's "does the whole plan hold together"
  * queries, not new operator classes.
  */
object TpchQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Q1-shaped pricing summary: scan + filter + wide hash agg.
    "tpch_q1" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    },

    // Q3-shaped shipping priority: 3-way join + agg + top-k.
    "tpch_q3" -> { (s, dir) =>
      val cutoff = lit("1995-03-15").cast("timestamp")
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // Q5-shaped local-supplier revenue: 6-way star join (two broadcast
    // dims, residual nation-equality on the supplier join) + hash agg.
    "tpch_q5" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // Q18-shaped large-volume customers: agg + HAVING feeding a join,
    // top-k by order value.
    "tpch_q18" -> { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // Q10-shaped returned-item losses: filtered fact join + dim broadcast
    // + per-customer agg + top-20.
    "tpch_q10" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q6-shaped forecast revenue: pure pushdown filter + global agg.
    "tpch_q6" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * col("l_discount") * 100, 0)
          .cast("long")) / 100.0).as("revenue"))
    },

    // Q14-shaped promo-revenue share: month-windowed scan (pushdown) +
    // broadcast part join + conditional agg over an exact-cents revenue
    // (the q6 idiom: identical IEEE product both engines, then integer
    // cents — order-independent under any partitioning).
    "tpch_q14" -> { (s, dir) =>
      val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
        .cast("long")
      val promoRev = sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(
          (promoRev / 100.0).as("promo_revenue"),
          (sum(rev) / 100.0).as("total_revenue"),
          (lit(100.0) * promoRev / sum(rev)).as("promo_pct"))
    },

    // Q17-shaped small-quantity revenue: the correlated-scalar-subquery
    // shape (l_quantity < 0.2 * per-part avg), decorrelated into a grouped
    // aggregate joined back — the standard Catalyst-friendly plan. The
    // threshold compare is exact cross-engine: quantities are integral
    // doubles, so `5 * qty * cnt < sum` ⟺ `qty < 0.2 * avg` with no float
    // division on either side. Both lineitem passes pre-filter through the
    // broadcast brand slice, so at 100 TB the fact scans prune to ~1/25.
    "tpch_q17" -> { (s, dir) =>
      val brandParts = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val perPart = Tables.lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey")
        .agg(sum("l_quantity").as("sum_qty"), count("l_quantity").as("cnt_qty"))
      Tables.lineitem(s, dir)
        .join(broadcast(perPart), Seq("l_partkey"))
        .filter(col("l_quantity") * col("cnt_qty") * 5 < col("sum_qty"))
        .agg((centsSum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // Q13-shaped customer order-count distribution: LEFT OUTER join with a
    // filtered right side (customers with zero qualifying orders must
    // survive as c_count=0), then a second aggregation over the first —
    // the two-level "aggregate of an aggregate" shape. All-integer
    // arithmetic; exact on any engine.
    "tpch_q13" -> { (s, dir) =>
      val ord = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
      Tables.customer(s, dir)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count("o_orderkey").as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q4-shaped priority check: the EXISTS shape — a left-semi join from a
    // date-windowed orders scan into a filtered lineitem, counted by
    // priority. Each order counts once however many lineitems match
    // (semi-join semantics, not an inner-join double count).
    "tpch_q4" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val returned = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q12-shaped shipping-priority split: fact join + conditional agg
    // (CASE inside SUM) — all-integer counts, exact anywhere.
    "tpch_q12" -> { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q19-shaped disjunctive-predicate join: three (brand, size, quantity)
    // clauses OR-ed across the join — the shape that needs the join-key
    // equality EXTRACTED from the disjunction (Catalyst does this; a naive
    // planner falls back to a cartesian residual). Exact-cents revenue.
    "tpch_q19" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val clauses =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30))
      li.join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(clauses)
        .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // Q22-shaped dormant high-balance accounts: global-average scalar
    // subquery (1-row broadcast) + NOT EXISTS (left-anti to a filtered
    // orders scan — every customer HAS some order in this testdata, so the
    // anti side is the urgent slice to keep the result non-vacuous) +
    // nation rollup. The above-average threshold compares as
    // bal_cents * cnt > sum_cents — exact integer arithmetic, the q17
    // idiom — so no float-average boundary can flip membership.
    "tpch_q22" -> { (s, dir) =>
      val pos = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0.0)
        .withColumn("bal_c", round(col("c_acctbal") * 100, 0).cast("long"))
      val stats = pos.agg(sum("bal_c").as("sum_c"), count(lit(1)).as("cnt_c"))
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      pos.crossJoin(broadcast(stats))
        .filter(col("bal_c") * col("cnt_c") > col("sum_c"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"), (sum("bal_c") / 100.0).as("totacctbal"))
        .orderBy("n_name")
    },

    // Q2-shaped minimum-price supplier: the correlated-MIN-subquery shape
    // (supplier offering the part's minimum price within one region),
    // decorrelated into an unordered per-part MIN window + equality filter.
    // There is no partsupp table in this testdata, so "offer price" is the
    // lineitem extended price in exact cents — the min/equality compare is
    // all-integer on both engines. Part slice and EUROPE supplier roster
    // both broadcast, so the fact scan prunes through both before the
    // per-part MIN. One lineitem pass, ONE exchange total: the window
    // partitions on p_partkey and the following (p_partkey, l_suppkey)
    // distinct reuses that partitioning (HashPartitioning(p_partkey)
    // satisfies the superset clustering), where the previous
    // groupBy-MIN + broadcast-join-back form scanned lineitem twice and
    // shuffled twice — that second pass was ~0.4 s of pure stage
    // constants at sf0.1 (the r13 verdict's q2 outlier).
    "tpch_q2" -> { (s, dir) =>
      val eur = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val sized = Tables.part(s, dir)
        .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
        .select("p_partkey")
      // the roster joins INNER before the window (it both filters to
      // EUROPE, which the per-part MIN must see, and carries the output
      // attributes), so eur broadcasts exactly once — the previous
      // semi-filter + final-join form built the 3-table roster broadcast
      // twice (column pruning makes the two builds non-identical, so
      // ReuseExchange cannot merge them); the supplier attributes ride
      // through the distinct as first() aggregates (constant per suppkey)
      val priced = Tables.lineitem(s, dir)
        .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("price_c"))
      priced
        .withColumn("min_c",
          min(col("price_c")).over(Window.partitionBy("p_partkey")))
        .filter(col("price_c") === col("min_c"))
        .groupBy("p_partkey", "s_suppkey")
        .agg(first(col("s_acctbal")).as("s_acctbal"),
          first(col("s_name")).as("s_name"),
          first(col("n_name")).as("n_name"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("s_suppkey"))
        .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
          col("p_partkey").asc, col("s_suppkey").asc)
        .limit(100)
    },

    // Q7-shaped volume shipping: bidirectional nation-pair filter across two
    // broadcast nation aliases, revenue by (supp_nation, cust_nation, year).
    "tpch_q7" -> { (s, dir) =>
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8-shaped national market share: numerator/denominator conditional agg
    // — both sums are exact integer cents, so the share is one IEEE divide of
    // two identical bigints on either engine.
    "tpch_q8" -> { (s, dir) =>
      val amer = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val suppNation = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val std = Tables.part(s, dir).filter(col("p_type") === "STANDARD").select("p_partkey")
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(std), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(amer), col("c_nationkey") === col("c_nk"), "left_semi")
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", rev).otherwise(0L))
          / sum(rev)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9-shaped product-type profit: 5-way join over a name-substring part
    // slice; profit = revenue cents − cost cents where cost is the exact
    // all-integer product round(retail*100) × qty (quantities are integral
    // in this testdata, pinned by the oracle's CAST).
    "tpch_q9" -> { (s, dir) =>
      val redParts = Tables.part(s, dir).filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
      val amount =
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0).cast("long") -
          round(col("p_retailprice") * 100, 0).cast("long") * col("l_quantity").cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(amount) / 100.0).as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    },

    // Q11-shaped important stock: per-part value from one nation's suppliers
    // vs a global-fraction threshold — the HAVING-over-scalar-subquery shape
    // as a 1-row broadcast; threshold compare is integer-exact
    // (value_c × 1000 > total_c ⟺ value > total/1000).
    "tpch_q11" -> { (s, dir) =>
      val n4 = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_4")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      // r15 checkpoint: `vals` feeds the total AND the threshold filter —
      // without the cut the lineitem semi-join + aggregation subtree
      // executed once per reference (two full lineitem passes)
      val vals = Tables.lineitem(s, dir)
        .join(broadcast(n4), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("value_c"))
        .localCheckpoint(false)
      val total = vals.agg(sum("value_c").as("total_c"))
      vals.crossJoin(broadcast(total))
        .filter(col("value_c") * 1000 > col("total_c"))
        .select(col("l_partkey"), (col("value_c") / 100.0).as("value"))
        .orderBy(col("value").desc, col("l_partkey").asc)
    },

    // Q15-shaped top supplier: quarterly revenue per supplier, global MAX as
    // a 1-row broadcast, equality join back (ties all surface, like the
    // spec's view formulation). Exact-cents revenue both sides.
    "tpch_q15" -> { (s, dir) =>
      // r15 checkpoint: `rev` feeds the MAX AND the equality join-back —
      // without the cut the filtered lineitem aggregation executed once
      // per reference (two full lineitem passes)
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("rev_c"))
        .localCheckpoint(false)
      val maxRev = rev.agg(max("rev_c").as("max_c"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("rev_c") === col("max_c"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          (col("rev_c") / 100.0).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q16-shaped supplier count per part attribute: the NOT-IN-subquery shape
    // as a broadcast left-anti join (suppliers in deficit stand in for the
    // spec's complaint suppliers), COUNT(DISTINCT) per (brand, type, size).
    "tpch_q16" -> { (s, dir) =>
      val parts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, dir)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    },

    // Q20-shaped part-promotion shortlist: chained semi joins — suppliers who
    // shipped a strict majority of some name-prefixed part's 1997 volume.
    // Quantities are integral, so the majority compare (2·sq > tq) is
    // all-BIGINT on both engines.
    "tpch_q20" -> { (s, dir) =>
      val hot = Tables.part(s, dir).filter(col("p_name").startsWith("hot"))
        .select("p_partkey")
      val shipped = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(hot), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      val perSupp = shipped.groupBy("l_partkey", "l_suppkey").agg(sum("qty").as("sq"))
      val perPart = shipped.groupBy("l_partkey").agg(sum("qty").as("tq"))
        .withColumnRenamed("l_partkey", "pk")
      val qual = perSupp.join(broadcast(perPart), col("l_partkey") === col("pk"))
        .filter(col("sq") * 2 > col("tq"))
        .select("l_suppkey").distinct()
      val afr = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.supplier(s, dir)
        .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(afr), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // Q21-shaped waiting-orders: the double-correlated EXISTS/NOT-EXISTS
    // shape (multi-supplier order whose latest shipment came from exactly
    // one supplier), decorrelated into ONE grouped pass over lineitem: a
    // single collect_set(shipdate, suppkey) per order — bounded by the
    // per-order line count (~4–7 in TPC-H, schema-bounded at any SF) — then
    // nsupp / max_ship / the sole-latest-shipper all fall out of codegen'd
    // array HOFs over that set. Round 6 shipped this as two separate
    // groupBy(l_orderkey) passes plus a join between them (three exchanges
    // of lineitem mass on the same key, 3.3 s at sf0.1); one exchange now.
    // This testdata has no commit/receipt dates, so "kept the order
    // waiting" is "sole latest shipper" (max l_shipdate stands in).
    "tpch_q21" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      // r15: ONE exchange of the projected lineitem rows, everything in
      // whole-stage codegen. The r14 collect_set ObjectHashAggregate (no
      // codegen, growing set<struct> partials) and the struct-min/max
      // variant (SortAggregate fallback — struct buffers are not
      // UnsafeRow-mutable, so the ENTIRE scan sorts map-side) both lose
      // to: repartition by order, then the (order, supplier) max-shipdate
      // hash aggregate, the per-order window, and the final hash
      // aggregate all reuse that single partitioning (subset-key
      // clustering). Semantics, exactly Q21's: suppliers-per-order > 1,
      // keep orders where exactly ONE distinct supplier shipped at the
      // order's latest ship date; that supplier is late_supp.
      import org.apache.spark.sql.expressions.Window
      val perSupp = li
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_shipdate")).as("sd"))
      val wOrd = Window.partitionBy("l_orderkey")
      val sole = perSupp
        .withColumn("nsupp", count(lit(1)).over(wOrd))
        .withColumn("max_ship", max(col("sd")).over(wOrd))
        .filter(col("nsupp") > 1 && col("sd") === col("max_ship"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_late"), max(col("l_suppkey")).as("late_supp"))
        .filter(col("n_late") === 1)
        .select("l_orderkey", "late_supp")
      val fOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      sole.join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(Tables.supplier(s, dir)), col("late_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }
  )

  val oracles: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
         |${centsSumSql("l_extendedprice")} AS sum_base_price, COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))/100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))/100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))/100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "tpch_q6" ->
      """SELECT SUM(CAST(round(l_extendedprice*l_discount*100,0) AS BIGINT))/100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "tpch_q14" ->
      """SELECT
        |  SUM(CASE WHEN p_type='PROMO'
        |           THEN CAST(round(l_extendedprice*(1.0E0-l_discount)*100,0) AS BIGINT)
        |           ELSE 0 END)/100.0 AS promo_revenue,
        |  SUM(CAST(round(l_extendedprice*(1.0E0-l_discount)*100,0) AS BIGINT))/100.0
        |    AS total_revenue,
        |  100.0E0 * SUM(CASE WHEN p_type='PROMO'
        |           THEN CAST(round(l_extendedprice*(1.0E0-l_discount)*100,0) AS BIGINT)
        |           ELSE 0 END)
        |    / SUM(CAST(round(l_extendedprice*(1.0E0-l_discount)*100,0) AS BIGINT))
        |    AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,
    "tpch_q17" ->
      """WITH per_part AS (
        |  SELECT l_partkey, SUM(l_quantity) AS sum_qty,
        |         COUNT(l_quantity) AS cnt_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13' GROUP BY 1)
        |SELECT SUM(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0/7.0 AS avg_yearly
        |FROM lineitem JOIN per_part USING (l_partkey)
        |WHERE l_quantity * cnt_qty * 5 < sum_qty""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q19" ->
      """SELECT SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))/100.0
        |  AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22" ->
      """WITH pos AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal*100,0) AS BIGINT) AS bal_c
        |  FROM customer WHERE c_acctbal > 0.0),
        |stats AS (SELECT SUM(bal_c) AS sum_c, COUNT(*) AS cnt_c FROM pos)
        |SELECT n_name, COUNT(*) AS numcust, SUM(bal_c)/100.0 AS totacctbal
        |FROM pos CROSS JOIN stats
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal_c * cnt_c > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q2" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |sized AS (SELECT p_partkey FROM part
        |          WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
        |priced AS (
        |  SELECT p_partkey, l_suppkey,
        |         CAST(round(l_extendedprice*100,0) AS BIGINT) AS price_c
        |  FROM lineitem JOIN sized ON l_partkey = p_partkey
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM eur)),
        |minc AS (SELECT p_partkey AS mk, MIN(price_c) AS min_c FROM priced GROUP BY 1),
        |win AS (SELECT DISTINCT p_partkey, l_suppkey
        |        FROM priced JOIN minc ON p_partkey = mk AND price_c = min_c)
        |SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey
        |FROM win JOIN eur ON l_suppkey = s_suppkey
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  EXTRACT(YEAR FROM l_shipdate) AS l_year,
        |  SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT))/100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "tpch_q8" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
        |  SUM(CASE WHEN n2.n_name = 'NATION_3'
        |           THEN CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
        |           ELSE 0 END)
        |  / SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q9" ->
      """SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
        |  SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)
        |      - CAST(round(p_retailprice*100,0) AS BIGINT) * CAST(l_quantity AS BIGINT))
        |  /100.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1,2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    "tpch_q11" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |         SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS value_c
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_4')
        |  GROUP BY 1),
        |total AS (SELECT SUM(value_c) AS total_c FROM vals)
        |SELECT l_partkey, value_c/100.0 AS value
        |FROM vals CROSS JOIN total
        |WHERE value_c * 1000 > total_c
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,
    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, s_acctbal, rev_c/100.0 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1,2,3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'hot%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |per_supp AS (SELECT l_partkey, l_suppkey, SUM(qty) AS sq
        |             FROM shipped GROUP BY 1,2),
        |per_part AS (SELECT l_partkey AS pk, SUM(qty) AS tq FROM shipped GROUP BY 1),
        |qual AS (SELECT DISTINCT l_suppkey
        |         FROM per_supp JOIN per_part ON l_partkey = pk WHERE sq * 2 > tq)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND s_suppkey IN (SELECT l_suppkey FROM qual)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q21" ->
      """WITH multi AS (
        |  SELECT l_orderkey AS ok, MAX(l_shipdate) AS max_ship
        |  FROM lineitem GROUP BY 1
        |  HAVING COUNT(DISTINCT l_suppkey) > 1),
        |sole AS (
        |  SELECT l_orderkey, MAX(l_suppkey) AS late_supp
        |  FROM lineitem JOIN multi ON l_orderkey = ok AND l_shipdate = max_ship
        |  GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) = 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM sole
        |JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON late_supp = s_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin
  )
}
