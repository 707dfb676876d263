package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2.3 — lateral flatten / explode (F-ops), the reference's most
  * load-bearing operator (Snowflake LATERAL FLATTEN ≡ Spark `explode`, a
  * correlated Generate node inside whole-stage codegen).
  *
  * The NHL-shaped nested-JSON triple-flatten (odds bookmakers→markets→
  * outcomes) is exercised against real nested fixtures in `NhlModelsSpec`;
  * here the same operators run over the testdata tables with DuckDB oracles.
  */
object ExplodeQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // F1 — explode an array column (split text → token rows), the
    // stg_player_game_stats.sql:20-78 flatten shape.
    "f1_explode_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    },

    // F2 — the Jinja combination-loop idiom (dim_player.sql:11-37): a Scala
    // Seq of combos, each producing a branch DataFrame, reduced with
    // unionByName. Four branches ≡ the reference's 4 side×position combos.
    "f2_combo_union" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      Seq("signup", "purchase", "click", "view")
        .map(t => ev.filter(col("event_type") === t)
          .select(lit(t).as("combo"), col("event_id"), col("user_id")))
        .reduce(_ unionByName _)
    },

    // F3 — posexplode of a real array column (embeddings vector → one row
    // per dimension), the positional-flatten variant.
    "f3_posexplode_vec" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
    },

    // F4 — nest → double-explode roundtrip: build the odds-payload shape
    // (customer → orders[] → lineitems[]) with collect_list(struct(...)),
    // then recover the flat relation with two chained explodes
    // (stg_odds_player_props.sql:36-91's triple-explode, one level shy).
    // The oracle is the flat join the roundtrip must reproduce.
    "f4_nest_explode_roundtrip" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      // r15: one exchange for BOTH nesting levels. The old shape shuffled
      // lineitem mass twice — once on l_orderkey for the per-order
      // collect_list, then again on o_custkey for the per-customer one
      // (plus the join between them). Joining the flat tables first and
      // repartitioning by the OUTER key lets both collect_list aggregates
      // reuse the same partitioning: HashPartitioning(o_custkey) satisfies
      // the (o_custkey, o_orderkey) clustering of the inner aggregate (a
      // subset key co-locates every group), so neither groupBy adds an
      // exchange. Same nested structure, same exploded relation (array
      // element order differs; the roundtrip's output is order-free).
      val flat = o.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_linenumber", "l_quantity"),
          col("o_orderkey") === col("l_orderkey"))
        .repartition(col("o_custkey"))
      val nested = flat
        .groupBy("o_custkey", "o_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"))).as("items"))
        .groupBy("o_custkey")
        .agg(collect_list(struct(col("o_orderkey"), col("items"))).as("orders"))
      nested
        .select(col("o_custkey"), explode(col("orders")).as("ord"))
        .select(col("o_custkey"), col("ord.o_orderkey").as("o_orderkey"),
          explode(col("ord.items")).as("it"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("it.l_linenumber").as("l_linenumber"), col("it.l_quantity").as("l_quantity"))
    },

    "f5_triple_nest_roundtrip" -> tripleNest
  )

  // F4/F5 full shape — TRIPLE nesting (region → nations[] → customers[]),
  // recovered with three chained explodes, oracle = the flat 3-way join
  // (the odds bookmakers→markets→outcomes shape on relational data).
  private lazy val tripleNest: Q = { (s, dir) =>
    val custPerNation = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("n_nationkey"))
      .agg(collect_list(struct(col("c_custkey"), col("c_mktsegment"))).as("custs"))
    val nationsNested = Tables.nation(s, dir)
      .join(custPerNation, Seq("n_nationkey"))
      .groupBy(col("n_regionkey").as("r_regionkey"))
      .agg(collect_list(struct(col("n_nationkey"), col("n_name"), col("custs"))).as("nations"))
    Tables.region(s, dir).join(nationsNested, Seq("r_regionkey"))
      .select(col("r_name"), explode(col("nations")).as("n"))
      .select(col("r_name"), col("n.n_name").as("n_name"), explode(col("n.custs")).as("c"))
      .select(col("r_name"), col("n_name"),
        col("c.c_custkey").as("c_custkey"), col("c.c_mktsegment").as("c_mktsegment"))
  }

  val oracles: Map[String, String] = Map(
    "f5_triple_nest_roundtrip" ->
      """SELECT r_name, n_name, c_custkey, c_mktsegment
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey""".stripMargin,
    "f1_explode_tokens" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents",
    "f2_combo_union" ->
      """SELECT 'signup' AS combo, event_id, user_id FROM events WHERE event_type='signup'
        |UNION ALL SELECT 'purchase', event_id, user_id FROM events WHERE event_type='purchase'
        |UNION ALL SELECT 'click', event_id, user_id FROM events WHERE event_type='click'
        |UNION ALL SELECT 'view', event_id, user_id FROM events WHERE event_type='view'""".stripMargin,
    "f3_posexplode_vec" ->
      """SELECT e.vec_id, CAST(p.pos AS INTEGER) AS pos, e.embedding[CAST(p.pos AS INTEGER)+1] AS val
        |FROM embeddings e CROSS JOIN (SELECT unnest(range(0,64)) AS pos) p
        |WHERE p.pos < len(e.embedding)""".stripMargin,
    "f4_nest_explode_roundtrip" ->
      """SELECT o_custkey, o_orderkey, l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin
  )
}
