package graft.nhl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Betting-odds staging, fuzzy player-name crosswalking, SOG-prop outcome
  * facts, and the performance report — the reference's most complex
  * pipeline (`stg_odds_player_props.sql`, `stg_player_name_crosswalk.sql`,
  * `fact_player_sog_props_v2.sql` (255 lines, 8 CTEs),
  * `rpt_sog_props_performance.sql`; lifecycle SURVEY §3.2).
  */
object Props {

  /** `stg_odds_player_props.sql:36-91` (F4): the triple LATERAL FLATTEN —
    * bookmakers[] → markets[] → outcomes[] — as three chained explodes,
    * with the null-description guard (P5).
    */
  def stgOddsPlayerProps(oddsBronze: DataFrame): DataFrame =
    oddsBronze.select(
      col("payload.event_id").as("event_id"),
      col("payload.market").as("market"),
      to_date(col("payload.game_date")).as("game_date"),
      col("payload.home_team").as("home_team"),
      col("payload.away_team").as("away_team"),
      to_timestamp(col("payload.extracted_at")).as("extracted_at"),
      to_timestamp(col("payload.data.commence_time")).as("commence_time"),
      explode(col("payload.data.bookmakers")).as("bk"))
      .select(col("event_id"), col("market"), col("game_date"), col("home_team"),
        col("away_team"), col("extracted_at"), col("commence_time"),
        col("bk.key").as("bookmaker_key"),
        col("bk.title").as("bookmaker_title"),
        explode(col("bk.markets")).as("mk"))
      .select(col("event_id"), col("market"), col("game_date"), col("home_team"),
        col("away_team"), col("extracted_at"), col("commence_time"),
        col("bookmaker_key"), col("bookmaker_title"),
        col("mk.key").as("market_key"),
        to_timestamp(col("mk.last_update")).as("last_update"),
        explode(col("mk.outcomes")).as("oc"))
      .filter(col("oc.description").isNotNull)
      .select(col("event_id"), col("market"), col("game_date"), col("home_team"),
        col("away_team"), col("extracted_at"), col("commence_time"),
        col("bookmaker_key"), col("bookmaker_title"), col("market_key"),
        col("last_update"),
        col("oc.name").as("bet_type"),
        col("oc.description").as("odds_player_name"),
        col("oc.point").as("line_value"),
        col("oc.price").as("odds_american"))

  /** `stg_player_name_crosswalk.sql`: 3-strategy cascade — exact → accent/
    * punct-normalized → (last name, first initial) — each strategy excluding
    * names already matched (J9 anti-joins, `:91,108-109`), unioned (U1),
    * then the ambiguity gate `QUALIFY COUNT(*) OVER (PARTITION BY
    * odds_player_name) = 1` (W3, `:111`).
    */
  def stgPlayerNameCrosswalk(oddsNames: DataFrame, nhlPlayers: DataFrame): DataFrame = {
    // materialize the two name tables: Snowflake evaluates each CTE once,
    // but the DataFrame DAG re-evaluates shared subtrees per reference —
    // the strategy cascade below references them ~4x through its
    // anti-joins, which re-ran the full corpus DISTINCTs each time
    // (measured 21 s warm at sf0.1; ~1 s materialized). Both tables are
    // distinct-name-sized (thousands of rows), not corpus-sized.
    val odds = oddsNames.select(col("odds_player_name")).distinct()
      .withColumn("odds_norm", Fns.normalizeName(col("odds_player_name")))
      .localCheckpoint()
    val nhl = nhlPlayers
      .select(col("player_id"), col("player_name")).distinct()
      .withColumn("nhl_norm", Fns.normalizeName(col("player_name")))
      .localCheckpoint()

    // Strategy cascade as a RANK, not anti-join chaining (r14): the old
    // shape ran `exact` twice (once unioned, once as the anti-join's
    // build side) and `normalized` twice, plus two anti-join stages. Here
    // every strategy joins ONCE over the full name tables, each match
    // carries its strategy rank, and a min-rank window keeps only each
    // name's best strategy — exactly the cascade's semantics (a name with
    // an exact match never exposes its normalized/last-initial matches to
    // the ambiguity gate, because those rows lose the rank filter). The
    // rank filter and the ambiguity count share one window partition, so
    // both evaluate in a single exchange+sort.
    val exact = odds.join(nhl, upper(trim(col("odds_player_name"))) === upper(trim(col("player_name"))))
      .select(col("odds_player_name"), col("player_id"), col("player_name"),
        lit("exact").as("match_method"), lit(1).as("__rank"))

    val normalized = odds.join(nhl, col("odds_norm") === col("nhl_norm"))
      .select(col("odds_player_name"), col("player_id"), col("player_name"),
        lit("normalized").as("match_method"), lit(2).as("__rank"))

    val lastInitial = odds
      .withColumn("o_last", Fns.lastToken(col("odds_norm")))
      .withColumn("o_init", Fns.firstInitial(col("odds_norm")))
      .join(nhl
        .withColumn("n_last", Fns.lastToken(col("nhl_norm")))
        .withColumn("n_init", Fns.firstInitial(col("nhl_norm"))),
        col("o_last") === col("n_last") && col("o_init") === col("n_init"))
      .select(col("odds_player_name"), col("player_id"), col("player_name"),
        lit("last_name_initial").as("match_method"), lit(3).as("__rank"))

    val all = exact.unionByName(normalized).unionByName(lastInitial)
    val wGate = Window.partitionBy("odds_player_name")
    all.withColumn("__mr", min(col("__rank")).over(wGate))
      .filter(col("__rank") === col("__mr"))
      .withColumn("__c", count(lit(1)).over(wGate))
      .filter(col("__c") === 1) // unambiguous matches only
      .drop("__c", "__mr", "__rank")
  }

  private val BookmakerPreference =
    when(col("bookmaker_key") === "draftkings", 1)
      .when(col("bookmaker_key") === "fanduel", 2)
      .when(col("bookmaker_key") === "betmgm", 3)
      .otherwise(9)

  /** `fact_player_sog_props.sql` (v1) — the original SOG-prop outcome model,
    * kept as a named twin of the reference's v1 table: bookmaker preference
    * rank incl. caesars (`:31-40`), per-bookmaker Over/Under pivot
    * (`:52-67`, note bookmaker_key stays in the grain, so split-book lines
    * yield one row per book), and the LIKE-containment fuzzy matcher
    * (`:121-127`): `UPPER(odds_name) = UPPER(nhl_name) OR UPPER(odds_name)
    * LIKE '%'||UPPER(last_word(nhl_name))||'%'`.
    *
    * Faithfully preserves v1's two sharp edges (why v2 exists): the
    * containment matcher FANS OUT on shared surnames (both Marner brothers
    * match "M. Marner" → duplicate rows), and an unmatched prop falls into
    * the CASE ELSE arm as outcome='push' (`:130-135`). The join is an equi
    * join on game_date with the name predicate as a residual filter — at
    * scale it shuffles on the date key only, no cross join.
    */
  def factPlayerSogPropsV1(stgOdds: DataFrame, factPlayerGameStats: DataFrame): DataFrame = {
    val prefV1 = when(col("bookmaker_key") === "draftkings", 1)
      .when(col("bookmaker_key") === "fanduel", 2)
      .when(col("bookmaker_key") === "betmgm", 3)
      .when(col("bookmaker_key") === "caesars", 4)
      .otherwise(5)

    val sog = stgOdds.filter(col("market_key") === "player_shots_on_goal")
    val wBook = Window
      .partitionBy("game_date", "event_id", "odds_player_name", "bet_type")
      .orderBy(prefV1.asc, col("last_update").desc, col("bookmaker_key").asc)
    val best = sog.withColumn("book_rank", row_number().over(wBook))
      .filter(col("book_rank") === 1)

    val pivoted = best
      .groupBy("game_date", "event_id", "home_team", "away_team",
        "commence_time", "odds_player_name", "bookmaker_key")
      .agg(
        max("line_value").as("sog_line"),
        max(when(col("bet_type") === "Over", col("odds_american"))).as("over_odds"),
        max(when(col("bet_type") === "Under", col("odds_american"))).as("under_odds"),
        max("last_update").as("line_last_update"))

    val actuals = factPlayerGameStats
      .filter(col("sog").isNotNull)
      .select(col("game_date").as("a_game_date"),
        col("player_name").as("nhl_player_name"),
        col("sog").as("actual_sog"), col("game_id"),
        col("team_abbrev"), col("home_away"))

    pivoted
      .join(actuals,
        col("game_date") === col("a_game_date") && (
          upper(col("odds_player_name")) === upper(col("nhl_player_name")) ||
            upper(col("odds_player_name"))
              .contains(upper(Fns.lastToken(col("nhl_player_name"))))),
        "left")
      .select(
        col("game_date"), col("event_id"),
        col("home_team").as("odds_home_team"),
        col("away_team").as("odds_away_team"),
        col("odds_player_name"), col("bookmaker_key"),
        col("sog_line"), col("over_odds"), col("under_odds"),
        col("line_last_update"),
        col("nhl_player_name"), col("team_abbrev"), col("home_away"),
        col("actual_sog"), col("game_id"),
        // v1 outcome CASE (`:130-135`): NULL actual falls through to 'push'
        when(col("actual_sog") > col("sog_line"), "over")
          .when(col("actual_sog") < col("sog_line"), "under")
          .otherwise("push").as("outcome"),
        when(col("actual_sog") > col("sog_line"), true)
          .when(col("actual_sog") < col("sog_line"), false).as("hit_over"),
        (col("actual_sog") - col("sog_line")).as("sog_vs_line"))
  }

  /** `fact_player_sog_props_v2.sql` — the 8-stage pipeline:
    * market filter (P8) → bookmaker preference rank (W2) → Over/Under pivot
    * (A4) → 180-day roster window (P9, anchored on `runDate`, not
    * wall-clock) → crosswalk join → actuals join → outcome / push /
    * implied-probability derivation (`:198-253`).
    */
  def factPlayerSogPropsV2(
      stgOdds: DataFrame,
      crosswalk: DataFrame,
      factPlayerGameStats: DataFrame,
      runDate: String): DataFrame = {

    val sog = stgOdds.filter(col("market_key") === "player_shots_on_goal") // P8

    // best line per (event, player, bet side) + Over/Under pivot (W2 + A4),
    // fused into ONE hash aggregation (r14): the old shape ranked every
    // sog row through a (event, date, name, bet)-partitioned window sort
    // and then re-exchanged the rank-1 rows for the pivot aggregate. A
    // min_by per bet side picks the SAME winner — the key struct
    // (preference, −unix_micros(last_update), bookmaker_key) minimizes in
    // exactly the window's (pref ASC, last_update DESC, bookmaker ASC)
    // total order, and min_by skips rows whose key is NULL, so each side's
    // argmin ranges over precisely its own bet_type's rows — with map-side
    // partial aggregation and no sort. bookmaker_key = greatest of the two
    // winners' keys ≡ the old MAX over the group's best rows (the SOG
    // market's sides are exactly Over/Under — stgOdds plants nothing else,
    // and the reference pivot enumerates only these two CASE arms).
    // coalesce: a null/unparseable last_update must stay LEAST preferred
    // (a null struct FIELD sorts FIRST in min_by's ascending order, which
    // would invert the old window's `desc NULLS LAST`; unreachable with
    // the synthetic data but load-bearing if the data contract changes —
    // ADVICE r14)
    def sideKey(bt: String) = when(col("bet_type") === bt,
      struct(BookmakerPreference.as("p"),
        coalesce(-unix_micros(col("last_update")), lit(Long.MaxValue)).as("nlu"),
        col("bookmaker_key").as("bk")))
    def sidePayload(bt: String) = when(col("bet_type") === bt,
      struct(col("line_value"), col("odds_american"), col("bookmaker_key")))
    val pivoted = sog.groupBy("event_id", "game_date", "odds_player_name")
      .agg(
        min_by(sidePayload("Over"), sideKey("Over")).as("ov"),
        min_by(sidePayload("Under"), sideKey("Under")).as("un"))
      .select(col("event_id"), col("game_date"), col("odds_player_name"),
        col("ov.line_value").as("line_value"),
        col("ov.odds_american").as("over_odds"),
        col("un.odds_american").as("under_odds"),
        greatest(col("ov.bookmaker_key"), col("un.bookmaker_key")).as("bookmaker_key"))

    // 180-day active roster (P9) — injected anchor (SURVEY §7.4.5)
    val roster = factPlayerGameStats
      .filter(col("game_date") >= date_sub(to_date(lit(runDate)), 180))
      .select("player_id", "player_name", "team_abbrev").distinct()

    // localCheckpoint: BOTH downstream branches (matched / stillUnmatched)
    // fork off this frame, and without the cut each branch re-ran the
    // whole best-line window + pivot + crosswalk-join subtree at
    // execution (r14 before-plan: the two WindowGroupLimit sorts and the
    // pivot SortAggregate appeared twice, one copy per branch)
    val viaCrosswalk = pivoted
      .join(broadcast(crosswalk.select(col("odds_player_name"),
        col("player_id"), col("player_name"), col("match_method"))),
        Seq("odds_player_name"), "left")
      .localCheckpoint(false)

    // fuzzy candidate fallback for names the crosswalk couldn't place
    // unambiguously (the reference's J7 idiom, `v2.sql:115-144`):
    // candidates on (last name, first initial) restricted to HISTORICAL
    // appearances (rp.game_date <= prop date), most recent appearance
    // wins, ties to the lowest player id.
    //
    // r14 shape: appearances pre-aggregate to ONE row per (player,
    // last, initial) carrying a sorted date array — the raw join keyed
    // them per player-GAME, so every unmatched prop fanned out to ~every
    // game of every same-surname player and a 3M-row rank window sorted
    // the result (measured 3.6 s of the 6.6 s query at sf0.1). Now the
    // join fans out per PLAYER, the per-prop winner is a max_by hash
    // aggregate over (best_date, −player_id) — identical pick order to
    // the old (app_date desc, player_id asc) rank-1 window, because each
    // player's best qualifying date IS its rank-1 row — and the argmax
    // joins back on the prop grain (event, date, name — unique by the
    // pivot's grain). A prop whose candidates are all in the future
    // drops from the argmax (the old residual dropped those rows too)
    // and resurfaces as null through the left join-back.
    val stillUnmatched = viaCrosswalk.filter(col("player_id").isNull)
      .drop("player_id", "player_name", "match_method")
      .withColumn("o_last", Fns.lastToken(Fns.normalizeName(col("odds_player_name"))))
      .withColumn("o_init", Fns.firstInitial(Fns.normalizeName(col("odds_player_name"))))
    // normalizeName's regex chain runs AFTER the per-player aggregation —
    // per distinct (player, name), not per player-GAME row (16× fewer
    // regex evaluations at sf0.1: 341k appearance rows → 20k players)
    val appearances = factPlayerGameStats
      .select(col("player_id").as("cand_player_id"),
        col("player_name").as("cand_player_name"),
        col("game_date").as("app_date"))
      .groupBy("cand_player_id", "cand_player_name")
      .agg(sort_array(collect_set(col("app_date"))).as("app_dates"))
      .withColumn("n_last", Fns.lastToken(Fns.normalizeName(col("cand_player_name"))))
      .withColumn("n_init", Fns.firstInitial(Fns.normalizeName(col("cand_player_name"))))
    val picked = stillUnmatched
      .select(col("event_id"), col("game_date"), col("odds_player_name"),
        col("o_last"), col("o_init"))
      .join(appearances,
        col("o_last") === col("n_last") && col("o_init") === col("n_init"))
      .withColumn("best_date",
        array_max(filter(col("app_dates"), d => d <= col("game_date"))))
      .filter(col("best_date").isNotNull)
      .groupBy("event_id", "game_date", "odds_player_name")
      .agg(max_by(
        struct(col("cand_player_id"), col("cand_player_name")),
        struct(col("best_date"), -col("cand_player_id"))).as("cand"))
      .select(col("event_id"), col("game_date"), col("odds_player_name"),
        col("cand.cand_player_id").as("cand_player_id"),
        col("cand.cand_player_name").as("cand_player_name"))
    val viaFuzzy = stillUnmatched
      .join(picked, Seq("event_id", "game_date", "odds_player_name"), "left")
      .select(stillUnmatched.columns.filterNot(Seq("o_last", "o_init").contains).map(col) :+
        col("cand_player_id").as("player_id") :+
        col("cand_player_name").as("player_name") :+
        when(col("cand_player_id").isNotNull, "fuzzy_fallback").as("match_method"): _*)

    val matched = viaCrosswalk.filter(col("player_id").isNotNull)
      .unionByName(viaFuzzy)
      .join(broadcast(roster.select(col("player_id"), col("team_abbrev"))),
        Seq("player_id"), "left")

    // actuals: the player's SOG in the game on the prop date
    val actuals = factPlayerGameStats
      .groupBy("player_id", "game_date")
      .agg(sum("sog").as("actual_sog"), max("game_id").as("game_id"))

    matched.join(actuals, Seq("player_id", "game_date"), "left")
      .select(
        col("event_id"), col("game_date"), col("odds_player_name"),
        col("player_id"), col("player_name"), col("team_abbrev"),
        coalesce(col("match_method"), lit("unmatched")).as("match_method"),
        col("bookmaker_key"), col("line_value"), col("over_odds"), col("under_odds"),
        col("game_id"), col("actual_sog"),
        // outcome derivation (`:224-237`)
        when(col("player_id").isNull, "unmatched")
          .when(col("actual_sog").isNull, "pending")
          .when(col("actual_sog") > col("line_value"), "over")
          .when(col("actual_sog") < col("line_value"), "under")
          .otherwise("push").as("outcome"),
        when(col("actual_sog").isNotNull && col("actual_sog") > col("line_value"), true)
          .when(col("actual_sog").isNotNull, false).as("hit_over"),
        // implied probabilities (`:245-253`)
        Fns.impliedProb(col("over_odds")).as("over_implied_prob"),
        Fns.impliedProb(col("under_odds")).as("under_implied_prob"),
        (col("actual_sog") - col("line_value")).as("beat_line_by"))
  }

  /** `rpt_sog_props_performance.sql` — all five cuts as REAL outputs (the
    * reference computes four of them into dead CTEs, `:48-118`; SURVEY
    * §7.4.11 says implement them as actual outputs). Settled props only.
    */
  object Report {
    private def settled(v2: DataFrame) = v2.filter(col("outcome").isin("over", "under", "push"))

    private def hitStats(grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
      grouped.agg(
        count(lit(1)).as("n_props"),
        sum(when(col("outcome") === "over", 1).otherwise(0)).as("n_over"),
        sum(when(col("outcome") === "under", 1).otherwise(0)).as("n_under"),
        sum(when(col("outcome") === "push", 1).otherwise(0)).as("n_push"),
        // exact-rational ROUND(…, 2) — see Fns.roundDiv2. beat_line_by is in
        // half-unit steps (x.5 lines), so 2*beat is exactly integral and
        // AVG rounds as (sum of halves)/(2*count).
        Fns.roundDiv2(lit(100) * sum(when(col("outcome") === "over", 1).otherwise(0)),
          count(when(col("outcome") =!= "push", lit(1)))).as("over_hit_pct"),
        Fns.roundDiv2(sum((col("beat_line_by") * 2).cast("long")),
          lit(2) * count(col("beat_line_by"))).as("avg_beat_line_by"))

    def overall(v2: DataFrame): DataFrame =
      hitStats(settled(v2).groupBy(lit("overall").as("scope")))

    /** Line buckets (`rpt:50-57`). */
    def byLineBucket(v2: DataFrame): DataFrame =
      hitStats(settled(v2)
        .withColumn("line_bucket",
          when(col("line_value") <= 1.5, "low (<=1.5)")
            .when(col("line_value") <= 2.5, "mid (2.0-2.5)")
            .when(col("line_value") <= 3.5, "high (3.0-3.5)")
            .otherwise("elite (4.0+)"))
        .groupBy("line_bucket"))

    def byMatchMethod(v2: DataFrame): DataFrame =
      hitStats(settled(v2).groupBy("match_method"))

    /** Per player with the HAVING >= 5 min-sample gate (A7, `rpt:73`). */
    def byPlayer(v2: DataFrame, minProps: Long = 5): DataFrame =
      hitStats(settled(v2).groupBy("player_id", "player_name"))
        .filter(col("n_props") >= minProps)

    def byDay(v2: DataFrame): DataFrame =
      hitStats(settled(v2).groupBy("game_date"))
  }
}
