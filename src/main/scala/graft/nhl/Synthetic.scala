package graft.nhl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** NHL-shaped bronze frames derived DETERMINISTICALLY from the driver's
  * TPC-H-ish tables, so the real model graph (`Models`/`Metrics`/`Props`)
  * gets a driver-level DuckDB oracle: the same arithmetic derivation is
  * mirrored in `graft.queries.NhlQueries`' oracle SQL, both sides run the
  * model logic, and the driver hash-compares the results. This closes the
  * r11 verdict's top gap — the NHL model graph's correctness authority was
  * builder-authored ScalaTest goldens only.
  *
  * Mapping (orders → games, lineitem → player-game rows / plays / props):
  * every derived value is integer arithmetic on key columns, expressible
  * identically in Spark and DuckDB. Deliberate reference edge cases are
  * planted on arithmetic subsets:
  *   - multi-snapshot games (`game_id % 3 = 0` gets a stale LIVE decoy
  *     snapshot that `Bronze.latestSnapshot` must discard),
  *   - null `playerId` rows (`l_linenumber = 7`; the P5 flatten guard),
  *   - OT games (`game_id % 6 = 0`), playoffs (`% 10 = 0`, P4 filter),
  *     pending games (`o_orderstatus 'P'` → FUT), score ties (null winner),
  *   - crosswalk name variants by `l_partkey % 4`: exact / apostrophe
  *     (normalized-only) / "F. Last" (last-name-initial) / unknown, plus a
  *     shared-surname "Kane" cohort (`l_partkey % 101 = 0`) whose full-name
  *     and initial collisions trip the W3 ambiguity gate into v2's fuzzy
  *     fallback (`stg_player_name_crosswalk.sql:111`),
  *   - push-able integer SOG lines, missing Under sides, a competing
  *     second bookmaker, null-description outcomes (P5 guard), a non-SOG
  *     market (P8 filter), and null shot coordinates.
  */
object Synthetic {

  /** Injected "today" for the v2 roster window (SURVEY §7.4.5) — late
    * enough that the 180-day cutoff lands inside the testdata date range.
    */
  val RunDate = "2001-09-01"

  /** Derived game attributes, one row per order. Mirrored by
    * `NhlQueries.gamesCte`.
    */
  def games(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val home = (lit(1) + col("o_custkey") % 30).cast("int")
    val away = (lit(1) + (col("o_custkey") % 30 + 1 + k % 28) % 30).cast("int")
    Tables.orders(spark, dir).select(
      k.as("game_id"),
      col("o_orderdate").cast("date").as("game_date"),
      year(col("o_orderdate")).as("season"),
      when(k % 10 === 0, 3).otherwise(2).as("game_type"),
      when(col("o_orderstatus") === "F", "OFF")
        .when(col("o_orderstatus") === "O", "FINAL")
        .otherwise("FUT").as("game_state"),
      concat(lit("Arena "), (k % 5).cast("string")).as("venue_name"),
      when(k % 6 === 0, 4).otherwise(3).as("periods"),
      when(k % 6 === 0, "OT").otherwise("REG").as("ptype"),
      home.as("home_team_id"),
      away.as("away_team_id"),
      concat(lit("T"), lpad(home.cast("string"), 2, "0")).as("home_team_abbrev"),
      concat(lit("T"), lpad(away.cast("string"), 2, "0")).as("away_team_abbrev"),
      (k % 7).cast("int").as("home_score"),
      ((k % 11) % 7).cast("int").as("away_score"),
      (lit(20) + k % 23).cast("int").as("home_sog"),
      (lit(20) + k % 19).cast("int").as("away_sog"))
  }

  /** First/last name from a player key: 7 first names ('Alex'…'Glex' via
    * the initial letter) × per-player surnames, except the Kane cohort
    * (`p % 101 = 0`) which shares a surname — and, where `p % 7` collides
    * too, a full name — to exercise the crosswalk ambiguity gate.
    */
  private def firstName(p: Column): Column =
    concat(call_function("char", lit(65) + p % 7), lit("lex"))
  private def lastName(p: Column): Column =
    when(p % 101 === 0, lit("Kane"))
      .otherwise(concat(lit("Smith"), (p / 2).cast("long").cast("string")))

  private def lineitems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity").cast("int").as("q"))

  /** Flat player-game rows — the values the boxscore payload nests and
    * `Models.stgPlayerGameStats` flattens back out. Mirrored by
    * `NhlQueries.playersCte`.
    */
  def playerRows(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitems(spark, dir)
    val g = games(spark, dir)
    val q = col("q")
    val p = col("l_partkey")
    val s = col("l_suppkey")
    val ln = col("l_linenumber")
    val isHome = ln % 2 === 0
    val goals = q % 4
    val toiMin = lit(8) + (q + ln) % 14
    val toiSec = (q * 7 + s) % 60
    l.join(g, col("l_orderkey") === col("game_id"))
      .select(
        col("game_id"), col("game_date"), col("season"), col("game_type"),
        col("game_state"),
        when(isHome, "home").otherwise("away").as("home_away"),
        when(isHome, col("home_team_id")).otherwise(col("away_team_id")).as("team_id"),
        when(isHome, col("home_team_abbrev")).otherwise(col("away_team_abbrev")).as("team_abbrev"),
        when(ln % 3 === 0, "D").otherwise("F").as("position_type"),
        when(ln === 7, lit(null).cast("long")).otherwise(p).as("player_id"),
        concat(firstName(p), lit(" "), lastName(p)).as("player_name"),
        when(ln % 3 === 0, "D")
          .when(p % 3 === 0, "C")
          .when(p % 3 === 1, "L")
          .otherwise("R").as("position"),
        goals.cast("int").as("goals"),
        ((q + ln) % 4).cast("int").as("assists"),
        (goals + (q + ln) % 4).cast("int").as("points"),
        (q % 9 - 4).cast("int").as("plus_minus"),
        (goals + (q + s) % 9).cast("int").as("sog"),
        (q % 5 * 2).cast("int").as("pim"),
        (s % 8).cast("int").as("hits"),
        ((q + s) % 5).cast("int").as("blocked_shots"),
        (q % 3).cast("int").as("giveaways"),
        (s % 3).cast("int").as("takeaways"),
        when(goals >= 2 && s % 3 === 0, 1).otherwise(0).as("power_play_goals"),
        when(q === 50, 1).otherwise(0).as("shorthanded_goals"),
        when(ln % 3 =!= 0 && p % 3 === 0,
          ((q * 13 + s) % 101).cast("double") / lit(100))
          .as("faceoff_winning_pctg"),
        concat(lpad(toiMin.cast("string"), 2, "0"), lit(":"),
          lpad(toiSec.cast("string"), 2, "0")).as("toi"))
  }

  /** Bronze boxscore snapshots: the flat rows nested back into the NHL API
    * payload shape (the models' input contract), one final snapshot per
    * game plus a stale LIVE decoy for `game_id % 3 = 0` that
    * `Bronze.latestSnapshot` must discard (the oracle derives from final
    * values only, so a dedup bug fails the driver gate).
    */
  def bronzeBoxscore(spark: SparkSession, dir: String): DataFrame = {
    val pr = playerRows(spark, dir)
    val pstruct = struct(
      col("player_id").as("playerId"),
      struct(col("player_name").as("default")).as("name"),
      col("position"),
      col("goals"), col("assists"), col("points"),
      col("plus_minus").as("plusMinus"),
      col("sog"), col("pim"), col("hits"),
      col("blocked_shots").as("blockedShots"),
      col("giveaways"), col("takeaways"),
      col("power_play_goals").as("powerPlayGoals"),
      col("shorthanded_goals").as("shorthandedGoals"),
      col("faceoff_winning_pctg").as("faceoffWinningPctg"),
      col("toi"))
    def side(ha: String, pt: String) =
      collect_list(when(col("home_away") === ha && col("position_type") === pt, pstruct))
    val grouped = pr.groupBy("game_id").agg(
      side("home", "F").as("hf"), side("home", "D").as("hd"),
      side("away", "F").as("af"), side("away", "D").as("ad"))
    val joined = games(spark, dir).join(grouped, Seq("game_id"), "left")

    def team(prefix: String, scoreBump: Int, fixedSog: Option[Int]) = struct(
      col(s"${prefix}_team_id").as("id"),
      col(s"${prefix}_team_abbrev").as("abbrev"),
      (col(s"${prefix}_score") + scoreBump).cast("int").as("score"),
      fixedSog.map(v => lit(v)).getOrElse(col(s"${prefix}_sog")).cast("int").as("sog"))
    def payload(state: Column, scoreBump: Int, fixedSog: Option[Int],
                arr: String => Column) = struct(
      col("game_id").as("id"),
      col("season"),
      col("game_type").as("gameType"),
      col("game_date").cast("string").as("gameDate"),
      state.as("gameState"),
      struct(col("venue_name").as("default")).as("venue"),
      struct(col("periods").as("number"), col("ptype").as("periodType")).as("periodDescriptor"),
      team("home", scoreBump, fixedSog).as("homeTeam"),
      team("away", scoreBump, fixedSog).as("awayTeam"),
      struct(
        struct(arr("hf").as("forwards"), arr("hd").as("defense")).as("homeTeam"),
        struct(arr("af").as("forwards"), arr("ad").as("defense")).as("awayTeam"))
        .as("playerByGameStats"))

    val fin = joined.select(
      payload(col("game_state"), 0, None, c => col(c)).as("payload"),
      concat(lit("raw/boxscore/g"), col("game_id"), lit("/b.json")).as("s3_key"),
      date_add(col("game_date"), 1).as("partition_date"),
      col("game_id"))
    val stale = joined.filter(col("game_id") % 3 === 0).select(
      payload(lit("LIVE"), 1, Some(5), c => slice(col(c), 1, 0)).as("payload"),
      concat(lit("raw/boxscore/g"), col("game_id"), lit("/a.json")).as("s3_key"),
      col("game_date").as("partition_date"),
      col("game_id"))
    fin.unionByName(stale)
  }

  /** Bronze play-by-play: one play per lineitem, nested into the PBP
    * payload shape for `Models.factShotEvents`. Shot types, coords (null
    * for `l_linenumber = 6` — the P5 guard), goal rows with
    * `scoringPlayerId` instead of `shootingPlayerId` (the COALESCE path).
    */
  def bronzePbp(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitems(spark, dir)
    val g = games(spark, dir)
    val q = col("q")
    val s = col("l_suppkey")
    val ln = col("l_linenumber")
    val typ = when((q + ln) % 5 === 0, "goal")
      .when((q + ln) % 5 === 1, "shot-on-goal")
      .when((q + ln) % 5 === 2, "missed-shot")
      .when((q + ln) % 5 === 3, "faceoff")
      .otherwise("hit")
    val play = struct(
      (ln * 1000 + q * 10 + s % 10).cast("int").as("eventId"),
      typ.as("typeDescKey"),
      struct((lit(1) + q % 3).cast("int").as("number"), lit("REG").as("periodType"))
        .as("periodDescriptor"),
      concat(lpad((q % 20).cast("string"), 2, "0"), lit(":"),
        lpad((s % 60).cast("string"), 2, "0")).as("timeInPeriod"),
      struct(
        when(ln === 6, lit(null).cast("double"))
          .otherwise(((q * 11 + s * 3) % 199 - 99).cast("double")).as("xCoord"),
        ((q * 5 + s * 7) % 85 - 42).cast("double").as("yCoord"),
        when(q % 4 === 0, "wrist").when(q % 4 === 1, "slap")
          .when(q % 4 === 2, "snap").otherwise("tip-in").as("shotType"),
        when(typ === "goal", lit(null).cast("long")).otherwise(col("l_partkey"))
          .as("shootingPlayerId"),
        when(typ === "goal", col("l_partkey")).as("scoringPlayerId"),
        (lit(90000L) + s % 60).as("goalieInNetId"),
        when(ln % 2 === 0, col("home_team_id")).otherwise(col("away_team_id"))
          .as("eventOwnerTeamId")).as("details"))
    l.join(g, col("l_orderkey") === col("game_id"))
      .groupBy("game_id", "game_date", "season", "game_type",
        "home_team_id", "home_team_abbrev", "away_team_id", "away_team_abbrev")
      .agg(collect_list(play).as("plays"))
      .select(
        struct(
          col("game_id").as("id"),
          col("game_date").cast("string").as("gameDate"),
          col("season"), col("game_type").as("gameType"),
          struct(col("home_team_id").as("id"), col("home_team_abbrev").as("abbrev")).as("homeTeam"),
          struct(col("away_team_id").as("id"), col("away_team_abbrev").as("abbrev")).as("awayTeam"),
          col("plays")).as("payload"),
        concat(lit("raw/pbp/g"), col("game_id"), lit("/b.json")).as("s3_key"),
        date_add(col("game_date"), 1).as("partition_date"),
        col("game_id"))
  }

  /** Bronze odds documents: player-SOG props for the first two lineitems
    * of every game, nested bookmakers→markets→outcomes, with the planted
    * name variants, second-bookmaker conflicts, missing Unders, integer
    * (push-able) lines, a non-SOG market, and null-description outcomes.
    * Carries a top-level `game_id` so query faces can take deterministic
    * subsets (the v1 containment matcher is quadratic per date by design).
    */
  def bronzeOdds(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitems(spark, dir)
    val g = games(spark, dir)
    val q = col("q")
    val p = col("l_partkey")
    val s = col("l_suppkey")
    val ln = col("l_linenumber")

    val oddsName = when(p % 4 === 0, concat(firstName(p), lit(" "), lastName(p)))
      .when(p % 4 === 1, concat(
        expr("char(65 + l_partkey % 7)"), lit("'lex "), lastName(p)))
      .when(p % 4 === 2, concat(
        expr("char(65 + l_partkey % 7)"), lit(". "), lastName(p)))
      .otherwise(concat(lit("Zz Unknown"), p.cast("string")))
    val marketKey = when(ln === 2 && q % 4 === 0, "player_points")
      .otherwise("player_shots_on_goal")
    val lineValue = when((q + ln) % 3 === 0, (q % 5).cast("double"))
      .otherwise((q % 5).cast("double") + 0.5)
    // prices key on s ONLY through s % 60 — see the tie argument below
    val overP = (-(lit(100) + (q * 3 + s % 60) % 60)).cast("int")
    val underP = (lit(100) + (q * 5 + s % 60) % 45).cast("int")
    val book1 = when(s % 4 === 0, "draftkings").when(s % 4 === 1, "fanduel")
      .when(s % 4 === 2, "betmgm").otherwise("pointsbet")
    // last_update encodes (ln, s%5, q, s%60) in (hour, minute, second): the
    // driver's lineitem DUPLICATES l_linenumber within an order, so two
    // same-book quotes for one prop can tie completely in the best-line
    // window — a full ordering tie must imply identical projected rows.
    // A tie fixes (q, ln, s%60, s%5, s%4-via-book), and every projected
    // value (line, prices) is a function of exactly those residues, so
    // either engine's rank-1 pick projects identically. (suppkey is NOT
    // bounded across scale factors — gen_sf offsets keys — so nothing may
    // assume s < 100; hour stays in 0..9.) Caesars quotes stamp the game
    // date itself (book1 stamps the day before), staying strictly fresher.
    val hour1 = (ln - 1) + s % 5 * 2
    def updateAt(d: Column): Column = concat(
      d.cast("string"), lit(" "),
      lpad(hour1.cast("string"), 2, "0"), lit(":"),
      lpad(q.cast("string"), 2, "0"), lit(":"),
      lpad((s % 60).cast("string"), 2, "0"))

    def oc(bk: Column, lu: Column, bet: String, desc: Column, point: Column,
           price: Column, keep: Column) = struct(
      bk.as("bk"), lu.as("lu"), marketKey.as("mkey"),
      lit(bet).as("name"), desc.as("description"),
      point.as("point"), price.as("price"), keep.as("keep"))
    val lu1 = updateAt(date_sub(col("game_date"), 1))
    val luC = updateAt(col("game_date"))

    val ocRows = l.filter(ln <= 2)
      .join(g, col("l_orderkey") === col("game_id"))
      .select(col("game_id"), col("game_date"),
        col("home_team_abbrev"), col("away_team_abbrev"),
        explode(array(
          oc(book1, lu1, "Over", oddsName, lineValue, overP, lit(true)),
          oc(book1, lu1, "Under", oddsName, lineValue, underP, (q + s) % 7 =!= 0),
          oc(lit("caesars"), luC, "Over", oddsName, lineValue,
            (overP + 6).cast("int"), s % 5 === 0),
          oc(lit("caesars"), luC, "Under", oddsName, lineValue,
            (underP + 6).cast("int"), s % 5 === 0),
          oc(book1, lu1, "Over", lit(null).cast("string"), lit(1.5),
            lit(-110), col("game_id") % 17 === 0 && ln === 1))).as("o"))
      .filter(col("o.keep"))
      .select(col("game_id"), col("game_date"),
        col("home_team_abbrev"), col("away_team_abbrev"),
        col("o.bk").as("bk"), col("o.lu").as("lu"), col("o.mkey").as("mkey"),
        struct(col("o.name").as("name"), col("o.description").as("description"),
          col("o.point").as("point"), col("o.price").as("price")).as("outcome"))

    val markets = ocRows
      .groupBy("game_id", "game_date", "home_team_abbrev", "away_team_abbrev", "bk", "mkey", "lu")
      .agg(collect_list(col("outcome")).as("outcomes"))
      .groupBy("game_id", "game_date", "home_team_abbrev", "away_team_abbrev", "bk")
      .agg(collect_list(struct(col("mkey").as("key"), col("lu").as("last_update"),
        col("outcomes"))).as("markets"))
    markets
      .groupBy("game_id", "game_date", "home_team_abbrev", "away_team_abbrev")
      .agg(collect_list(struct(col("bk").as("key"), col("bk").as("title"),
        col("markets"))).as("bookmakers"))
      .select(
        struct(
          concat(lit("ev"), col("game_id").cast("string")).as("event_id"),
          lit("player_shots_on_goal").as("market"),
          col("game_date").cast("string").as("game_date"),
          concat(col("home_team_abbrev"), lit(" Club")).as("home_team"),
          concat(col("away_team_abbrev"), lit(" Club")).as("away_team"),
          concat(col("game_date").cast("string"), lit(" 10:00:00")).as("extracted_at"),
          struct(
            concat(col("game_date").cast("string"), lit(" 23:00:00")).as("commence_time"),
            col("bookmakers")).as("data")).as("payload"),
        col("game_id"))
  }
}
