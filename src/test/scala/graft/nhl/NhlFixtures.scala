package graft.nhl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic NHL JSON fixtures (FIXTURES.md §§2-5): tiny, deterministic,
  * hand-written to cover the reference's edge cases — multi-snapshot dedup,
  * OT games, non-final games, two-team players, null coords, accented /
  * initialed / ambiguous odds names, push lines, pending games.
  */
object NhlFixtures {

  private def player(id: Long, name: String, pos: String, goals: Int, assists: Int,
                     sog: Int, hits: Int, toi: String, fow: String = "null"): String =
    s"""{"playerId": $id, "name": {"default": "$name"}, "position": "$pos",
       |"goals": $goals, "assists": $assists, "points": ${goals + assists},
       |"plusMinus": 1, "sog": $sog, "pim": 0, "hits": $hits, "blockedShots": 1,
       |"giveaways": 1, "takeaways": 2, "powerPlayGoals": 0, "shorthandedGoals": 0,
       |"faceoffWinningPctg": $fow, "toi": "$toi", "shifts": 20}""".stripMargin

  def boxscore(gameId: Long, gameDate: String, state: String, periods: Int,
               homeId: Long, homeAb: String, homeScore: Int, homeSog: Int,
               awayId: Long, awayAb: String, awayScore: Int, awaySog: Int,
               homeFwd: Seq[String], homeDef: Seq[String],
               awayFwd: Seq[String], awayDef: Seq[String]): String =
    s"""{"id": $gameId, "season": 20242025, "gameType": 2, "gameDate": "$gameDate",
       |"gameState": "$state", "venue": {"default": "Test Arena"},
       |"periodDescriptor": {"number": $periods, "periodType": "${if (periods > 3) "OT" else "REG"}"},
       |"homeTeam": {"id": $homeId, "abbrev": "$homeAb", "name": {"default": "$homeAb Team"},
       |  "placeName": {"default": "$homeAb City"}, "commonName": {"default": "${homeAb}s"},
       |  "score": $homeScore, "sog": $homeSog},
       |"awayTeam": {"id": $awayId, "abbrev": "$awayAb", "name": {"default": "$awayAb Team"},
       |  "placeName": {"default": "$awayAb City"}, "commonName": {"default": "${awayAb}s"},
       |  "score": $awayScore, "sog": $awaySog},
       |"playerByGameStats": {
       |  "homeTeam": {"forwards": [${homeFwd.mkString(",")}],
       |               "defense": [${homeDef.mkString(",")}], "goalies": []},
       |  "awayTeam": {"forwards": [${awayFwd.mkString(",")}],
       |               "defense": [${awayDef.mkString(",")}], "goalies": []}}}""".stripMargin

  val Pastrnak = 8479318L
  val McAvoy = 8479325L
  val Marner = 8478483L
  val Miller = 8476468L
  val Draisaitl = 8477934L
  val MarnerTwo = 9000001L // "Marco Marner", the ambiguity trap
  val TradeGuy = 9999999L

  // g1 2024-10-09: BOS(6) home 4-2 TOR(10), REG. Two snapshots: partial then final.
  val g1Partial: String = boxscore(2024020001L, "2024-10-09", "LIVE", 2,
    6, "BOS", 2, 18, 10, "TOR", 1, 9,
    homeFwd = Seq(player(Pastrnak, "David Pastrnak", "R", 1, 0, 3, 1, "10:00")),
    homeDef = Seq(player(McAvoy, "Charlie McAvoy", "D", 0, 0, 1, 2, "11:00")),
    awayFwd = Seq(player(Marner, "Mitch Marner", "R", 1, 0, 2, 0, "10:30")),
    awayDef = Seq())
  val g1Final: String = boxscore(2024020001L, "2024-10-09", "OFF", 3,
    6, "BOS", 4, 32, 10, "TOR", 2, 24,
    homeFwd = Seq(player(Pastrnak, "David Pastrnak", "R", 1, 2, 5, 3, "18:42")),
    homeDef = Seq(player(McAvoy, "Charlie McAvoy", "D", 0, 1, 2, 4, "22:10")),
    awayFwd = Seq(
      player(Marner, "Mitch Marner", "R", 1, 1, 4, 1, "19:05"),
      player(Miller, "J.T. Miller", "C", 0, 0, 3, 2, "17:20", fow = "0.58"),
      player(TradeGuy, "Trade Guy", "C", 0, 0, 1, 0, "08:00", fow = "0.41")),
    awayDef = Seq(player(MarnerTwo, "Marco Marner", "D", 0, 0, 1, 3, "15:00")))

  // g2 2024-10-10: CAR(12) home 1-5 BOS(10→BOS away), OT (period 4).
  val g2Final: String = boxscore(2024020002L, "2024-10-10", "OFF", 4,
    12, "CAR", 1, 20, 6, "BOS", 5, 30,
    homeFwd = Seq(
      player(Draisaitl, "Léon Draisaitl", "C", 1, 0, 2, 1, "21:00", fow = "0.52"),
      player(TradeGuy, "Trade Guy", "C", 0, 1, 2, 1, "09:30", fow = "0.44")),
    homeDef = Seq(),
    awayFwd = Seq(player(Pastrnak, "David Pastrnak", "R", 2, 1, 3, 2, "19:55")),
    awayDef = Seq(player(McAvoy, "Charlie McAvoy", "D", 1, 2, 4, 3, "24:01")))

  // g3: future game — must be filtered from every fact (P2).
  val g3Future: String = boxscore(2024020003L, "2024-10-15", "FUT", 0,
    6, "BOS", 0, 0, 12, "CAR", 0, 0, Seq(), Seq(), Seq(), Seq())

  val pbpG1: String =
    s"""{"id": 2024020001, "gameDate": "2024-10-09", "season": 20242025, "gameType": 2,
       |"homeTeam": {"id": 6, "abbrev": "BOS"}, "awayTeam": {"id": 10, "abbrev": "TOR"},
       |"plays": [
       |{"eventId": 102, "typeDescKey": "shot-on-goal",
       | "periodDescriptor": {"number": 1, "periodType": "REG"},
       | "timeInPeriod": "04:13", "timeRemaining": "15:47",
       | "details": {"xCoord": 61.0, "yCoord": -18.5, "shotType": "wrist",
       |   "shootingPlayerId": $Pastrnak, "goalieInNetId": 8479496, "eventOwnerTeamId": 6}},
       |{"eventId": 215, "typeDescKey": "goal",
       | "periodDescriptor": {"number": 2, "periodType": "REG"},
       | "timeInPeriod": "10:00", "timeRemaining": "10:00",
       | "details": {"xCoord": -75.0, "yCoord": 4.0, "shotType": "snap",
       |   "scoringPlayerId": $Pastrnak, "goalieInNetId": 8479496, "eventOwnerTeamId": 6,
       |   "homeScore": 1, "awayScore": 0}},
       |{"eventId": 301, "typeDescKey": "missed-shot",
       | "periodDescriptor": {"number": 3, "periodType": "REG"},
       | "timeInPeriod": "01:02", "timeRemaining": "18:58",
       | "details": {"xCoord": 55.0, "yCoord": 30.0, "shotType": "slap",
       |   "reason": "wide-right", "shootingPlayerId": $Marner, "eventOwnerTeamId": 10}},
       |{"eventId": 350, "typeDescKey": "shot-on-goal",
       | "periodDescriptor": {"number": 3, "periodType": "REG"},
       | "timeInPeriod": "05:00", "timeRemaining": "15:00",
       | "details": {"shotType": "tip-in", "shootingPlayerId": $Marner,
       |   "eventOwnerTeamId": 10}},
       |{"eventId": 400, "typeDescKey": "faceoff", "details": {}}
       |]}""".stripMargin

  val scheduleLatest: String =
    """{"gameWeek": [
      |{"date": "2024-10-09", "games": [
      |  {"id": 2024020001, "gameState": "OFF", "gameType": 2,
      |   "startTimeUTC": "2024-10-09T23:00:00Z",
      |   "homeTeam": {"id": 6, "abbrev": "BOS"}, "awayTeam": {"id": 10, "abbrev": "TOR"}},
      |  {"id": 999999999, "gameState": "OFF", "gameType": 2,
      |   "startTimeUTC": "2024-10-09T23:00:00Z",
      |   "homeTeam": {"id": 7, "abbrev": "BUF"}, "awayTeam": {"id": 8, "abbrev": "MTL"}}]},
      |{"date": "2024-10-15", "games": [
      |  {"id": 2024020050, "gameState": "FUT", "gameType": 2,
      |   "startTimeUTC": "2024-10-15T23:00:00Z",
      |   "homeTeam": {"id": 12, "abbrev": "CAR"}, "awayTeam": {"id": 6, "abbrev": "BOS"}},
      |  {"id": 2024020060, "gameState": "FUT", "gameType": 2,
      |   "startTimeUTC": "2024-10-18T23:00:00Z",
      |   "homeTeam": {"id": 6, "abbrev": "BOS"}, "awayTeam": {"id": 10, "abbrev": "TOR"}}]}
      |]}""".stripMargin

  val scheduleStale: String =
    """{"gameWeek": [{"date": "2024-10-01", "games": [
      |  {"id": 2024020099, "gameState": "FUT", "gameType": 2,
      |   "startTimeUTC": "2024-10-02T23:00:00Z",
      |   "homeTeam": {"id": 6, "abbrev": "BOS"}, "awayTeam": {"id": 99, "abbrev": "XXX"}}]}]}""".stripMargin

  private def outcome(name: String, desc: String, point: Double, price: Int): String =
    s"""{"name": "$name", "description": "$desc", "point": $point, "price": $price}"""

  private def oddsDoc(eventId: String, gameDate: String, bookmakers: String): String =
    s"""{"extracted_at": "${gameDate}T15:00:00+00:00", "game_date": "$gameDate",
       |"event_id": "$eventId", "market": "player_shots_on_goal",
       |"home_team": "Home Team", "away_team": "Away Team",
       |"data": {"commence_time": "${gameDate}T23:00:00Z", "bookmakers": [$bookmakers]}}""".stripMargin

  /** Odds fixtures: exact / normalized / initialed / ambiguous / unmatched
    * names; preferred-bookmaker conflict; push-able integer line; pending
    * game (FIXTURES.md §5 cases).
    */
  val oddsDocs: Seq[String] = Seq(
    // e1 → g1 (2024-10-09): DK preferred over FanDuel for Pastrnak O/U 3.5
    oddsDoc("e1", "2024-10-09",
      s"""{"key": "draftkings", "title": "DraftKings", "markets": [
         |  {"key": "player_shots_on_goal", "last_update": "2024-10-09T14:58:00Z", "outcomes": [
         |    ${outcome("Over", "David Pastrnak", 3.5, -115)},
         |    ${outcome("Under", "David Pastrnak", 3.5, -105)},
         |    ${outcome("Over", "J.T. Miller", 3.0, 100)},
         |    ${outcome("Under", "J.T. Miller", 3.0, -120)},
         |    ${outcome("Over", "D. Pastrnak", 4.5, 120)},
         |    ${outcome("Under", "D. Pastrnak", 4.5, -140)},
         |    ${outcome("Over", "M. Marner", 2.5, 105)},
         |    ${outcome("Over", "Nobody Unknown", 1.5, -110)}]}]},
         |{"key": "fanduel", "title": "FanDuel", "markets": [
         |  {"key": "player_shots_on_goal", "last_update": "2024-10-09T14:50:00Z", "outcomes": [
         |    ${outcome("Over", "David Pastrnak", 3.5, 100)}]}]}""".stripMargin),
    // e2 → g2 (2024-10-10): normalized accent match for Draisaitl; Pastrnak under
    oddsDoc("e2", "2024-10-10",
      s"""{"key": "fanduel", "title": "FanDuel", "markets": [
         |  {"key": "player_shots_on_goal", "last_update": "2024-10-10T14:00:00Z", "outcomes": [
         |    ${outcome("Over", "Leon Draisaitl", 2.5, 110)},
         |    ${outcome("Under", "Leon Draisaitl", 2.5, -130)},
         |    ${outcome("Over", "David Pastrnak", 3.5, -110)},
         |    ${outcome("Under", "David Pastrnak", 3.5, -110)}]}]}""".stripMargin),
    // e3 → future game (2024-10-15): pending
    oddsDoc("e3", "2024-10-15",
      s"""{"key": "draftkings", "title": "DraftKings", "markets": [
         |  {"key": "player_shots_on_goal", "last_update": "2024-10-14T14:00:00Z", "outcomes": [
         |    ${outcome("Over", "David Pastrnak", 2.5, -120)},
         |    ${outcome("Under", "David Pastrnak", 2.5, 100)}]}]}""".stripMargin))

  // ------------------------------------------------------------- DataFrames

  /** Bronze boxscore: multiple snapshots per game with distinct
    * (partition_date, s3_key) — latest must win.
    */
  def boxscoreBronze(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (g1Partial, "raw/nhl/game_boxscore/date=2024-10-09/hour=23/game_id=2024020001/snap.json", "2024-10-09"),
      (g1Final, "raw/nhl/game_boxscore/date=2024-10-10/hour=03/game_id=2024020001/snap.json", "2024-10-10"),
      (g2Final, "raw/nhl/game_boxscore/date=2024-10-11/hour=03/game_id=2024020002/snap.json", "2024-10-11"),
      (g3Future, "raw/nhl/game_boxscore/date=2024-10-11/hour=03/game_id=2024020003/snap.json", "2024-10-11"))
    rows.toDF("json", "s3_key", "pd")
      .select(from_json(col("json"), Schemas.boxscore).as("payload"), col("s3_key"),
        to_date(col("pd")).as("partition_date"))
      .withColumn("game_id", col("payload.id"))
  }

  def pbpBronze(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((pbpG1, "raw/nhl/game_pbp/date=2024-10-10/hour=03/game_id=2024020001/snap.json", "2024-10-10"))
      .toDF("json", "s3_key", "pd")
      .select(from_json(col("json"), Schemas.pbp).as("payload"), col("s3_key"),
        to_date(col("pd")).as("partition_date"))
      .withColumn("game_id", col("payload.id"))
  }

  def scheduleBronze(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((scheduleStale, "raw/nhl/schedule/date=2024-10-01/hour=03/snap.json", "2024-10-01 03:00:00"),
      (scheduleLatest, "raw/nhl/schedule/date=2024-10-11/hour=03/snap.json", "2024-10-11 03:00:00"))
      .toDF("json", "s3_key", "ts")
      .select(from_json(col("json"), Schemas.schedule).as("payload"), col("s3_key"),
        to_timestamp(col("ts")).as("ingest_ts"))
  }

  def oddsBronze(spark: SparkSession): DataFrame = {
    import spark.implicits._
    oddsDocs.zipWithIndex
      .map { case (j, i) => (j, s"raw/odds/player_props/market=player_shots_on_goal/date=2024-10-0$i/event_e$i.json") }
      .toDF("json", "s3_key")
      .select(from_json(col("json"), Schemas.odds).as("payload"), col("s3_key"))
      .withColumn("event_id", col("payload.event_id"))
      .withColumn("partition_date", to_date(col("payload.game_date")))
      .withColumn("market", col("payload.market"))
  }
}
