package graft.nhl

import org.apache.spark.sql.types._

/** Explicit payload schemas — the engine's schema-on-read data contract,
  * replacing Snowflake VARIANT + `::` path-casts (SURVEY §1.2). Transcribed
  * from the reference's contract (`docs/data_contracts/nhl_api/boxscore.yml`)
  * and the extraction sites in the dbt models; only fields some model
  * consumes are declared (column pruning then keeps parquet/JSON scans
  * minimal). Missing JSON keys resolve to null — the same semantics as
  * Snowflake's path access.
  */
object Schemas {

  private def s(fields: StructField*): StructType = StructType(fields)
  private def f(name: String, t: DataType): StructField = StructField(name, t, nullable = true)
  private val default = s(f("default", StringType))

  /** Per-player stat line (boxscore.yml:160-186). */
  val playerStats: StructType = s(
    f("playerId", LongType),
    f("name", default),
    f("position", StringType),
    f("goals", IntegerType),
    f("assists", IntegerType),
    f("points", IntegerType),
    f("plusMinus", IntegerType),
    f("sog", IntegerType),
    f("pim", IntegerType),
    f("hits", IntegerType),
    f("blockedShots", IntegerType),
    f("giveaways", IntegerType),
    f("takeaways", IntegerType),
    f("powerPlayGoals", IntegerType),
    f("shorthandedGoals", IntegerType),
    f("faceoffWinningPctg", DoubleType),
    f("toi", StringType),
    f("shifts", IntegerType))

  private val teamSide = s(
    f("id", LongType),
    f("abbrev", StringType),
    f("name", default),
    f("placeName", default),
    f("commonName", default),
    f("score", IntegerType),
    f("sog", IntegerType))

  private val positionGroups = s(
    f("forwards", ArrayType(playerStats)),
    f("defense", ArrayType(playerStats)),
    f("goalies", ArrayType(playerStats)))

  /** Boxscore payload (stg_games.sql:11-31, fact_player_game_stats.sql:11-27). */
  val boxscore: StructType = s(
    f("id", LongType),
    f("season", IntegerType),
    f("gameType", IntegerType),
    f("gameDate", StringType),
    f("gameState", StringType),
    f("venue", default),
    f("periodDescriptor", s(f("number", IntegerType), f("periodType", StringType))),
    f("homeTeam", teamSide),
    f("awayTeam", teamSide),
    f("playerByGameStats", s(f("homeTeam", positionGroups), f("awayTeam", positionGroups))))

  private val playDetails = s(
    f("xCoord", DoubleType),
    f("yCoord", DoubleType),
    f("shotType", StringType),
    f("shootingPlayerId", LongType),
    f("scoringPlayerId", LongType),
    f("goalieInNetId", LongType),
    f("eventOwnerTeamId", LongType),
    f("assist1PlayerId", LongType),
    f("assist2PlayerId", LongType),
    f("homeScore", IntegerType),
    f("awayScore", IntegerType),
    f("reason", StringType))

  /** Play-by-play payload (fact_shot_events.sql:13-84). */
  val pbp: StructType = s(
    f("id", LongType),
    f("gameDate", StringType),
    f("season", IntegerType),
    f("gameType", IntegerType),
    f("homeTeam", s(f("id", LongType), f("abbrev", StringType))),
    f("awayTeam", s(f("id", LongType), f("abbrev", StringType))),
    f("plays", ArrayType(s(
      f("eventId", LongType),
      f("typeDescKey", StringType),
      f("periodDescriptor", s(f("number", IntegerType), f("periodType", StringType))),
      f("timeInPeriod", StringType),
      f("timeRemaining", StringType),
      f("details", playDetails)))))

  /** Weekly schedule payload (bruins_next_opponent.sql:19-33,
    * gamecenter_selection.py:22-72).
    */
  val schedule: StructType = s(
    f("gameWeek", ArrayType(s(
      f("date", StringType),
      f("games", ArrayType(s(
        f("id", LongType),
        f("gameState", StringType),
        f("gameType", IntegerType),
        f("startTimeUTC", StringType),
        f("homeTeam", s(f("id", LongType), f("abbrev", StringType))),
        f("awayTeam", s(f("id", LongType), f("abbrev", StringType))))))))))

  /** Odds props payload wrapper (stg_odds_player_props.sql:22-91,
    * fetch_odds_props.py:219-228).
    */
  val odds: StructType = s(
    f("extracted_at", StringType),
    f("game_date", StringType),
    f("event_id", StringType),
    f("market", StringType),
    f("home_team", StringType),
    f("away_team", StringType),
    f("data", s(
      f("commence_time", StringType),
      f("bookmakers", ArrayType(s(
        f("key", StringType),
        f("title", StringType),
        f("markets", ArrayType(s(
          f("key", StringType),
          f("last_update", StringType),
          f("outcomes", ArrayType(s(
            f("name", StringType),
            f("description", StringType),
            f("point", DoubleType),
            f("price", IntegerType)))))))))))))
}
