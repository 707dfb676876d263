package graft.nhl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed `Dataset[T]` facade over the silver facts — SURVEY §1.3: case-class
  * rows where a stable type earns its keep (compile-time field checks in
  * downstream jobs and tests); `DataFrame` everywhere schemas are dynamic.
  * Encoders are derived, so these stay Tungsten-backed (no Kryo blobs).
  */
object Typed {

  final case class GameResult(
      game_id: Long, season: Int, game_type: Int, game_date: java.sql.Date,
      home_team_id: Long, home_team_abbrev: String, home_team_score: Int,
      away_team_id: Long, away_team_abbrev: String, away_team_score: Int,
      winning_team_id: Option[Long], winning_side: Option[String],
      goal_differential: Int, went_to_overtime: Boolean)

  final case class PlayerGameLine(
      game_id: Long, game_date: java.sql.Date, season: Int, game_type: Int,
      player_id: Long, player_name: String, team_id: Long, team_abbrev: String,
      position_type: String, goals: Int, assists: Int, sog: Int,
      toi_seconds: Option[Int])

  def gameResults(spark: SparkSession, df: DataFrame): Dataset[GameResult] = {
    import spark.implicits._
    df.select("game_id", "season", "game_type", "game_date",
      "home_team_id", "home_team_abbrev", "home_team_score",
      "away_team_id", "away_team_abbrev", "away_team_score",
      "winning_team_id", "winning_side", "goal_differential", "went_to_overtime")
      .as[GameResult]
  }

  def playerGameLines(spark: SparkSession, df: DataFrame): Dataset[PlayerGameLine] = {
    import spark.implicits._
    df.select("game_id", "game_date", "season", "game_type", "player_id",
      "player_name", "team_id", "team_abbrev", "position_type", "goals",
      "assists", "sog", "toi_seconds")
      .as[PlayerGameLine]
  }
}
