package graft.nhl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Rolling / seasonal window-metric models (`team_shot_metrics.sql`,
  * `player_shot_metrics.sql`, `team_shots_against_by_position.sql`) and the
  * shot-location binning models (`player_shot_locations.sql`,
  * `team_shot_locations.sql`).
  *
  * All windows partition by (team|player, season) and order by
  * (game_date, game_id) with exclusively ROWS frames — the reference uses
  * no RANGE frames (SURVEY §2.6). Partition keys are entity-level, so the
  * shuffle distributes by team/player and no window ever needs a global
  * sort.
  */
object Metrics {

  private def regSeason(df: DataFrame): DataFrame = df.filter(col("game_type") === 2) // P4

  /** `team_shot_metrics.sql`: per team-game SOG with 3/5/10-game rolling
    * averages (W4), season-to-date average (W5), and sequence number (W6).
    */
  def teamShotMetrics(factTeamGameStats: DataFrame): DataFrame = {
    val w = Window.partitionBy("team_id", "season")
      .orderBy(col("game_date").asc, col("game_id").asc)
    // ROUND(AVG(sog), 2) as sum/count on the exact rational (Fns.roundDiv2):
    // Snowflake rounds the exact NUMBER average; round-of-double would both
    // mis-round ties and diverge cross-engine.
    def roll(n: Int) = {
      val f = w.rowsBetween(-(n - 1), 0)
      Fns.roundDiv2(sum(col("sog")).over(f), count(col("sog")).over(f))
    }
    val season = w.rowsBetween(Window.unboundedPreceding, 0)
    regSeason(factTeamGameStats)
      .select(col("team_id"), col("team_abbrev"), col("season"), col("game_id"),
        col("game_date"), col("sog"), col("sog_against"), col("goals"))
      .withColumn("sog_avg_last3", roll(3))
      .withColumn("sog_avg_last5", roll(5))
      .withColumn("sog_avg_last10", roll(10))
      .withColumn("sog_avg_season",
        Fns.roundDiv2(sum(col("sog")).over(season), count(col("sog")).over(season)))
      .withColumn("games_played_in_season", row_number().over(w))
  }

  /** `player_shot_metrics.sql`: season totals + per-game averages (A2),
    * team-game recency rank join (J10/W6 DESC), partition-wide team game
    * count (W7), and the rank-gated last-N conditional averages with the
    * eligibility gate (W8, `:84-111,172-209`) — the subtlest window logic
    * in the reference.
    */
  def playerShotMetrics(factPlayerGameStats: DataFrame): DataFrame = {
    val reg = regSeason(factPlayerGameStats)

    // team-game recency rank: 1 = team's most recent game in season.
    // dense_rank over the player rows ≡ row_number over the DISTINCT
    // team-games joined back ((game_date, game_id) is unique per game), but
    // costs ONE shuffle instead of distinct + window + join — and the two
    // windows share a partitioning, so they ride one exchange.
    val wDesc = Window.partitionBy("team_id", "season")
      .orderBy(col("game_date").desc, col("game_id").desc)
    val joined = reg
      .withColumn("team_game_rank", dense_rank().over(wDesc))
      .withColumn("team_total_games",
        max(col("team_game_rank")).over(Window.partitionBy("team_id", "season"))
          .cast("long")) // count-typed, as the distinct-and-count form was

    def lastN(n: Int) = {
      val gamesInWindow = count(when(col("team_game_rank") <= n, lit(1)))
      // eligibility gate (`player_shot_metrics.sql:178-203`): need at least
      // LEAST(n, team_total) - 1 appearances in the window, else NULL
      when(gamesInWindow >= least(lit(n), first(col("team_total_games"))) - 1,
        Fns.roundDiv2(sum(when(col("team_game_rank") <= n, col("sog"))),
          count(when(col("team_game_rank") <= n, col("sog")))))
    }

    joined.groupBy("player_id", "player_name", "position", "team_id", "team_abbrev", "season")
      .agg(
        count(lit(1)).as("games_played"),
        first(col("team_total_games")).as("team_total_games"),
        sum("sog").as("total_sog"),
        sum("goals").as("total_goals"),
        Fns.roundDiv2(sum(col("sog")), count(col("sog"))).as("sog_per_game"),
        Fns.roundDiv2(lit(100) * sum("goals"), sum("sog")).as("shooting_pct"),
        lastN(3).as("sog_avg_last3_team_games"),
        lastN(5).as("sog_avg_last5_team_games"),
        lastN(10).as("sog_avg_last10_team_games"))
  }

  /** `team_shots_against_by_position.sql`: opposing-skater SOG conceded per
    * team-game split by F/D (A3), with rolling and season-to-date windows
    * (W4/W5) over the defending team's games.
    */
  def teamShotsAgainstByPosition(factPlayerGameStats: DataFrame): DataFrame = {
    val reg = regSeason(factPlayerGameStats)
    // one aggregation to (game, side) grain; the swap of each side's sums
    // onto the DEFENDING team is then a window over the game, not a
    // self-join: a game has exactly two side rows, so opponent = game total
    // minus own, and the reference's both-sides-dressed inner-join gate is
    // count-over-game = 2. Same semantics, but ONE pass over the player
    // rows — the self-join form duplicated the whole aggregation subtree
    // into both join branches and paid a join build for a 2-row swap.
    val perSide = reg
      .groupBy("game_id", "season", "game_date", "home_away", "team_id", "team_abbrev")
      .agg(
        sum(when(col("position_type") === "F", col("sog")).otherwise(0)).as("f_sog"),
        sum(when(col("position_type") === "D", col("sog")).otherwise(0)).as("d_sog"),
        sum(col("sog")).as("t_sog"))
    val gw = Window.partitionBy("game_id")
    val perTeam = perSide
      .withColumn("n_sides", count(lit(1)).over(gw))
      .withColumn("sog_against_forwards", sum(col("f_sog")).over(gw) - col("f_sog"))
      .withColumn("sog_against_defense", sum(col("d_sog")).over(gw) - col("d_sog"))
      .withColumn("sog_against_total", sum(col("t_sog")).over(gw) - col("t_sog"))
      .filter(col("n_sides") === 2)
      .drop("n_sides", "f_sog", "d_sog", "t_sog")

    val w = Window.partitionBy("team_id", "season")
      .orderBy(col("game_date").asc, col("game_id").asc)
    def roll(c: String, n: Int) = {
      val f = w.rowsBetween(-(n - 1), 0)
      Fns.roundDiv2(sum(col(c)).over(f), count(col(c)).over(f))
    }
    val season = w.rowsBetween(Window.unboundedPreceding, 0)
    perTeam
      .withColumn("fwd_sog_against_last5", roll("sog_against_forwards", 5))
      .withColumn("def_sog_against_last5", roll("sog_against_defense", 5))
      .withColumn("total_sog_against_season",
        Fns.roundDiv2(sum(col("sog_against_total")).over(season),
          count(col("sog_against_total")).over(season)))
      .withColumn("team_game_number", row_number().over(w))
      .withColumn("fwd_share_pct",
        Fns.roundDiv2(lit(100) * col("sog_against_forwards"), col("sog_against_total")))
  }

  /** `team_shot_locations.sql`: 5-ft |coord| bins (M6/A9), offense+defense
    * contexts unioned with the `goals_against_pct AS shooting_pct` rename
    * (U1 gotcha, `:117`; SURVEY §7.4.7).
    */
  def teamShotLocations(factShotEvents: DataFrame): DataFrame = {
    val shots = regSeason(factShotEvents)
      .filter(col("x_coord").isNotNull && col("y_coord").isNotNull) // P5
      .withColumn("x_bin", Fns.binCoord(col("x_coord"), 5))
      .withColumn("y_bin", Fns.binCoord(col("y_coord"), 5))

    def cell(teamCol: String, context: String) = shots
      .groupBy(col(teamCol).as("team_id"), col("season"), col("x_bin"), col("y_bin"))
      .agg(
        count(lit(1)).as("shot_attempts"),
        sum(when(col("is_goal"), 1).otherwise(0)).as("goals"),
        sum(when(col("event_type") === "shot-on-goal", 1).otherwise(0)).as("shots_on_goal"),
        sum(when(col("event_type") === "missed-shot", 1).otherwise(0)).as("missed_shots"),
        sum(when(col("shot_type") === "wrist", 1).otherwise(0)).as("wrist_shots"),
        sum(when(col("shot_type") === "slap", 1).otherwise(0)).as("slap_shots"))
      .withColumn("shooting_pct",
        Fns.roundDiv2(lit(100) * col("goals"), col("shot_attempts")))
      .withColumn("shot_context", lit(context))

    cell("shooting_team_id", "offense")
      .unionByName(cell("defending_team_id", "defense"))
  }

  /** `player_shot_locations.sql`: per-player heatmap cells (A9 + A3).
    * `shooting_team_id` stays in the grain as in the reference (`:69-77`) —
    * it is what the Bruins serving extract filters on.
    */
  def playerShotLocations(factShotEvents: DataFrame): DataFrame =
    regSeason(factShotEvents)
      .filter(col("x_coord").isNotNull && col("y_coord").isNotNull &&
        col("shooter_player_id").isNotNull)
      .withColumn("x_bin", Fns.binCoord(col("x_coord"), 5))
      .withColumn("y_bin", Fns.binCoord(col("y_coord"), 5))
      .groupBy("shooter_player_id", "shooting_team_id", "season", "x_bin", "y_bin")
      .agg(
        count(lit(1)).as("shot_attempts"),
        sum(when(col("is_goal"), 1).otherwise(0)).as("goals"),
        sum(when(col("event_type") === "shot-on-goal", 1).otherwise(0)).as("shots_on_goal"))
      .withColumn("shooting_pct",
        Fns.roundDiv2(lit(100) * col("goals"), col("shot_attempts")))
}
