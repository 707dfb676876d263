package graft.nhl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-layer extracts: schedule-driven selections, Bruins row-reduction
  * extracts (sized for the reference's ~25k-row serving ceiling,
  * `.context/DECISIONS.md:477-518`), and export sinks (S8).
  */
object Extracts {

  /** `gamecenter_selection.py:22-72`: final-game ids from a schedule payload
    * — double flatten (F5), final-state + 10-digit-id filters, ordered
    * order-preserving dedup, cap 30 (O5).
    */
  def extractFinalGameIds(scheduleBronze: DataFrame, maxGames: Int = 30): DataFrame =
    scheduleBronze
      .select(explode(col("payload.gameWeek")).as("wk"))
      .select(col("wk.date").as("day"), explode(col("wk.games")).as("g"))
      .filter(col("g.gameState").isin("OFF", "OVER", "FINAL", "OFFICIAL"))
      .filter(col("g.id").between(1000000000L, 9999999999L)) // 10-digit ids
      .select(col("g.id").as("game_id"), col("day"))
      .groupBy("game_id").agg(min("day").as("first_day"))
      .orderBy(col("first_day").asc, col("game_id").asc)
      .limit(maxGames)
      .select("game_id")

  /** `bruins_next_opponent.sql`: latest schedule snapshot (O1) → double
    * flatten (F5) → upcoming Bruins games → next by date (O1) → opponent
    * derivation (`:43-55`).
    */
  def nextOpponent(scheduleBronze: DataFrame, teamAbbrev: String = "BOS"): DataFrame =
    scheduleBronze
      .orderBy(col("ingest_ts").desc).limit(1) // latest snapshot
      .select(explode(col("payload.gameWeek")).as("wk"))
      .select(explode(col("wk.games")).as("g"))
      .filter(col("g.gameState").isin("FUT", "PRE"))
      .filter(col("g.homeTeam.abbrev") === teamAbbrev || col("g.awayTeam.abbrev") === teamAbbrev)
      .select(
        col("g.id").as("game_id"),
        to_date(col("g.startTimeUTC")).as("game_date"),
        when(col("g.homeTeam.abbrev") === teamAbbrev, col("g.awayTeam.abbrev"))
          .otherwise(col("g.homeTeam.abbrev")).as("opponent_abbrev"),
        (col("g.homeTeam.abbrev") === teamAbbrev).as("is_home"))
      .orderBy(col("game_date").asc, col("game_id").asc)
      .limit(1)

  /** `bruins_shot_events.sql:10-12` (P7). */
  def teamShotEvents(factShotEvents: DataFrame, teamAbbrev: String = "BOS"): DataFrame =
    factShotEvents.filter(
      col("home_team_abbrev") === teamAbbrev || col("away_team_abbrev") === teamAbbrev)

  /** `bruins_opponent_shot_locations.sql:21-23`: opponent defensive heatmap
    * cells, scalar next-opponent context attached via 1-row cross join (J8).
    */
  def opponentShotLocations(teamShotLocations: DataFrame, dimTeam: DataFrame,
                            nextOpp: DataFrame): DataFrame =
    teamShotLocations
      .filter(col("shot_context") === "defense")
      .join(broadcast(dimTeam.select("team_id", "team_abbrev")), Seq("team_id"))
      .join(broadcast(nextOpp.select(col("opponent_abbrev"))),
        col("team_abbrev") === col("opponent_abbrev"))

  /** `bruins_player_shot_locations.sql:9-11`: Bruins-only player heatmap
    * cells for the sheet-sized serving layer — dim join for the abbrev
    * (broadcast: 32 teams), then the P2 filter.
    */
  def bruinsPlayerShotLocations(playerShotLocations: DataFrame, dimTeam: DataFrame,
                                teamAbbrev: String = "BOS"): DataFrame =
    playerShotLocations
      .join(broadcast(dimTeam.select(col("team_id"), col("team_abbrev"))),
        col("shooting_team_id") === col("team_id"))
      .drop("team_id")
      .filter(col("team_abbrev") === teamAbbrev)

  /** `bruins_team_shot_locations.sql:9-13`: Bruins-only team heatmap cells,
    * keeping BOTH contexts — offense (shots by) and defense (shots against).
    */
  def bruinsTeamShotLocations(teamShotLocations: DataFrame, dimTeam: DataFrame,
                              teamAbbrev: String = "BOS"): DataFrame =
    teamShotLocations
      .join(broadcast(dimTeam.select(col("team_id"), col("team_abbrev"))), Seq("team_id"))
      .filter(col("team_abbrev") === teamAbbrev)

  /** S8: full-table export sink — header CSV, single file for sheet-sized
    * extracts (collect-to-driver-scale tables only; big tables export
    * partitioned).
    */
  def exportCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S8 both-modes export: tables at or under the serving ceiling (the
    * reference's ~25k-row Sheets/Tableau limit, `.context/DECISIONS.md:482-487`)
    * export as ONE headered CSV; bigger tables export partitioned, plus a
    * `_manifest.json` listing the part files and the row count so a serving
    * loader can stitch or reject deterministically.
    *
    * Returns the exported row count. The count() is one extra job over the
    * (already small, already computed) extract — not a scale risk; the data
    * itself never funnels through the driver.
    */
  def exportCsvWithManifest(df: DataFrame, path: String,
                            servingCeiling: Long = 25000L): Long = {
    val n = df.count()
    val single = n <= servingCeiling
    exportCsv(df, path, singleFile = single)

    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val parts = fs.listStatus(p).map(_.getPath.getName)
      .filter(f => f.startsWith("part-") && f.endsWith(".csv")).sorted
    val manifest =
      s"""{"row_count": $n, "mode": "${if (single) "single_file" else "partitioned"}",
         | "files": [${parts.map(f => "\"" + f + "\"").mkString(", ")}]}""".stripMargin
    val out = fs.create(new org.apache.hadoop.fs.Path(p, "_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    n
  }
}
