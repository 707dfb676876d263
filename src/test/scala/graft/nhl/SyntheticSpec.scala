package graft.nhl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the invariants of the TPC-H→NHL derivation that the driver oracle
  * cannot see directly: the decoy snapshots really exist and really lose,
  * the planted crosswalk traps really fire, and the P5 null-player rows
  * really are dropped by the model (not absent from the input).
  */
class SyntheticSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("boxscore bronze carries decoy snapshots and latestSnapshot discards them") {
    val bronze = Synthetic.bronzeBoxscore(spark, dir).cache()
    val decoys = bronze.filter(col("payload.gameState") === "LIVE")
    assert(decoys.count() > 0, "no decoy snapshots planted")
    // every game_id % 3 == 0 has exactly two snapshots, others one
    val counts = bronze.groupBy("game_id").count()
      .withColumn("want", when(col("game_id") % 3 === 0, 2L).otherwise(1L))
    assert(counts.filter(col("count") =!= col("want")).count() === 0)
    // the staged model must contain zero LIVE rows and zero decoy sogs
    val stg = Models.stgGames(bronze)
    assert(stg.filter(col("game_state") === "LIVE").count() === 0)
    // decoy scores are final+1: a surviving decoy would break this equality
    val finals = Synthetic.games(spark, dir)
      .select(col("game_id"), col("home_score"))
    val joined = stg.join(finals, "game_id")
    assert(joined.filter(col("home_team_score") =!= col("home_score")).count() === 0)
    bronze.unpersist()
  }

  test("null-player rows exist in bronze and are dropped by the flatten guard") {
    val pr = Synthetic.playerRows(spark, dir)
    assert(pr.filter(col("player_id").isNull).count() > 0)
    val stg = Models.stgPlayerGameStats(Synthetic.bronzeBoxscore(spark, dir))
    assert(stg.filter(col("player_id").isNull).count() === 0)
    // flatten round-trip is lossless on the non-null rows
    assert(stg.count() === pr.filter(col("player_id").isNotNull).count())
  }

  test("crosswalk traps fire: all three strategies match, Kane cohort is ambiguous") {
    val odds = Props.stgOddsPlayerProps(Synthetic.bronzeOdds(spark, dir))
    val f = {
      val st = Models.stgPlayerGameStats(Synthetic.bronzeBoxscore(spark, dir))
      Models.factPlayerGameStats(st, Models.dimPlayer(st))
    }
    val xw = Props.stgPlayerNameCrosswalk(odds, f).cache()
    val methods = xw.select("match_method").distinct().collect().map(_.getString(0)).toSet
    assert(methods === Set("exact", "normalized", "last_name_initial"))
    // the Kane full-name collision (p=0 vs p=707 → 'Alex Kane') is gate-killed
    // wherever both appear; at sf0.001 only one Kane per initial exists, so
    // Kanes pass — pin instead that the gate keeps every name unique
    assert(xw.groupBy("odds_player_name").count().filter(col("count") > 1).count() === 0)
    xw.unpersist()
  }

  test("odds bronze plants the pivot traps: missing Unders and competing books") {
    val odds = Props.stgOddsPlayerProps(Synthetic.bronzeOdds(spark, dir)).cache()
    val sides = odds.filter(col("market_key") === "player_shots_on_goal")
      .groupBy("event_id", "odds_player_name", "bookmaker_key")
      .agg(countDistinct("bet_type").as("n"))
    assert(sides.filter(col("n") === 1).count() > 0, "no missing-Under props")
    assert(odds.filter(col("bookmaker_key") === "caesars").count() > 0)
    assert(odds.filter(col("market_key") === "player_points").count() > 0)
    // null descriptions were filtered by the flatten guard
    assert(odds.filter(col("odds_player_name").isNull).count() === 0)
    odds.unpersist()
  }
}
