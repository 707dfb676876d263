package graft.nhl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Synthetic multi-hundred-game season: validates the model graph's
  * invariants at a volume where shuffles, windows, and the matching
  * cascade all have real work (the fixtures prove VALUES; this proves
  * SHAPE under volume — grain uniqueness, conservation laws, no fanout).
  */
object NhlSynth {
  private val Teams = Vector("BOS" -> 6L, "TOR" -> 10L, "CAR" -> 12L, "NYR" -> 3L,
    "MTL" -> 8L, "DET" -> 17L, "CHI" -> 16L, "COL" -> 21L)

  /** Deterministic synthetic boxscore bronze: `nGames` final games over a
    * season, 6F+3D per side from stable team rosters, ~30% of games with a
    * stale extra snapshot that dedup must discard.
    */
  def boxscoreBronze(spark: SparkSession, nGames: Int): DataFrame = {
    val rng = new scala.util.Random(42)
    def player(teamIdx: Int, slot: Int, pos: String, sog: Int, goals: Int): String = {
      val pid = 8400000L + teamIdx * 100 + slot
      s"""{"playerId": $pid, "name": {"default": "P$teamIdx N$slot"}, "position": "$pos",
         |"goals": $goals, "assists": ${rng.nextInt(3)}, "points": 0, "plusMinus": 0,
         |"sog": $sog, "pim": 0, "hits": ${rng.nextInt(5)}, "blockedShots": 1,
         |"giveaways": 1, "takeaways": 1, "powerPlayGoals": 0, "shorthandedGoals": 0,
         |"faceoffWinningPctg": null, "toi": "${10 + rng.nextInt(10)}:${10 + rng.nextInt(49)}",
         |"shifts": 20}""".stripMargin
    }
    val docs = (0 until nGames).flatMap { g =>
      val gameId = 2024020100L + g
      val date = java.time.LocalDate.of(2024, 10, 1).plusDays(g / 4)
      val hIdx = g % Teams.length
      val aIdx = (g + 1 + g / Teams.length) % Teams.length
      if (hIdx == aIdx) Seq.empty
      else {
        val (hAb, hId) = Teams(hIdx); val (aAb, aId) = Teams(aIdx)
        def side(idx: Int): (Seq[String], Seq[String], Int, Int) = {
          val fwd = (0 until 6).map(s => player(idx, s, "C", rng.nextInt(6), if (rng.nextInt(8) == 0) 1 else 0))
          val dfn = (6 until 9).map(s => player(idx, s, "D", rng.nextInt(4), 0))
          (fwd, dfn, rng.nextInt(6) + 1, 20 + rng.nextInt(20))
        }
        val (hF, hD, hScore, hSog) = side(hIdx)
        val (aF, aD, aScore0, aSog) = side(aIdx)
        val aScore = if (aScore0 == hScore) aScore0 + 1 else aScore0 // no ties in hockey
        val doc = NhlFixtures.boxscore(gameId, date.toString, "OFF", if (g % 9 == 0) 4 else 3,
          hId, hAb, hScore, hSog, aId, aAb, aScore, aSog, hF, hD, aF, aD)
        val finalSnap = (doc, s"raw/d=${date.plusDays(1)}/game_id=$gameId/a.json", date.plusDays(1).toString)
        if (g % 3 == 0) {
          val stale = NhlFixtures.boxscore(gameId, date.toString, "LIVE", 2,
            hId, hAb, 0, 5, aId, aAb, 0, 4, hF.take(1), Seq(), aF.take(1), Seq())
          Seq(finalSnap, (stale, s"raw/d=$date/game_id=$gameId/b.json", date.toString))
        } else Seq(finalSnap)
      }
    }
    import spark.implicits._
    docs.toDF("json", "s3_key", "pd")
      .select(from_json(col("json"), Schemas.boxscore).as("payload"), col("s3_key"),
        to_date(col("pd")).as("partition_date"))
      .withColumn("game_id", col("payload.id"))
  }
}

class PipelineScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("model graph holds its invariants over a 300-game synthetic season") {
    val t0 = System.nanoTime()
    val bronze = NhlSynth.boxscoreBronze(spark, 300)
    val stg = Models.stgGames(bronze)
    val pgs = Models.stgPlayerGameStats(bronze)
    val dimP = Models.dimPlayer(pgs)
    val fgr = Models.factGameResults(stg)
    val fpgs = Models.factPlayerGameStats(pgs, dimP)
    val ftgs = Models.factTeamGameStats(stg, pgs)
    val tsm = Metrics.teamShotMetrics(ftgs)
    val psm = Metrics.playerShotMetrics(fpgs)

    val nGames = stg.count()
    assert(nGames > 250, s"dedup should keep one row per game, got $nGames")
    assert(fgr.count() === nGames) // all finals
    // grain uniqueness at volume (the dbt grain tests)
    Quality.checkUnique(stg, Seq("game_id"))
    Quality.checkUnique(fpgs, Seq("game_id", "player_id"))
    Quality.checkUnique(ftgs, Seq("game_id", "team_id"))
    Quality.checkUnique(psm, Seq("player_id", "season"))
    // conservation: player rows = 18 skaters per game exactly
    assert(fpgs.count() === nGames * 18)
    // winner is always one of the two participants, never null (no ties)
    assert(fgr.filter($"winning_team_id".isNull).count() === 0)
    assert(fgr.filter($"winning_team_id" =!= $"home_team_id" &&
      $"winning_team_id" =!= $"away_team_id").count() === 0)
    // rolling metrics: last3 average can never exceed the partition max
    val bad = tsm.groupBy("team_id", "season")
      .agg(max("sog").as("mx"), max("sog_avg_last3").as("mxr"))
      .filter($"mxr" > $"mx" + 1e-9)
    assert(bad.count() === 0)
    // team totals reconcile with player sums (conservation across the join)
    val mismatch = ftgs.join(
      pgs.groupBy("game_id", "team_id").agg(sum("hits").as("player_hits")),
      Seq("game_id", "team_id"))
      .filter($"hits" =!= $"player_hits")
    assert(mismatch.count() === 0)
    info(f"300-game pipeline validated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
