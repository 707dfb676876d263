package graft.nhl

import java.nio.file.{Files, Paths}
import graft.SparkTestBase

/** Drives the RunPipeline main end-to-end: fixture JSON on disk in the
  * reference's raw key layout → silver parquet on disk.
  */
class RunPipelineSpec extends SparkTestBase {

  test("RunPipeline ingests raw JSON keys and writes the full silver layer") {
    spark.range(1).count() // materialize the shared session before main()
    val root = Files.createTempDirectory("graft_e2e").toString
    def put(rel: String, content: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("raw/nhl/game_boxscore/date=2024-10-09/hour=23/game_id=2024020001/snap.json", NhlFixtures.g1Partial)
    put("raw/nhl/game_boxscore/date=2024-10-10/hour=03/game_id=2024020001/snap.json", NhlFixtures.g1Final)
    put("raw/nhl/game_boxscore/date=2024-10-11/hour=03/game_id=2024020002/snap.json", NhlFixtures.g2Final)
    put("raw/nhl/game_boxscore/date=2024-10-11/hour=03/game_id=2024020003/snap.json", NhlFixtures.g3Future)
    put("raw/nhl/game_pbp/date=2024-10-10/hour=03/game_id=2024020001/snap.json", NhlFixtures.pbpG1)
    NhlFixtures.oddsDocs.zipWithIndex.foreach { case (doc, i) =>
      put(s"raw/odds/player_props/market=player_shots_on_goal/date=2024-10-0$i/event_e$i.json", doc)
    }

    val silver = s"$root/silver"
    RunPipeline.main(Array(root, silver, "2024-10-11"))

    val fgr = spark.read.parquet(s"$silver/fact_game_results")
    assert(fgr.count() === 2) // FUT filtered
    assert(Files.exists(Paths.get(silver, "fact_game_results/season=20242025")),
      "facts must be partitioned by season")
    val v2 = spark.read.parquet(s"$silver/fact_player_sog_props_v2")
    assert(v2.filter(org.apache.spark.sql.functions.col("outcome") === "over").count() >= 2)
    val rpt = spark.read.parquet(s"$silver/rpt_sog_props_performance")
    assert(rpt.count() === 1)
    Seq("dim_team", "dim_player", "dim_date", "team_shot_metrics",
      "player_shot_metrics", "team_shot_locations", "stg_player_name_crosswalk")
      .foreach(t => assert(spark.read.parquet(s"$silver/$t").count() > 0, t))
  }
}
