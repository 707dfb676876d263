package graft.nhl

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The rpt_sog_props_performance cuts (all five as REAL outputs — SURVEY
  * §7.4.11) and the serving extracts.
  */
class ReportSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val out = NhlPipeline.run(spark,
    NhlFixtures.boxscoreBronze(spark),
    NhlFixtures.pbpBronze(spark),
    NhlFixtures.oddsBronze(spark),
    runDate = "2024-10-11", persist = false)

  test("byLineBucket groups settled props into the rpt:50-57 buckets") {
    val cuts = Props.Report.byLineBucket(out.factPlayerSogPropsV2).collect()
      .map(r => r.getAs[String]("line_bucket") -> r.getAs[Long]("n_props")).toMap
    // lines: 3.5, 3.0, 4.5, 2.5, 3.5 → mid(2.5)=1, high(3.0,3.5,3.5)=3, elite(4.5)=1... wait 2.5 twice
    assert(cuts.values.sum === 6L)
    assert(cuts.contains("high (3.0-3.5)"))
  }

  test("byMatchMethod covers exact, normalized, last_name_initial, fuzzy_fallback") {
    val methods = Props.Report.byMatchMethod(out.factPlayerSogPropsV2)
      .select("match_method").as[String].collect().toSet
    assert(methods === Set("exact", "normalized", "last_name_initial", "fuzzy_fallback"))
  }

  test("byPlayer applies the HAVING >= minProps gate") {
    val all = Props.Report.byPlayer(out.factPlayerSogPropsV2, minProps = 1).collect()
    val gated = Props.Report.byPlayer(out.factPlayerSogPropsV2, minProps = 3).collect()
    assert(all.length >= 3)
    // only Pastrnak reaches 3 settled props (e1, e2, and the resolved
    // "D. Pastrnak" row all land on his player_id)
    assert(gated.map(_.getAs[Long]("player_id")).toSeq === Seq(NhlFixtures.Pastrnak))
    assert(Props.Report.byPlayer(out.factPlayerSogPropsV2, minProps = 4).isEmpty)
  }

  test("byDay cuts per game_date") {
    val days = Props.Report.byDay(out.factPlayerSogPropsV2)
      .select("game_date").as[java.sql.Date].collect().map(_.toString).toSet
    assert(days === Set("2024-10-09", "2024-10-10")) // e3 pending excluded
  }

  test("team extract filters and opponent shot-location context join") {
    val bos = Extracts.teamShotEvents(out.factShotEvents, "BOS")
    assert(bos.count() === out.factShotEvents.count()) // all fixture shots involve BOS
    val nextOpp = Extracts.nextOpponent(NhlFixtures.scheduleBronze(spark))
    val oppLoc = Extracts.opponentShotLocations(out.teamShotLocations, out.dimTeam, nextOpp)
    // next opponent is CAR; CAR has no PBP in fixtures → empty but runnable
    assert(oppLoc.columns.contains("shot_context"))
    assert(oppLoc.filter($"team_abbrev" =!= "CAR").count() === 0)
  }

  test("csv export sink writes a single headered file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/rpt"
    Extracts.exportCsv(out.rptOverall, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 1)
    assert(back.columns.contains("over_hit_pct"))
  }
}
