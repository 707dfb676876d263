package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("roundDiv2: half-away rounding holds for signed numerators AND denominators") {
    assert(one[Double](Fns.roundDiv2(lit(1), lit(8))) === 0.13)    // 0.125 away from zero
    assert(one[Double](Fns.roundDiv2(lit(-1), lit(8))) === -0.13)
    assert(one[Double](Fns.roundDiv2(lit(1), lit(-8))) === -0.13)  // pre-fix gave -0.12
    assert(one[Double](Fns.roundDiv2(lit(-1), lit(-8))) === 0.13)
    assert(one[Any](Fns.roundDiv2(lit(1), lit(0))) === null)
  }

  test("nhlSeason: Oct-Dec rolls forward, Jan-Jun rolls back, Jul-Sep null") {
    assert(one[Int](Fns.nhlSeason(to_date(lit("2024-10-15")))) === 20242025)
    assert(one[Int](Fns.nhlSeason(to_date(lit("2025-02-01")))) === 20242025)
    assert(one[Any](Fns.nhlSeason(to_date(lit("2025-08-01")))) === null)
  }

  test("seasonPhase buckets match dim_date.sql:74-81") {
    assert(one[String](Fns.seasonPhase(to_date(lit("2024-10-15")))) === "Early Season")
    assert(one[String](Fns.seasonPhase(to_date(lit("2025-02-01")))) === "Mid Season")
    assert(one[String](Fns.seasonPhase(to_date(lit("2025-04-01")))) === "Late Season")
    assert(one[String](Fns.seasonPhase(to_date(lit("2025-06-01")))) === "Playoffs")
    assert(one[String](Fns.seasonPhase(to_date(lit("2025-08-01")))) === "Off Season")
  }

  test("dayOfWeek0Sun: 0=Sunday (Snowflake convention, SURVEY §7.4.2)") {
    assert(one[Int](Fns.dayOfWeek0Sun(to_date(lit("2024-10-13")))) === 0) // a Sunday
    assert(one[Int](Fns.dayOfWeek0Sun(to_date(lit("2024-10-14")))) === 1) // Monday
    assert(one[Int](Fns.dayOfWeek0Sun(to_date(lit("2024-10-19")))) === 6) // Saturday
  }

  test("foldAccents + normalizeName") {
    assert(one[String](Fns.foldAccents(lit("Léon Draisaïtl"))) === "LEon DraisaItl")
    assert(one[String](Fns.normalizeName(lit("  Léon  Draisaitl "))) === "LEON  DRAISAITL")
    assert(one[String](Fns.normalizeName(lit("J.T. Miller"))) === "JT MILLER")
  }

  test("lastToken / firstInitial (SPLIT_PART -1 / LEFT 1)") {
    assert(one[String](Fns.lastToken(lit("David Pastrnak"))) === "Pastrnak")
    assert(one[String](Fns.lastToken(lit("single"))) === "single")
    assert(one[String](Fns.firstInitial(lit("David"))) === "D")
  }

  test("impliedProb matches American-odds math (v2.sql:245-253)") {
    assert(math.abs(one[Double](Fns.impliedProb(lit(-110))) - 110.0 / 210.0) < 1e-12)
    assert(math.abs(one[Double](Fns.impliedProb(lit(150))) - 100.0 / 250.0) < 1e-12)
    assert(one[Any](Fns.impliedProb(lit(0))) === null)
  }

  test("toiToSeconds parses MM:SS") {
    assert(one[Int](Fns.toiToSeconds(lit("18:42"))) === 1122)
    assert(one[Int](Fns.toiToSeconds(lit("00:07"))) === 7)
  }

  test("binCoord: 5-ft absolute bins (team_shot_locations.sql:21-22)") {
    assert(one[Int](Fns.binCoord(lit(-61.0), 5)) === 60)
    assert(one[Int](Fns.binCoord(lit(63.0), 5)) === 65)
    assert(one[Int](Fns.binCoord(lit(0.0), 5)) === 0)
  }
}
