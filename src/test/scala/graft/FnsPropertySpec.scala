package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Property-style sweeps for the pure expression helpers (SURVEY §5 test
  * plan). Each property evaluates the Column expression through a DataFrame
  * so it tests the REAL codegen'd path, not a Scala reimplementation; the
  * input grids are deterministic and dense enough to hit every branch and
  * boundary.
  */
class FnsPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("impliedProb is in (0,1); favorites >= 0.5, dogs <= 0.5 — all odds sweeps") {
    val odds = ((-10000 to 10000 by 37) ++ Seq(-101, -100, 100, 101)).filter(_ != 0)
    val rows = odds.toDF("odds")
      .select($"odds", Fns.impliedProb($"odds").as("p")).collect()
    rows.foreach { r =>
      val (o, p) = (r.getInt(0), r.getDouble(1))
      assert(p > 0.0 && p < 1.0, s"odds=$o p=$p")
      if (o <= -100) assert(p >= 0.5, s"favorite $o → $p")
      if (o >= 100) assert(p <= 0.5, s"dog $o → $p")
    }
  }

  test("toiToSeconds inverts MM:SS formatting over the full range") {
    val rows = (for (m <- 0 to 90 by 7; s <- 0 to 59 by 5) yield (f"$m%02d:$s%02d", m * 60 + s))
      .toDF("toi", "expected")
      .select(Fns.toiToSeconds($"toi").as("got"), $"expected").collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("binCoord lands on non-negative multiples of the width, within w/2") {
    for (w <- Seq(1, 5, 10)) {
      val rows = (BigDecimal(-120.0) to BigDecimal(120.0) by BigDecimal(0.7))
        .map(_.toDouble).toDF("x")
        .select($"x", Fns.binCoord($"x", w).as("b")).collect()
      rows.foreach { r =>
        val (x, b) = (r.getDouble(0), r.getInt(1))
        assert(b >= 0 && b % w === 0, s"x=$x w=$w b=$b")
        assert(math.abs(b - math.abs(x)) <= w / 2.0 + 1e-9, s"x=$x w=$w b=$b")
      }
    }
  }

  test("nhlSeason: null exactly Jul-Sep, else consecutive-year code") {
    val rows = (for (y <- 2000 to 2040; m <- 1 to 12) yield f"$y%04d-$m%02d-15")
      .toDF("d")
      .select($"d", Fns.nhlSeason(to_date($"d")).as("season")).collect()
    rows.foreach { r =>
      val d = r.getString(0)
      val (y, m) = (d.take(4).toInt, d.slice(5, 7).toInt)
      if (m >= 7 && m <= 9) assert(r.isNullAt(1), s"$d should be off-season")
      else {
        val s = r.getInt(1)
        val (start, end) = (s / 10000, s % 10000)
        assert(end === start + 1, s"$d → $s")
        if (m >= 10) assert(start === y) else assert(end === y)
      }
    }
  }

  test("normalizeName is idempotent and strips periods/apostrophes") {
    val parts = Seq("Léon", "Draisaitl", "J.T.", "Miller", "O'Ree", "ÅKE", "smith", "Ñunez")
    val names = for (a <- parts; b <- parts) yield s"$a $b"
    val rows = names.toDF("name")
      .select(Fns.normalizeName($"name").as("once")).collect().map(_.getString(0))
    val again = rows.toSeq.toDF("name")
      .select(Fns.normalizeName($"name").as("twice")).collect().map(_.getString(0))
    rows.zip(again).foreach { case (a, b) => assert(a === b, "idempotence") }
    rows.foreach(n => assert(!n.exists(c => c == '.' || c == '\'') && n === n.toUpperCase))
  }
}
