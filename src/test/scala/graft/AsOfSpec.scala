package graft

import java.sql.Timestamp
import graft.ops.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3"),
      (3L, ts("2024-01-01 09:00:00"), "e4") // key with no right rows
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-01 09:00:00"), 300L), // equal time → inclusive match
      (2L, ts("2024-01-01 10:00:00"), 400L)  // after left → ignored
    ).toDF("k", "t", "payload")

    val got = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", Seq("payload"))
      .select("name", "payload").as[(String, Option[Long])].collect().toMap
    assert(got === Map("e1" -> Some(100L), "e2" -> Some(200L),
      "e3" -> Some(300L), "e4" -> None))
  }

  test("asOfJoin preserves left row count (no fanout)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1L),
      (1L, ts("2024-01-01 09:30:00"), 2L)).toDF("k", "t", "payload")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", Seq("payload"))
    assert(out.count() === 2)
    assert(out.select("payload").as[Long].collect().toSeq === Seq(2L, 2L))
  }
}
