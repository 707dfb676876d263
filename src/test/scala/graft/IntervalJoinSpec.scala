package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private lazy val points = Seq(
    (1L, ts("2024-01-01")), // = iv10 start (inclusive)
    (2L, ts("2024-01-07")), // = iv10 end (inclusive)
    (3L, ts("2024-01-08")), // 1 day past iv10
    (4L, ts("2024-02-15")), // inside both iv20 and iv21 (overlap → 2 matches)
    (5L, ts("2024-03-10")), // matches nothing
    (6L, ts("2024-04-01"))  // = degenerate iv30's single day
  ).toDF("pid", "p_ts")

  private lazy val intervals = Seq(
    (10L, ts("2024-01-01"), ts("2024-01-07")), // spans a 7-day bucket boundary
    (20L, ts("2024-02-10"), ts("2024-02-20")), // overlapping pair
    (21L, ts("2024-02-14"), ts("2024-02-16")),
    (30L, ts("2024-04-01"), ts("2024-04-01")), // zero-length (single instant)
    (40L, ts("2024-05-10"), ts("2024-05-01"))  // malformed end<start: matches nothing
  ).toDF("ivid", "s_ts", "e_ts")

  private def naive = points.join(intervals,
      col("p_ts").between(col("s_ts"), col("e_ts")))
    .select("pid", "ivid").as[(Long, Long)].collect().toSet

  test("bucketed interval join ≡ naive range join (boundaries, overlap, degenerate, malformed)") {
    val got = IntervalJoin.pointInInterval(
        points, "p_ts", intervals, "s_ts", "e_ts", bucketDays = 7)
      .select("pid", "ivid").as[(Long, Long)].collect().toList
    assert(got.toSet === naive)
    assert(got.size === got.toSet.size, "bucketing must not duplicate pairs")
    assert(got.toSet === Set((1L, 10L), (2L, 10L), (4L, 20L), (4L, 21L), (6L, 30L)))
  }

  test("equivalence holds across bucket widths (1, 3, 30 days)") {
    Seq(1, 3, 30).foreach { w =>
      val got = IntervalJoin.pointInInterval(
          points, "p_ts", intervals, "s_ts", "e_ts", bucketDays = w)
        .select("pid", "ivid").as[(Long, Long)].collect().toList
      assert(got.toSet === naive, s"bucketDays=$w")
      assert(got.size === got.toSet.size, s"bucketDays=$w duplicated pairs")
    }
  }

  test("j12 plans a hash/merge equi-join on the bucket — never a nested loop") {
    val df = SparkEntry.queries("j12_interval_bucket")(spark, sf("sf0.001"))
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ()) // AQE: executedPlan is final only after running
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must be bucketed into an equi-join, not a nested loop:\n" + p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected an equi-join on the bucket id:\n" + p)
  }
}
