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

  test("asOfJoin with composite keys keeps key-scoped matches only") {
    val left = Seq((1L, "x", ts("2024-01-01 10:00:00"), "e1"),
      (1L, "y", ts("2024-01-01 10:00:00"), "e2")).toDF("k1", "k2", "t", "name")
    val right = Seq((1L, "x", ts("2024-01-01 09:00:00"), 7L)).toDF("k1", "k2", "t", "payload")
    val got = AsOf.asOfJoin(left, right, Seq("k1", "k2"), "t", "t", Seq("payload"))
      .select("name", "payload").as[(String, Option[Long])].collect().toMap
    assert(got === Map("e1" -> Some(7L), "e2" -> None))
  }

  test("collapseNearDups drops exactly the higher ids of qualifying pairs") {
    import graft.ops.Dedup
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val kept = Dedup.collapseNearDups(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("safeDiv yields null on zero denominators, exact quotients otherwise") {
    import graft.functions.Fns
    import org.apache.spark.sql.functions.col
    val df = Seq((10.0, 4.0), (1.0, 0.0)).toDF("x", "y")
      .select(Fns.safeDiv(col("x"), col("y")).as("q"))
    val got = df.as[Option[Double]].collect()
    assert(got(0) === Some(2.5))
    assert(got(1) === None)
  }
}
