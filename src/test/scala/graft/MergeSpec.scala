package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("scd1Upsert: delta wins conflicts, inserts land, base survives, last rev wins") {
    val base = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)
    ).toDF("k", "v", "rev")
    val delta = Seq(
      (2L, "b2", 21L), (2L, "b3", 22L), // two revisions: 22 must win
      (4L, "d", 40L)                    // insert
    ).toDF("k", "v", "rev")
    val got = Merge.scd1Upsert(base, delta, Seq("k"), Seq(col("rev")))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", 10L), (3L, "c", 30L),   // untouched base
      (2L, "b3", 22L),                  // overwritten by the LAST delta rev
      (4L, "d", 40L)))                  // inserted
    // idempotent: re-applying the same delta changes nothing
    val again = Merge.scd1Upsert(
      Merge.scd1Upsert(base, delta, Seq("k"), Seq(col("rev"))),
      delta, Seq("k"), Seq(col("rev")))
      .as[(Long, String, Long)].collect().toSet
    assert(again === got)
    // empty delta is the identity
    val id = Merge.scd1Upsert(base, delta.filter(col("k") < 0),
      Seq("k"), Seq(col("rev")))
      .as[(Long, String, Long)].collect().toSet
    assert(id === base.as[(Long, String, Long)].collect().toSet)
  }
}
