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

  test("snapshotDiff: classifies added/removed/changed, drops unchanged") {
    val old = Seq(
      (1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option("c"), 30L), (4L, Option("d"), 40L)
    ).toDF("k", "v", "n")
    val neu = Seq(
      (1L, Option("a"), 10L),   // unchanged — must NOT appear
      (2L, Option("b2"), 20L),  // changed
      (4L, Option("d"), 41L),   // changed (other column)
      (5L, Option("e"), 50L)    // added; 3 removed
    ).toDF("k", "v", "n")
    val got = Merge.snapshotDiff(old, neu, Seq("k"), Seq("v", "n"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("snapshotDiff: NULL transitions are visible changes, not collisions") {
    // the sentinel must distinguish ('a', NULL) from ('a') -- concat_ws
    // alone would hash them identically and a NULL-ing update would
    // silently vanish from the diff
    val old = Seq[(Long, Option[String], Option[String])](
      (1L, Some("a"), Some("x")), (2L, Some("a"), None)).toDF("k", "v", "w")
    val neu = Seq[(Long, Option[String], Option[String])](
      (1L, Some("a"), None), (2L, Some("a"), None)).toDF("k", "v", "w")
    val got = Merge.snapshotDiff(old, neu, Seq("k"), Seq("v", "w"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "changed"))) // key 2: NULL == NULL, unchanged
  }

  test("snapshotDiff: fingerprint is injection-proof (delimiters, sentinel lookalikes)") {
    // per-column fixed-width hashing must distinguish rows a delimiter
    // encoding would collide: ('a|b','c') vs ('a','b|c'), and NULL vs any
    // literal string a sentinel scheme might have reserved ('\N' here)
    val old = Seq[(Long, Option[String], Option[String])](
      (1L, Some("a|b"), Some("c")), (2L, None, Some("x"))).toDF("k", "v", "w")
    val neu = Seq[(Long, Option[String], Option[String])](
      (1L, Some("a"), Some("b|c")), (2L, Some("\\N"), Some("x"))).toDF("k", "v", "w")
    val got = Merge.snapshotDiff(old, neu, Seq("k"), Seq("v", "w"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "changed"), (2L, "changed")))
  }
}
