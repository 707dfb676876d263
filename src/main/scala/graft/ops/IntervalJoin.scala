package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join without a nested loop.
  *
  * A join whose only useful condition is a range predicate
  * (`p BETWEEN s AND e`) has no equi key, so Spark plans it as a
  * BroadcastNestedLoopJoin (or CartesianProduct): every point is tested
  * against every interval — O(|points|·|intervals|) work that stops being
  * viable the moment the interval side outgrows a broadcast. This is the
  * range-join gap the reference never hits (SURVEY §2.4 "Not present:
  * range-bucket joins, interval joins") but a 100 TB event pipeline does.
  *
  * The scale path is bucketing (the same quantize-and-equi-join shape as
  * Flink's interval join and our LSH/banding candidate generation):
  * quantize time into fixed-width buckets, explode each interval into
  * every bucket it overlaps, tag each point with its single bucket,
  * hash-join on the bucket id, and re-check the exact range predicate as
  * a residual. A qualifying (point, interval) pair meets in exactly one
  * bucket — the point's — so the join introduces no duplicates and needs
  * no dedup pass. Cost: |intervals| × (span/bucketWidth + 1) exploded
  * rows plus one equi-shuffle; bucket ids are uniform in event time, so
  * the shuffle is skew-free and AQE-splittable.
  *
  * Pick `bucketDays` ≈ the typical interval span: much smaller explodes
  * the interval side, much larger packs unrelated intervals into each
  * bucket and pushes the work into the residual filter.
  */
object IntervalJoin {

  private val SecsPerDay = 86400L

  /** Inner-joins `points` to every interval containing `points(pointCol)`
    * (inclusive on both ends, SQL BETWEEN semantics). All three columns are
    * timestamps. Output = all columns of `points` then all of `intervals`;
    * the caller projects. The helper bucket column is dropped.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive, got $bucketDays")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "pointInInterval reserves the __bucket column; rename it on the input")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals share columns ${shared.mkString(", ")}; the residual " +
        "range filter would be ambiguous — alias one side first")
    val w = lit(bucketDays * SecsPerDay)
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c) / w).cast("long")
    val pts = points.withColumn("__bucket", bucketOf(col(pointCol)))
    // end < start matches nothing under BETWEEN, but sequence(hi, lo)
    // generates a DESCENDING range — a malformed interval would explode
    // into spurious buckets only to be residual-filtered later. Dropping
    // them first is semantics-preserving and bounds the explode.
    val ivs = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pts.join(ivs, Seq("__bucket"), "inner")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
