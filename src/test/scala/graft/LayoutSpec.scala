package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: interleave correctness and the pruning property the
  * operator exists for (small per-partition bounding boxes in BOTH
  * dimensions).
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue: hand-computed Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    // (3,5): x bits 011 land at even positions 0,2; y bits 101 at odd
    // positions 1,5 -> 1 + 4 + 2 + 32 = 39
    assert(got === Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("zValue: quadtree prefix — coarse z of the cell == high bits of fine z") {
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val bad = pts.toDF("x", "y")
      .select(
        shiftright(Layout.zValue(col("x"), col("y"), 8), 8).as("hi"),
        Layout.zValue(shiftright(col("x"), 4), shiftright(col("y"), 4), 4).as("cell"))
      .filter(col("hi") =!= col("cell")).count()
    assert(bad === 0L, "z >> 8 must equal the z-value of the 16x16 cell")
  }

  test("clusterByZ: partitions are z-contiguous with bounded (x,y) boxes") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y").repartition(13) // deliberately scrambled input
    val clustered = Layout.clusterByZ(grid, col("x"), col("y"), bits = 6,
      numPartitions = 16)
    val stats = clustered
      .select(spark_partition_id().as("pid"), col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 6).as("z"))
      .groupBy("pid")
      .agg(min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        (max(col("x")) - min(col("x")) + 1).as("w"),
        (max(col("y")) - min(col("y")) + 1).as("h"))
      .collect()
    // z-contiguity: range exchange means partition z-intervals don't overlap
    val iv = stats.map(r => (r.getAs[Long]("z_min"), r.getAs[Long]("z_max")))
      .sortBy(_._1)
    assert(iv.sliding(2).forall {
      case Array((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    }, "partition z-ranges must not overlap")
    // pruning property: mean bounding-box area well under the full domain
    // (a random or single-column layout leaves one dimension at width 64
    // -> area 4096-ish per partition; the z-layout's quadtree cells keep
    // the MEAN far below even though a range crossing a quadrant seam can
    // widen individual boxes)
    val meanArea = stats.map(r => r.getAs[Long]("w") * r.getAs[Long]("h"))
      .sum.toDouble / stats.length
    assert(meanArea <= 64 * 64 / 4.0,
      s"mean box area $meanArea exceeds a quarter of the domain")
  }
}
