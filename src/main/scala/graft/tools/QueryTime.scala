package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Time SparkEntry queries by name (2 runs each: cold + warm) — the
  * per-query iteration loop behind Bench. Not part of the library surface.
  * Usage: runMain graft.tools.QueryTime <name>[,<name>...] [sfDir]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror Bench's scan-split configs — without them a single-file
      // compute-dense table (sf1 documents) scans as ONE task and every
      // downstream number is a 1-core artifact, not the plan's cost
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[qt] $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
