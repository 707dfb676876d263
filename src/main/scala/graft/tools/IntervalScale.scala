package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin
import graft.sources.Tables

/** Diagnostic (not a pipeline path): scaling behavior of the bucketed
  * interval join as the interval side densifies — the axis that kills the
  * nested-loop form quadratically. custkey%1000 (the j12 shape, ~1.4k
  * intervals at sf0.1) → %100 (10×) → %10 (100×). Cost should track the
  * OUTPUT pair count (the join is candidate-exact per bucket), not the
  * point×interval product. Results recorded in BENCH_NOTES.md round 5.
  * Run: `sbt "runMain graft.tools.IntervalScale [sfDir]"`.
  */
object IntervalScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    Seq(1000L, 100L, 10L).foreach { mod =>
      val ivs = Tables.orders(spark, sfDir)
        .filter(col("o_custkey") % mod === 0)
        .select(col("o_orderkey").as("iv_key"), col("o_orderdate").as("iv_start"),
          (col("o_orderdate") + expr("INTERVAL 6 DAYS")).as("iv_end"))
      val nIv = ivs.count()
      // warm once, then time 3 and take the median (ScaleBench idiom)
      def run(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = IntervalJoin.pointInInterval(
          pts, "l_shipdate", ivs, "iv_start", "iv_end", bucketDays = 7).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run()
      val rs = Seq.fill(3)(run())
      val med = rs.map(_._1).sorted.apply(1)
      // the nested-loop control: the plan Spark picks for the raw range
      // predicate (BroadcastNestedLoopJoin) — |points|×|intervals| probes
      def naive(): Double = {
        val t0 = System.nanoTime()
        pts.join(ivs, col("l_shipdate").between(col("iv_start"), col("iv_end"))).count()
        (System.nanoTime() - t0) / 1e9
      }
      naive()
      val nMed = Seq.fill(3)(naive()).sorted.apply(1)
      println(f"[ivscale] mod=$mod%-5d intervals=$nIv%-7d pairs=${rs.head._2}%-9d "
        + f"bucketed=$med%.2f s nested_loop=$nMed%.2f s")
    }
    spark.stop()
  }
}
