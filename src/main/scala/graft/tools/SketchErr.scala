package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Diagnostic (not a pipeline path): measures the actual relative error of
  * the two sketches gated by `SketchQueries`, per SF, so the shipped bounds
  * (`HllRelBound`, `PctRelBound`) cite measurements instead of guesses —
  * same evidence pattern as the Recall* tools. Run:
  * `sbt "runMain graft.tools.SketchErr"`.
  */
object SketchErr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val hll = Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id"), rsd = 0.05).as("hll"))
        .select(col("event_type"),
          (abs(col("hll") - col("exact")) / col("exact")).as("rel_err"))
        .collect()
      hll.foreach(r => println(
        f"[$sf] hll ${r.getString(0)}%-10s rel_err=${r.getDouble(1)}%.5f"))
      val gk = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("gk"))
        .select(col("l_returnflag"),
          (abs(col("gk") - col("exact")) / col("exact")).as("rel_err"))
        .collect()
      gk.foreach(r => println(
        f"[$sf] gk  ${r.getString(0)}%-10s rel_err=${r.getDouble(1)}%.7f"))
    }
    spark.stop()
  }
}
