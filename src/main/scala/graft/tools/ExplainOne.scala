package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Print one query's formatted physical plan — the .explain feedback loop
  * behind the plan-shape notes. Usage: runMain graft.tools.ExplainOne <name> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
