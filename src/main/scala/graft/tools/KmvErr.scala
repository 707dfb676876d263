package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.SketchQueries

/** Measure sk_kmv_intersect's relative error per SF — the calibration
  * evidence behind SketchQueries.KmvRelBound. Not part of the library
  * surface. Usage: runMain graft.tools.KmvErr <sfDir> [<sfDir>...]
  */
object KmvErr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val r = SketchQueries.kmvIntersectRaw(spark, dir, SketchQueries.KmvK).collect()(0)
      val exact = r.getAs[Long]("n_exact_intersect")
      val est = r.getAs[Double]("est_intersect")
      println(f"[kmv] $dir exact=$exact est=$est%.1f " +
        f"relerr=${math.abs(est - exact) / exact}%.4f " +
        f"a=${r.getAs[Long]("n_exact_a")} b=${r.getAs[Long]("n_exact_b")}")
    }
    spark.stop()
  }
}
