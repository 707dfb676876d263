package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate aggregates — the 100 TB defaults the oracles can't check
  * (sketch values are engine-specific): bounded-error guarantees against
  * the exact answers.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sf("sf0.01"))

  test("approx_count_distinct within its rsd bound of exact, and deterministic") {
    val exact = ev.agg(countDistinct(col("user_id"))).as[Long].collect()(0)
    val approx = ev.agg(approx_count_distinct(col("user_id"), 0.02)).as[Long].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
    val again = ev.agg(approx_count_distinct(col("user_id"), 0.02)).as[Long].collect()(0)
    assert(approx === again, "HLL sketch must be deterministic")
  }

  test("percentile_approx brackets the exact interpolated percentile") {
    val exact = ev.agg(expr("percentile(value, 0.5)")).as[Double].collect()(0)
    val approx = ev.agg(percentile_approx(col("value"), lit(0.5), lit(10000)))
      .as[Double].collect()(0)
    // with accuracy 10000 over 10k rows the approx answer is an actual
    // data value within a tight quantile band of the exact median
    assert(math.abs(approx - exact) / math.max(1.0, exact) < 0.05,
      s"approx=$approx exact=$exact")
  }
}
