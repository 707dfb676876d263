package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch aggregates (beyond the reference — the 100 TB tier of §2.5).
  *
  * The reference's validators use exact `COUNT(DISTINCT)`
  * (`query/validate_bronze.py:65-96`) and the engine carries exact
  * percentiles (`a13_percentile`); both are the correct oracle face but the
  * wrong production default at 100 TB — exact distinct shuffles every
  * distinct key and exact percentiles sort every group. The sketch forms
  * (HyperLogLog++ `approx_count_distinct`, Greenwald-Khanna
  * `percentile_approx`) aggregate in fixed memory per group and one
  * map-side pass, which is why they exist in this pack as first-class
  * operators rather than a footnote.
  *
  * Driver-checkability follows the `ann_ivf_recall` pattern: a sketch's
  * raw output is engine-internal (DuckDB's HLL and Spark's HLL++ disagree
  * by design), so each query emits the EXACT value — which the DuckDB
  * oracle recomputes bit-identically — alongside a boolean asserting the
  * sketch landed within its documented error bound. Both Spark sketches
  * are deterministic for fixed input (no RNG), so the booleans are stable
  * across runs; a genuine sketch regression flips them and the driver row
  * goes red. `SketchSpec` pins non-vacuity (an absurdly tight bound DOES
  * flip the gate false).
  */
object SketchQueries extends QueryPack {

  /** HLL++ at rsd=0.05: measured relative error on events.user_id
    * (graft.tools.SketchErr) is 0.0067 at sf0.01 and 0.0667 at sf0.1 —
    * identical across the 5 event_type groups because every user emits
    * every event type, so the distinct sets (and the sketch) coincide.
    * The bound is 3σ of the configured rsd and >2× the measured worst.
    */
  val HllRelBound = 0.15

  /** percentile_approx at accuracy=10000 picks a member within rank
    * error ≈ n/10000 of the true quantile; lineitem groups are ≤~260k rows
    * at sf0.1 → rank error ≤ ~26 rows. Measured relative value error
    * (graft.tools.SketchErr) ≤ 2.1e-4 at both SFs vs the exact
    * interpolated median; 0.02 gives ~100× headroom while still failing
    * on any real sketch break (wrong rank math lands orders of magnitude
    * off).
    */
  val PctRelBound = 0.02

  /** HLL cardinality with an exactness gate: one pass, fixed ~kB of state
    * per (partition, group) vs countDistinct's per-key shuffle. `bound` is
    * parameterized so SketchSpec can pin the gate's non-vacuity.
    */
  def hllCard(s: SparkSession, dir: String, bound: Double): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd = 0.05).as("n_hll"))
      .select(
        col("event_type"),
        col("n_exact"),
        (abs(col("n_hll") - col("n_exact")) / col("n_exact") <= bound)
          .as("hll_within_bound"))

  /** GK quantile sketch with an exactness gate: the exact interpolated
    * median (a13's cross-engine face) plus a bound on the sketch's drift
    * from it. At scale the sketch replaces a per-group full sort.
    */
  def approxQuantile(s: SparkSession, dir: String, bound: Double): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("median_exact"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("m_gk"))
      .select(
        col("l_returnflag"),
        col("median_exact"),
        (abs(col("m_gk") - col("median_exact")) / col("median_exact") <= bound)
          .as("gk_within_bound"))

  val queries: Map[String, Q] = Map(
    "sk_hll_card" -> (hllCard(_, _, HllRelBound)),
    "sk_approx_quantile" -> (approxQuantile(_, _, PctRelBound))
  )

  val oracles: Map[String, String] = Map(
    "sk_hll_card" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        |  true AS hll_within_bound
        |FROM events GROUP BY 1""".stripMargin,
    "sk_approx_quantile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_exact,
        |  true AS gk_within_bound
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
