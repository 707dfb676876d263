package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.queries.SketchQueries

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

  test("sk_hll_card gate: green at its shipped bound, non-vacuous at 1e-4") {
    import graft.queries.SketchQueries
    val shipped = SketchQueries.hllCard(spark, sf("sf0.01"), SketchQueries.HllRelBound)
    assert(shipped.filter(!col("hll_within_bound")).count() === 0)
    // the boolean must actually measure the sketch: an absurdly tight
    // bound flips at least one group false (HLL error ~1e-2, never ~1e-4)
    val tight = SketchQueries.hllCard(spark, sf("sf0.01"), 1e-4)
    assert(tight.filter(!col("hll_within_bound")).count() > 0,
      "tight-bound gate stayed green — the gate is vacuous")
  }

  test("sk_approx_quantile gate: green at its shipped bound, non-vacuous at 1e-9") {
    import graft.queries.SketchQueries
    val shipped = SketchQueries.approxQuantile(spark, sf("sf0.01"), SketchQueries.PctRelBound)
    assert(shipped.filter(!col("gk_within_bound")).count() === 0)
    // GK returns an actual data value; the exact interpolated median of an
    // even-count group generally is not one, so drift is > 0 and a 1e-9
    // bound flips the gate (verified against the fixed testdata)
    val tight = SketchQueries.approxQuantile(spark, sf("sf0.01"), 1e-9)
    assert(tight.filter(!col("gk_within_bound")).count() > 0,
      "tight-bound gate stayed green — the gate is vacuous")
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

  test("freqItems: MG containment + undercount bound hold across partitionings") {
    import graft.functions.FreqSketch
    // 1000 'hot' (10%), 500 'warm', and 2000 distinct cold singletons
    val items = (Seq.fill(1000)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 2000).map(i => s"cold$i"))
    for (parts <- Seq(1, 8)) {
      val ds = spark.createDataset(items).repartition(parts)
      val m = ds.select(FreqSketch.freqItems(64)).collect()(0)
      val n = items.size
      // containment: every item with count > n/65 (~54) is present
      assert(m.contains("hot") && m.contains("warm"), s"parts=$parts m=$m")
      // estimates never overcount, and undercount at most n/(cap+1)
      assert(m("hot") <= 1000 && m("hot") >= 1000 - n / 65)
      assert(m("warm") <= 500 && m("warm") >= 500 - n / 65)
      assert(m.size <= 64)
    }
  }

  test("sk_freq_items gate: green as shipped; data-derived (capacity 1 misses)") {
    import graft.queries.SketchQueries
    val row = SketchQueries.freqItems(spark, sf("sf0.01"),
      SketchQueries.FreqItemsCapacity).collect()(0)
    assert(row.getAs[Long]("n_heavy") > 0, "no heavy hitters — gate vacuous")
    assert(row.getAs[Boolean]("mg_ok"))
    // data-derivedness: a ONE-counter sketch cannot retain the 30-token
    // heavy tier, so replaying the containment check against the SAME
    // capacity-64 threshold with a starved sketch must find misses
    import graft.functions.FreqSketch
    import graft.ops.TextOps
    val toks = Tables.documents(spark, sf("sf0.01"))
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
    val starved = toks.as[String].select(FreqSketch.freqItems(1)).collect()(0)
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val heavy = exact.filter(_._2 * 65 > n).map(_._1)
    assert(heavy.nonEmpty && !heavy.forall(starved.contains),
      "capacity-1 sketch retained every heavy token — the gate is vacuous")
  }

  test("sk_hll_union: mergeable (union of shard sketches == one global sketch), gated, non-vacuous") {
    import graft.ops.TextOps
    val dir = sf("sf0.01")
    val sh = Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextOps.shinglesFromTokens(TextOps.tokens(col("text")), 3)).as("sh"))
    // THE mergeability property: estimating from unioned per-source
    // partials agrees with one direct sketch over the whole corpus.
    // Agreement is within a tight band, not bit-equality: a DataSketches
    // union carries an HLL_8 gadget while the direct path stays HLL_4,
    // so the two estimators differ in a few low-order coupons (measured
    // 16392 vs 16348 here, 0.27%)
    val viaUnion = sh.groupBy("source").agg(hll_sketch_agg(col("sh")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).collect()(0).getLong(0)
    val direct = sh.agg(hll_sketch_estimate(hll_sketch_agg(col("sh"))))
      .collect()(0).getLong(0)
    assert(math.abs(viaUnion - direct).toDouble / direct < 0.01,
      s"union=$viaUnion direct=$direct")
    // deterministic + green at the shipped bound
    val run1 = SketchQueries.hllUnion(spark, dir, SketchQueries.HllUnionRelBound)
      .collect()(0)
    val run2 = SketchQueries.hllUnion(spark, dir, SketchQueries.HllUnionRelBound)
      .collect()(0)
    assert(run1.toSeq === run2.toSeq)
    assert(run1.getAs[Boolean]("hll_union_within_bound"))
    // non-vacuous: an absurdly tight bound flips the gate
    assert(!SketchQueries.hllUnion(spark, dir, 1e-7)
      .collect()(0).getAs[Boolean]("hll_union_within_bound"))
  }
}
