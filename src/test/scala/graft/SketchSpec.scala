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

  test("CmsSketch matches an independent reimplementation cell-for-cell") {
    import graft.functions.CmsSketch
    val depth = 4; val width = 16
    // deliberate tiny width so collisions actually occur among 5 items
    val data = Seq("a", "b", "a", "c", "a", "b", "dd", "ee", "dd", "a")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap

    def bucketOf(r: Int, it: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r:$it".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % width
    }
    val expCounters = data.flatMap(it => (0 until depth).map(r => (r.toLong, bucketOf(r, it))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expEst = truth.keys.map { it =>
      it -> (0 until depth).map(r => expCounters((r.toLong, bucketOf(r, it)))).min
    }.toMap

    val items = data.toDF("it")
    val gotCounters = CmsSketch.build(items, "it", depth, width)
      .as[(Long, Long, Long)].collect().map { case (r, b, c) => ((r, b), c) }.toMap
    assert(gotCounters == expCounters)
    val gotEst = CmsSketch.estimate(
        CmsSketch.build(items, "it", depth, width),
        items.distinct(), "it", depth, width)
      .as[(String, Long)].collect().toMap
    assert(gotEst == expEst)
    // one-sided error: every estimate is >= the true count
    truth.foreach { case (k, v) => assert(gotEst(k) >= v) }
  }

  test("CmsSketch out-of-corpus probes take absent buckets as zero") {
    import graft.functions.CmsSketch
    // the r10 advisory: an inner join dropped (or overcounted) probes whose
    // buckets miss the counter table — the classic external-probe CMS use
    // case. With a roomy width, a foreign probe's buckets are all absent
    // and the estimate must be exactly 0 (and the probe must not vanish).
    val depth = 4; val width = 4096
    val counters = CmsSketch.build(Seq("a", "b", "a").toDF("it"), "it", depth, width)
    val probes = Seq("a", "zz_not_in_corpus").toDF("it")
    val got = CmsSketch.estimate(counters, probes, "it", depth, width)
      .as[(String, Long)].collect().toMap
    assert(got.size === 2, s"a probe vanished: $got")
    assert(got("a") >= 2L)
    assert(got("zz_not_in_corpus") === 0L,
      s"foreign probe must estimate 0, got ${got("zz_not_in_corpus")}")
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

  test("KmvSketchAgg: k-min set laws — distinct, sorted, merge == sketch of union") {
    val agg = new graft.functions.KmvSketchAgg(8)
    val xs = Seq(50L, 10L, 30L, 10L, 90L, 20L, 30L, 70L, 60L, 40L, 80L, 5L)
    val sk = xs.foldLeft(agg.zero)(agg.reduce)
    assert(sk === Seq(5L, 10L, 20L, 30L, 40L, 50L, 60L, 70L),
      "8 smallest DISTINCT values, ascending")
    // merge of split sketches equals the sketch of the union, any split
    for (cut <- Seq(1, 4, 7, 11)) {
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === sk, s"split at $cut")
      assert(agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce)) === sk,
        s"commuted split at $cut")
    }
    // under-filled sketch is the exact distinct sorted set
    val small = Seq(3L, 1L, 3L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(small === Seq(1L, 2L, 3L))
  }

  test("sk_kmv_intersect: order-independent, green as shipped, non-vacuous at 1e-3") {
    val dir = sf("sf0.01")
    // measured calibration face: print the relative error the bound gates
    val raw = SketchQueries.kmvIntersectRaw(spark, dir, SketchQueries.KmvK).collect()(0)
    val exact = raw.getAs[Long]("n_exact_intersect")
    val est = raw.getAs[Double]("est_intersect")
    info(f"kmv intersect: exact=$exact est=$est%.1f relerr=${math.abs(est - exact) / exact}%.4f")
    assert(exact > 0, "even/odd halves must overlap or the gate is vacuous")
    val shipped = SketchQueries.kmvIntersect(spark, dir,
      SketchQueries.KmvK, SketchQueries.KmvRelBound).collect()(0)
    assert(shipped.getAs[Boolean]("kmv_within_bound"))
    // the k-min set is a function of the value set alone: a different
    // partitioning must produce the identical row, not just a close one
    val repart = {
      val s2 = spark
      import graft.ops.TextOps
      import graft.functions.KmvSketch
      import s2.implicits._
      Tables.documents(spark, dir).repartition(7)
        .select(explode(TextOps.shinglesFromTokens(
          TextOps.tokens(col("text")), 3)).as("sh"))
        .select(shiftrightunsigned(xxhash64(col("sh")), 1).as("h"))
        .as[Long].select(KmvSketch.kmv(SketchQueries.KmvK).name("sk"))
        .collect()(0)
    }
    val direct = {
      val s2 = spark
      import graft.ops.TextOps
      import graft.functions.KmvSketch
      import s2.implicits._
      Tables.documents(spark, dir).coalesce(1)
        .select(explode(TextOps.shinglesFromTokens(
          TextOps.tokens(col("text")), 3)).as("sh"))
        .select(shiftrightunsigned(xxhash64(col("sh")), 1).as("h"))
        .as[Long].select(KmvSketch.kmv(SketchQueries.KmvK).name("sk"))
        .collect()(0)
    }
    assert(repart === direct, "KMV must be bit-identical under any partitioning")
    // non-vacuous: an absurdly tight bound flips the gate (KMV error ~3%)
    assert(!SketchQueries.kmvIntersect(spark, dir, SketchQueries.KmvK, 1e-3)
      .collect()(0).getAs[Boolean]("kmv_within_bound"))
  }

  test("sk_kmv_intersect: DISJOINT halves pin a boolean gate, never NULL") {
    // relerr / n_exact_intersect is NULL at intersect = 0 — the guard must
    // swap in "sketch also says zero" so a disjoint-halves fixture stays
    // hashable by the driver. Build one: even docs draw shingles from one
    // vocabulary, odd docs from another (schema copied from the real table).
    val tmp = java.nio.file.Files.createTempDirectory("kmv_disjoint").toString
    val evenText =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val oddText =
      "unus duo tres quattuor quinque sex septem octo novem decem undecim"
    Tables.documents(spark, sf("sf0.001"))
      .withColumn("text",
        when(col("doc_id") % 2 === 0, lit(evenText)).otherwise(lit(oddText)))
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val row = SketchQueries.kmvIntersect(spark, tmp,
      SketchQueries.KmvK, SketchQueries.KmvRelBound).collect()(0)
    assert(row.getAs[Long]("n_exact_intersect") === 0L)
    assert(!row.isNullAt(row.fieldIndex("kmv_within_bound")),
      "disjoint inputs produced a NULL gate — latent driver hash mismatch")
    assert(row.getAs[Boolean]("kmv_within_bound"),
      "KMV over disjoint sets must estimate an empty intersection")
  }
}
