package graft

import org.apache.spark.sql.functions._
import graft.ops.TextStats

class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("tfIdfTopK: rarer term outranks a commoner one at equal tf; k bounds output") {
    // 4 docs; 'rare' appears in 1 doc, 'mid' in 2, 'common' in all 4.
    val docs = Seq(
      (1L, "common mid rare common"),
      (2L, "common mid x y"),
      (3L, "common x y z"),
      (4L, "common x y z")).toDF("doc_id", "text")
    val got = TextStats.tfIdfTopK(docs, "text", "doc_id", k = 2)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.count(_._1 == 1L) === 2, "k=2 per doc")
    val doc1 = got.filter(_._1 == 1L).sortBy(-_._5).map(_._2).toSeq
    // doc 1: rare tf=1 idf_fp=(4e6 div 1)=4e6 → 4e6; common tf=2 idf=1e6 → 2e6;
    // mid tf=1 idf=2e6 → 2e6; tie (common, mid) breaks term-asc → common
    assert(doc1 === Seq("rare", "common"))
    val rareRow = got.find(r => r._1 == 1L && r._2 == "rare").get
    assert(rareRow._5 === 4000000L, "score_fp = tf * ((N*1e6) div df)")
  }

  test("pmiPairs: hand-computed fixed-point ratio, minCount filter, multiplicity") {
    // 'a b' occurs 5 times (multiplicity within one doc counts), 'b c' 4 <- dropped
    val docs = Seq(
      (1L, "a b a b a b c"),
      (2L, "a b b c"),
      (3L, "a b b c b c")).toDF("doc_id", "text")
    val got = TextStats.pmiPairs(docs, "text", "doc_id", minCount = 5L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(!got.contains(("b", "c")), "support-4 bigram must be dropped")
    val ab = got(("a", "b"))
    // n_xy=5, n_a=5, n_b=8 (3+2+3), N=17 → (5*17*100) div 40 = 212
    assert(ab._3 === 5L && ab._4 === 5L && ab._5 === 8L && ab._6 === 212L)
  }

  test("domainShift: identical per-source distributions give exactly zero TVD") {
    val docs = Seq(
      (1L, "x x y", "s1"), (2L, "x x y", "s2"),
      (3L, "z", "s1"), (4L, "z", "s2")).toDF("doc_id", "text", "source")
    val got = TextStats.domainShift(docs, "text", "doc_id", "source")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // both sources hold {x:2, y:1, z:1} — per-source ppm floors equal the
    // corpus floors term-for-term, so the integer TVD is exactly 0
    assert(got("s1")._4 === 0L && got("s2")._4 === 0L)
    assert(got("s1")._2 === 4L && got("s1")._3 === 3L, "(n_tokens, n_terms)")
  }

  test("domainShift: a skewed source scores higher drift than a balanced one") {
    val docs = Seq(
      (1L, "x y z w", "bal"),
      (2L, "x x x x", "skew"),
      (3L, "x y z w", "bal2")).toDF("doc_id", "text", "source")
    val got = TextStats.domainShift(docs, "text", "doc_id", "source")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(got("skew") > got("bal"), "all-x source must out-drift the balanced one")
  }

  test("zipfRanks: total-order ranks and exact cumulative coverage floors") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextStats.zipfRanks(docs, "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // counts a:3 b:2 c:1, total 6 → cum ppm floors 500000, 833333, 1000000
    assert(got.toSeq === Seq(
      (1L, "a", 3L, 500000L), (2L, "b", 2L, 833333L), (3L, "c", 1L, 1000000L)))
    // ties rank by token ascending (total order)
    val tied = TextStats.zipfRanks(Seq((1L, "y x")).toDF("doc_id", "text"), "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(tied === Seq("x", "y"))
  }

  test("zipfClassCoverage: hand-computed classes; boundary cum_types = zipfRanks rank") {
    // counts a:5 b:3 c:2 d:1 e:1 → classes ⌊log2⌋: a→2, b→1, c→1, d→0, e→0
    val docs = Seq((1L, "a a a a a b b b c c d e")).toDF("doc_id", "text")
    val got = TextStats.zipfClassCoverage(docs, "text")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(-_._1).toSeq
    // total 12; cum desc: class2 (1 type, 5 tok), class1 (2 types, 5 tok),
    // class0 (2 types, 2 tok) → ppm floors 416666, 833333, 1000000
    assert(got === Seq(
      (2, 1L, 5L, 1L, 416666L),
      (1, 2L, 5L, 3L, 833333L),
      (0, 2L, 2L, 5L, 1000000L)))
    // the structural consistency contract: cum_types at each class equals
    // the zipfRanks rank of the LAST token in that class (rank axis is
    // only coarsened, never re-ordered)
    val ranks = TextStats.zipfRanks(docs, "text")
      .select(col("rank"), length(bin(col("n"))).cast("long") - 1L)
      .as[(Long, Long)].collect()
    got.foreach { case (cls, _, _, cumTypes, _) =>
      assert(ranks.filter(_._2 == cls.toLong).map(_._1).max === cumTypes)
    }
  }

  test("temperatureWeights: integer shares and the sqrt fixed point, hand-checked") {
    val df = (1 to 4).map(i => (i.toLong, if (i == 1) "de" else "en"))
      .toDF("doc_id", "lang")
    val got = TextStats.temperatureWeights(df, "lang")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // de: 1/4 → share 250000, temp floor(sqrt(0.25)*1e6) = 500000
    // en: 3/4 → share 750000, temp floor(sqrt(0.75)*1e6) = 866025
    assert(got("de") === ("de", 1L, 250000L, 500000L))
    assert(got("en") === ("en", 3L, 750000L, 866025L))
    // α=½ flattens: the minority's temp share more than doubles its raw share
    assert(got("de")._4 * 1.0 / got("en")._4 > got("de")._3 * 1.0 / got("en")._3)
  }
}
