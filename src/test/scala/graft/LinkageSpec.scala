package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  // 5 docs in one block: texts sort t0..t4; t0/t1 near-identical
  // (adjacent), t0/t4 identical but 4 ranks apart (outside window=2)
  private def fixture = Seq(
    (10L, "aaa p q r s t u v w"),
    (11L, "aab p q r s t u v w"),   // 1 shingle off t0 — adjacent match
    (12L, "bbb 1 2 3 4 5 6 7 8"),
    (13L, "ccc 9 10 11 12 13 14 15 16"),
    (14L, "zzz p q r s t u v w")    // high-Jaccard with t0 but rank-distance 4
  ).toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("sortedNeighborPairs: candidates are exactly the rank-adjacent band") {
    val got = Linkage.sortedNeighborPairs(fixture, "doc_id", "text",
      blockCols = Seq(col("lang")), sortKey = col("text"),
      window = 2, n = 3, thresholdPct = 50L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    // ranks by text: 10,11,12,13,14 → pairs at distance 1 and 2 only
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs === Set((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L),
      (12L, 13L), (12L, 14L), (13L, 14L)))
    val verdict = got.map(r => (r._1, r._2) -> r._5).toMap
    assert(verdict((10L, 11L)), "near-identical adjacent pair must match")
    assert(!verdict((12L, 13L)), "disjoint-shingle neighbors must not match")
    // the recall-bounded contract, demonstrated: (10,14) share 6 of 8+?
    // shingles (Jaccard > 0.5) but sit 4 ranks apart — SNM's one pass
    // never pairs them; a second pass with another sort key would
    assert(!pairs.contains((10L, 14L)))
  }

  test("sortedNeighborPairs: two shingle-less records are NOT a vacuous match") {
    // the r11 review finding: with both tsets empty, the bare
    // cross-multiplication 0 >= pct*0 passed, declaring unrelated short
    // records linked at every threshold; the verdict requires uni > 0
    val short = Seq(
      (1L, "red car"),       // < 3 tokens → empty 3-gram set
      (2L, "blue dog"),
      (3L, "p q r s t u v w")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = Linkage.sortedNeighborPairs(short, "doc_id", "text",
      blockCols = Seq(col("lang")), sortKey = col("text"),
      window = 2, n = 3, thresholdPct = 50L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val both = got.find(r => Set(r._1, r._2) == Set(1L, 2L)).get
    assert(both._3 === 0L && both._4 === 0L && !both._5,
      s"empty-vs-empty must not match: $both")
    assert(got.filter(_._5).isEmpty, s"nothing here is a true match: ${got.toSeq}")
  }

  test("multiPassPairs: pass-2 (reverse key) catches the pair pass-1 misses") {
    // the single-pass recall bound, repaired: (10, 14) share the suffix
    // "p q r s t u v w" but sort 4 ranks apart on text (outside window=2)
    // — pass 1 never pairs them; sorted by reverse(text) their shared
    // suffix makes them ADJACENT and pass 2 emits the pair.
    val got = Linkage.multiPassPairs(fixture, "doc_id", "text",
      passes = Seq(
        (Seq(col("lang")), col("text")),
        (Seq(col("lang")), reverse(col("text")))),
      window = 2, n = 3, thresholdPct = 50L)
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    val caught = byPair.get((10L, 14L))
    assert(caught.isDefined, s"pass 2 must catch the suffix dup: ${got.toSeq}")
    assert(caught.get._5, "(10,14) is a true >=0.5-Jaccard match")
    assert(caught.get._6 === 1L, "found by exactly one pass (the reverse key)")
    // consensus: the adjacent near-dup is proposed by both passes
    val both = byPair((10L, 11L))
    assert(both._5 && both._6 === 2L, s"(10,11) is 2-pass consensus: $both")
    // canonical order + dedup: every pair appears once, id_a < id_b
    assert(got.forall(r => r._1 < r._2))
    assert(got.map(r => (r._1, r._2)).distinct.length === got.length)
  }

  test("sortedNeighborPairs: blocks never pair across, candidate count is O(n·w)") {
    val two = fixture.withColumn("lang",
      when(col("doc_id") % 2 === 0, "en").otherwise("fr"))
    val got = Linkage.sortedNeighborPairs(two, "doc_id", "text",
      blockCols = Seq(col("lang")), sortKey = col("text"),
      window = 2, n = 3, thresholdPct = 50L)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val evens = Set(10L, 12L, 14L)
    assert(got.forall(r => evens(r._1) == evens(r._2)), "no cross-block pair")
    // n=5, w=2: per block of size m at most m·w pairs
    assert(got.length <= 5 * 2)
  }
}
