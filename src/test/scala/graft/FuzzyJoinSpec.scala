package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def namesDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("k", "s")

  /** Brute-force reference: banded cross join + levenshtein. */
  private def brute(l: DataFrame, r: DataFrame, k: Int): Set[(Long, Long, Int)] =
    l.select(col("k").as("ak"), col("s").as("as_"))
      .crossJoin(r.select(col("k").as("bk"), col("s").as("bs")))
      .withColumn("d", levenshtein(col("as_"), col("bs")))
      .filter(col("d") <= k)
      .select("ak", "bk", "d").as[(Long, Long, Int)].collect().toSet

  private val words = Seq(
    "spark", "spork", "sprk", "sparkk", "park", "shark", "sparc",
    "query", "quary", "qury", "queryy", "", "a", "b", "ab", "ba",
    "lavender goldenrod", "lavender goldenrd", "goldenrod lavender")
  private val left = namesDf(words.zipWithIndex.map { case (w, i) => (i.toLong, w) })
  private val right = namesDf(words.reverse.zipWithIndex.map { case (w, i) => (1000L + i, w) })

  test("editDistanceJoin(k=1) equals brute-force levenshtein<=1") {
    val got = FuzzyJoin.editDistanceJoin(left, "k", "s", right, "k", "s", maxDist = 1)
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === brute(left, right, 1))
    assert(got.nonEmpty)
  }

  test("editDistanceJoin(k=2) equals brute-force levenshtein<=2") {
    val got = FuzzyJoin.editDistanceJoin(left, "k", "s", right, "k", "s", maxDist = 2)
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === brute(left, right, 2))
    // k=2 must be a strict superset on this fixture (e.g. "sprk" vs "spark"
    // at distance 1, "qury" vs "queryy" at distance 2)
    assert(got.size > brute(left, right, 1).size)
  }

  test("editDistanceJoin(k=0) degenerates to exact equality join") {
    val got = FuzzyJoin.editDistanceJoin(left, "k", "s", right, "k", "s", maxDist = 0)
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === brute(left, right, 0))
    assert(got.forall(_._3 == 0))
  }

  test("deletionVariants: k=1 neighborhood is self + one-deletions, distinct") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head().toSet
    assert(got === Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head()
    assert(empty === Seq(""))
  }

  test("signature join plans as equi-join — no nested loop, no cartesian") {
    val plan = FuzzyJoin.editDistanceJoin(left, "k", "s", right, "k", "s", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"nested-loop fuzzy join planned:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop fuzzy join planned:\n$plan")
  }
}
