package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join via deletion-neighborhood signatures.
  *
  * The classic entity-resolution primitive the reference approximates with
  * exact normalized-key equi-joins (stg_player_name_crosswalk.sql:76-91):
  * pair rows whose string keys are within Levenshtein distance `maxDist`.
  * A naive theta-join (`levenshtein(a, b) <= k`) plans as a nested loop —
  * O(|L|·|R|) string comparisons, a non-starter at 100 TB.
  *
  * Signature scheme (FastSS, Bocek et al., Tech report U. Zurich 2007; the
  * same neighborhood idea as SymSpell): the signature set of a string is
  * every variant obtainable by deleting at most `maxDist` characters
  * (including the string itself). If lev(s, t) <= k, the optimal alignment
  * has at most k non-matching columns; deleting the non-matched characters
  * from each side yields a common variant, so the order-<=k deletion
  * neighborhoods of s and t intersect. Candidates are therefore an
  * EQUI-join on signature — shuffle on the signature key, no nested loop —
  * followed by an exact `levenshtein` verification that discards the
  * false candidates the signature theorem admits. Lossless by the argument
  * above; FuzzyJoinSpec pins equality with the brute-force cross join for
  * k = 1 and k = 2.
  *
  * Scale shape: signature fanout per row is O(len^k) (len+1 variants at
  * k=1), so the exploded index is a constant factor of the input, and the
  * join is signature-keyed with map-side-combinable dedup. Hot signatures
  * (very short strings) are the skew knob — at production scale, band rows
  * by length first (lev(s,t) <= k implies |len(s)-len(t)| <= k) which this
  * implementation gets for free: a deletion variant of order d has length
  * len-d, so only strings within k of each other in length can ever share
  * a signature. k is bounded to 2: beyond that the neighborhood blow-up
  * favors q-gram filters instead (documented, not silently accepted).
  */
object FuzzyJoin {

  /** All variants of `s` with at most `k` characters deleted (including
    * `s` itself), distinct. Pure column expression — codegen'd, no UDF.
    */
  def deletionVariants(s: Column, k: Int): Column = {
    require(k >= 0 && k <= 2, s"maxDist=$k out of supported range 0..2 (use q-gram filtering beyond)")
    val self = array(s)
    if (k == 0) self
    else {
      val d1 = oneDeletions(s)
      if (k == 1) array_distinct(concat(self, d1))
      else {
        // order-2 neighborhood: one deletion applied to every order-1 variant
        val d2 = flatten(transform(d1, v => oneDeletions(v)))
        array_distinct(concat(self, d1, d2))
      }
    }
  }

  /** The len(s) variants of `s` with exactly one character deleted.
    * Empty-string guard: `sequence(0, -1)` would infer a NEGATIVE step and
    * yield [0, -1], not the empty range — so the empty input maps to an
    * empty variant array explicitly.
    */
  private def oneDeletions(s: Column): Column =
    when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length(s) - 1),
        i => concat(substring(s, lit(1), i), substring(s, i + 2, length(s)))))

  /** Fuzzy inner join: every (left, right) pair with
    * `levenshtein(left(leftStr), right(rightStr)) <= maxDist`, exactly —
    * the signature stage only generates candidates, the verify filter is
    * the semantics. Output: (leftKey, rightKey, leftStr aliased `a_str`,
    * rightStr aliased `b_str`, `dist`), one row per qualifying pair.
    *
    * Keys must be unique per side (they dedup the candidate multi-matches:
    * a pair sharing several signatures is emitted once).
    */
  def editDistanceJoin(left: DataFrame, leftKey: String, leftStr: String,
                       right: DataFrame, rightKey: String, rightStr: String,
                       maxDist: Int = 1): DataFrame = {
    val a = left.select(col(leftKey).as("a_key"), col(leftStr).as("a_str"))
      .select(col("a_key"), col("a_str"),
        explode(deletionVariants(col("a_str"), maxDist)).as("sig"))
    val b = right.select(col(rightKey).as("b_key"), col(rightStr).as("b_str"))
      .select(col("b_key"), col("b_str"),
        explode(deletionVariants(col("b_str"), maxDist)).as("sig"))
    a.join(b, Seq("sig"))
      // dedup BEFORE the verify so levenshtein runs once per candidate pair,
      // not once per shared signature. distinct over all four columns (the
      // strings are functionally dependent on the keys) instead of
      // groupBy+first: plans as a partial+final HashAggregate where a
      // first() agg on strings would force SortAggregate.
      .select("a_key", "b_key", "a_str", "b_str").distinct()
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")))
      .filter(col("dist") <= maxDist)
      .select("a_key", "b_key", "a_str", "b_str", "dist")
  }
}
