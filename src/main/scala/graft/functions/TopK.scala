package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] — the k-best analog of
  * [[KmvSketchAgg]]'s k-min set, for aggregations whose RESULT is a k-slice
  * but whose naive formulation (`slice(array_sort(collect_list(...)), 1,
  * k)`) buffers every input row before slicing. Here the buffer itself is
  * the sorted k-slice: `reduce` is O(1) for a row that cannot enter the
  * top k (the overwhelmingly common case once the buffer fills) and O(k)
  * otherwise, and partials `merge` by sorted-merge + trim, so a shuffle —
  * or a streaming state store — holds at most k entries per group. That
  * bounded buffer is what makes the streaming retrieval operator
  * ([[graft.streaming.Streaming.annProbe]]) honest about its state-size
  * contract: k entries per in-flight query, not one entry per candidate.
  *
  * Ordering is lexicographic ascending on (key, id) — identical to
  * `array_sort` over `struct(key, id)` (Spark's double ordering: NaN
  * sorts greatest, and -0.0 == 0.0 so ±0.0 ties break on id) — and
  * DUPLICATE pairs are kept, exactly as collect_list-then-slice would, so
  * the two formulations are row-for-row interchangeable (StreamingSpec
  * "TopKAgg ≡ collect_list" pins the parity, NaN / duplicate / ±0.0 keys
  * included). Callers wanting "largest key first" negate the key, the
  * same convention as the window-function `ORDER BY -x` idiom.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k=$k: need at least one slot")

  // Spark's sort order for doubles (nanSafeCompareDoubles): NaN compares
  // greatest (and equal to NaN), and -0.0 == 0.0 — NOT java.lang.Double
  // .compare, which puts -0.0 strictly first, and NOT raw `<`, under which
  // every NaN comparison is false and the sorted invariant breaks. -0.0 is
  // reachable here: the intended caller negates cosine scores, so cos==0.0
  // arrives as -0.0; NaN arrives from zero-norm vectors.
  private def cmpKey(x: Double, y: Double): Int = {
    val xn = x.isNaN
    val yn = y.isNaN
    if (xn && yn) 0
    else if (xn) 1
    else if (yn) -1
    else if (x < y) -1
    else if (x > y) 1
    else 0
  }

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = cmpKey(a._1, b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  def zero: Seq[(Double, Long)] = Vector.empty

  def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (b.lengthCompare(k) == 0 && !lt(x, b.last)) b // O(1) fast path
    else insert(b, x)

  /** Sorted-insert (duplicates kept), trimmed to k. */
  private def insert(b: Seq[(Double, Long)],
                     x: (Double, Long)): Seq[(Double, Long)] = {
    var lo = 0
    var hi = b.length
    while (lo < hi) { // lower bound binary search
      val mid = (lo + hi) >>> 1
      if (lt(b(mid), x)) lo = mid + 1 else hi = mid
    }
    val grown = (b.take(lo) :+ x) ++ b.drop(lo)
    if (grown.lengthCompare(k) > 0) grown.take(k) else grown
  }

  def merge(a: Seq[(Double, Long)],
            b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // sorted-merge two ascending runs, keep the k smallest (stable: on
    // equal pairs the left run's copy goes first — order of equal pairs
    // is unobservable anyway)
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(reduction: Seq[(Double, Long)]): Seq[(Double, Long)] = reduction

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

object TopK {
  /** Untyped-DataFrame form: a UDAF taking (sortKey: double, id: long)
    * column pairs, returning the ascending k-slice as
    * `array<struct<_1: double, _2: bigint>>`.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
}
