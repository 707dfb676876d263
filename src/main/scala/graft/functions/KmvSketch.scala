package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable k-minimum-values (KMV / bottom-k theta) sketch as a typed
  * [[Aggregator]] — the set-EXPRESSION member of the sketch family. HLL
  * (`sk_hll_card`/`sk_hll_union`) answers cardinality and union only;
  * keeping the k smallest distinct hash VALUES instead of register maxima
  * additionally supports intersection and Jaccard between independently
  * built sketches (Beyer et al., SIGMOD'07 "On synopses for distinct-value
  * estimation"; the theta-sketch framework of the Apache DataSketches
  * library): trimming both sketches to the shared
  * threshold theta = min(kth_a, kth_b) yields two uniform coordinated
  * samples of the key space, so |A op B| ~= |S_a op S_b| / (theta /
  * 2^63) for any set op — the cross-CORPUS overlap question (train/test
  * contamination mass, source overlap) that HLL structurally cannot
  * answer.
  *
  * Input is the already-hashed key (`shiftrightunsigned(xxhash64(x), 1)`,
  * uniform on [0, 2^63)); the buffer is the sorted distinct vector of the
  * k smallest hashes seen. Updates are O(1) for the (overwhelmingly
  * common) hash above the current kth minimum and O(k) otherwise —
  * expected O(k log(n/k)) inserts total; partials merge by sorted-merge +
  * trim, so the shuffle ships one k-long array (8 KB at k=1024) per
  * partition — the 1000-executor two-level rollup. Unlike Misra-Gries the
  * result is fully ORDER-INDEPENDENT (a k-min set is a function of the
  * value set alone), so sketches are bit-identical under any partitioning
  * — SketchSpec pins this.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 8, s"k=$k: below 8 the (k-1)/kth estimator is all variance")

  def zero: Seq[Long] = Vector.empty

  def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.lengthCompare(k) == 0 && h >= b.last) b // O(1) fast path
    else insertDistinct(b, h)

  /** Sorted-insert keeping distinctness, trimmed to k. */
  private def insertDistinct(b: Seq[Long], h: Long): Seq[Long] = {
    var lo = 0
    var hi = b.length
    while (lo < hi) { // lower bound binary search
      val mid = (lo + hi) >>> 1
      if (b(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == h) b // already tracked: KMV is a SET sketch
    else {
      val grown = (b.take(lo) :+ h) ++ b.drop(lo)
      if (grown.lengthCompare(k) > 0) grown.take(k) else grown
    }
  }

  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    // sorted-merge two distinct ascending runs, keep the k smallest
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val next =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      out += next
      n += 1
      // skip remaining copies of `next` at the head of either run
      while (i < a.length && a(i) == next) i += 1
      while (j < b.length && b(j) == next) j += 1
    }
    out.result()
  }

  def finish(reduction: Seq[Long]): Seq[Long] = reduction

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvSketch {
  /** Typed-column form over a Dataset of pre-hashed keys. */
  def kmv(k: Int): org.apache.spark.sql.TypedColumn[Long, Seq[Long]] =
    new KmvSketchAgg(k).toColumn
}
