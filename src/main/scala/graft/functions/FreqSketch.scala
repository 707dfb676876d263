package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items sketch as a typed [[Aggregator]] —
  * the heavy-hitters member of the sketch family (alongside HLL++ and GK
  * quantiles): fixed `capacity` counters per partition instead of a
  * full-vocabulary hash aggregation, the 100 TB answer to "which tokens
  * dominate the corpus" when the vocabulary itself is too large to shuffle.
  *
  * Per-partition update is classic Misra-Gries (increment if tracked,
  * insert if room, otherwise decrement all); partial summaries merge by
  * summing counters and trimming back to `capacity` by subtracting the
  * (capacity+1)-th largest count — the mergeable-summaries construction
  * (Agarwal et al., PODS'12), which preserves the deterministic guarantee
  * `true_count - n/(capacity+1) <= est <= true_count`. Every item with
  * true count above n/(capacity+1) is therefore PRESENT in the output,
  * which is the containment contract `sk_freq_items` gates on.
  *
  * Scale shape: the object-hash aggregation path (typed aggregators don't
  * whole-stage-codegen) with O(capacity) state per task and an
  * O(capacity)-sized shuffle row per partition — the deliberate trade
  * against exact groupBy's per-key shuffle. Deterministic for fixed input
  * (no RNG), so downstream gate booleans are stable.
  */
class FreqItemsAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None =>
        // decrement-all: drop zeros, no insertion (the MG trade)
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count, keep positives
      val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)
        .apply(capacity)
      summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqSketch {
  /** Column form: aggregate a Dataset[String] of items into the MG counter
    * map (item -> lower-bound count estimate).
    */
  def freqItems(capacity: Int): org.apache.spark.sql.TypedColumn[String, Map[String, Long]] =
    new FreqItemsAgg(capacity).toColumn
}
