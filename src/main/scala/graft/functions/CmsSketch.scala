package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * pure relational construction: `depth` independent hash rows × `width`
  * buckets; counter(r, b) = number of item occurrences hashing to bucket b
  * under row r's hash. A point estimate is the MIN over rows of the item's
  * counter — always an overcount, within e·n/width of truth with
  * probability 1 − e^(−depth).
  *
  * The row hashes are md5 32-bit prefixes keyed by row index ("r:item") —
  * deterministic and ENGINE-EXACT, so a DuckDB oracle rebuilds the sketch
  * cell-for-cell (the [[graft.ops.CorpusOps.hashUniform]] trick applied to
  * bucketing). Scale shape: the counter groupBy's key space is fixed at
  * depth×width, so map-side combine bounds every task's partial AND the
  * shuffle at depth×width rows regardless of corpus size — the
  * fixed-memory one-pass property that makes CMS the 100 TB substitute
  * for an exact full-vocabulary count when the vocabulary itself is too
  * large to shuffle. Entirely built-ins (md5/conv/explode) → the whole
  * build stays inside whole-stage codegen; no UDF, no typed state.
  */
object CmsSketch {

  /** Bucket of `item` under hash row `r`: first 8 md5 hex chars of
    * "r:item" parsed as the exact 32-bit integer, mod `width` (conv
    * returns the decimal string of a value < 2^32 — the parse is exact).
    */
  def bucket(item: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat_ws(":", lit(r), item)), 1, 8), 16, 10)
      .cast("long") % width

  private def rowBuckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      struct(lit(r).as("r"), bucket(item, r, width).as("b"))): _*)

  /** The depth×width counter table from ONE pass over `items(itemCol)`. */
  def build(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items.select(explode(rowBuckets(col(itemCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** CMS point estimates for `probes(itemCol)`: min over hash rows of the
    * probe's counter. `counters` (≤ depth×width rows) broadcasts. The join
    * is LEFT with absent buckets coalesced to 0 — the build never
    * materializes zero-count buckets, so an out-of-corpus probe whose
    * buckets partially (or fully) miss the counter table must take its min
    * over those implicit zeros, yielding the correct 0 estimate instead of
    * an overcount from the surviving rows (or no row at all). In-corpus
    * probes hit every bucket, so their estimates are unchanged.
    */
  def estimate(counters: DataFrame, probes: DataFrame, itemCol: String,
               depth: Int, width: Int): DataFrame =
    probes
      .select(col(itemCol), explode(rowBuckets(col(itemCol), depth, width)).as("rb"))
      .select(col(itemCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(itemCol).agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
}
