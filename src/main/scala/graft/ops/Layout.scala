package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * min/max footer stats (parquet row groups, table-format file stats)
  * prune scans only when each file's value RANGE is narrow, and a
  * single-column sort narrows exactly one column. Z-ordering (Morton,
  * 1966; the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` and
  * documented publicly in both) interleaves the bits of two key columns
  * so that range-partitioning on the interleaved value keeps EVERY
  * partition's bounding box small in BOTH dimensions — point/range
  * predicates on either key (or both) then skip most files.
  *
  * Everything here is codegen'd integer bit arithmetic (`shiftleft`/
  * `shiftright`/`&`/`|` — no UDFs, no expression-tree blowup: 8-bit
  * interleave is 8 OR-terms), and [[clusterByZ]] is one
  * `repartitionByRange` exchange + an in-partition sort — the same
  * shuffle budget as the single-column layout it replaces.
  */
object Layout {

  /** Morton/Z-value of two already-bucketed coordinates: interleaves the
    * low `bits` bits of `x` (even positions) and `y` (odd positions).
    * Callers bucket raw keys into `[0, 2^bits)` first (modulo for
    * identifiers, integer-divide for timestamps) — the z-curve needs a
    * bounded grid, and `bits` doubles as the stats grain: more bits =
    * finer boxes = more distinct z-prefixes to range-partition on.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of (0, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a DataFrame for two-dimensional scan pruning: range-partition
    * on the z-value of the two bucketed keys, sort within each partition
    * by it. Downstream `write.parquet` then produces files whose min/max
    * stats are tight in BOTH `x` and `y` — the layout sink for a fact
    * table queried by user AND by time. Partitions are z-contiguous
    * (range exchange) and the z-curve's quadtree structure bounds each
    * partition's (x, y) bounding box — LayoutSpec measures the property.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 numPartitions: Int): DataFrame = {
    val z = zValue(x, y, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
