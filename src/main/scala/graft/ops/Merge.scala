package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-maintenance merges — the MERGE INTO family re-expressed as
  * deterministic DataFrame plans.
  *
  * Reference scope: the reference's idempotent load (SURVEY S5,
  * `graft.nhl.Bronze.overwritePartitions`) replaces whole partitions;
  * this module is the ROW-level complement — the SCD1 overwrite-upsert
  * that dbt's `materialized='incremental', unique_key=...` models and
  * warehouse MERGE statements perform — and the row-level sibling of the
  * SCD2 interval builder (`w14_scd2_intervals`), which keeps history
  * where SCD1 overwrites it.
  */
object Merge {

  /** Deterministic SCD1 (overwrite) upsert: delta rows WIN on key
    * conflict, base rows survive otherwise, delta-only keys insert —
    * last-writer-wins where "last" is the largest `orderCols` tuple
    * within the delta (ties must be broken by the caller's ordering,
    * e.g. a revision counter; include a unique tiebreaker or equal-rev
    * duplicates are nondeterministic).
    *
    * Scale shape: only the DELTA (small by the incremental-load
    * contract) pays a window; the base pays ONE key-keyed anti-join —
    * broadcast when the delta's key set fits (AQE decides), so the base
    * never shuffles at all on the common path. The naive union-then-
    * window formulation would sort the full base per key — the shape
    * that dies at 100 TB.
    *
    * Schemas must match by name (`unionByName`); the output carries the
    * common columns.
    */
  def scd1Upsert(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "scd1Upsert needs at least one key column")
    require(orderCols.nonEmpty,
      "scd1Upsert needs an ordering (e.g. a revision column) to pick the last writer")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val latestDelta = delta
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    base.join(latestDelta.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(latestDelta)
  }
}
