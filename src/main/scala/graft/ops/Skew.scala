package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join for hot keys.
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is the
  * explicit fallback when one join key dominates so heavily that even split
  * partitions of it overwhelm single tasks (the classic "null key" /
  * "default tenant" shape at 100 TB). The fact side gets a deterministic
  * salt derived from row content; the dim side is replicated `salt` times —
  * so the hot key's rows spread over `salt` tasks at the cost of a
  * `salt`× blow-up of the (small) build side.
  */
object Skew {

  /** Inner/left equi-join `left ⋈ right ON key` with `salt`-way spreading.
    * `right` must be the small side (it is replicated `salt` times).
    * Deterministic: the salt is a hash of the left row's full key tuple.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltCols: Array[Column] = left.columns.map(col)
    val l = left.withColumn("__salt", pmod(xxhash64(saltCols: _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe grouped top-k: `row_number <= k` per group without ever
    * funneling a hot group onto one task.
    *
    * The single-window form (`row_number over (partition by group)` then
    * filter) shuffles EVERY row of a group to one task and sorts it there —
    * with few/hot groups that is the serialized-task shape that dies at
    * 100 TB. Two phases fix it: phase 1 ranks within `(group, salt)` — the
    * hot group's rows spread over `salt` tasks, each keeping its local
    * top-k — then phase 2 ranks the surviving `<= salt*k` rows per group.
    * Phase 2's input is bounded by `salt*k` per group regardless of input
    * skew, so the final per-group task is O(salt*k), not O(group size).
    *
    * `order` must be a total order (include a unique tiebreaker) or ties
    * at the k-boundary make the result nondeterministic: phase 1 may keep
    * a different tied row per salt bucket across runs, so the phase-2 input
    * set itself varies — not just the final ordering. The salt is a
    * deterministic hash of `tieCol` (repartition-stable).
    *
    * Output = all input columns plus a `rank` column (1-based position
    * within the group under `order`). `__salt`, `__lrn` and `rank` are
    * reserved: inputs carrying any of them are rejected rather than
    * silently clobbered.
    */
  def saltedTopK(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                 tieCol: String, k: Int, salt: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && salt >= 1, s"k=$k salt=$salt must be >= 1")
    val reserved = Seq("__salt", "__lrn", "rank").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"saltedTopK reserves columns ${reserved.mkString(", ")}; rename them on the input")
    val g = groupCols.map(col)
    val local = Window.partitionBy(g :+ col("__salt"): _*).orderBy(order: _*)
    val global = Window.partitionBy(g: _*).orderBy(order: _*)
    df.withColumn("__salt", pmod(xxhash64(col(tieCol)), lit(salt)).cast("int"))
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .drop("__salt", "__lrn")
  }
}
