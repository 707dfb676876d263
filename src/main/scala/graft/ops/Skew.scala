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
}
