package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-side scale helpers. The 100 TB sink problem is file sizing: a
  * naive write emits one file per task (thousands of tiny files after a
  * wide transform; unsplittable monsters after skew), and both poison the
  * NEXT job's scan planning.
  */
object Sinks {

  /** Parquet write with AQE-rebalanced output: the REBALANCE hint lets
    * adaptive execution coalesce small output partitions AND split skewed
    * ones to the advisory size — unlike a fixed `repartition(n)`, which
    * must guess n and still leaves skewed writers. `partitionBy` columns
    * both hive-partition the layout and key the rebalance, so each
    * partition directory gets right-sized files.
    *
    * The advisory size is a SESSION conf (no per-query override exists),
    * set for the duration of the write and restored after — so the value
    * briefly applies to queries planned concurrently on the same session.
    * Call from one writer thread at a time, or accept the default.
    */
  def rebalancedParquet(df: DataFrame, path: String,
                        partitionBy: Seq[String] = Nil,
                        advisoryMB: Int = 128): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, s"${advisoryMB}m")
    try {
      val balanced =
        if (partitionBy.isEmpty) df.hint("rebalance")
        else df.hint("rebalance",
          partitionBy.map(org.apache.spark.sql.functions.col): _*)
      val writer = balanced.write.mode("overwrite")
      (if (partitionBy.isEmpty) writer else writer.partitionBy(partitionBy: _*))
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
