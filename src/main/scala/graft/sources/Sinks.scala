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
    * so the write runs on a CLONED session (same SparkContext, isolated
    * SQLConf) carrying the caller's runtime confs plus the advisory size —
    * queries planned concurrently on the caller's session never observe
    * the temporary setting, and nothing needs restoring afterwards.
    */
  def rebalancedParquet(df: DataFrame, path: String,
                        partitionBy: Seq[String] = Nil,
                        advisoryMB: Int = 128): Unit = {
    val spark = df.sparkSession
    val writeSession = spark.newSession()
    // newSession starts from SparkConf defaults; carry over the caller's
    // runtime SQL confs (static/immutable entries throw — skip them)
    spark.conf.getAll.foreach { case (k, v) =>
      try writeSession.conf.set(k, v) catch { case _: Exception => () }
    }
    writeSession.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${advisoryMB}m")
    val scoped = org.apache.spark.sql.GraftSqlBridge.onSession(df, writeSession)
    val balanced =
      if (partitionBy.isEmpty) scoped.hint("rebalance")
      else scoped.hint("rebalance",
        partitionBy.map(org.apache.spark.sql.functions.col): _*)
    val writer = balanced.write.mode("overwrite")
    (if (partitionBy.isEmpty) writer else writer.partitionBy(partitionBy: _*))
      .parquet(path)
  }

  /** Bucketed parquet table for CO-LOCATED joins — the other half of the
    * 100 TB sink problem: a fact table that will be joined on the same key
    * every night should pay its shuffle ONCE, at write time. `bucketBy`
    * hash-partitions rows into a fixed bucket count recorded in the
    * catalog; a later equi-join between two tables bucketed on the join
    * key with the same count plans with NO Exchange on either side (and
    * with `sortBy` the per-bucket sort is pre-paid too, so the sort-merge
    * join reads presorted buckets). `SinksSpec` pins the exchange-free
    * plan property and result parity vs the unbucketed join.
    *
    * Bucketing requires a catalog table (`saveAsTable`) — bucket metadata
    * lives in the catalog, not the files — which is exactly how a
    * warehouse deployment would ship it.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(table)
  }
}
