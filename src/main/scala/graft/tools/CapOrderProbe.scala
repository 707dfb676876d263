package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.Tables

/** One-question instrument: is the ~2x slowdown of the maxDocFreq=500
  * ngram run on the 10x corpus inherent to the capped PLAN, or to run
  * ORDER within the JVM? Runs capped, uncapped, capped, uncapped —
  * if the first capped run is fast, order (JVM/GC state) is the cause;
  * if capped is slow in both positions, the capped plan itself is.
  * Usage: runMain graft.tools.CapOrderProbe [sfDir]
  */
object CapOrderProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text")
    val docs10 = (0 until 10).map { i =>
      docs1.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text"))
    }.reduce(_ union _)
    val docsHot = docs10.withColumn("text",
      when(col("doc_id") % 50 === 0,
        concat(col("text"), lit(" subscribe to our newsletter today")))
        .otherwise(col("text")))
    def run(label: String, capped: Boolean): Unit = {
      val df =
        if (capped) Dedup.ngramJaccardPairs(docsHot, "text", "doc_id", maxDocFreq = 500)
        else Dedup.ngramJaccardPairs(docsHot, "text", "doc_id")
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      println(f"[probe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    run("capped (1st)", capped = true)
    run("uncapped (2nd)", capped = false)
    run("capped (3rd)", capped = true)
    run("uncapped (4th)", capped = false)
    spark.stop()
  }
}
