package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup
import graft.sources.Tables

/** sf1→sf10 decade probe for the exact near-dup pair family in its
  * PRODUCTION posture: `maxDocFreq`-capped prefix-filtered pairs and the
  * connected-components clustering fed by them.
  *
  * Why a separate instrument: `tools/gen_sf.py` scales documents as
  * byte-exact copies, so true-dup pair mass grows ~×100 per decade (every
  * doc gains C(k,2) twin pairs) and each pair co-occurs in ~every shingle
  * of the doc — the UNCAPPED enumerators' shuffle grows ~×100/decade too
  * and exceeds a single node's spill disk at sf10 (measured 2026-08-15:
  * `dd_ngram_prefix` uncapped died SPILL_OUT_OF_MEMORY at sf10 after
  * filling ~78 GB of /tmp; a 1000-executor cluster has the aggregate disk,
  * one local[32] node does not). The cap is the documented 100 TB
  * safeguard; this probe measures the capped posture at both decades so
  * the growth table compares the shape a production run would use.
  * Timings/pair counts recorded in BENCH_NOTES §Round 12.
  *
  * Usage: runMain graft.tools.DecadeProbe <sfDir> [maxDocFreq=150] [runs=2]
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toLong else 150L
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      for (r <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"[decade] $label run$r: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }

    val docs = Tables.documents(spark, dir)
    time(s"prefix_pairs(cap=$cap)") {
      Dedup.ngramPrefixPairs(docs, "text", "doc_id", n = 3, threshold = 0.8,
        maxDocFreq = cap)
    }
    time(s"cluster_cc(cap=$cap)") {
      Dedup.nearDupComponents(docs, "doc_id",
        Dedup.ngramPrefixPairs(docs, "text", "doc_id", n = 3, threshold = 0.8,
          maxDocFreq = cap))
    }
    spark.stop()
  }
}
