package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, Dedup}
import graft.sources.Tables

/** sf1→sf10 decade probe for the two expensive r13-oracled faces without
  * growth rows (the r13 verdict's #7): `ta_bpe_merges` (the iterative BPE
  * trainer) and `dd_threshold_curve` (the one-pass Jaccard yield sweep).
  * Each face runs with the EXACT parameters of its bench query so the
  * growth row measures the shipped shape.
  *
  * Expected shapes (the hypotheses the probe checks):
  * - bpe_merges: [[CorpusOps.bpeTrainMerges]] collapses the corpus to its
  *   word-frequency VOCABULARY before round 0, and the generator freezes
  *   the vocabulary across SFs — so all 6 rounds run on IDENTICAL state at
  *   both decades and only the initial word-table scan/agg grows. Wall
  *   should be near-FLAT (the ta_kn_trigram argument); the per-round term
  *   is rounds × job constants, invariant in corpus size.
  * - threshold_curve: candidate mass is [[Dedup.coOccurrencePairs]]'s
  *   inverted-index self-join — on THIS copy-degenerate generator every
  *   shingle's df multiplies ×10/decade, so Σ C(df,2) grows ~×100 (the
  *   same arithmetic that kills uncapped containment, measured r13). The
  *   probe runs the curve CAPPED (maxDocFreq=150, the documented
  *   production posture) alongside one uncapped sf1 reference; at sf10
  *   uncapped is expected to be spill-bound and is SKIPPED by default
  *   (pass allowUncapped=true to try anyway).
  *
  * Usage: runMain graft.tools.DecadeProbe3 <sfDir> [runs=2] [allowUncapped=false]
  */
object DecadeProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val allowUncapped = args.length > 2 && args(2).toBoolean
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
        println(f"[decade3] $label run$r: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")

    time("ta_bpe_merges(rounds=6)") {
      CorpusOps.bpeTrainMerges(docs, "text", rounds = 6)
    }

    time("dd_threshold_curve(cap=150)") {
      Dedup.jaccardYieldCurve(docs, "text", "doc_id", n = 3, maxDocFreq = 150L)
    }

    if (allowUncapped) time("dd_threshold_curve(uncapped)") {
      Dedup.jaccardYieldCurve(docs, "text", "doc_id", n = 3)
    }
    spark.stop()
  }
}
