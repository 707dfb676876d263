package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{CorpusOps, Dedup, Similarity, TextOps}
import graft.sources.Tables

/** sf1→sf10 decade probe for the round-12 families the original
  * [[DecadeProbe]] table does not cover: `ann_margin_pairs` (double brute
  * scorer + rank folds), `dd_containment` (asymmetric probe-broadcast
  * inverted index), and `ta_kn_trigram` (two type-grain hash aggs +
  * context window + mid-order groupBy/join). Each face runs with the
  * EXACT parameters of its bench query so the growth row measures the
  * shipped shape.
  *
  * Expected shapes (the hypotheses the probe checks):
  * - margin: query side is pinned to copy-0 ids (`vec_id < 200`), corpus
  *   side grows ×10/decade → the forward brute pass is ~linear in corpus;
  *   the backward pass (corpus→query) is too (queries broadcast).
  * - containment: probe side is the planted `doc_id % 5 == 2` snippets —
  *   grows with the corpus, so pair mass grows ~×10 (each snippet still
  *   matches its one parent; gen_sf copies don't cross-match thanks to
  *   id-offset shingles ... except exact-copy docs share shingle TEXT, so
  *   snippet_i may match parent copies too — the probe PRINTS pair counts
  *   so the mass model is measured, not assumed).
  * - kn_trigram: output is type-grain (vocabulary-bounded) — wall should
  *   grow sub-linearly (scan-dominated), the same argument as ta_pmi.
  *
  * Usage: runMain graft.tools.DecadeProbe2 <sfDir> [runs=2] [containCap=MaxValue]
  *
  * containCap is containmentSelfPairs' maxDocFreq — the documented
  * production safeguard. Measured 2026-08-16: the UNCAPPED posture dies
  * at sf10 on this corpus (No space left on device after filling the
  * node's ~76 GB of spill in stage 67, the candidate self-join) — the
  * same copy-degenerate candidate-mass arithmetic as the r12 sf10 table:
  * the generator freezes the shingle vocabulary, so every df multiplies
  * by 100/decade and sum C(df,2) grows ~x100. kn_trigram runs FIRST so a
  * containment spill death doesn't rob the other families' numbers.
  */
object DecadeProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val containCap = if (args.length > 2) args(2).toLong else Long.MaxValue
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
        println(f"[decade2] $label run$r: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val emb = Tables.embeddings(spark, dir)

    time("ann_margin_pairs") {
      Similarity.marginPairs(
        emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 200),
        emb.filter(col("vec_id") % 2 === 1),
        k = 4, threshold = 1.02)
    }

    time("ta_kn_trigram") {
      CorpusOps.knTrigram(docs, "text")
    }

    time(s"dd_containment(cap=$containCap)") {
      val t = TextOps.tokens(col("text"))
      val snip = docs.filter(col("doc_id") % 5 === 2).select(
        (col("doc_id") + lit(1000000000000L)).as("doc_id"),
        concat_ws(" ",
          slice(t, lit(1), greatest(floor(size(t) * 2 / 5).cast("int"), lit(5))))
          .as("text"))
      Dedup.containmentSelfPairs(docs.unionByName(snip), "text", "doc_id",
        n = 3, threshold = 0.9, maxDocFreq = containCap)
    }
    spark.stop()
  }
}
