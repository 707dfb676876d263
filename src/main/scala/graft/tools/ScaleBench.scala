package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.sources.Tables

/** Synthetic 10× scale-up evidence run: unions sf0.1 documents/embeddings
  * ×10 with id-offset copies (≈ sf1) and plants one hot boilerplate
  * shingle on 2% of documents, then times the dedup/ANN family at both
  * scales and reports whether AQE split the skewed candidate join —
  * confirming the `Dedup` scaladoc's "Skew honesty" finding that it never
  * fires on output-amplified skew, so the frequency caps are the operative
  * safeguard. Not part of the library surface; measurements recorded in
  * BENCH_NOTES.md (rounds 3-5, incl. the candidate-mass accounting).
  *
  * Usage: runMain graft.tools.ScaleBench [sfDir]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String, df: DataFrame): Unit = {
      // Execute THIS DataFrame's own QueryExecution (a write/count would
      // plan a separate, never-reoptimized QE — reading executedPlan off
      // that reports the pre-execution AQE plan where skew markers can
      // never appear). After toRdd runs, executedPlan is the FINAL
      // adaptive plan (isFinalPlan=true) where AQEShuffleRead skew splits
      // are visible if they fired.
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.toRdd.foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = qe.executedPlan.toString
      val finalPlan = plan.contains("isFinalPlan=true")
      val skewLines = plan.linesIterator.filter(_.toLowerCase.contains("skew")).toSeq
      val split = skewLines.exists(l =>
        l.contains("skew=true") || l.toLowerCase.contains("skewed"))
      println(f"[scale] $label%-34s ${dt}%8.1f s  aqe_skew_split=$split final=$finalPlan")
      skewLines.filter(l => l.contains("skew=true") || l.toLowerCase.contains("skewed"))
        .take(2).foreach(l => println(s"[scale]   plan: ${l.trim.take(150)}"))
      spark.catalog.clearCache()
      // drop the run's localCheckpoint blocks NOW, not at the next GC —
      // otherwise they squat on executor storage into the following run
      // (measured: run-order contamination made a capped run time 2x its
      // uncapped superset) — then GC so the ContextCleaner's queue drains
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // Deterministic candidate-mass accounting — the number the maxDocFreq
    // cap actually controls, free of wall-clock noise: sum over shingles
    // with doc-freq in (1, cap] of c*(c-1)/2 (the pairs the self-join
    // generates; mirrors Dedup's pruning exactly).
    def candMass(docs: DataFrame, cap: Long, label: String): Unit = {
      val m = docs
        .select(explode(graft.ops.TextOps.shingles(col("text"), 3)).as("sh"))
        .groupBy("sh").count()
        .filter(col("count") > 1 && col("count") <= cap)
        .agg(coalesce((sum(col("count") * (col("count") - 1)) / 2).cast("long"),
          lit(0L)).as("m"))
        .head.getLong(0)
      println(f"[scale] $label%-34s candidate_pairs=$m%,d")
    }

    val docs1 = Tables.documents(spark, sf).select("doc_id", "text")
    val emb1 = Tables.embeddings(spark, sf)
    // id-offset copies: near-dup structure replicates (every original doc
    // gains 9 exact copies), the worst case for candidate generation
    val docs10 = (0 until 10).map { i =>
      docs1.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text"))
    }.reduce(_ union _)
    // planted hot shingles: 2% of the 10× corpus shares one boilerplate
    // sentence → its 3-grams each appear in ~2k docs (quadratic bucket)
    val docsHot = docs10.withColumn("text",
      when(col("doc_id") % 50 === 0,
        concat(col("text"), lit(" subscribe to our newsletter today")))
        .otherwise(col("text")))
    val emb10 = (0 until 10).map { i =>
      emb1.select((col("vec_id") + i * 10000000L).as("vec_id"), col("embedding"))
    }.reduce(_ union _)

    val planes = Similarity.hyperplanes(nPlanes = 4, dim = 64, seed = 42L)
    // wider LSH at 10× so per-bucket candidate sets stay bounded — the
    // documented scale knob (bucket count grows with corpus, 2^7=128)
    val planes10 = Similarity.hyperplanes(nPlanes = 7, dim = 64, seed = 42L)

    println(s"[scale] base=$sf (docs=${docs1.count()}, vecs=${emb1.count()}); " +
      s"10x union with id offsets; hot shingle on doc_id%50==0")

    run("ngram_jaccard sf0.1", Dedup.ngramJaccardPairs(docs1, "text", "doc_id"))
    // POSITIVE control for the maxDocFreq cap, at single scale: in the 10×
    // runs below the copy structure (9 exact duplicates per doc) dominates
    // the candidate mass, so removing the planted bucket lands within host
    // noise. Here the hot bucket IS the dominant mass — 20% of sf0.1 docs
    // share the boilerplate sentence (~1k docs per hot shingle → ~500k
    // candidate pairs per shingle vs a tiny clean baseline), so the
    // capped-vs-uncapped gap must clear noise:
    val docsHot1 = docs1.withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" subscribe to our newsletter today")))
        .otherwise(col("text")))
    candMass(docs1, Long.MaxValue, "mass sf0.1 clean")
    candMass(docsHot1, Long.MaxValue, "mass sf0.1+hot20% uncapped")
    candMass(docsHot1, 500L, "mass sf0.1+hot20% maxDocFreq=500")
    run("ngram_jaccard sf0.1+hot20% uncapped",
      Dedup.ngramJaccardPairs(docsHot1, "text", "doc_id"))
    run("ngram_jaccard sf0.1+hot20% maxDocFreq=500",
      Dedup.ngramJaccardPairs(docsHot1, "text", "doc_id", maxDocFreq = 500))
    candMass(docsHot, Long.MaxValue, "mass 10x+hot uncapped")
    candMass(docsHot, 500L, "mass 10x+hot maxDocFreq=500")
    run("ngram_jaccard 10x+hot uncapped", Dedup.ngramJaccardPairs(docsHot, "text", "doc_id"))
    run("ngram_jaccard 10x+hot maxDocFreq=500",
      Dedup.ngramJaccardPairs(docsHot, "text", "doc_id", maxDocFreq = 500))
    // Negative control (measured r4, fixed instrument — final adaptive
    // plan, isFinalPlan=true): scaling AQE's skew thresholds to the data
    // does NOT make the split fire — aqe_skew_split=false on all 11 runs
    // including this one. That is the expected outcome, not a failure of
    // the instrument: AQE keys off shuffle-INPUT partition bytes, and a
    // hot shingle is small on input (one index row per doc); its cost is
    // join-OUTPUT amplification, which the heuristic cannot see. The
    // operative safeguard is the explicit frequency caps (maxDocFreq /
    // maxChunkFreq) — see the Dedup scaladoc ("Skew honesty") and
    // BENCH_NOTES rounds 3-4. This run stays as the recorded evidence:
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    run("ngram_jaccard 10x+hot skew-scaled",
      Dedup.ngramJaccardPairs(docsHot, "text", "doc_id"))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    run("minhash_lsh sf0.1", Dedup.minhashLshPairs(docs1, "text", "doc_id"))
    run("minhash_lsh 10x+hot", Dedup.minhashLshPairs(docsHot, "text", "doc_id"))
    run("simhash_pairs 10x capped",
      Dedup.simhashPairs(docsHot, "text", "doc_id", maxChunkFreq = 2000))
    run("lsh_topk sf0.1 (16 buckets)", Similarity.lshTopK(emb1, planes, k = 5))
    run("lsh_topk 10x (128 buckets)", Similarity.lshTopK(emb10, planes10, k = 5))
    run("ivf_topk sf0.1 (nlist=16)", Similarity.ivfTopK(emb1, k = 5))
    run("ivf_topk 10x (nlist=64)", Similarity.ivfTopK(emb10, k = 5, nlist = 64, nprobe = 6))
    spark.stop()
  }
}
