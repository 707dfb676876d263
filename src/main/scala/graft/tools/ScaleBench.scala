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
  * BENCH_NOTES.md (rounds 3-4).
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
