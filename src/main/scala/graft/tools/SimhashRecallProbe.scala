package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup
import graft.sources.Tables

/** Floor-provenance probe for the dd_simhash_recall gate (the RecallProbe
  * pattern applied to SimHash): measures what fraction of the exact
  * >= 0.9-Jaccard near-dup pairs simhashPairs(maxHamming=3) recovers at a
  * given SF. Run per SF; the measured band (with margin) sets
  * SimhashRecallFloorPct in LlmQueries.
  *
  * Usage: runMain graft.tools.SimhashRecallProbe <sfDir> [<sfDir> ...]
  */
object SimhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val sim = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
        .select("id_a", "id_b").localCheckpoint(false)
      for (t <- Seq(0.9, 0.95, 0.98, 0.995)) {
        val truth = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          n = 3, threshold = t).select("id_a", "id_b")
        val caught = truth.join(sim, Seq("id_a", "id_b"), "left_semi")
        val nTrue = truth.count()
        val nCaught = caught.count()
        val pct = if (nTrue == 0) 100.0 else 100.0 * nCaught / nTrue
        println(f"[simhash-recall] $dir t=$t n_true=$nTrue n_caught=$nCaught recall=$pct%.1f%%")
      }
    }
    spark.stop()
  }
}
