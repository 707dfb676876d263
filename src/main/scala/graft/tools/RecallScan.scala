package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** One-off recall sweep at sf0.1 to pick honest IVF defaults (iters ×
  * nprobe) for the ≥0.6 recall contract. Not part of the library surface.
  */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (iters <- Seq(2, 4, 6); nprobe <- Seq(4, 5, 6)) {
      val ivf = Similarity.ivfTopK(emb, k = 5, nlist = 16, nprobe = nprobe, iters = iters)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect ivf).size.toDouble / brute.size
      println(f"iters=$iters nprobe=$nprobe recall=$recall%.3f")
    }
    spark.stop()
  }
}
