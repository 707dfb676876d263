package graft

import org.scalatest.Tag
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Slow, sf0.1-scale recall checks for the approximate ANN paths (the
  * SimilaritySpec recall numbers come from sf0.001 fixtures; these assert
  * the same contract at 10× the vectors, where bucket/list occupancy is
  * realistic). Tagged so a fast loop can exclude them
  * (`testOnly -- -l graft.SlowTest`); skipped if the sf0.1 testdata
  * directory is absent.
  */
object SlowTest extends Tag("graft.SlowTest")

class SimilarityScaleSpec extends SparkTestBase {
  import spark.implicits._

  private def sf01 = new java.io.File(sf("sf0.1") + "/embeddings.parquet")

  test("ivfTopK recall@5 >= 0.6 at sf0.1 with default params", SlowTest) {
    assume(sf01.exists(), "sf0.1 testdata not present")
    val emb = spark.read.parquet(sf01.toString)
    val brute = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"IVF recall@5 at sf0.1 = $recall%.3f (defaults: nlist=16, nprobe=6)")
    assert(recall >= 0.6, f"IVF recall@5 $recall%.3f below 0.6 at sf0.1")
  }

  test("lshTopK recall@5 nontrivial at sf0.1; multi-probe strictly improves it", SlowTest) {
    assume(sf01.exists(), "sf0.1 testdata not present")
    val emb = spark.read.parquet(sf01.toString)
    val planes = Similarity.hyperplanes(4, 64, 42L)
    val brute = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, planes, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH recall@5 at sf0.1 = $recall%.3f (4 planes, single probe)")
    // single-probe sign-LSH recall is structurally modest; the contract is
    // "nontrivial and every returned pair is exactly scored", not high recall
    assert(recall > 0.1, f"LSH recall@5 $recall%.3f collapsed at sf0.1")
    val mp = Similarity.lshTopKMultiProbe(emb, planes, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mpRecall = (brute intersect mp).size.toDouble / brute.size
    info(f"multi-probe LSH recall@5 at sf0.1 = $mpRecall%.3f (5 probes)")
    assert(mpRecall > recall, f"multi-probe $mpRecall%.3f not above single-probe $recall%.3f")
  }

  test("prebuilt IVF index: build+query ≡ ivfTopK; survives a parquet round-trip") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val direct = Similarity.ivfTopK(emb, k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet

    val (centroids, corpus) = Similarity.ivfBuildIndex(emb, nlist = 8)
    val viaIndex = Similarity.ivfQueryIndex(centroids, corpus, emb, k = 5, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaIndex === direct, "prebuilt-index query diverges from the fused ivfTopK pass")

    // amortization contract: the index persists and the RELOADED index
    // answers identically (float arrays round-trip parquet losslessly)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.write.mode("overwrite").parquet(s"$dir/corpus")
    val reloaded = Similarity.ivfQueryIndex(
      spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/corpus"),
      emb, k = 5, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(reloaded === direct, "reloaded index diverges from the in-memory build")

    // disjoint query ids: an id-shifted COPY of each vector queries the
    // index; its assigned probe[0] equals the original's inverted list
    // (identical vector, identical tie-breaks), the self-filter no longer
    // bites, so rank 1 must be the original vector itself (cos = 1)
    val shifted = emb.withColumn("vec_id", col("vec_id") + 1000000L)
    val top1 = Similarity.ivfQueryIndex(centroids, corpus, shifted, k = 5, nprobe = 3)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length === emb.count())
    assert(top1.forall { case (q, nb) => nb === q - 1000000L },
      "shifted copy's nearest neighbor is not its own original")
  }

  test("prebuilt IVF-PQ index: build+query ≡ ivfPqTopK; survives a parquet round-trip") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val direct = Similarity.ivfPqTopK(emb, k = 5, nlist = 8, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet

    val (centroids, encoded) = Similarity.ivfPqBuildIndex(emb, nlist = 8)
    val viaIndex = Similarity.ivfPqQueryIndex(centroids, encoded, emb, emb,
        k = 5, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaIndex === direct, "prebuilt IVF-PQ query diverges from the fused pass")

    val dir = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    encoded.write.mode("overwrite").parquet(s"$dir/encoded")
    val reloaded = Similarity.ivfPqQueryIndex(
      spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/encoded"),
      emb, emb, k = 5, nprobe = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(reloaded === direct, "reloaded IVF-PQ index diverges from the in-memory build")
  }
}
