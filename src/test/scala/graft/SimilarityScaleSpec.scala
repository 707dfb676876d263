package graft

import org.scalatest.Tag
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
}
