package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "abc def"), (2L, "zzzz"), (3L, "")).toDF("doc_id", "text")

  test("asMediaTable produces binary payload with correct byte metadata") {
    val m = Multimodal.asMediaTable(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Array[Byte]]("media").length, r.getAs[Int]("n_bytes"))).toMap
    assert(m(1L) === ((7, 7)))
    assert(m(2L) === ((4, 4)))
    assert(m(3L) === ((0, 0)))
  }

  test("decodeStub emits fixed-width L1-normalized features, deterministically") {
    val feats = Multimodal.decodeStub(spark, Multimodal.asMediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.values.forall(_.feature.length == 16))
    val sum1 = feats(1L).feature.sum
    assert(math.abs(sum1 - 1.0f) < 1e-6, s"histogram should be L1-normalized, got $sum1")
    // 'z' = 0x7a → bin 7; all 4 bytes of doc 2 land there
    assert(feats(2L).feature(7) === 1.0f)
    // empty payload → all-zero feature, no crash
    assert(feats(3L).feature.forall(_ == 0f))
    // determinism across runs
    val again = Multimodal.decodeStub(spark, Multimodal.asMediaTable(docs))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(again(1L) === feats(1L).feature.toSeq)
  }

  test("frameSample cuts k windows from the payload") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "0123456789abcdef0123456789abcdef")).toDF("doc_id", "text"))
    val frames = Multimodal.frameSample(media, frames = 4, width = 8)
      .select(explode(col("frames")).as("f")).as[Array[Byte]].collect()
    assert(frames.length === 4)
    assert(frames.forall(_.length == 8))
    assert(new String(frames(0), "UTF-8") === "01234567")
  }
}
