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

  test("decodeImages round-trips real PNGs: exact dims and channel means") {
    val ids = Seq(0L, 1L, 6L, 13L, 255L, 256L).toDF("doc_id")
    val feats = Multimodal.decodeImages(spark, Multimodal.syntheticPngTable(spark, ids))
      .collect().map(f => f.doc_id -> f).toMap
    ids.as[Long].collect().foreach { id =>
      val f = feats(id)
      assert(f.width === (1 + id % 7).toInt, s"width of $id")
      assert(f.height === (1 + id % 5).toInt, s"height of $id")
      assert(f.mean_r === (id % 256).toDouble, s"mean_r of $id")
      assert(f.mean_g === ((id * 7) % 256).toDouble, s"mean_g of $id")
      assert(f.mean_b === ((id * 13) % 256).toDouble, s"mean_b of $id")
    }
  }

  test("decodeImages decodes mislabeled-mime payloads via the sniffing fallback") {
    // PNG bytes labeled image/jpeg: the mime-selected JPEG reader rejects
    // them; the content-sniffing ImageIO.read fallback must still decode
    val mislabeled = Multimodal.syntheticPngTable(spark, Seq(6L, 13L).toDF("doc_id"))
      .withColumn("mime", lit("image/jpeg"))
    val feats = Multimodal.decodeImages(spark, mislabeled)
      .collect().map(f => f.doc_id -> f).toMap
    Seq(6L, 13L).foreach { id =>
      assert(feats(id).width === (1 + id % 7).toInt, s"width of $id")
      assert(feats(id).mean_r === (id % 256).toDouble, s"mean_r of $id")
    }
  }

  test("decodeImages flags non-decodable payloads instead of failing the partition") {
    val junk = Multimodal.asMediaTable(docs) // text/plain bytes, not an image
    val feats = Multimodal.decodeImages(spark, junk).collect()
    assert(feats.length === 3)
    assert(feats.forall(f => f.width == -1 && f.height == -1 && f.mean_r.isNaN))
  }

  test("resizeImages fits the box, keeps aspect floors, survives junk") {
    // targetDims: pure integer contract
    assert(Multimodal.targetDims(7, 5, 4) === ((4, 2)))  // 7x5 -> 4x(5*4/7=2)
    assert(Multimodal.targetDims(3, 2, 4) === ((3, 2)))  // already inside
    assert(Multimodal.targetDims(100, 1, 4) === ((4, 1))) // floor >= 1
    // synthetic solid PNGs: dims follow targetDims, colors survive exactly
    val ids = Seq(6L, 13L, 34L).toDF("doc_id")
    val out = Multimodal.resizeImages(spark,
        Multimodal.syntheticPngTable(spark, ids), maxDim = 4)
      .collect().map(r => r.doc_id -> r).toMap
    Seq(6L, 13L, 34L).foreach { id =>
      val r = out(id)
      val (w, h) = ((1 + id % 7).toInt, (1 + id % 5).toInt)
      assert((r.width, r.height) === ((w, h)))
      assert((r.new_w, r.new_h) === Multimodal.targetDims(w, h, 4))
      assert(r.mean_r === (id % 256).toDouble)
      assert(r.mean_b === ((id * 13) % 256).toDouble)
    }
    // junk payloads flag, not fail
    val junk = Multimodal.resizeImages(spark, Multimodal.asMediaTable(docs), 4)
      .collect()
    assert(junk.forall(f => f.new_w == -1 && f.mean_r.isNaN))
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
