package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with batched per-partition feature extraction.
  *
  * The Spark-side machinery — binary columns with a metadata struct,
  * deterministic partition-local batch processing, fixed-width feature
  * output — is real and tested. Two decoders ride on it:
  * [[decodeImages]], a REAL image decode through the JDK's
  * `javax.imageio` (PNG/JPEG/GIF/BMP — no external codecs needed); and
  * [[decodeStub]], the byte-histogram fallback for payloads whose codec
  * isn't available in-JVM (audio/video), kept as the documented stand-in.
  * Swapping decoders changes only the mapPartitions body; schema,
  * batching, and partitioning are identical.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Int)
  case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Float])
  case class ImageFeature(doc_id: Long, width: Int, height: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double)

  /** Wrap a text corpus as a media table: binary payload + metadata struct
    * (the shape an image/audio table would have; payload is opaque bytes).
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime"),
      length(encode(col("text"), "UTF-8")).as("n_bytes"))

  /** STUB decode: 16-bin byte histogram, L1-normalized — stands in for
    * image decode / audio feature extraction. Deterministic and
    * partition-local (mapPartitions batches rows through one "decoder"
    * instance per partition, the same lifecycle a real codec needs).
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "decoder" init would go here (codec handle, model…)
        rows.map { r =>
          val hist = new Array[Float](16)
          var i = 0
          while (i < r.media.length) {
            hist((r.media(i) & 0xFF) / 16) += 1f
            i += 1
          }
          val total = math.max(1, r.media.length).toFloat
          MediaFeature(r.doc_id, r.media.length, hist.map(_ / total))
        }
      }
  }

  /** REAL image decode via `javax.imageio` in the same mapPartitions batch
    * shape as [[decodeStub]]: dimensions + per-channel pixel means per
    * image. Non-decodable payloads yield (-1, -1, NaN…) rather than
    * failing the partition (a 100 TB crawl always carries corrupt files).
    * Integer pixel sums accumulate in Long, so the means are exact when
    * the true mean is representable (e.g. solid-color test images).
    *
    * Codec lifecycle: an `ImageReader` is resolved from the IIORegistry
    * ONCE per (partition, mime) and reused across rows — per-row static
    * `ImageIO.read` walks the partially-synchronized registry on every
    * image, which 32 executor threads turn into lock contention (measured
    * as a 2× run-to-run spread on mm_image_decode before this). Readers
    * live for the partition and are freed on GC; `setInput` per row resets
    * the instance.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeature] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        val readers = scala.collection.mutable.Map.empty[String, Option[javax.imageio.ImageReader]]
        def readerFor(mime: String): Option[javax.imageio.ImageReader] =
          readers.getOrElseUpdate(mime, {
            val it = javax.imageio.ImageIO.getImageReadersByMIMEType(mime)
            if (it.hasNext) Some(it.next()) else None
          })
        rows.map { r =>
          val fast: java.awt.image.BufferedImage =
            readerFor(r.mime) match {
              case Some(reader) =>
                try {
                  // MemoryCacheImageInputStream wraps the bytes without a
                  // registry lookup (ImageIO.createImageInputStream takes one)
                  val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                    new java.io.ByteArrayInputStream(r.media))
                  reader.setInput(iis)
                  val out = reader.read(0)
                  iis.close()
                  out
                } catch { case _: Exception => null } // corrupt payload
              case None => null // no codec registered for this mime
            }
          // mislabeled-mime fallback: content-sniffing ImageIO.read walks
          // the registry, but only rows the mime-selected reader rejected
          // pay that cost (rare on a labeled corpus)
          val img =
            if (fast != null) fast
            else try {
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
            } catch { case _: Exception => null }
          if (img == null)
            ImageFeature(r.doc_id, -1, -1, Double.NaN, Double.NaN, Double.NaN)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF
                sg += (p >> 8) & 0xFF
                sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            ImageFeature(r.doc_id, w, h, sr / n, sg / n, sb / n)
          }
        }
      }
  }

  /** Deterministic synthetic PNG table: one solid-color image per id, dims
    * and channel color pure functions of doc_id — so an encode→decode
    * round trip through [[decodeImages]] is verifiable by recomputing
    * width/height/means arithmetically (the cross-engine oracle for
    * mm_image_decode). Encoding runs in executors (mapPartitions), one
    * ImageIO pipeline per partition — the same batch lifecycle a real
    * media-ingest job has.
    */
  def syntheticPngTable(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      // one ImageWriter per partition (same registry-contention story as
      // decodeImages — per-row ImageIO.write resolves the writer each call)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      it.map { id =>
        val w = (1 + id % 7).toInt
        val h = (1 + id % 5).toInt
        val rgb = ((id % 256) << 16 | ((id * 7) % 256) << 8 | (id * 13) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.flush()
        (id, bos.toByteArray, "image/png", bos.size())
      }
    }.toDF("doc_id", "media", "mime", "n_bytes")
  }

  case class ResizedImage(doc_id: Long, width: Int, height: Int,
                          new_w: Int, new_h: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double)

  /** Fit (w, h) inside a `maxDim` box preserving aspect ratio — pure
    * integer arithmetic (floor division, floor ≥ 1) so an SQL oracle can
    * replicate the target dims exactly.
    */
  def targetDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val mx = math.max(w, h)
    if (mx <= maxDim) (w, h)
    else (math.max(1, w * maxDim / mx), math.max(1, h * maxDim / mx))
  }

  /** REAL image resize — the training-pipeline downscale step, decode →
    * scale into a `maxDim` bounding box → pixel stats of the RESIZED
    * raster, all through the JDK (`javax.imageio` + a headless
    * `Graphics2D` nearest-neighbor draw; no external codecs). Same
    * per-partition codec lifecycle as [[decodeImages]]; non-decodable
    * payloads yield (-1, -1, -1, -1, NaN…) rather than failing the
    * partition.
    *
    * Oracle-ability: target dims are [[targetDims]]'s integer arithmetic,
    * and for solid-color inputs every resized pixel keeps the source
    * color (nearest-neighbor copies pixels), so the channel means are
    * exact — mm_image_resize recomputes all of it from doc_id.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   maxDim: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        val readers = scala.collection.mutable.Map.empty[String, Option[javax.imageio.ImageReader]]
        def readerFor(mime: String): Option[javax.imageio.ImageReader] =
          readers.getOrElseUpdate(mime, {
            val it = javax.imageio.ImageIO.getImageReadersByMIMEType(mime)
            if (it.hasNext) Some(it.next()) else None
          })
        rows.map { r =>
          val img: java.awt.image.BufferedImage =
            readerFor(r.mime) match {
              case Some(reader) =>
                try {
                  val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                    new java.io.ByteArrayInputStream(r.media))
                  reader.setInput(iis)
                  val out = reader.read(0)
                  iis.close()
                  out
                } catch { case _: Exception => null }
              case None => null
            }
          if (img == null)
            ResizedImage(r.doc_id, -1, -1, -1, -1,
              Double.NaN, Double.NaN, Double.NaN)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val (nw, nh) = targetDims(w, h, maxDim)
            val scaled = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < nh) {
              var x = 0
              while (x < nw) {
                val p = scaled.getRGB(x, y)
                sr += (p >> 16) & 0xFF
                sg += (p >> 8) & 0xFF
                sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (nw.toLong * nh).toDouble
            ResizedImage(r.doc_id, w, h, nw, nh, sr / n, sg / n, sb / n)
          }
        }
      }
  }

  /** "Frame sampling" over an opaque payload: k fixed-width byte windows at
    * even strides (the video-frame-sample access pattern, bytes standing in
    * for frames).
    */
  def frameSample(media: DataFrame, frames: Int = 4, width: Int = 8): DataFrame =
    media.select(col("doc_id"), col("n_bytes"),
      transform(sequence(lit(0), lit(frames - 1)),
        i => col("media").substr(lit(1) + i * (col("n_bytes") / frames).cast("int"), lit(width)))
        .as("frames"))
}
