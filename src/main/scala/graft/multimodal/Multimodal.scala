package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata — the multimodal
  * column model (image/audio/video as `binary` with a metadata struct).
  * Payloads here are synthesized deterministically from `documents.text`
  * because no media codecs ship in this container; the SPARK-SIDE PLUMBING
  * (schema, batching, partition-parallel decode, feature schema) is real. */
final case class MediaItem(
    doc_id: Long,
    modality: String,
    width: Int,
    height: Int,
    payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    n_frames: Long,
    mean_byte: Double,
    payload_fp: Long)

final case class ResizedMedia(
    doc_id: Long,
    out_bytes: Long,
    checksum: Long,
    resized_fp: Long)

final case class SampledFrames(
    doc_id: Long,
    n_sampled: Long,
    bytes_sampled: Long,
    sampled_fp: Long)

final case class MediaEmbedding(doc_id: Long, hv: Array[Double])

/** Decoded-image statistics through the REAL codec path (javax.imageio):
  * dimensions as decoded, exact pixel sum, and the pixel sum of a 16×16
  * nearest-neighbor resize of the decoded raster. */
final case class ImageStats(
    doc_id: Long,
    width: Int,
    height: Int,
    px_sum: Long,
    resized_sum: Long)

object Multimodal {

  /** Bytes per synthetic "frame" (a decoded chunk unit — stands in for an
    * image tile / audio frame). */
  val FrameBytes = 256

  /** Synthesize a media table from documents: payload = UTF-8 bytes of the
    * text (deterministic), modality round-robins over image/audio/video,
    * metadata derives from doc stats. */
  def synthesize(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      (pmod(col("n_chars"), lit(64)) * 10 + 16).cast("int").as("width"),
      (pmod(col("n_chars"), lit(48)) * 10 + 16).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** Decode one payload into per-frame "pixel" batches.
    *
    * STUB — used for opaque non-image payloads (audio/video fixtures,
    * plain bytes): the payload bytes ARE the "samples". The batching shape
    * (one call per item, frames chunked at [[FrameBytes]]) is what a real
    * codec sees. Real PNG/JPEG payloads take [[decodeImage]] instead
    * (sniffed by magic bytes in [[decodeFrames]]). */
  def decodeFramesStub(payload: Array[Byte]): Iterator[Array[Byte]] =
    payload.grouped(FrameBytes)

  /** PNG (\x89PNG) / JPEG (\xFF\xD8) magic sniff — the dispatch between
    * the real javax.imageio codec and the opaque-payload stub. */
  def isImagePayload(payload: Array[Byte]): Boolean =
    payload.length >= 4 &&
      (((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G') ||
        ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8))

  /** REAL image decode via javax.imageio (JDK-shipped PNG/JPEG codecs) —
    * runs inside executor tasks; the in-memory stream avoids ImageIO's
    * temp-file cache. Returns None for payloads no registered reader
    * accepts — including payloads a reader CLAIMS (magic-byte match) but
    * then fails on (a corrupt body throws from ImageIO.read); a sniffed
    * payload that is not actually a decodable image must fall back to the
    * stub codec, not fail the task. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException | _: RuntimeException => None }
  }

  /** Codec dispatch: a PNG/JPEG payload decodes through javax.imageio and
    * yields one frame per pixel ROW (the raster scanline — the natural
    * frame unit of an image); anything else chunks through the stub. The
    * partition-parallel plumbing above this call is identical either way. */
  def decodeFrames(payload: Array[Byte]): Iterator[Array[Byte]] =
    if (!isImagePayload(payload)) decodeFramesStub(payload)
    else decodeImage(payload) match {
      case None => decodeFramesStub(payload)
      case Some(img) =>
        val raster = img.getRaster
        val w = img.getWidth
        (0 until img.getHeight).iterator.map { y =>
          val row = new Array[Byte](w)
          var x = 0
          while (x < w) { row(x) = raster.getSample(x, y, 0).toByte; x += 1 }
          row
        }
    }

  /** Deterministic grayscale test pattern: pixel (x, y) of document `id`.
    * Closed-form, so the DuckDB oracle recomputes decoded-pixel sums
    * arithmetically while Spark round-trips them through REAL PNG
    * encode/decode (lossless for 8-bit grayscale). */
  def pixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Synthesize REAL PNG payloads (javax.imageio encode, executor-side):
    * one 8-bit grayscale image per document, dimensions from n_chars, the
    * deterministic [[pixel]] pattern as content. This is the fixture
    * generator for the real-codec path — everything downstream of it
    * treats the payload as an opaque image file. */
  def synthesizeImages(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val w = (16 + nChars % 13).toInt
          val h = (16 + nChars % 11).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaItem(id, "image", w, h, baos.toByteArray)
        }
      }
  }

  /** Decode every payload through the REAL codec and fold pixel stats:
    * dimensions as decoded, exact pixel sum, and the pixel sum of a 16×16
    * nearest-neighbor resize of the DECODED raster (out(i,j) =
    * in(i·w/16, j·h/16)). One sequential pass per item, partition-parallel,
    * no shuffle — the same plumbing shape as the stub ops, with
    * javax.imageio doing genuine PNG/JPEG work in the middle. */
  def imageStats(items: Dataset[MediaItem]): Dataset[ImageStats] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { item =>
        val img = decodeImage(item.payload).getOrElse(
          throw new IllegalStateException(
            s"doc ${item.doc_id}: payload is not a decodable image"))
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        var s = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        var rs = 0L
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) {
            rs += raster.getSample(i * w / 16, j * h / 16, 0)
            i += 1
          }
          j += 1
        }
        ImageStats(item.doc_id, w, h, s, rs)
      }
    }
  }

  /** Resize target: every payload downsamples to this many "pixels". */
  val ResizeTo = 256
  /** Frame-sample stride: keep every k-th decoded frame (keyframe model). */
  val SampleEvery = 4

  /** Nearest-neighbor downsample of a decoded payload to [[ResizeTo]]
    * samples — the resize op of an image pipeline, over the stub codec's
    * byte-"pixels": out(p) = in(p * n / ResizeTo). Deterministic, O(out),
    * no intermediate full-resolution buffer. */
  def resizeStub(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    if (n == 0) return Array.emptyByteArray
    val out = new Array[Byte](ResizeTo)
    var p = 0
    while (p < ResizeTo) {
      out(p) = payload((p.toLong * n / ResizeTo).toInt)
      p += 1
    }
    out
  }

  /** Keep every [[SampleEvery]]-th frame of the decoded stream — the
    * keyframe-extraction op of a video pipeline. Streams through the codec
    * iterator; memory is one frame, never the decoded payload. */
  def sampleFramesStub(payload: Array[Byte]): Iterator[Array[Byte]] =
    decodeFramesStub(payload).zipWithIndex
      .collect { case (f, i) if i % SampleEvery == 0 => f }

  /** Partition-parallel resize: one pass per item, fixed output schema
    * (size, checksum, rolling fingerprint of the resized samples). */
  def resizeAll(items: Dataset[MediaItem]): Dataset[ResizedMedia] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        val out = resizeStub(item.payload)
        var sum = 0L
        var fp = 0L
        var i = 0
        while (i < out.length) {
          val b = out(i) & 0xff
          sum += b
          fp = (fp * 31 + b) % 1000000007L
          i += 1
        }
        ResizedMedia(item.doc_id, out.length.toLong, sum, fp)
      }
    }
  }

  /** Partition-parallel frame sampling: fingerprint + byte count over the
    * kept frames only. */
  def sampleAll(items: Dataset[MediaItem]): Dataset[SampledFrames] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        var frames = 0L
        var bytes = 0L
        var fp = 0L
        sampleFramesStub(item.payload).foreach { frame =>
          frames += 1
          var i = 0
          while (i < frame.length) {
            val b = frame(i) & 0xff
            bytes += 1
            fp = (fp * 31 + b) % 1000000007L
            i += 1
          }
        }
        SampledFrames(item.doc_id, frames, bytes, fp)
      }
    }
  }

  /** STUB media encoder: payload bytes → 64-dim histogram feature vector
    * (count of bytes per value-class). The real implementation would run a
    * vision/audio encoder here; the vector shape, determinism, and
    * downstream ANN plumbing are what this exercises. */
  def embedStub(payload: Array[Byte]): Array[Double] = {
    val h = new Array[Double](64)
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xff) % 64) += 1.0; i += 1 }
    h
  }

  /** Partition-parallel payload → embedding: the encode stage of a
    * multimodal retrieval pipeline (no shuffle, no driver collection). */
  def embedAll(items: Dataset[MediaItem]): Dataset[MediaEmbedding] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.map(i => MediaEmbedding(i.doc_id, embedStub(i.payload))))
  }

  /** Partition-parallel batched feature extraction: the multimodal
    * equivalent of a vectorized decode UDF. Each partition iterates its
    * items once, decodes frame batches through the codec dispatch (real
    * javax.imageio for PNG/JPEG payloads, the stub for opaque ones), and
    * emits a fixed feature schema. No shuffle, no driver collection;
    * partitioning is whatever the upstream table had. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        var n = 0L
        var sum = 0L
        var fp = 0L
        var frames = 0L
        decodeFrames(item.payload).foreach { frame =>
          frames += 1
          var i = 0
          while (i < frame.length) {
            val b = frame(i) & 0xff
            n += 1
            sum += b
            fp = (fp * 31 + b) % 1000000007L
            i += 1
          }
        }
        MediaFeatures(item.doc_id, item.modality, n, frames,
          if (n == 0) 0.0 else sum.toDouble / n, fp)
      }
    }
  }
}
