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
    * STUB — the real implementation would JPEG/PNG/PCM-decode here; this
    * container ships no media libraries, so the decode is a deterministic
    * fake: the payload bytes ARE the "samples". The batching shape (one call
    * per item, frames chunked at [[FrameBytes]]) is what a real codec would
    * see. */
  def decodeFramesStub(payload: Array[Byte]): Iterator[Array[Byte]] =
    payload.grouped(FrameBytes)

  /** Partition-parallel batched feature extraction: the multimodal
    * equivalent of a vectorized decode UDF. Each partition iterates its
    * items once, decodes frame batches through the stub codec, and emits a
    * fixed feature schema. No shuffle, no driver collection; partitioning is
    * whatever the upstream table had. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { item =>
        var n = 0L
        var sum = 0L
        var fp = 0L
        var frames = 0L
        decodeFramesStub(item.payload).foreach { frame =>
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
