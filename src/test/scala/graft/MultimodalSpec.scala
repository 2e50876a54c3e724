package graft

import graft.multimodal.{MediaItem, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batching shape, partition preservation. */
class MultimodalSpec extends SparkSpec {

  test("synthesize emits binary payloads with typed metadata") {
    val items = Multimodal.synthesize(Tables.load(spark, sfDir, "documents"))
    val row = items.head()
    assert(Set("image", "audio", "video").contains(row.modality))
    assert(row.payload.nonEmpty && row.width > 0 && row.height > 0)
    assert(items.count() == Tables.load(spark, sfDir, "documents").count())
  }

  test("decode stub chunks payloads into FrameBytes-sized frames") {
    val frames = Multimodal.decodeFramesStub(Array.fill[Byte](600)(1)).toSeq
    assert(frames.map(_.length) == Seq(256, 256, 88))
    assert(Multimodal.decodeFramesStub(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures is partition-preserving (no shuffle) and complete") {
    val items = Multimodal.synthesize(
      Tables.load(spark, sfDir, "documents")).repartition(7)
    val feats = Multimodal.extractFeatures(items)
    assert(feats.rdd.getNumPartitions == 7)
    val rows = feats.collect()
    assert(rows.length == items.count())
    rows.foreach { f =>
      assert(f.n_frames == (f.n_bytes + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes)
      assert(f.mean_byte >= 0.0 && f.mean_byte < 256.0)
    }
  }

  test("resize stub is nearest-neighbor at exactly ResizeTo samples") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val out = Multimodal.resizeStub(payload)
    assert(out.length == Multimodal.ResizeTo)
    (0 until Multimodal.ResizeTo).foreach { p =>
      assert(out(p) == payload((p.toLong * 1000 / Multimodal.ResizeTo).toInt))
    }
    // shorter-than-target payloads upsample by repetition, no OOB
    val tiny = Multimodal.resizeStub(Array[Byte](7, 9))
    assert(tiny.length == Multimodal.ResizeTo && tiny.toSet == Set(7.toByte, 9.toByte))
    assert(Multimodal.resizeStub(Array.emptyByteArray).isEmpty)
  }

  test("frame sampling keeps exactly every SampleEvery-th frame") {
    val payload = Array.fill[Byte](256 * 9 + 10)(1)
    val kept = Multimodal.sampleFramesStub(payload).toSeq
    // frames 0,4,8 of the 10-frame stream
    assert(kept.length == 3)
    assert(kept.map(_.length) == Seq(256, 256, 256))
    val all = Multimodal.decodeFramesStub(payload).toSeq
    assert(kept(2).sameElements(all(8)))
  }

  test("resizeAll and sampleAll are partition-preserving") {
    val items = Multimodal.synthesize(
      Tables.load(spark, sfDir, "documents")).repartition(5)
    assert(Multimodal.resizeAll(items).rdd.getNumPartitions == 5)
    assert(Multimodal.sampleAll(items).rdd.getNumPartitions == 5)
  }

  test("features are deterministic for a fixed payload") {
    val sp = spark; import sp.implicits._
    val one = Seq(MediaItem(1L, "image", 4, 4, "abcd".getBytes)).toDS()
    val f = Multimodal.extractFeatures(one).head()
    // rolling hash of 'a','b','c','d' mod 1e9+7
    val expected = "abcd".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(f.payload_fp == expected && f.n_bytes == 4 && f.n_frames == 1)
  }
}
