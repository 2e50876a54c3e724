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

  test("real PNG codec: encode → decode round-trips every pixel exactly") {
    val sp = spark; import sp.implicits._
    val docs = Seq((5L, "x" * 37), (6L, "y" * 101)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val items = Multimodal.synthesizeImages(docs).collect()
    assert(items.length == 2)
    items.foreach { item =>
      // a real PNG file came out of the encoder
      assert(Multimodal.isImagePayload(item.payload), "payload lacks PNG magic")
      val img = Multimodal.decodeImage(item.payload).get
      assert(img.getWidth == item.width && img.getHeight == item.height)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(img.getRaster.getSample(x, y, 0) ==
          Multimodal.pixel(item.doc_id, x, y), s"pixel ($x,$y) of ${item.doc_id}")
    }
    // imageStats folds the decoded raster to the closed-form sums
    val stats = Multimodal.imageStats(
      Multimodal.synthesizeImages(docs)).collect().sortBy(_.doc_id)
    stats.foreach { st =>
      var s = 0L
      for (y <- 0 until st.height; x <- 0 until st.width)
        s += Multimodal.pixel(st.doc_id, x, y)
      assert(st.px_sum == s)
      var rs = 0L
      for (j <- 0 until 16; i <- 0 until 16)
        rs += Multimodal.pixel(st.doc_id, i * st.width / 16, j * st.height / 16)
      assert(st.resized_sum == rs)
    }
  }

  test("codec dispatch: PNG payloads take imageio, opaque ones the stub") {
    // an image payload yields one frame per scanline through the real codec
    val sp = spark; import sp.implicits._
    val docs = Seq((9L, "z" * 55)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val item = Multimodal.synthesizeImages(docs).head()
    val frames = Multimodal.decodeFrames(item.payload).toSeq
    assert(frames.length == item.height && frames.forall(_.length == item.width))
    // a text payload sniffs as non-image and chunks through the stub
    val text = "hello world".getBytes
    assert(!Multimodal.isImagePayload(text))
    assert(Multimodal.decodeFrames(text).toSeq.map(_.toSeq) ==
      Multimodal.decodeFramesStub(text).toSeq.map(_.toSeq))
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
