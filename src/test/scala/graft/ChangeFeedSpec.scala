package graft

import graft.sources.cassandralike._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The cell store as a streaming SOURCE (CellChangeFeedStream): offsets are
  * single manifest sequence numbers (O(1) bytes however long the stream
  * lives), each micro-batch emits exactly the delta segments' rows
  * (batch-local LWW + tombstone reconciliation), resume from a checkpoint
  * processes only segments committed while the stream was down, and a
  * from-scratch catch-up equals the batch scan. */
class ChangeFeedSpec extends SparkSpec {

  private def freshStore(name: String): String = {
    val dir = s"${Seed.storeRoot(sfDir)}/$name"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta("id BIGINT,v STRING", ":key,v", Map.empty))
    dir
  }

  private def append(dir: String, ts: Long, rows: Seq[(Long, String)]): Unit = {
    val sp = spark; import sp.implicits._
    Seed.append(rows.toDF("id", "v"), dir, Map(Options.WriteTimestamp -> ts.toString))
  }

  /** One AvailableNow drain of the feed, resuming from `ckpt`; returns the
    * emitted (id, v) rows of THIS run only. foreachBatch, not the memory
    * sink — memory doesn't support checkpoint recovery in append mode. */
  private def drain(dir: String, ckpt: String, name: String,
      readOptions: Map[String, String] = Map.empty): Seq[(Long, String)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var reader = spark.readStream.format("cassandralike").option(Options.Path, dir)
    readOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1)))
        buf.synchronized { buf ++= rows }; ()
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    buf.synchronized(buf.toSeq)
  }

  test("offset json roundtrip, empty and populated; bad names rejected") {
    assert(SegmentSetOffset(Set.empty).json == "[]")
    assert(SegmentSetOffset.fromJson("[]") == SegmentSetOffset(Set.empty))
    val o = SegmentSetOffset(Set("b3-abc.bin", "b11-def.bin"))
    assert(SegmentSetOffset.fromJson(o.json) == o)
    assert(SegmentSetOffset.bucketOf("b11-def.bin") == 11)
    intercept[IllegalArgumentException](SegmentSetOffset(Set("tmp-x-b1.bin")))
  }

  test("manifest log compaction bounds file count; reload is exact") {
    val dir = java.nio.file.Files.createTempDirectory("manifestc")
    val m = new SegmentManifest(dir)
    val entries = (1 to 150).map(i => s"b${i % 4}-e$i.bin" -> (i % 5 == 0))
    entries.foreach(e => m.append(Seq(e)))
    assert(m.size == 150)
    import scala.jdk.CollectionConverters._
    def files() = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    val onDisk = files()
    assert(onDisk.count(_.endsWith(".log")) < SegmentManifest.CompactEvery,
      s"deltas must compact away: $onDisk")
    assert(onDisk.exists(_.endsWith(".compact")), "expected a compact snapshot")
    // fresh reload reproduces every (seq, name, flag) exactly
    val m2 = new SegmentManifest(dir)
    assert(m2.size == 150)
    entries.zipWithIndex.foreach { case ((n, f), i) =>
      assert(m2.seqOf(n).contains(i + 1L) && m2.isFree(i + 1L) == f,
        s"entry $n diverged on reload")
    }
    // an interrupted cleanup (stale subsumed delta left behind) is ignored
    java.nio.file.Files.write(dir.resolve(f"m${5L}%019d.log"),
      "r b0-stale.bin\n".getBytes)
    val m3 = new SegmentManifest(dir)
    assert(m3.size == 150 && m3.seqOf("b0-stale.bin").isEmpty,
      "subsumed leftover delta must be ignored on reload")
  }

  test("checkpointed offset stays O(1) bytes across many epochs") {
    val dir = freshStore("spec_feed_o1")
    val root = java.nio.file.Files.createTempDirectory("cfeedo1").toString
    val ckpt = s"$root/ckpt"
    (1L to 4L).foreach(ts => append(dir, ts, (1L to 3L).map(i => ts * 10 + i -> s"e$ts-$i")))
    drain(dir, ckpt, "o1_run1")
    // more epochs while down; the resumed offset must stay one integer
    (5L to 8L).foreach(ts => append(dir, ts, (1L to 3L).map(i => ts * 10 + i -> s"e$ts-$i")))
    drain(dir, ckpt, "o1_run2")
    val offsets = java.nio.file.Paths.get(ckpt, "offsets")
    import scala.jdk.CollectionConverters._
    val latest = java.nio.file.Files.list(offsets).iterator().asScala.toSeq
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    val sourceOffsetLine = new String(java.nio.file.Files.readAllBytes(latest))
      .split("\n").last.trim
    assert(sourceOffsetLine.matches("\\d+"),
      s"offset must be one integer, got: $sourceOffsetLine")
    assert(sourceOffsetLine.length <= 19,
      s"offset must be O(1) bytes: $sourceOffsetLine")
    // the manifest assigned every committed segment exactly once
    val manifestDir = CellChangeFeedStream.manifestDir(s"$ckpt/sources/0")
    assert(java.nio.file.Files.isDirectory(manifestDir),
      s"manifest missing at $manifestDir")
  }

  test("legacy consumed-set offset migrates to integer offsets, no re-emit") {
    val dir = freshStore("spec_feed_legacy")
    append(dir, ts = 1, (1L to 5L).map(i => i -> s"a$i"))
    val epoch1 = CellStore.allSegmentFiles(dir).values.flatten
      .map(_.getFileName.toString).toSet
    append(dir, ts = 2, (6L to 9L).map(i => i -> s"b$i"))
    val all = CellStore.allSegmentFiles(dir).values.flatten
      .map(_.getFileName.toString).toSet
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    val stream = new CellChangeFeedStream(table, table.schema(), Array.empty,
      Map.empty, java.nio.file.Files.createTempDirectory("cfeedl").toString)
    val startSet = SegmentSetOffset(epoch1) // a pre-manifest checkpoint's offset
    val end = stream.latestOffset(startSet,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .asInstanceOf[SegmentSeqOffset]
    assert(end.seq == all.size, s"migration must assign every segment: $end")
    val parts = stream.planInputPartitions(startSet, end)
    val planned = parts.flatMap(_.asInstanceOf[CellInputPartition].files).toSet
    assert(planned == (all -- epoch1),
      s"migrated batch must read exactly the unseen segments: $planned")
    // steady state from the integer offset: nothing further to admit
    val end2 = stream.latestOffset(end,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(end2 == end, s"no new data must hold position: $end2")
  }

  test("source metrics: consumed/committed/pending surface in query progress") {
    val dir = freshStore("spec_feed_metrics")
    append(dir, ts = 1, (1L to 5L).map(i => i -> s"a$i"))
    append(dir, ts = 2, (6L to 9L).map(i => i -> s"b$i"))
    val root = java.nio.file.Files.createTempDirectory("cfeedm").toString
    val q = spark.readStream.format("cassandralike").option(Options.Path, dir)
      .load()
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metricMaps = q.recentProgress.toSeq
      .flatMap(p => Option(p.sources).toSeq.flatten)
      .flatMap(s => Option(s.metrics))
      .filter(_.containsKey("segmentsConsumed"))
    assert(metricMaps.nonEmpty, "feed metrics missing from query progress")
    val m = metricMaps.last
    // the drain consumed everything committed: no pending backlog
    assert(m.get("segmentsConsumed").toLong >= 2) // one+ segment per append
    assert(m.get("segmentsCommitted").toLong == m.get("segmentsConsumed").toLong)
    assert(m.get("segmentsPending").toLong == 0)
    assert(metricMaps.exists(_.get("batchSegmentsAdmitted").toLong >= 1))
  }

  test("feed surfaces reader seek savings in source metrics") {
    val sp = spark; import sp.implicits._
    // transposed wide row: a static point slice (slice.start = slice.finish
    // — Spark does not run predicate pushdown for streaming scans, so the
    // option knobs are how a feed narrows its read) makes the feed's
    // readers SEEK through the (key,col)-prefixed run index — and the
    // saving must be visible to a stream operator through the progress
    // metrics, not only in the batch scan's per-node UI metrics
    val dir = s"${Seed.storeRoot(sfDir)}/spec_feed_seek"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta(
      "row_key STRING,column_name STRING,value STRING",
      ":key,:column,:value", Map.empty))
    val wide = (0 until 4000).map(i => ("hot", f"c$i%05d", s"v$i"))
    Seed.append(wide.toDF("row_key", "column_name", "value"), dir,
      Map(Options.WriteTimestamp -> "1"))
    val root = java.nio.file.Files.createTempDirectory("cfeedseek").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format("cassandralike").option(Options.Path, dir)
      .option(Options.SliceStart, "c01234").option(Options.SliceFinish, "c01234")
      .load()
      .filter($"column_name" === "c01234")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = b.collect().map(_.getString(2))
        got.synchronized { got ++= vs }; ()
      }
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.synchronized(got.toSeq) == Seq("v1234"))
    val metricMaps = q.recentProgress.toSeq
      .flatMap(p => Option(p.sources).toSeq.flatten)
      .flatMap(s => Option(s.metrics))
      .filter(_.containsKey(ScanMetrics.CellsSeekSkipped))
    assert(metricMaps.nonEmpty, "seek metrics missing from query progress")
    val m = metricMaps.last
    // one match in a 4000-cell row: nearly every index span seeks past
    assert(m.get(ScanMetrics.CellsSeekSkipped).toLong >= 3000,
      s"cellsSeekSkipped=${m.get(ScanMetrics.CellsSeekSkipped)}")
    assert(m.get(ScanMetrics.RunsColSkipped).toLong >= 0) // key present, value surfaced
  }

  test("resume emits only the delta; overwrites re-emit; deletes emit nothing") {
    val dir = freshStore("spec_changefeed")
    val root = java.nio.file.Files.createTempDirectory("cfeed").toString
    val ckpt = s"$root/ckpt"

    append(dir, ts = 1, (1L to 10L).map(i => i -> s"a$i"))
    val first = drain(dir, ckpt, "cfeed_run1")
    assert(first.toSet == (1L to 10L).map(i => i -> s"a$i").toSet, s"first: $first")

    // while the stream is down: 5 new rows + an overwrite of id 1
    append(dir, ts = 2, (11L to 15L).map(i => i -> s"b$i") :+ (1L -> "B1"))
    val second = drain(dir, ckpt, "cfeed_run2")
    assert(second.toSet ==
      ((11L to 15L).map(i => i -> s"b$i").toSet + (1L -> "B1")),
      s"delta run must emit exactly the new segments' rows: $second")

    // a tombstone delete: the delta batch emits nothing for the doomed key
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("id", 2L)))
    val third = drain(dir, ckpt, "cfeed_run3")
    assert(third.isEmpty, s"tombstone-only delta must emit nothing: $third")

    // from-scratch catch-up (fresh checkpoint) = the batch scan's view:
    // one batch over every committed segment, full LWW (id 1 -> B1) and
    // tombstone (id 2 gone) reconciliation
    val catchUp = drain(dir, s"$root/ckpt2", "cfeed_catchup")
    val batch = Seed.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(catchUp.toSet == batch)
    assert(!batch.exists(_._1 == 2L) && batch.contains(1L -> "B1"))
  }

  test("admission control drains a backlog in bounded multi-batch steps") {
    // single-bucket store so one append epoch == exactly one segment
    val dir = s"${Seed.storeRoot(sfDir)}/spec_changefeed_rate"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta("id BIGINT,v STRING", ":key,v",
      Map(Options.Buckets -> "1")))
    append(dir, ts = 1, (1L to 5L).map(i => i -> s"a$i"))
    append(dir, ts = 2, (6L to 10L).map(i => i -> s"b$i"))
    append(dir, ts = 3, (11L to 15L).map(i => i -> s"c$i"))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String)]]
    val q = spark.readStream.format("cassandralike")
      .option(Options.Path, dir)
      .option(Options.StreamMaxSegmentsPerBatch, "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        batches.synchronized { batches += rows }; ()
      }
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = batches.synchronized(batches.toVector)
    // 3 segments at 1 per batch -> exactly 3 non-empty batches, one epoch
    // each, in commit order within the lexicographic segment-name order
    assert(got.count(_.nonEmpty) == 3, s"expected 3 rate-limited batches: $got")
    assert(got.flatten.toSet == ((1L to 5L).map(i => i -> s"a$i") ++
      (6L to 10L).map(i => i -> s"b$i") ++ (11L to 15L).map(i => i -> s"c$i")).toSet)
    assert(got.filter(_.nonEmpty).forall(_.size == 5),
      "each batch must carry exactly one epoch's rows")
  }

  test("feed-aware compaction: fully-consumed outputs skip, partial ones re-emit") {
    // single-bucket store so segments and epochs line up one-to-one
    val dir = s"${Seed.storeRoot(sfDir)}/spec_changefeed_compact"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta("id BIGINT,v STRING", ":key,v",
      Map(Options.Buckets -> "1")))
    val root = java.nio.file.Files.createTempDirectory("cfeedc").toString
    val ckpt = s"$root/ckpt"

    append(dir, ts = 1, (1L to 5L).map(i => i -> s"a$i"))
    append(dir, ts = 2, (6L to 10L).map(i => i -> s"b$i"))
    val first = drain(dir, ckpt, "cfeedc_run1")
    assert(first.size == 10, s"baseline drain: $first")

    // compact mid-stream: both inputs are in the consumed offset, so the
    // output segment carries nothing the feed hasn't emitted — the next
    // drain must emit NOTHING (no full-bucket re-upsert) and lose nothing
    CellStore.compactBucket(dir, 0)
    val afterCompact = drain(dir, ckpt, "cfeedc_run2")
    assert(afterCompact.isEmpty,
      s"fully-consumed compaction output must not re-emit: $afterCompact")

    // new data after the compaction still flows
    append(dir, ts = 3, (11L to 12L).map(i => i -> s"c$i"))
    val delta = drain(dir, ckpt, "cfeedc_run3")
    assert(delta.toSet == Set(11L -> "c11", 12L -> "c12"), s"delta: $delta")

    // PARTIAL consumption: compact while an unconsumed segment exists —
    // the output must be read (re-emitting consumed rows is the
    // at-least-once contract; dropping the unconsumed ones would be loss)
    append(dir, ts = 4, Seq(13L -> "d13"))
    CellStore.compactBucket(dir, 0) // inputs include the unconsumed ts=4 segment
    val partial = drain(dir, ckpt, "cfeedc_run4")
    assert(partial.exists(_._1 == 13L),
      s"unconsumed cells inside a compaction output must still be emitted: $partial")

    // and the final catch-up state equals the batch scan
    val catchUp = drain(dir, s"$root/ckpt2", "cfeedc_catchup")
    val batch = Seed.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(catchUp.toSet == batch && batch.size == 13)
  }

  test("fuzz: random append/overwrite/delete/compact interleavings never lose an upsert") {
    // the at-least-once upsert contract, randomized: a consumer that folds
    // every drained batch (later batch wins per key) must agree with the
    // store's live read on EVERY live key after EVERY drain — whatever
    // interleaving of appends, overwrites, deletes and compactions happened
    // between drains. Deletes don't propagate through the feed (documented
    // upsert semantics), so consumer entries for dead keys are allowed;
    // a missing or stale live key is a bug.
    val rnd = new scala.util.Random(20260817)
    val dir = s"${Seed.storeRoot(sfDir)}/spec_changefeed_fuzz"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta("id BIGINT,v STRING", ":key,v",
      Map(Options.Buckets -> "2")))
    val root = java.nio.file.Files.createTempDirectory("cfeedz").toString
    val ckpt = s"$root/ckpt"
    val consumer = scala.collection.mutable.Map.empty[Long, String]
    var ts = 0L
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)

    (1 to 10).foreach { round =>
      // 1-3 random mutations between drains
      (1 to 1 + rnd.nextInt(3)).foreach { _ =>
        rnd.nextInt(6) match {
          case n if n <= 3 =>
            ts += 1
            // distinct keys per epoch (same-epoch duplicate resolution is
            // the value-byte tie rule, deliberately not an ordering fact);
            // commit order is exact at any speed — commitSegments stamps
            // monotone commit times, so no inter-append spacing is needed
            append(dir, ts, Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(30).toLong)
              .distinct.map(k => k -> s"v$ts-${rnd.nextInt(100)}"))
          case 4 =>
            val doomed = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(35).toLong)
              .distinct.map(Long.box).toArray[Any]
            table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
              org.apache.spark.sql.sources.In("id", doomed)))
          case _ =>
            (0 until 2).foreach(b => CellStore.compactBucket(dir, b))
        }
      }
      // drain the feed and fold: later batches win; within a batch a key
      // appears once (batch-local LWW)
      // ONE segment per micro-batch: the admission-order contract is the
      // thing under test — a name-ordered admission would fold stale
      drain(dir, ckpt, s"cfeedz_$round",
          Map(Options.StreamMaxSegmentsPerBatch -> "1"))
        .foreach { case (k, v) => consumer(k) = v }
      val live = Seed.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      live.foreach { case (k, v) =>
        assert(consumer.get(k).contains(v),
          s"round $round: live key $k=$v but consumer saw ${consumer.get(k)}")
      }
    }
  }

  test("feed batches scan columnar with results identical to the row path") {
    val dir = freshStore("spec_feed_columnar")
    append(dir, ts = 1, (1L to 500L).map(i => i -> s"v$i"))
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    def drainDirect(opts: Map[String, String]): (Boolean, Set[(Long, String)]) = {
      val stream = new CellChangeFeedStream(table, table.schema(), Array.empty,
        opts, java.nio.file.Files.createTempDirectory("cfeedcol").toString)
      val end = stream.latestOffset(stream.initialOffset(),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      val parts = stream.planInputPartitions(stream.initialOffset(), end)
      val factory = stream.createReaderFactory()
      val columnar = parts.nonEmpty && factory.supportColumnarReads(parts.head)
      val rows = scala.collection.mutable.Set.empty[(Long, String)]
      parts.foreach { p =>
        if (columnar) {
          val r = factory.createColumnarReader(p)
          try while (r.next()) {
            val it = r.get().rowIterator()
            while (it.hasNext) {
              val row = it.next()
              rows += ((row.getLong(0), row.getUTF8String(1).toString))
            }
          } finally r.close()
        } else {
          val r = factory.createReader(p)
          try while (r.next()) {
            val row = r.get()
            rows += ((row.getLong(0), row.getUTF8String(1).toString))
          } finally r.close()
        }
      }
      (columnar, rows.toSet)
    }
    val (vec, got) = drainDirect(Map.empty)
    assert(vec, "feed batches should support columnar reads")
    val (vec2, rowGot) = drainDirect(Map(Options.ReadColumnar -> "false"))
    assert(!vec2, "read.columnar=false must restore the row path")
    assert(got == rowGot && got.size == 500,
      s"columnar feed read diverged: ${got.size} vs ${rowGot.size}")
  }

  test("catch-up batches sub-split by key range like the batch scan") {
    val dir = freshStore("spec_changefeed_split")
    append(dir, ts = 1, (1L to 4000L).map(i => i -> s"v$i"))
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    val stream = new CellChangeFeedStream(table, table.schema(), Array.empty,
      Map(Options.SplitTargetCells -> "32"),
      java.nio.file.Files.createTempDirectory("cfeeds").toString)
    val parts = stream.planInputPartitions(stream.initialOffset(),
      stream.latestOffset(stream.initialOffset(),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()))
    val buckets = parts.map(_.asInstanceOf[CellInputPartition].bucket).distinct
    assert(parts.length > buckets.length,
      s"expected key-range sub-splits: ${parts.length} parts over ${buckets.length} buckets")
    assert(parts.forall(_.asInstanceOf[CellInputPartition].files != null),
      "feed partitions must pin their delta file set")
  }
}
