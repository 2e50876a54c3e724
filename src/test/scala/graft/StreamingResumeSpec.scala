package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once resumption: a streaming query stopped after a backlog and
  * restarted against the SAME checkpoint must process only the newly
  * arrived files, and the union of its emissions must equal the batch
  * answer over everything — the recovery contract production streaming
  * jobs rely on, which the per-run fresh-checkpoint judged queries don't
  * exercise. */
class StreamingResumeSpec extends SparkSpec {

  test("restart from checkpoint processes only new files, no loss, no dups") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("resume").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def writeBatch(tag: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(name: String): Map[Long, Long] = {
      val stream = spark.readStream
        .schema("id BIGINT, v STRING")
        .parquet(srcDir)
        .groupBy($"id").agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    writeBatch("a", Seq((1L, "x"), (2L, "y"), (1L, "z")))
    val first = runOnce("resume_run1")
    assert(first == Map(1L -> 2L, 2L -> 1L), s"first run: $first")

    // new data arrives while the query is DOWN; the restart must pick up
    // exactly the delta from the checkpointed offsets and fold it into the
    // recovered state (complete mode re-emits the full aggregate)
    writeBatch("b", Seq((2L, "w"), (3L, "q")))
    val second = runOnce("resume_run2")
    assert(second == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), s"after resume: $second")

    // batch ground truth over everything
    val batch = spark.read.parquet(srcDir).groupBy($"id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(second == batch)
  }

  test("RocksDB state store: judged windowed aggregation is provider-identical") {
    import graft.streaming.StreamOps
    def run(): Seq[String] =
      SparkEntry.queries("stream_window_counts")(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
    val default = run()
    spark.conf.set(StreamOps.RocksDbKey, "true")
    val rocks = try run() finally spark.conf.unset(StreamOps.RocksDbKey)
    assert(rocks.nonEmpty && rocks == default,
      s"RocksDB provider changed results: ${rocks.size} vs ${default.size} rows")
    // the toggle must not leak the provider into the session (getOption
    // surfaces the conf's built-in default, which is the HDFS provider)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("state partitions: production conf sizes the state stores, judged default otherwise") {
    // spark.graft.streaming.statePartitions is the production sizing knob:
    // set, it is honored VERBATIM (r16 clamped every caller down to 2,
    // making the knob a no-op); unset, runs keep the small judged-run
    // default. Observed where it physically matters: the number of
    // per-partition state-store directories the checkpoint materializes.
    import graft.streaming.StreamOps
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("stparts").toString
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    def statePartitions(ckpt: String): Int = {
      val stream = spark.readStream.schema("id BIGINT, v STRING").parquet(srcDir)
        .groupBy($"id").agg(count(lit(1)).as("n"))
      // the body must consume every partition (Spark 4.1 validates that
      // each state store instance committed), so count the batch
      StreamOps.runForeachBatchResumable(stream, "update", ckpt) { (df, _) => df.count(); () }
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(ckpt, "state", "0"))
      // partition dirs are numeric; schema/metadata dirs sit alongside them
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.forall(_.isDigit)) }
      finally s.close()
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    assert(statePartitions(s"$root/ck_default") == StreamOps.DefaultStatePartitions)
    spark.conf.set(StreamOps.StatePartitionsKey, "12")
    try assert(statePartitions(s"$root/ck_sized") == 12,
      "the production sizing conf must be honored, not capped")
    finally spark.conf.unset(StreamOps.StatePartitionsKey)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "the session shuffle-partition value must be restored after the run")
  }

  test("continuous dedup stop/append/resume equals the full-corpus LSH dedup") {
    // the judged query now drains one epoch, STOPS, lands two more epochs,
    // and resumes from the same checkpoint — its accumulated pairs must
    // still equal the minhash full-corpus dedup, proving the resumed query
    // picked up exactly the post-stop epochs (a missed epoch loses pairs,
    // a replayed one is absorbed by the pair-keyed upsert)
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val continuous = pairs("stream_dedup_continuous")
    assert(continuous.nonEmpty)
    assert(continuous == pairs("llm_dedup_minhash"))
  }

  test("native streaming sink: replayed epoch drops its staged files, commits nothing") {
    import graft.sources.cassandralike._
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.unsafe.types.UTF8String
    val dir = s"${Seed.storeRoot(sfDir)}/spec_native_sink"
    CellStore.dropTable(dir)
    CellStore.writeMeta(dir, CellStore.Meta("id BIGINT,v STRING", ":key,v", Map.empty))
    val meta = CellStore.readMeta(dir).get
    val table = new CassandraLikeTable(dir, dir,
      StructType.fromDDL(meta.schemaDdl), Some(meta.mapping), meta.properties)
    val opts = Map(Options.WriteTimestamp -> "1")
    val sw = new CellStreamingWrite(table, opts, truncate = false, "qtest")

    def stage(rows: Seq[(Long, String)]): Array[WriterCommitMessage] = {
      val w = CellCommit.writerFactory(table, opts).createWriter(0, 0L)
      rows.foreach { case (id, v) =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(id, UTF8String.fromString(v)))
      }
      Array(w.commit())
    }
    def segments: Set[String] =
      (0 until Options.DefaultBuckets).flatMap(b =>
        CellStore.segmentFiles(dir, b).map(_.getFileName.toString)).toSet
    def readBack: Set[(Long, String)] = Seed.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    sw.commit(5L, stage(Seq(1L -> "a", 2L -> "b")))
    val afterFirst = segments
    assert(afterFirst.nonEmpty && readBack == Set(1L -> "a", 2L -> "b"))

    // Spark replays epoch 5 (crash between sink commit and checkpoint
    // commit): the tasks re-stage identical data, but the marker makes the
    // second commit a cleanup no-op — same segments, same rows, no stray
    // tmp- staging files
    sw.commit(5L, stage(Seq(1L -> "a", 2L -> "b")))
    assert(segments == afterFirst, "replayed epoch must not add segments")
    assert(readBack == Set(1L -> "a", 2L -> "b"))
    val sst = java.nio.file.Paths.get(dir, CellStore.SstDir)
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(sst)
    val stray = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("tmp-")).toList finally s.close()
    assert(stray.isEmpty, s"replay left staged files: $stray")

    // the next epoch commits normally
    sw.commit(6L, stage(Seq(3L -> "c")))
    assert(readBack == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("foreachBatch store sink: mid-stream crash, restart resumes exactly-once") {
    val sp = spark; import sp.implicits._
    import graft.sources.cassandralike.{CellStore, Options, Seed}
    val root = java.nio.file.Files.createTempDirectory("sinkresume").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = s"$root/store"
    CellStore.writeMeta(store, CellStore.Meta("id BIGINT, v STRING", ":key,v", Map.empty))

    // three files -> three micro-batches (maxFilesPerTrigger=1)
    Seq(Seq((1L, "a"), (2L, "b")), Seq((3L, "c"), (4L, "d")), Seq((5L, "e")))
      .foreach(_.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir))

    def run(crashAtBatch: Option[Long]): Either[Throwable, Unit] = {
      val stream = spark.readStream.schema("id BIGINT, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          // the append lands BEFORE the injected crash: the restart will
          // re-run this batch, and the store must absorb the duplicate
          // (same address, same pinned timestamp, same value -> LWW
          // collapses it) — exactly-once through sink idempotence
          Seed.append(batch, store, Map(Options.WriteTimestamp -> "1"))
          if (crashAtBatch.contains(id))
            throw new RuntimeException("injected mid-stream crash")
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(); Right(()) }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException => Left(e) }
    }

    // first run crashes after batch 1 wrote its data but before it committed
    assert(run(crashAtBatch = Some(1L)).isLeft, "injected crash did not surface")
    // restart from the same checkpoint: re-runs batch 1, then batch 2
    assert(run(crashAtBatch = None).isRight)
    val got = Seed.read(spark, store).as[(Long, String)].collect().toSet
    val want = spark.read.parquet(srcDir).as[(Long, String)].collect().toSet
    assert(got == want, s"store after resume: $got")
  }

  test("RocksDB state store provider yields identical streaming dedup results") {
    // the billion-key posture: in-memory (HDFSBackedStateStoreProvider)
    // state is bounded by executor heap; RocksDB spills keyed state to
    // local disk. The judged streaming queries run on the default provider;
    // this pins that flipping the provider conf changes WHERE state lives,
    // never WHAT is emitted — turning the documented deployment note into
    // a tested path.
    val q = graft.SparkEntry.queries("stream_dedup_watermark")
    val default = q(spark, sfDir).collect().toSeq
    assert(default.nonEmpty)
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = q(spark, sfDir).collect().toSeq
      assert(rocks == default,
        s"RocksDB provider diverged: ${rocks.size} vs ${default.size} rows")
    } finally spark.conf.unset(key)
  }
}
