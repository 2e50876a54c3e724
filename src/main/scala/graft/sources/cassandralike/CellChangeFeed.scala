package graft.sources.cassandralike

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Change-feed offset: ONE monotone sequence number — the count of manifest
  * entries consumed so far. The stream's manifest (see [[SegmentManifest]])
  * assigns every committed segment a permanent sequence number in commit
  * order the first time the stream sees it, so "how far has this stream
  * read" is a single integer whatever the table's lifetime segment count.
  * This is the production evolution of the earlier consumed-segment-SET
  * offset, whose JSON grew with every segment ever committed and was
  * re-serialized into the checkpoint each trigger. */
final case class SegmentSeqOffset(seq: Long) extends Offset {
  require(seq >= 0, s"negative manifest position: $seq")
  override def json: String = seq.toString
}

/** LEGACY offset form (pre-manifest checkpoints): the set of consumed
  * segment names. Still deserialized so an existing checkpoint resumes
  * exactly — the first manifest assignment marks every name in the set
  * consumed-for-free and the stream continues on integer offsets. */
final case class SegmentSetOffset(names: Set[String]) extends Offset {
  names.foreach(n => require(SegmentSetOffset.NamePat.matches(n),
    s"not a committed segment name: $n"))
  override def json: String =
    if (names.isEmpty) "[]"
    else names.toSeq.sorted.mkString("[\"", "\",\"", "\"]")
}

object SegmentSetOffset {
  private[cassandralike] val NamePat = "b(\\d+)-[A-Za-z0-9._-]+\\.bin".r

  def fromJson(json: String): SegmentSetOffset = {
    val inner = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (inner.isEmpty) SegmentSetOffset(Set.empty)
    else SegmentSetOffset(inner.split(",")
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet)
  }

  def bucketOf(name: String): Int = name match {
    case NamePat(b) => b.toInt
    case _ => throw new IllegalArgumentException(s"bad segment name: $name")
  }
}

/** The stream's durable segment → sequence-number log, owned by ONE stream
  * (it lives inside the query's checkpoint source directory, which Spark
  * locks to a single active query). Append-only: each assignment batch is
  * one atomically-renamed delta file named by its first sequence number, so
  * a restart reloads the exact order and a torn write is invisible. Entries
  * are `r <name>` (to read) or `f <name>` (consumed-for-free: its cells are
  * already covered — a fully-consumed compaction output, or a name from a
  * migrated legacy set offset). Flags are decided once, at assignment, and
  * are immutable — that is what makes batch replay after a failure exact.
  *
  * LOG COMPACTION (the HDFSMetadataLog pattern): every [[SegmentManifest
  * .CompactEvery]] delta appends, the full entry list rewrites as ONE
  * self-contained `.compact` file named by its end sequence; reload takes
  * the newest compact and applies only deltas starting past it, so a
  * months-lived stream restarts from O(CompactEvery) files however many
  * triggers it has run. Subsumed files are deleted best-effort AFTER the
  * compact is durable — a crash between the two leaves files a reload
  * provably ignores, never a gap.
  *
  * Driver memory is O(segments ever assigned) (name + flag), the same order
  * as Spark's own FileStreamSource seen-files log; the CHECKPOINTED offset
  * is one integer. */
private[graft] final class SegmentManifest(dir: Path) {
  import SegmentManifest.CompactEvery
  private val names = mutable.ArrayBuffer.empty[String]
  private val free = mutable.ArrayBuffer.empty[Boolean]
  private val seqByName = mutable.HashMap.empty[String, Long]
  private var deltasSinceCompact = 0

  private def record(name: String, isFree: Boolean): Unit = {
    seqByName(name) = names.length + 1L
    names += name
    free += isFree
  }

  private def parseInto(f: Path): Unit =
    new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .foreach(line => record(line.substring(2), line.startsWith("f ")))

  // load: newest self-contained compact (entries 1..end), then every delta
  // that starts past it, in sequence order; deltas at or below the compact
  // end are subsumed leftovers of an interrupted cleanup and are ignored
  Files.createDirectories(dir)
  locally {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val (compacts, deltas) = try {
      val all = s.iterator().asScala.map(_.getFileName.toString).toSeq
      (all.filter(_.matches("m\\d{19}\\.compact")).sorted,
        all.filter(_.matches("m\\d{19}\\.log")).sorted)
    } finally s.close()
    compacts.lastOption.foreach(c => parseInto(dir.resolve(c)))
    deltas.foreach { d =>
      val start = d.stripPrefix("m").stripSuffix(".log").toLong
      if (start == names.length + 1L) {
        parseInto(dir.resolve(d))
        deltasSinceCompact += 1
      } else if (start > names.length + 1L)
        throw new java.io.IOException(
          s"segment manifest gap: delta $d but only ${names.length} entries loaded")
      // start <= loaded size: subsumed by the compact — ignore
    }
  }

  def size: Long = names.length.toLong
  def seqOf(name: String): Option[Long] = seqByName.get(name)
  def nameAt(seq: Long): String = names((seq - 1).toInt)
  def isFree(seq: Long): Boolean = free((seq - 1).toInt)
  def namesThrough(seq: Long): Set[String] =
    names.view.take(math.min(seq, size).toInt).toSet

  private def body(ns: collection.Seq[String], fs: collection.Seq[Boolean]): Array[Byte] =
    ns.lazyZip(fs).map { case (n, f) => (if (f) "f " else "r ") + n }
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Append `(name, consumedForFree)` entries; returns the new size. */
  def append(entries: Seq[(String, Boolean)]): Long = {
    if (entries.isEmpty) return size
    val start = size + 1
    val tmp = dir.resolve(f"m$start%019d.log.tmp")
    Files.write(tmp, body(entries.map(_._1), entries.map(_._2)))
    Files.move(tmp, dir.resolve(f"m$start%019d.log"),
      StandardCopyOption.ATOMIC_MOVE)
    entries.foreach { case (n, f) => record(n, f) }
    deltasSinceCompact += 1
    if (deltasSinceCompact >= CompactEvery) compact()
    size
  }

  private def compact(): Unit = {
    val tmp = dir.resolve(f"m$size%019d.compact.tmp")
    Files.write(tmp, body(names, free))
    Files.move(tmp, dir.resolve(f"m$size%019d.compact"),
      StandardCopyOption.ATOMIC_MOVE)
    deltasSinceCompact = 0
    // cleanup AFTER the compact is durable; best-effort (leftovers are
    // ignored by the load rule above)
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      val subsumedDelta = n.matches("m\\d{19}\\.log") &&
        n.stripPrefix("m").stripSuffix(".log").toLong <= size
      val olderCompact = n.matches("m\\d{19}\\.compact") &&
        n.stripPrefix("m").stripSuffix(".compact").toLong < size
      if (subsumedDelta || olderCompact)
        try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
    } finally s.close()
  }
}

private[graft] object SegmentManifest {
  /** Delta files between full-snapshot rewrites; bounds restart reload to
    * O(CompactEvery) files at ~40 bytes/entry amortized write cost. */
  val CompactEvery = 64
}

/** Micro-batch change feed over a cell store: each batch reads exactly the
  * segments committed since the previous offset, assembled into table-shaped
  * rows by the SAME reader as the batch scan (mapping pivot, codecs,
  * batch-local LWW + tombstone reconciliation over the delta segments).
  *
  * Semantics — an UPSERT stream: a row appears in the batch whose segments
  * carry its newest cells; an overwrite re-emits the row with its new
  * values; a delete (tombstone segment) emits nothing (the tombstones
  * shadow the delta's older cells, and cells already consumed are the
  * consumer's to reconcile — standard CDC at-least-once-upsert contract).
  * Consumers needing exact current-state semantics aggregate downstream
  * (e.g. stateful dedup on key) or read the table in batch.
  *
  * Scale shape: planning lists the sst directory once per trigger (the same
  * single-walk listing as the batch scan); a batch plans one partition per
  * touched bucket, sub-split by key range via the run indexes when the
  * delta exceeds `split.target.cells` — catch-up from an empty offset over
  * a huge table parallelizes exactly like the batch scan instead of one
  * task per bucket. Offsets are ONE integer ([[SegmentSeqOffset]]): the
  * per-checkpoint [[SegmentManifest]] freezes commit order into sequence
  * numbers, so a months-lived stream checkpoints O(1) bytes per trigger.
  *
  * FEED-AWARE COMPACTION: maintenance compaction records its input segment
  * names in a provenance sidecar ([[CellStore.provFile]]) before the output
  * becomes visible. A compacted segment carries no information beyond its
  * inputs (merge only shadows and drops cells), so when every input was
  * already COMMITTED-consumed at the moment the output enters the manifest
  * it is flagged consumed-for-free and never read — compacting mid-stream
  * costs nothing instead of a full-bucket re-upsert. An output whose inputs
  * were only partially consumed is read normally (re-emitting some rows —
  * the at-least-once upsert contract). If an admitted segment's file has
  * vanished (compacted away before its batch ran, or during a post-failure
  * replay), the batch reads its covering compaction output instead — or,
  * when the cover chain is broken, the whole bucket — so replay can
  * over-emit but never lose cells. */
final class CellChangeFeedStream(
    table: CassandraLikeTable,
    required: StructType,
    filters: Array[Filter],
    options: Map[String, String],
    checkpointLocation: String) extends MicroBatchStream
  with SupportsAdmissionControl with SupportsTriggerAvailableNow
  with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  private lazy val manifest = new SegmentManifest(
    CellChangeFeedStream.manifestDir(checkpointLocation))

  private def listCommitted(): Set[String] = {
    val listing = CellStore.allSegmentFiles(table.dir).values.flatten
      .map(_.getFileName.toString).toSet
    lastListing = listing
    listing
  }

  /** Most recent committed-set listing (latestOffset / prepare / plan), so
    * [[metrics]] reports from cached state instead of re-walking the
    * segment directory on every progress tick. */
  @volatile private var lastListing: Set[String] = null

  /** Highest manifest position known COMMITTED (batch completed + offset
    * durably logged). Flags are only marked consumed-for-free against this
    * bound: a merely-planned batch can still be replayed after a failure,
    * and a free flag minted against it could skip cells the replay never
    * re-reads. Seeded from the start offset Spark hands latestOffset
    * (micro-batches are serial: the previous batch has completed by then)
    * and advanced by [[commit]]. */
  @volatile private var committedSeq: Long = 0L

  /** Admission control: at most this many segments admitted per micro-batch
    * (`stream.max.segments.per.batch`). The segment is the store's commit
    * unit, so this bounds batch size the way maxFilesPerTrigger does for
    * file sources — a 100-TB catch-up becomes a sequence of bounded batches
    * (each further key-range sub-split for parallelism) instead of one
    * giant batch whose shuffle must fit the cluster at once. Unset = drain
    * everything available each trigger. */
  private val maxSegmentsPerBatch: Int =
    table.opt(options, Options.StreamMaxSegmentsPerBatch)
      .map(_.toInt).getOrElse(Int.MaxValue)

  /** Trigger.AvailableNow: the drain target is pinned at query start, so
    * the query processes exactly the data committed before it started —
    * in rate-limited steps — and stops, even while writers keep appending.
    * Pinned as a name set (assignment needs the start offset, which only
    * latestOffset sees — a legacy set offset marks its names free there). */
  @volatile private var availableNowTarget: Option[Set[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listCommitted())

  override def getDefaultReadLimit: ReadLimit =
    if (maxSegmentsPerBatch == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxSegmentsPerBatch)

  override def initialOffset(): Offset = SegmentSeqOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  /** (manifest position, legacy consumed-name set) view of a start offset. */
  private def startState(start: Offset): (Long, Set[String]) = start match {
    case SegmentSeqOffset(s) => (s, Set.empty)
    case s: SegmentSetOffset => (0L, s.names)
    case o => (0L, SegmentSetOffset.fromJson(o.json).names)
  }

  /** Assign manifest entries to every not-yet-assigned visible segment, in
    * COMMIT order: every commit path stamps a MONOTONE mtime onto its
    * segments before the atomic rename (CellStore.commitSegments), so
    * cross-epoch order is exact even for sub-millisecond commit
    * successions; name is the deterministic tie-break within one commit
    * (one epoch — order there is meaningless). Segment names embed a random
    * UUID, so name order is unrelated to commit order — admitting by name
    * under a batch-size cap could hand a NEWER epoch's upsert to an EARLIER
    * micro-batch than the older value it supersedes, and a fold-the-batches
    * consumer would end stale. The manifest freezes this order permanently
    * at first sight (ChangeFeedSpec fuzz drives it with
    * stream.max.segments.per.batch=1).
    *
    * Flag decision (immutable once written): consumed-for-free when the
    * name is in a migrated legacy set offset, or when it is a compaction
    * output whose recorded inputs were ALL consumed at or below the
    * COMMITTED position (or in the legacy set) — its cells carry nothing
    * the stream hasn't durably emitted. Everything else reads. */
  private def assignNew(visible: Set[String], legacySeen: Set[String]): Unit = {
    val fresh = visible.filter(manifest.seqOf(_).isEmpty)
    if (fresh.isEmpty) return
    val sst = Paths.get(table.dir, CellStore.SstDir)
    def commitMillis(n: String): Long =
      try Files.getLastModifiedTime(sst.resolve(n)).toMillis
      catch { case _: java.io.IOException => 0L }
    val ordered = fresh.toSeq.sortBy(n => (commitMillis(n), n))
    def consumedAlready(p: String): Boolean =
      legacySeen.contains(p) || manifest.seqOf(p).exists(_ <= committedSeq)
    manifest.append(ordered.map { n =>
      val freeFlag =
        legacySeen.contains(n) ||
          CellStore.provenance(table.dir, n)
            .exists(ins => ins.nonEmpty && ins.forall(consumedAlready))
      n -> freeFlag
    })
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val (s, legacySeen) = startState(start)
    // micro-batches are serial: the start offset's batch has completed, so
    // its position is a safe committed floor even before commit() is called
    committedSeq = math.max(committedSeq, s)
    val pinned = availableNowTarget
    assignNew(pinned.getOrElse(listCommitted()), legacySeen)
    // AvailableNow: stop at the end of the pinned names' assignments (later
    // appends get later sequence numbers and fall outside the pin)
    val target = pinned match {
      case Some(names) =>
        names.flatMap(manifest.seqOf).foldLeft(0L)(math.max)
      case None => manifest.size
    }
    val cap = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _: ReadAllAvailable => Int.MaxValue
      case _ => maxSegmentsPerBatch // composite/unknown: honor the option
    }
    // admit up to `cap` to-read entries; free entries ride along positionally
    var e = s
    var admitted = 0
    var halt = false
    while (!halt && e < target) {
      if (manifest.isFree(e + 1)) e += 1
      else if (admitted < cap) { admitted += 1; e += 1 }
      else halt = true
    }
    SegmentSeqOffset(e)
  }

  override def reportLatestOffset(): Offset = SegmentSeqOffset(manifest.size)

  // last planned batch's admission stats, surfaced through [[metrics]]
  @volatile private var lastBatchAdmitted = 0L
  @volatile private var lastBatchCompactionSkipped = 0L

  /** Seek-saving totals since query start, merged back from executor
    * readers via accumulators (the feed shares the batch scan's run/span
    * seek machinery; without this tap the saving is invisible on a live
    * feed — the batch scan reports it per scan node, a stream operator
    * watches progress metrics instead). getActiveSession is thread-local,
    * and a progress/metrics call can land on a thread with no active
    * session before the first createReaderFactory — a `lazy val` would
    * cache that None permanently and zero the metrics for the query's
    * lifetime, so resolution RETRIES until a session is found and only the
    * successful result is cached. The retry is SYNCHRONIZED: a bare
    * check-then-act would let the stream-execution thread and a
    * progress-listener thread race to build two accumulator sets, with
    * readers merging into the one metrics() no longer reads (the zeroed-
    * metrics bug back, via a race) plus duplicate named accumulators. */
  @volatile private var seekAccumsCached: Option[ScanAccumulators] = None
  private def seekAccums: Option[ScanAccumulators] = {
    if (seekAccumsCached.isEmpty) synchronized {
      if (seekAccumsCached.isEmpty)
        seekAccumsCached =
          org.apache.spark.sql.SparkSession.getActiveSession.map { s =>
            ScanAccumulators(
              s.sparkContext.longAccumulator("cassandralike.feed.cellsSeekSkipped"),
              s.sparkContext.longAccumulator("cassandralike.feed.runsColSkipped"),
              s.sparkContext.longAccumulator("cassandralike.feed.runsColBloomSkipped"),
              s.sparkContext.longAccumulator("cassandralike.feed.runsSubSkipped"))
          }
    }
    seekAccumsCached
  }

  /** Per-batch source metrics in `StreamingQueryProgress.sources[].metrics`:
    * consumed vs committed segment counts and their difference — the feed's
    * backlog, the lag signal an operator alarms on — plus the last batch's
    * admission split (segments read vs consumed-for-free because their
    * compaction inputs were already in the offset). Pending is a SET
    * difference against the cached committed listing: compaction deletes
    * consumed inputs, so a count subtraction would report zero backlog
    * while an unconsumed output sat pending; a committed-but-unconsumed
    * output whose inputs were all consumed is excluded (it would be
    * consumed for free). Consumed/committed are reported from the same
    * listing so the three numbers always reconcile. */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val consumedNames: Set[String] =
      if (!latestConsumed.isPresent) Set.empty
      else latestConsumed.get match {
        case SegmentSeqOffset(s) => manifest.namesThrough(s)
        case s: SegmentSetOffset => s.names
        case o => startState(o) match {
          case (s, legacy) => if (s > 0) manifest.namesThrough(s) else legacy
        }
      }
    val committed = Option(lastListing).getOrElse(listCommitted())
    val pending = committed.count { n =>
      !consumedNames.contains(n) &&
        !CellStore.provenance(table.dir, n)
          .exists(ins => ins.nonEmpty && ins.forall(consumedNames.contains))
    }
    java.util.Map.of(
      "segmentsConsumed", (committed.size - pending).toString,
      "segmentsCommitted", committed.size.toString,
      "segmentsPending", pending.toString,
      "batchSegmentsAdmitted", lastBatchAdmitted.toString,
      "batchSegmentsCompactionSkipped", lastBatchCompactionSkipped.toString,
      // cumulative reader-side seek savings (run/span IO pruning) since
      // query start — the live-feed view of the batch scan's
      // cellsSeekSkipped/runsColSkipped custom metrics
      ScanMetrics.CellsSeekSkipped,
      seekAccums.map(_.cellsSeekSkipped.value.toString).getOrElse("0"),
      ScanMetrics.RunsColSkipped,
      seekAccums.map(_.runsColSkipped.value.toString).getOrElse("0"),
      ScanMetrics.RunsColBloomSkipped,
      seekAccums.map(_.runsColBloomSkipped.value.toString).getOrElse("0"),
      ScanMetrics.RunsSubSkipped,
      seekAccums.map(_.runsSubSkipped.value.toString).getOrElse("0"))
  }

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("[")) SegmentSetOffset.fromJson(t)
    else SegmentSeqOffset(t.toLong)
  }

  override def commit(end: Offset): Unit = end match {
    case SegmentSeqOffset(s) => committedSeq = math.max(committedSeq, s)
    case _ => ()
  }
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val (s, legacySeen) = startState(start)
    val e = end match {
      case SegmentSeqOffset(x) => x
      case o => startState(o)._1
    }
    val range = (s + 1) to math.min(e, manifest.size)
    val admitted = range.filterNot(manifest.isFree).map(manifest.nameAt)
      .filterNot(legacySeen.contains)
    lastBatchAdmitted = range.size.toLong
    lastBatchCompactionSkipped = range.size.toLong - admitted.size
    val sst = Paths.get(table.dir, CellStore.SstDir)
    val (present, missing) = admitted.partition(n => Files.exists(sst.resolve(n)))
    // a to-read segment compacted away before its batch ran (or during a
    // post-failure replay): read its covering compaction output instead —
    // its merge holds every cell the input held — or, if the cover chain
    // has itself been compacted (the sidecar went with it), the whole
    // bucket: over-emission is the at-least-once contract, loss is not.
    val covers: Seq[String] =
      if (missing.isEmpty) Nil
      else {
        val byBucket = CellStore.allSegmentFiles(table.dir)
        lastListing = byBucket.values.flatten.map(_.getFileName.toString).toSet
        missing.flatMap { m =>
          val vis = byBucket.getOrElse(SegmentSetOffset.bucketOf(m), Nil)
            .map(_.getFileName.toString)
          vis.find(v => CellStore.provenance(table.dir, v).exists(_.contains(m)))
            .map(Seq(_)).getOrElse(vis)
        }
      }
    val fresh = (present ++ covers).distinct
    val target = table.opt(options, Options.SplitTargetCells).map(_.toLong)
      .getOrElse(Options.DefaultSplitTargetCells)
    fresh.groupBy(SegmentSetOffset.bucketOf).toSeq.sortBy(_._1)
      .flatMap { case (bucket, names) =>
        SplitPlanner.forBucket(table.dir, bucket,
          names.sorted.map(sst.resolve), Array.empty, target,
          restrictFiles = true)
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // columnar = true: micro-batch scans vectorize exactly like the batch
    // scan (MicroBatchScanExec consumes ColumnarBatch through the same
    // codegen'd ColumnarToRow); eligibility gating — atomic-or-map
    // projection, read.columnar — lives in the factory and falls back to
    // rows identically for both scan kinds
    CellReaderFactory(table.tableSchema, table.mapping.fields, required,
      filters, options, table.tableProps, columnar = true,
      accums = seekAccums)
}

object CellChangeFeedStream {
  /** The stream's manifest lives inside its checkpoint source directory —
    * progress metadata owned by exactly this query (Spark locks a
    * checkpoint to one active query), surviving restarts with it. */
  private[graft] def manifestDir(checkpointLocation: String): Path = {
    val p =
      if (checkpointLocation.startsWith("file:"))
        Paths.get(java.net.URI.create(checkpointLocation))
      else Paths.get(checkpointLocation)
    p.resolve("graft_segment_manifest")
  }
}
