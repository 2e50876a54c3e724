package graft.sources.cassandralike

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Change-feed offset: the set of committed segment file names consumed so
  * far. Segments are immutable and atomically renamed into visibility, so
  * "which segments has this stream seen" is an exact, replayable progress
  * marker — the same design as Spark's own FileStreamSource (a log of seen
  * files), and the natural fit for an LSM store whose commit unit IS the
  * segment. At very large segment counts the production evolution is a
  * driver-committed manifest with monotone sequence numbers (offsets become
  * one integer); the set form keeps replay exact without requiring the
  * store to serialize writers through a manifest.
  *
  * Names match `b<bucket>-<uuid>.bin` (validated), so the JSON encoding
  * needs no escaping. */
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
  * task per bucket.
  *
  * FEED-AWARE COMPACTION: maintenance compaction records its input segment
  * names in a provenance sidecar ([[CellStore.provFile]]) before the output
  * becomes visible. A compacted segment carries no information beyond its
  * inputs (merge only shadows and drops cells), so when every input is in
  * the feed's consumed offset the output is marked consumed WITHOUT
  * planning any read — compacting mid-stream costs nothing instead of a
  * full-bucket re-upsert. An output whose inputs were only PARTIALLY
  * consumed is read normally (re-emitting some rows — the at-least-once
  * upsert contract); task-commit compaction happens BEFORE a segment
  * becomes visible and was always invisible to the feed. */
final class CellChangeFeedStream(
    table: CassandraLikeTable,
    required: StructType,
    filters: Array[Filter],
    options: Map[String, String]) extends MicroBatchStream
  with SupportsAdmissionControl with SupportsTriggerAvailableNow
  with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  private def listCommitted(): Set[String] =
    CellStore.allSegmentFiles(table.dir).values.flatten
      .map(_.getFileName.toString).toSet

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
    * in rate-limited steps — and stops, even while writers keep appending. */
  @volatile private var availableNowTarget: Option[Set[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listCommitted())

  override def getDefaultReadLimit: ReadLimit =
    if (maxSegmentsPerBatch == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxSegmentsPerBatch)

  override def initialOffset(): Offset = SegmentSetOffset(Set.empty)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[SegmentSetOffset].names
    val visible = availableNowTarget.getOrElse(listCommitted())
    // Admission follows COMMIT order: every commit path stamps a MONOTONE
    // mtime onto its segments before the atomic rename
    // (CellStore.commitSegments), so cross-epoch order is exact even for
    // sub-millisecond commit successions; name is the deterministic
    // tie-break within one commit (one epoch — order there is meaningless).
    // Segment names embed a random UUID, so name order is unrelated to
    // commit order — admitting by name under a batch-size cap could hand a
    // NEWER epoch's upsert to an EARLIER micro-batch than the older value
    // it supersedes, and a fold-the-batches consumer would end stale.
    // Within one batch the emit is LWW-reconciled by cell timestamp; this
    // makes the ACROSS-batch order sound too (ChangeFeedSpec fuzz drives
    // it with stream.max.segments.per.batch=1).
    val sst = java.nio.file.Paths.get(table.dir, CellStore.SstDir)
    def commitMillis(n: String): Long =
      try java.nio.file.Files.getLastModifiedTime(sst.resolve(n)).toMillis
      catch { case _: java.io.IOException => 0L }
    val fresh = (visible -- seen).toSeq.sortBy(n => (commitMillis(n), n))
    val cap = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _: ReadAllAvailable => Int.MaxValue
      case _ => maxSegmentsPerBatch // composite/unknown: honor the option
    }
    SegmentSetOffset(seen ++ fresh.take(math.min(cap, maxSegmentsPerBatch)))
  }

  override def reportLatestOffset(): Offset = SegmentSetOffset(listCommitted())

  // last planned batch's admission stats, surfaced through [[metrics]]
  @volatile private var lastBatchAdmitted = 0L
  @volatile private var lastBatchCompactionSkipped = 0L

  /** Per-batch source metrics in `StreamingQueryProgress.sources[].metrics`:
    * consumed vs committed segment counts (their difference is the feed's
    * backlog — the lag signal an operator alarms on), plus the last batch's
    * admission split (segments read vs consumed-for-free because their
    * compaction inputs were already in the offset). */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val consumed =
      if (!latestConsumed.isPresent) 0
      else latestConsumed.get match {
        case s: SegmentSetOffset => s.names.size
        case o => SegmentSetOffset.fromJson(o.json).names.size
      }
    val committed = listCommitted().size
    java.util.Map.of(
      "segmentsConsumed", consumed.toString,
      "segmentsCommitted", committed.toString,
      "segmentsPending", math.max(0, committed - consumed).toString,
      "batchSegmentsAdmitted", lastBatchAdmitted.toString,
      "batchSegmentsCompactionSkipped", lastBatchCompactionSkipped.toString)
  }

  override def deserializeOffset(json: String): Offset =
    SegmentSetOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[SegmentSetOffset].names
    val admitted = end.asInstanceOf[SegmentSetOffset].names -- seen
    val fresh = admitted
      // feed-aware compaction skip: a compaction output whose recorded
      // inputs are ALL in the consumed offset holds only already-emitted
      // cells — consume it (it is in `end`) but read nothing. Deterministic
      // on replay: the sidecar is immutable and outlives the segment's
      // membership in any un-committed batch.
      .filterNot(n => CellStore.provenance(table.dir, n).exists(_.subsetOf(seen)))
    lastBatchAdmitted = admitted.size
    lastBatchCompactionSkipped = admitted.size - fresh.size
    val sst = java.nio.file.Paths.get(table.dir, CellStore.SstDir)
    val target = table.opt(options, Options.SplitTargetCells).map(_.toLong)
      .getOrElse(Options.DefaultSplitTargetCells)
    fresh.groupBy(SegmentSetOffset.bucketOf).toSeq.sortBy(_._1)
      .flatMap { case (bucket, names) =>
        SplitPlanner.forBucket(table.dir, bucket,
          names.toSeq.sorted.map(sst.resolve), Array.empty, target,
          restrictFiles = true)
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CellReaderFactory(table.tableSchema, table.mapping.fields, required,
      filters, options, table.tableProps)
}
