package graft.sources.cassandralike

import java.io._
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

/** One stored cell. `sub == null` for standard cells; `tombstone` marks a
  * deletion (last-write-wins with live cells by timestamp). */
final case class Cell(
    key: Array[Byte],
    col: Array[Byte],
    sub: Array[Byte],
    value: Array[Byte],
    ts: Long,
    tombstone: Boolean)

/** Token ring: 32-bit murmur of the key spread over `buckets` contiguous
  * ranges. The bucket is the unit of scan parallelism (the reference's
  * token-range input split, input/HiveCassandraStandardColumnInputFormat
  * .java:131-189) and of write fan-out. Key-equality predicates prune to a
  * single bucket — partition pruning the reference never had (SURVEY §4). */
object TokenRing {
  def token(key: Array[Byte]): Long =
    MurmurHash3.bytesHash(key, 9001).toLong & 0xffffffffL
  def bucket(key: Array[Byte], buckets: Int): Int =
    ((token(key) * buckets) >>> 32).toInt
  /** Routing with an optional RANGE layout (`range.bounds`): bucket =
    * number of bounds <= the encoded key (bounds sorted ascending in the
    * table's key byte form, so with an order-preserving encoding bucket b
    * covers the key interval [bounds(b-1), bounds(b)) — what lets a pushed
    * key range prune to O(covered buckets) instead of touching the whole
    * ring). `bounds = null` is the default hash ring. */
  def bucket(key: Array[Byte], buckets: Int, bounds: Array[Array[Byte]]): Int =
    if (bounds == null) bucket(key, buckets)
    else {
      var lo = 0
      var hi = bounds.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (Codecs.compareBytes(bounds(m), key) <= 0) lo = m + 1 else hi = m
      }
      lo
    }
}

/** Per-run key bloom filter — the SSTable bloom of Cassandra's read path
  * (a point read consults the bloom before touching an SSTable at all).
  * ~10 bits / 4 probes per distinct key (~1% false positives), double
  * hashing over two murmur-derived 64-bit hashes. No false negatives: a
  * key written into the run always probes true, so skipping a run whose
  * bloom rejects every looked-up key is exact. At LSM scale most segments
  * of a bucket do NOT hold a given key — blooms make `WHERE key = ?` read
  * O(segments that match), not O(all segments). */
final class KeyBloom(val words: Array[Long], val numKeys: Int) {
  private val mBits = words.length.toLong * 64L
  private def bit(i: Long): Boolean = {
    val m = java.lang.Math.floorMod(i, mBits)
    (words((m >>> 6).toInt) & (1L << (m & 63L))) != 0L
  }
  def mightContain(key: Array[Byte]): Boolean = {
    val (h1, h2) = KeyBloom.hashes(key)
    var i = 0
    while (i < KeyBloom.Probes) {
      if (!bit(h1 + i.toLong * h2)) return false
      i += 1
    }
    true
  }
}

object KeyBloom {
  val BitsPerKey = 10
  val Probes = 4

  /** Two independent 64-bit hashes of the key, each from two 32-bit murmur
    * passes with distinct seeds; probe i addresses bit h1 + i*h2 (classic
    * Kirsch–Mitzenmacher double hashing). */
  def hashes(key: Array[Byte]): (Long, Long) = {
    val a = MurmurHash3.bytesHash(key, 0x9747b28c).toLong
    val b = MurmurHash3.bytesHash(key, 0x5bd1e995).toLong & 0xffffffffL
    val c = MurmurHash3.bytesHash(key, 0xc2b2ae35).toLong
    val d = MurmurHash3.bytesHash(key, 0x27d4eb2f).toLong & 0xffffffffL
    ((a << 32) | b, (c << 32) | d)
  }

  /** Streaming builder: buffers the two 64-bit hashes per distinct key
    * (16 bytes/key) so the bloom can be sized exactly once the run's key
    * count is known — the writers stream cells and don't know it upfront.
    * The buffer is 12.8× the final bloom (1.25 bytes/key) and bounded by
    * the run's distinct keys, the same order as the in-memory index-entry
    * buffer the writers already carry. */
  final class Builder {
    private val hs = mutable.ArrayBuffer.empty[Long]
    def add(key: Array[Byte]): Unit = {
      val (h1, h2) = hashes(key); hs += h1; hs += h2
    }
    def build(): KeyBloom = {
      val n = hs.length / 2
      val mBits = math.max(64L, n.toLong * BitsPerKey)
      val words = new Array[Long](((mBits + 63L) / 64L).toInt)
      val cap = words.length.toLong * 64L
      var j = 0
      while (j < hs.length) {
        val h1 = hs(j); val h2 = hs(j + 1)
        var i = 0
        while (i < Probes) {
          val m = java.lang.Math.floorMod(h1 + i.toLong * h2, cap)
          words((m >>> 6).toInt) |= (1L << (m & 63L))
          i += 1
        }
        j += 2
      }
      new KeyBloom(words, n)
    }
  }
}

/** On-disk layout of one cassandralike table:
  *
  * {{{
  *   <dir>/meta.json              schema DDL + mapping + options
  *   <dir>/sst/b<bucket>-<uuid>.bin   immutable cell-segment files
  * }}}
  *
  * Segments are append-created, immutable once committed (SSTable
  * discipline); a read of a bucket merges all its segments with
  * last-write-wins per (key, col, sub) — the same reconciliation Cassandra
  * performs across SSTables. Writers emit one temp file per touched bucket
  * and rename on task commit, so failed task attempts leave no visible data
  * (Spark-task-retry-based fault tolerance; replaces the reference's broken
  * client failover, SURVEY §8 / client/CassandraProxyClient.java:424-466).
  *
  * A segment is a sequence of SORTED RUNS — each `batch_mutate`-sized flush
  * is sorted by cell address and written behind a `[cellCount, byteLen]`
  * header. Reads k-way-merge every run of the bucket through a priority
  * queue ([[BucketMergeIterator]]), reconciling duplicate addresses by
  * timestamp as they surface, so scan memory is O(runs + one row's cells),
  * never O(bucket) — the property that keeps a 100-TB scan inside executor
  * memory regardless of bucket size.
  */
object CellStore {
  val MetaFile = "meta.json"
  val SstDir = "sst"

  /** Every segment file starts with `[int magic][int version]`. A reader that
    * sees anything else fails fast with a crisp IOException instead of
    * misparsing cell data — the integrity posture of the reference, where a
    * truncated read surfaces an IOException rather than spinning
    * (input/CassandraHiveRecordReader.java error paths). Bump the version on
    * any layout change so old readers reject new files and vice versa. */
  val SegmentMagic = 0x43534547 // "CSEG"
  val FormatVersion = 2
  val SegmentHeaderLen = 8L

  /** THE one way to open a segment file for appending runs — writes the
    * segment header so every writer (task flush, compaction, tests) produces
    * the same format. */
  def newSegmentStream(file: Path): DataOutputStream = {
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(file), 1 << 16))
    out.writeInt(SegmentMagic)
    out.writeInt(FormatVersion)
    out
  }

  /** Total order on cell addresses: (key, col, sub) in unsigned-byte
    * (Cassandra BytesType comparator) order. */
  val addressOrdering: Ordering[Cell] = new Ordering[Cell] {
    def compare(a: Cell, b: Cell): Int = {
      val k = Codecs.compareBytes(a.key, b.key)
      if (k != 0) return k
      val c = Codecs.compareBytes(a.col, b.col)
      if (c != 0) return c
      Codecs.compareBytes(
        if (a.sub == null) Array.emptyByteArray else a.sub,
        if (b.sub == null) Array.emptyByteArray else b.sub)
    }
  }

  private def addrEq(a: Cell, b: Cell): Boolean = addressOrdering.compare(a, b) == 0

  // ---- segment file format: [int cellCount][long byteLen][cells…]* runs ----

  def writeCell(out: DataOutputStream, c: Cell): Unit = {
    writeBytes(out, c.key)
    writeBytes(out, c.col)
    writeBytes(out, c.sub)
    writeBytes(out, c.value)
    out.writeLong(c.ts)
    out.writeBoolean(c.tombstone)
  }

  /** Append one sorted run (the order invariant is enforced here), with its
    * sparse key index and per-run key bloom.
    *
    * `certifiedDeletes = true` marks the run as a CERTIFIED DELETE EPOCH —
    * the caller asserts that EVERY cell is a tombstone that shadows a cell
    * VISIBLE at write time (the address existed live, the tombstone's
    * timestamp strictly exceeds that cell's), and that when a key's cells
    * are tombstoned, ALL of that key's then-visible cells are tombstoned
    * in this same run. [[graft.sources.cassandralike.CassandraLikeTable
    * .deleteWhere]] satisfies this by construction (it reads the doomed
    * visible cells and stamps max-ts+1); nothing else may set it. The
    * marker is what lets positional counts NET OUT deletions
    * ([[nettedCountCellsInRange]] and twins) instead of declining to the
    * fold until compaction. It is written only when the run is genuinely
    * all-tombstone. */
  def writeRun(out: DataOutputStream, cells: Seq[Cell],
      certifiedDeletes: Boolean = false): Unit = {
    if (cells.isEmpty) return
    val sorted = cells.sorted(addressOrdering)
    val payload = new ByteArrayOutputStream(64 * cells.length)
    val pout = new DataOutputStream(payload)
    val entries = mutable.ArrayBuffer.empty[IndexEntry]
    val bloom = new KeyBloom.Builder
    val colBloom = new ColBloomBuilder
    val subBloom = new ColBloomBuilder
    var prevKey: Array[Byte] = null
    var colMin: Array[Byte] = null
    var colMax: Array[Byte] = null
    var subMin: Array[Byte] = null
    var subMax: Array[Byte] = null
    // exact content stats for the STAT tail: counted on the same sorted
    // pass (distinct = adjacency changes), zero extra comparisons beyond
    // the (col, sub) adjacency check
    var prevCol: Array[Byte] = null
    var prevSub: Array[Byte] = null
    var sawAddr = false
    var tombs = 0
    var dKeys = 0
    var dAddrs = 0
    // KPFX/VSUM positional tails, accumulated on the same pass: per entry,
    // the distinct-key count and value-sum of every cell BEFORE it (prefix
    // forms — what lets a boundary search answer "how many keys / how much
    // value below x" positionally), plus whether the entry's own cell
    // starts a new key (a hot key can straddle the entry boundary, and the
    // reader must know whether to count it again). The value sum tracks
    // 8-byte big-endian longs only and is dropped whole on any other value
    // shape or on Long overflow — a partial sum would be a wrong answer,
    // an absent tail only costs the fold.
    val kPrefix = mutable.ArrayBuffer.empty[Int]
    val kStart = mutable.ArrayBuffer.empty[Boolean]
    val vPrefix = mutable.ArrayBuffer.empty[Long]
    val vals = new ValueTailBuilder
    val colVals = new ColValTailBuilder
    var tsMin = Long.MaxValue
    var tsMax = Long.MinValue
    var i = 0
    sorted.foreach { c =>
      // sorted input: distinct keys are exactly the key changes
      val newKey = prevKey == null || !java.util.Arrays.equals(prevKey, c.key)
      if (i % IndexEvery == 0) {
        entries += IndexEntry(i, payload.size().toLong, c.key, c.col, c.sub)
        kPrefix += dKeys
        kStart += newKey
        vPrefix += vals.sum
        vals.startSpan()
        colVals.startSpan()
      }
      if (newKey) {
        bloom.add(c.key); prevKey = c.key; dKeys += 1
      }
      if (newKey || !sawAddr || !eqNullable(prevCol, c.col) ||
          !eqNullable(prevSub, c.sub)) dAddrs += 1
      prevCol = c.col; prevSub = c.sub; sawAddr = true
      if (c.tombstone) tombs += 1
      if (c.ts < tsMin) tsMin = c.ts
      if (c.ts > tsMax) tsMax = c.ts
      vals.add(c)
      colVals.add(c)
      colBloom.add(i, c.col)
      subBloom.add(i, c.sub)
      if (c.col != null) {
        if (colMin == null || Codecs.compareBytes(c.col, colMin) < 0) colMin = c.col
        if (colMax == null || Codecs.compareBytes(c.col, colMax) > 0) colMax = c.col
      }
      if (c.sub != null) {
        if (subMin == null || Codecs.compareBytes(c.sub, subMin) < 0) subMin = c.sub
        if (subMax == null || Codecs.compareBytes(c.sub, subMax) > 0) subMax = c.sub
      }
      writeCell(pout, c)
      i += 1
    }
    val index = serializeIndex(entries.toSeq, sorted.last.key, bloom.build(),
      colMin, colMax, colBloom.build(), subMin, subMax, subBloom.build(),
      tombs, dKeys, dAddrs,
      kPrefix.toArray, kStart.toArray,
      if (vals.sumOk) vPrefix.toArray else null, if (vals.sumOk) vals.sum else 0L,
      vals, colVals.result(),
      certifiedDeletes = certifiedDeletes && tombs == sorted.length,
      tsMin = tsMin, tsMax = tsMax)
    out.writeInt(sorted.length)
    out.writeLong(payload.size().toLong)
    out.writeInt(index.length)
    payload.writeTo(out)
    out.write(index)
  }

  /** Null-safe byte-array equality (sub is null on non-super cells). */
  private def eqNullable(a: Array[Byte], b: Array[Byte]): Boolean =
    (a eq b) || (a != null && b != null && java.util.Arrays.equals(a, b))

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }

  private def readCell(in: DataInputStream): Cell =
    Cell(readBytes(in), readBytes(in), readBytes(in), readBytes(in),
      in.readLong(), in.readBoolean())

  /** One sorted run of a segment: `[int cellCount][long payloadLen]
    * [int indexByteLen]` header, the cell payload, then a sparse key index —
    * `[int numEntries]` entries of `(int cellPos, long payloadOffset,
    * key bytes)` every [[IndexEvery]] cells (always including cell 0) plus
    * the run's last key. The index is what lets a key-range partition seek
    * into the middle of a run and lets the planner sample key quantiles
    * without touching cell data. */
  final case class RunInfo(payloadOffset: Long, cellCount: Int,
      indexOffset: Long, indexByteLen: Int)

  /** One sparse-index entry: the full (key, col, sub) address prefix of the
    * cell at `cellPos` plus its payload offset. */
  final case class IndexEntry(cellPos: Int, offset: Long,
      key: Array[Byte], col: Array[Byte], sub: Array[Byte])

  final case class RunIndex(cellPos: Array[Int], offsets: Array[Long],
      keys: Array[Array[Byte]], lastKey: Array[Byte],
      bloom: KeyBloom /* null on pre-bloom files */,
      cols: Array[Array[Byte]] = null /* (key, col)-prefixed entries; null on pre-col files */,
      colMin: Array[Byte] = null /* run-wide min/max column (Cassandra's */,
      colMax: Array[Byte] = null /* sstable min/max clustering); null = legacy */,
      colBlooms: Array[KeyBloom] = null /* per-CHUNK distinct-column blooms (one chunk = colChunkCells cells; a single-chunk run stores the legacy run-wide CBLM form); null = legacy */,
      colChunkCells: Int = 0 /* cells per bloom chunk; Int.MaxValue for a run-wide CBLM bloom */,
      subs: Array[Array[Byte]] = null /* per-entry sub bytes; null = legacy or no non-null subs */,
      subMin: Array[Byte] = null /* run-wide min/max SUB-column window */,
      subMax: Array[Byte] = null /* (super mappings); null = legacy or none */,
      subBlooms: Array[KeyBloom] = null /* per-chunk distinct-SUB blooms; null = legacy */,
      subChunkCells: Int = 0,
      statTombstones: Int = -1 /* exact per-run content stats (STAT tail); */,
      statKeys: Int = -1 /* -1 = legacy run (stats unknown) — the */,
      statAddrs: Int = -1 /* metadata-only aggregate path declines */,
      keyPrefix: Array[Int] = null /* per-entry distinct keys BEFORE the entry (KPFX); null = legacy */,
      keyStart: Array[Boolean] = null /* per-entry: does the entry's cell start a new key? */,
      valSums: Array[Long] = null /* per-entry value-sum prefix (VSUM); null = legacy or non-8-byte/overflowing values */,
      valTotal: Long = 0L /* whole-run value sum; valid iff valSums != null */,
      valMins: Array[Long] = null /* per-SPAN value min/max (VMMX); null = legacy or non-8-byte values */,
      valMaxs: Array[Long] = null,
      valMin: Long = 0L /* run-wide value min/max; valid iff valMins != null */,
      valMax: Long = 0L,
      colVals: Array[ColValIdx] = null /* per-COLUMN value stats (CVAL); null = legacy or over-cap */,
      certDeletes: Boolean = false /* certified delete-epoch run (DCRT) */,
      tsMin: Long = 0L /* run-wide cell-timestamp window (TSRG); */,
      tsMax: Long = 0L /* valid iff hasTsRange */,
      hasTsRange: Boolean = false)

  val IndexEvery = 128
  private val RunHeaderLen = 16L

  /** Run directory of a segment, found by skipping payload+index
    * header-to-header (no cell parse). Validates the segment magic/version
    * and every run header; any mismatch or truncation throws a crisp
    * IOException — a corrupt file must never be silently misparsed (the r4
    * regression) or spun on (the skip loop is progress-checked). */
  def runInfos(file: Path): Seq[RunInfo] = {
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(file), 1 << 12))
    try {
      val magic = try in.readInt() catch {
        case _: EOFException => throw new IOException(s"truncated segment header: $file")
      }
      if (magic != SegmentMagic)
        throw new IOException(f"not a cassandralike segment (magic 0x$magic%08x): $file")
      val version = in.readInt()
      if (version != FormatVersion)
        throw new IOException(s"unsupported segment format version $version (want $FormatVersion): $file")
      val runs = mutable.ArrayBuffer.empty[RunInfo]
      var offset = SegmentHeaderLen
      var done = false
      while (!done) {
        val count = try in.readInt() catch { case _: EOFException => done = true; 0 }
        if (!done) {
          val len = in.readLong()
          val idxLen = in.readInt()
          if (count < 0 || len < 0 || idxLen < 0)
            throw new IOException(
              s"corrupt run header (count=$count payload=$len index=$idxLen) at offset $offset: $file")
          runs += RunInfo(offset + RunHeaderLen, count, offset + RunHeaderLen + len, idxLen)
          var toSkip = len + idxLen
          while (toSkip > 0) {
            val skipped = in.skip(toSkip)
            if (skipped > 0) toSkip -= skipped
            else if (in.read() == -1)
              throw new EOFException(
                s"truncated segment (run at offset $offset short by $toSkip bytes): $file")
            else toSkip -= 1
          }
          offset += RunHeaderLen + len + idxLen
        }
      }
      runs.toSeq
    } finally in.close()
  }

  /** (payload offset, cell count) view of [[runInfos]]. */
  def runOffsets(file: Path): Seq[(Long, Int)] =
    runInfos(file).map(ri => (ri.payloadOffset, ri.cellCount))

  /** Index block layout: `[int numEntries](int pos, long off, key)* lastKey`
    * then an OPTIONAL bloom tail `[int numKeys][int numWords][long words…]`
    * then an OPTIONAL column tail `[int ColsMagic](col bytes)*` — the COL
    * of each indexed cell, making every entry a (key, col) address prefix
    * so a point slice over a very wide row can seek past whole index spans
    * (see [[SegmentReader.rangeRun]]'s colSet path). The block is
    * length-prefixed in the run header, so every tail is self-describing by
    * remaining bytes: readers of older files get `bloom = null` /
    * `cols = null`, and an older reader of a new file simply stops after
    * the tails it knows — compatible both ways, no format-version bump
    * (the magic int disambiguates the col tail from any future bloom-less
    * layout). */
  private val ColsMagic = 0x434f4c53 // "COLS"
  private val ColRangeMagic = 0x43524e47 // "CRNG"
  private val ColBloomMagic = 0x43424c4d // "CBLM" (run-wide, single chunk)
  private val ColBlockBloomMagic = 0x43424242 // "CBBB" (per-chunk blooms)
  private val SubRangeMagic = 0x53524e47 // "SRNG" (run-wide [subMin, subMax])
  private val SubsMagic = 0x53554253 // "SUBS" (per-entry sub bytes)
  private val SubBloomMagic = 0x53424c4d // "SBLM" (per-chunk distinct-sub blooms)
  private val KeyPrefixMagic = 0x4b504658 // "KPFX" (per-entry distinct-key prefixes)
  private val ValSumMagic = 0x5653554d // "VSUM" (per-entry value-sum prefixes)
  private val ValRangeMagic = 0x564d4d58 // "VMMX" (run + per-span value min/max)
  private val ColValMagic = 0x4356414c // "CVAL" (per-COLUMN value stats)
  private val TsRangeMagic = 0x54535247 // "TSRG" (run-wide cell-timestamp min/max)
  private val DelCertMagic = 0x44435254 // "DCRT" (certified-delete run marker)
  private val StatsMagic = 0x53544154 // "STAT" (per-run exact content stats)

  /** Distinct-column cap of the CVAL tail: a run with more named columns
    * than this drops the tail whole (tail bytes and writer memory stay
    * bounded). Regular tables — the tail's audience — have schema-width
    * column counts, far below it; high-cardinality transposed runs (cols
    * are data there) opt out via the cap rather than writing megabytes of
    * per-column arrays. */
  val MaxColValCols = 48

  /** Probe knob (tools/bench only): `-Dgraft.write.tails=false` makes the
    * writer skip every OPTIONAL index tail (COLS onward), so the write-path
    * cost of the tails can be measured in isolation (VERDICT r10 #2).
    * Readers treat such runs as legacy — results stay exact, the metadata
    * fast paths just decline. Never set on a production path. */
  private def writeOptionalTails: Boolean =
    !sys.props.get("graft.write.tails").contains("false")

  /** CHUNKED distinct-column bloom accumulator for a run's column BLOOM
    * tail. The min/max window kills DISJOINT slices; the blooms kill the
    * false-window case — a point slice whose wanted column falls INSIDE
    * [colMin, colMax] but is simply absent (interleaved-column wide rows).
    *
    * One bloom per CHUNK of [[ColBloomBuilder.ChunkCells]] consecutive
    * cells (64 index spans), distinct set reset at every chunk boundary:
    * writer memory is bounded by one chunk's cells no matter how big the
    * run is — compaction's giant merged runs get full bloom coverage
    * instead of the old all-or-nothing 1M-distinct opt-out, and the reader
    * gains SPAN-level skips (a chunk whose bloom rejects every wanted
    * column is 8192 provably-irrelevant cells, even across key
    * boundaries). The distinct set per chunk matters (cols recur per key —
    * adjacent dedup alone would inflate the bloom by the key count); a
    * chunk whose cells all carry null cols emits a zero bloom that rejects
    * everything, which is exact (no wanted byte form can be there). Chunks
    * align with index spans (ChunkCells is a multiple of IndexEvery), so a
    * span never straddles chunks. */
  final class ColBloomBuilder {
    private val chunks = mutable.ArrayBuffer.empty[KeyBloom]
    private var set = mutable.HashSet.empty[java.nio.ByteBuffer]
    private var sawAny = false
    /** Feed EVERY cell in write order (null col included) — the position
      * drives chunk boundaries. */
    def add(cellPos: Int, col: Array[Byte]): Unit = {
      val chunk = cellPos / ColBloomBuilder.ChunkCells
      while (chunks.length < chunk) flushChunk()
      if (col != null) { set += java.nio.ByteBuffer.wrap(col); sawAny = true }
    }
    private def flushChunk(): Unit = {
      val b = new KeyBloom.Builder
      set.foreach(bb => b.add(bb.array()))
      chunks += b.build()
      set = mutable.HashSet.empty
    }
    /** Per-chunk blooms (index = cellPos / ChunkCells); null when the run
      * held no non-null column at all (no tail written). */
    def build(): Array[KeyBloom] = {
      if (!sawAny) return null
      flushChunk()
      chunks.toArray
    }
  }
  object ColBloomBuilder {
    val SpansPerChunk = 64
    val ChunkCells: Int = SpansPerChunk * IndexEvery // 8192
  }

  /** Accumulates the VALUE-derived index tails on one sorted write pass:
    * the VSUM prefix sums (valid only while every value is an 8-byte long
    * AND no running prefix overflows Long) and the VMMX per-span + run-wide
    * value min/max (valid whenever every value is an 8-byte long — extremes
    * can't overflow, so a VSUM-overflowing run keeps its VMMX). Spans align
    * with index entries ([[writeRun]]/[[writeSingleRun]] call
    * [[startSpan]] at every entry), so span i covers exactly the cells of
    * index span i — what lets a positional interval take interior spans'
    * extremes from the tail and scan only the two boundary spans. */
  final class ValueTailBuilder {
    var sum = 0L
    private var val8 = true
    private var sumValid = true
    private val spanMins = mutable.ArrayBuffer.empty[Long]
    private val spanMaxs = mutable.ArrayBuffer.empty[Long]
    var runMin: Long = Long.MaxValue
    var runMax: Long = Long.MinValue
    def startSpan(): Unit = { spanMins += Long.MaxValue; spanMaxs += Long.MinValue }
    def add(c: Cell): Unit = {
      if (!val8) return
      if (c.value == null || c.value.length != 8) { val8 = false; return }
      val v = ByteBuffer.wrap(c.value).getLong
      if (sumValid)
        try sum = Math.addExact(sum, v)
        catch { case _: ArithmeticException => sumValid = false }
      val s = spanMins.length - 1
      if (v < spanMins(s)) spanMins(s) = v
      if (v > spanMaxs(s)) spanMaxs(s) = v
      if (v < runMin) runMin = v
      if (v > runMax) runMax = v
    }
    def sumOk: Boolean = val8 && sumValid
    def rangeOk: Boolean = val8 && spanMins.nonEmpty
    def spanCount: Int = spanMins.length
    def mins: Array[Long] = spanMins.toArray
    def maxs: Array[Long] = spanMaxs.toArray
  }

  /** One column's CVAL tail: run totals, per-entry prefix count/sum and
    * per-span value min/max of the cells NAMED `col`. `prefixSums`/
    * `totalSum` valid iff `sumsOk` (every value of this column an 8-byte
    * long AND no prefix overflowed); span/run extremes valid iff `rangeOk`
    * (8-byte longs — extremes can't overflow, so they survive a sum
    * overflow). Empty spans carry the (Long.MaxValue, Long.MinValue)
    * sentinel. Counts are valid unconditionally — they count cells, not
    * values. */
  final case class ColValIdx(col: Array[Byte], sumsOk: Boolean,
      rangeOk: Boolean, totalCount: Int, prefixCounts: Array[Int],
      totalSum: Long, prefixSums: Array[Long],
      runMin: Long, runMax: Long,
      spanMins: Array[Long], spanMaxs: Array[Long])

  /** [[ColValIdx]] reduced to its run totals — what [[RunStats]] and the
    * bucket-stat sidecar carry (the per-entry arrays stay in the index). */
  final case class ColValStat(col: Array[Byte], sumsOk: Boolean,
      rangeOk: Boolean, count: Long, sum: Long, min: Long, max: Long)

  /** Accumulates the PER-COLUMN value tails (CVAL) on the same sorted
    * write pass as every other tail: for each distinct cell NAME in the
    * run — bounded by [[MaxColValCols]]; past the cap the tail is dropped
    * whole — the per-entry prefix count and value-sum of that column's
    * cells BEFORE each index entry, per-span value min/max, and run
    * totals. This is what lets `SUM/MIN/MAX/AVG/COUNT(col) WHERE key
    * BETWEEN …` on a REGULAR mapping (the most common real table shape)
    * answer positionally instead of reading the range (VERDICT r11 #1).
    * The writer validates only the byte SHAPE (8-byte values); the
    * planner's static gate must additionally prove the column TYPE is a
    * binary-marshaled LongType before trusting sums/extremes — a text
    * store's 8-character digit strings would parse as garbage longs.
    * Tail presence asserts COMPLETE per-column coverage: a column absent
    * from a written tail provably has zero cells in the run. */
  final class ColValTailBuilder {
    import java.nio.{ByteBuffer => BB}
    private final class State {
      var count = 0
      var sumsOk = true
      var sum = 0L
      var rangeOk = true
      var runMin = Long.MaxValue
      var runMax = Long.MinValue
      val prefixCounts = mutable.ArrayBuffer.empty[Int]
      val prefixSums = mutable.ArrayBuffer.empty[Long]
      val spanMins = mutable.ArrayBuffer.empty[Long]
      val spanMaxs = mutable.ArrayBuffer.empty[Long]
    }
    private val byCol = mutable.LinkedHashMap.empty[BB, State]
    private var spans = 0
    private var dropped = false
    /** Called exactly when an index entry is pushed, BEFORE the entry's
      * own cell is added — same prefix convention as KPFX/VSUM. */
    def startSpan(): Unit = {
      spans += 1
      if (dropped) return
      byCol.valuesIterator.foreach { st =>
        st.prefixCounts += st.count
        st.prefixSums += st.sum
        st.spanMins += Long.MaxValue
        st.spanMaxs += Long.MinValue
      }
    }
    def add(c: Cell): Unit = {
      if (dropped || c.col == null) return
      val k = BB.wrap(c.col)
      var st = byCol.getOrElse(k, null)
      if (st == null) {
        if (byCol.size >= MaxColValCols) {
          dropped = true; byCol.clear(); return
        }
        st = new State
        // backfill: this column existed (with zero cells) in every
        // earlier span, so its arrays stay aligned with the index entries
        var i = 0
        while (i < spans) {
          st.prefixCounts += 0; st.prefixSums += 0L
          st.spanMins += Long.MaxValue; st.spanMaxs += Long.MinValue
          i += 1
        }
        byCol.put(k, st)
      }
      st.count += 1
      if (c.value == null || c.value.length != 8) {
        st.sumsOk = false; st.rangeOk = false
      } else {
        val v = BB.wrap(c.value).getLong
        if (st.sumsOk)
          try st.sum = Math.addExact(st.sum, v)
          catch { case _: ArithmeticException => st.sumsOk = false }
        if (st.rangeOk) {
          val s = st.spanMins.length - 1
          if (s >= 0) {
            if (v < st.spanMins(s)) st.spanMins(s) = v
            if (v > st.spanMaxs(s)) st.spanMaxs(s) = v
          }
          if (v < st.runMin) st.runMin = v
          if (v > st.runMax) st.runMax = v
        }
      }
    }
    /** The serializable tail (columns byte-sorted for determinism), or
      * null when dropped (over-cap) or no span was ever started. */
    def result(): Array[ColValIdx] = {
      if (dropped || spans == 0) return null
      byCol.iterator.map { case (k, st) =>
        ColValIdx(k.array(), st.sumsOk, st.rangeOk, st.count,
          st.prefixCounts.toArray,
          if (st.sumsOk) st.sum else 0L,
          if (st.sumsOk) st.prefixSums.toArray else null,
          if (st.rangeOk) st.runMin else 0L,
          if (st.rangeOk) st.runMax else 0L,
          if (st.rangeOk) st.spanMins.toArray else null,
          if (st.rangeOk) st.spanMaxs.toArray else null)
      }.toArray.sortWith((a, b) => Codecs.compareBytes(a.col, b.col) < 0)
    }
  }

  private def serializeIndex(entries: Seq[IndexEntry],
      lastKey: Array[Byte], bloom: KeyBloom = null,
      colMin: Array[Byte] = null, colMax: Array[Byte] = null,
      colBlooms: Array[KeyBloom] = null,
      subMin: Array[Byte] = null, subMax: Array[Byte] = null,
      subBlooms: Array[KeyBloom] = null,
      statTombstones: Int = -1, statKeys: Int = -1, statAddrs: Int = -1,
      keyPrefix: Array[Int] = null, keyStart: Array[Boolean] = null,
      valSums: Array[Long] = null, valTotal: Long = 0L,
      valTail: ValueTailBuilder = null,
      colVals: Array[ColValIdx] = null,
      certifiedDeletes: Boolean = false,
      tsMin: Long = Long.MaxValue, tsMax: Long = Long.MinValue)
    : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(entries.length)
    entries.foreach { e =>
      out.writeInt(e.cellPos); out.writeLong(e.offset); writeBytes(out, e.key)
    }
    writeBytes(out, lastKey)
    if (bloom != null) {
      out.writeInt(bloom.numKeys)
      out.writeInt(bloom.words.length)
      bloom.words.foreach(out.writeLong)
    }
    if (!writeOptionalTails) return bos.toByteArray
    out.writeInt(ColsMagic)
    entries.foreach(e => writeBytes(out, e.col))
    // run-wide min/max column — Cassandra's sstable min/max clustering:
    // a slice lookup skips the whole run when no wanted column can fall
    // inside [colMin, colMax] (null when the run held no non-null col)
    if (colMin != null && colMax != null) {
      out.writeInt(ColRangeMagic)
      writeBytes(out, colMin)
      writeBytes(out, colMax)
    }
    // distinct-column blooms — the third self-describing tail (see
    // [[ColBloomBuilder]]); only behind a CRNG tail, so parse order is
    // fixed. A single-chunk run stores the legacy run-wide CBLM form (old
    // readers keep their skip); multi-chunk runs (past ChunkCells cells —
    // compaction's merged runs) store one bloom per chunk under CBBB, which
    // bounds writer memory and adds span-level skips.
    if (colMin != null && colMax != null && colBlooms != null) {
      if (colBlooms.length == 1) {
        out.writeInt(ColBloomMagic)
        out.writeInt(colBlooms(0).numKeys)
        out.writeInt(colBlooms(0).words.length)
        colBlooms(0).words.foreach(out.writeLong)
      } else {
        out.writeInt(ColBlockBloomMagic)
        out.writeInt(ColBloomBuilder.ChunkCells)
        out.writeInt(colBlooms.length)
        colBlooms.foreach { b =>
          out.writeInt(b.numKeys)
          out.writeInt(b.words.length)
          b.words.foreach(out.writeLong)
        }
      }
    }
    // SUB-column tails (super mappings; absent when every sub was null, so
    // regular/transposed tables pay zero bytes): run-wide [subMin, subMax]
    // window, the per-entry sub bytes completing each entry's
    // (key, col, sub) address prefix, and per-chunk distinct-sub blooms —
    // the sub twins of CRNG, COLS and CBBB (one uniform chunked bloom
    // format here; no single-chunk legacy variant to preserve).
    if (subMin != null && subMax != null) {
      out.writeInt(SubRangeMagic)
      writeBytes(out, subMin)
      writeBytes(out, subMax)
      out.writeInt(SubsMagic)
      entries.foreach(e => writeBytes(out, e.sub))
      if (subBlooms != null) {
        out.writeInt(SubBloomMagic)
        out.writeInt(ColBloomBuilder.ChunkCells)
        out.writeInt(subBlooms.length)
        subBlooms.foreach { b =>
          out.writeInt(b.numKeys)
          out.writeInt(b.words.length)
          b.words.foreach(out.writeLong)
        }
      }
    }
    // positional PREFIX tails (round 11): per index entry, the number of
    // distinct keys (KPFX — regular-mapping range counts: rows in a key
    // range = distinct keys there) and the value-sum (VSUM — range SUMs:
    // "total volume in [t1, t2]" from index arithmetic) of every cell
    // BEFORE the entry, so a boundary search answers f(x) positionally and
    // scans only the ONE span containing each boundary. KPFX is ~5 bytes
    // per entry and always present; VSUM (8 bytes/entry + a run total) is
    // written only when EVERY cell value was an 8-byte long and the run
    // total never overflowed — an absent tail declines to the fold.
    if (keyPrefix != null && keyPrefix.length == entries.length) {
      out.writeInt(KeyPrefixMagic)
      var pi = 0
      while (pi < keyPrefix.length) {
        out.writeInt(keyPrefix(pi)); out.writeBoolean(keyStart(pi)); pi += 1
      }
    }
    if (valSums != null && valSums.length == entries.length) {
      out.writeInt(ValSumMagic)
      out.writeLong(valTotal)
      valSums.foreach(out.writeLong)
    }
    // VMMX: run-wide + per-span value MIN/MAX ("peak reading in the
    // window" from index arithmetic) — written whenever every value is an
    // 8-byte long (extremes can't overflow, so a VSUM-overflowing run
    // still carries its VMMX)
    if (valTail != null && valTail.rangeOk &&
        valTail.spanCount == entries.length) {
      out.writeInt(ValRangeMagic)
      out.writeLong(valTail.runMin)
      out.writeLong(valTail.runMax)
      val mins = valTail.mins
      val maxs = valTail.maxs
      var vi = 0
      while (vi < mins.length) {
        out.writeLong(mins(vi)); out.writeLong(maxs(vi)); vi += 1
      }
    }
    // CVAL: per-COLUMN prefix counts/sums and span extremes (regular-
    // mapping value aggregates under key envelopes); self-describing by
    // magic like every tail, dropped whole past MaxColValCols
    if (colVals != null &&
        colVals.forall(cv => cv.prefixCounts.length == entries.length)) {
      out.writeInt(ColValMagic)
      out.writeInt(colVals.length)
      colVals.foreach { cv =>
        writeBytes(out, cv.col)
        out.writeByte((if (cv.sumsOk) 1 else 0) | (if (cv.rangeOk) 2 else 0))
        out.writeInt(cv.totalCount)
        cv.prefixCounts.foreach(out.writeInt)
        if (cv.sumsOk) {
          out.writeLong(cv.totalSum)
          cv.prefixSums.foreach(out.writeLong)
        }
        if (cv.rangeOk) {
          out.writeLong(cv.runMin); out.writeLong(cv.runMax)
          var i = 0
          while (i < cv.spanMins.length) {
            out.writeLong(cv.spanMins(i)); out.writeLong(cv.spanMaxs(i)); i += 1
          }
        }
      }
    }
    // TSRG: run-wide cell-timestamp window — what lets an AS-OF read keep
    // the metadata fast paths when the bound provably covers every cell
    // (maxTs ≤ asOf ⇒ the bounded view IS the current view)
    if (tsMin <= tsMax) {
      out.writeInt(TsRangeMagic)
      out.writeLong(tsMin)
      out.writeLong(tsMax)
    }
    // DCRT: the certified-delete marker (see [[writeRun]]'s contract) —
    // 4 magic bytes on pure-tombstone delete-epoch runs only
    if (certifiedDeletes) out.writeInt(DelCertMagic)
    // per-run exact content STATS — the tail that lets a global
    // COUNT/MIN/MAX answer from metadata alone (see
    // [[CassandraLikeTable.MetadataAggReader]]): tombstone count,
    // distinct keys and distinct (key, col, sub) addresses, all counted
    // exactly during the single sorted write pass. Written last so every
    // older tail keeps its position; legacy readers stop before it,
    // legacy files parse with -1s (stats unknown → the metadata path
    // declines and the scan folds cells as before). INVARIANT: STAT must
    // stay the FINAL tail — [[quickRunStats]] reads it as the fixed
    // 16-byte suffix of the index block; a future tail appended after it
    // must bump that reader.
    if (statTombstones >= 0 && statKeys >= 0 && statAddrs >= 0) {
      out.writeInt(StatsMagic)
      out.writeInt(statTombstones)
      out.writeInt(statKeys)
      out.writeInt(statAddrs)
    }
    bos.toByteArray
  }

  private def parseIndex(bytes: Array[Byte]): RunIndex = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val pos = new Array[Int](n)
    val off = new Array[Long](n)
    val keys = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { pos(i) = in.readInt(); off(i) = in.readLong(); keys(i) = readBytes(in); i += 1 }
    val lastKey = readBytes(in)
    in.mark(8)
    val bloom =
      if (in.available() < 8) null
      else {
        val numKeys = in.readInt()
        val numWords = in.readInt()
        if (numKeys == ColsMagic || numWords < 0 ||
            in.available() < numWords.toLong * 8L) { in.reset(); null }
        else {
          val words = new Array[Long](numWords)
          var w = 0
          while (w < words.length) { words(w) = in.readLong(); w += 1 }
          new KeyBloom(words, numKeys)
        }
      }
    val cols =
      if (in.available() < 4) null
      else {
        in.mark(4)
        if (in.readInt() != ColsMagic) { in.reset(); null }
        else {
          val cs = new Array[Array[Byte]](n)
          var j = 0
          while (j < n) { cs(j) = readBytes(in); j += 1 }
          cs
        }
      }
    val (cMin, cMax) =
      if (in.available() < 4) (null, null)
      else {
        in.mark(4)
        if (in.readInt() != ColRangeMagic) { in.reset(); (null, null) }
        else (readBytes(in), readBytes(in))
      }
    def readBloom(): KeyBloom = {
      val numKeys = in.readInt()
      val numWords = in.readInt()
      if (numWords < 0 || in.available() < numWords.toLong * 8L) return null
      val words = new Array[Long](numWords)
      var w = 0
      while (w < words.length) { words(w) = in.readLong(); w += 1 }
      new KeyBloom(words, numKeys)
    }
    val (colBlooms, colChunkCells) =
      if (cMin == null || in.available() < 12) (null, 0)
      else {
        in.mark(12)
        in.readInt() match {
          case ColBloomMagic => // run-wide single bloom (legacy + small runs)
            readBloom() match {
              case null => in.reset(); (null, 0)
              case b => (Array(b), Int.MaxValue)
            }
          case ColBlockBloomMagic => // one bloom per chunk of chunkCells cells
            val chunkCells = in.readInt()
            val numChunks = in.readInt()
            if (chunkCells <= 0 || numChunks <= 0) { in.reset(); (null, 0) }
            else {
              val bs = new Array[KeyBloom](numChunks)
              var ci = 0
              var bad = false
              while (ci < numChunks && !bad) {
                bs(ci) = readBloom(); if (bs(ci) == null) bad = true; ci += 1
              }
              if (bad) { in.reset(); (null, 0) } else (bs, chunkCells)
            }
          case _ => in.reset(); (null, 0)
        }
      }
    val (sMin, sMax) =
      if (in.available() < 4) (null, null)
      else {
        in.mark(4)
        if (in.readInt() != SubRangeMagic) { in.reset(); (null, null) }
        else (readBytes(in), readBytes(in))
      }
    val subs =
      if (sMin == null || in.available() < 4) null
      else {
        in.mark(4)
        if (in.readInt() != SubsMagic) { in.reset(); null }
        else {
          val ss = new Array[Array[Byte]](n)
          var j = 0
          while (j < n) { ss(j) = readBytes(in); j += 1 }
          ss
        }
      }
    val (subBlooms, subChunkCells) =
      if (subs == null || in.available() < 12) (null, 0)
      else {
        in.mark(12)
        if (in.readInt() != SubBloomMagic) { in.reset(); (null, 0) }
        else {
          val chunkCells = in.readInt()
          val numChunks = in.readInt()
          if (chunkCells <= 0 || numChunks <= 0) { in.reset(); (null, 0) }
          else {
            val bs = new Array[KeyBloom](numChunks)
            var ci = 0
            var bad = false
            while (ci < numChunks && !bad) {
              bs(ci) = readBloom(); if (bs(ci) == null) bad = true; ci += 1
            }
            if (bad) { in.reset(); (null, 0) } else (bs, chunkCells)
          }
        }
      }
    val (kPrefix, kStart) =
      if (in.available() < 4 + 5 * n) (null, null)
      else {
        in.mark(4)
        if (in.readInt() != KeyPrefixMagic) { in.reset(); (null, null) }
        else {
          val kp = new Array[Int](n)
          val ks = new Array[Boolean](n)
          var j = 0
          while (j < n) { kp(j) = in.readInt(); ks(j) = in.readBoolean(); j += 1 }
          (kp, ks)
        }
      }
    val (vSums, vTotal) =
      if (in.available() < 12 + 8 * n) (null, 0L)
      else {
        in.mark(4)
        if (in.readInt() != ValSumMagic) { in.reset(); (null, 0L) }
        else {
          val total = in.readLong()
          val vs = new Array[Long](n)
          var j = 0
          while (j < n) { vs(j) = in.readLong(); j += 1 }
          (vs, total)
        }
      }
    val (vMins, vMaxs, vMin, vMax) =
      if (in.available() < 20 + 16 * n) (null, null, 0L, 0L)
      else {
        in.mark(4)
        if (in.readInt() != ValRangeMagic) { in.reset(); (null, null, 0L, 0L) }
        else {
          val mn = in.readLong()
          val mx = in.readLong()
          val mins = new Array[Long](n)
          val maxs = new Array[Long](n)
          var j = 0
          while (j < n) { mins(j) = in.readLong(); maxs(j) = in.readLong(); j += 1 }
          (mins, maxs, mn, mx)
        }
      }
    val colVals =
      if (in.available() < 8) null
      else {
        in.mark(8)
        if (in.readInt() != ColValMagic) { in.reset(); null }
        else {
          val nc = in.readInt()
          if (nc < 0 || nc > MaxColValCols) { in.reset(); null }
          else {
            val arr = new Array[ColValIdx](nc)
            var ci = 0
            while (ci < nc) {
              val col = readBytes(in)
              val flags = in.readByte()
              val sumsOk = (flags & 1) != 0
              val rangeOk = (flags & 2) != 0
              val totalCount = in.readInt()
              val pc = new Array[Int](n)
              var j = 0
              while (j < n) { pc(j) = in.readInt(); j += 1 }
              var totalSum = 0L
              var ps: Array[Long] = null
              if (sumsOk) {
                totalSum = in.readLong()
                ps = new Array[Long](n)
                j = 0
                while (j < n) { ps(j) = in.readLong(); j += 1 }
              }
              var rMin = 0L
              var rMax = 0L
              var sm: Array[Long] = null
              var sx: Array[Long] = null
              if (rangeOk) {
                rMin = in.readLong(); rMax = in.readLong()
                sm = new Array[Long](n); sx = new Array[Long](n)
                j = 0
                while (j < n) { sm(j) = in.readLong(); sx(j) = in.readLong(); j += 1 }
              }
              arr(ci) = ColValIdx(col, sumsOk, rangeOk, totalCount, pc,
                totalSum, ps, rMin, rMax, sm, sx)
              ci += 1
            }
            arr
          }
        }
      }
    val (tsMin, tsMax, hasTs) =
      if (in.available() < 20) (0L, 0L, false)
      else {
        in.mark(4)
        if (in.readInt() != TsRangeMagic) { in.reset(); (0L, 0L, false) }
        else (in.readLong(), in.readLong(), true)
      }
    val certDeletes =
      if (in.available() < 4) false
      else {
        in.mark(4)
        if (in.readInt() != DelCertMagic) { in.reset(); false }
        else true
      }
    val (sTombs, sKeys, sAddrs) =
      if (in.available() < 16) (-1, -1, -1)
      else {
        in.mark(16)
        if (in.readInt() != StatsMagic) { in.reset(); (-1, -1, -1) }
        else (in.readInt(), in.readInt(), in.readInt())
      }
    RunIndex(pos, off, keys, lastKey, bloom, cols, cMin, cMax,
      colBlooms, colChunkCells, subs, sMin, sMax, subBlooms, subChunkCells,
      sTombs, sKeys, sAddrs, kPrefix, kStart, vSums, vTotal,
      vMins, vMaxs, vMin, vMax, colVals, certDeletes, tsMin, tsMax, hasTs)
  }

  // ---- immutable-file driver-side caches: a committed segment never
  // changes (temp-write + atomic rename), so (path, size, mtime) keys stats
  // and sample reads forever; planning cost stays O(1) per segment per
  // process instead of re-walking run headers every plan (VERDICT r3 #8) ----

  final case class SegmentStats(bytes: Long, cells: Long)

  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), SegmentStats]()
  private val sampleCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Seq[Array[Byte]]]()
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[KeyBloom]]()
  private val boundsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), (Array[Byte], Array[Byte])]()
  private val colRangeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[(Array[Byte], Array[Byte])]]()
  private val colBloomCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[Array[KeyBloom]]]()
  private val subRangeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[(Array[Byte], Array[Byte])]]()
  private val subBloomCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[Array[KeyBloom]]]()
  private val runStatsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[RunStats]]()
  private val quickStatsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Array[QuickStats]]()

  private def cacheKey(file: Path): (String, Long, Long) =
    (file.toString, Files.size(file), Files.getLastModifiedTime(file).toMillis)

  /** Probe/test hook: drop every driver-side planning memo (run stats,
    * quick stats, bucket-stat sidecars) so a measurement can replay the
    * COLD-driver planning cost inside one JVM. Never called on a
    * production path — the caches are correct forever (immutable files). */
  private[graft] def clearPlannerCaches(): Unit = {
    runStatsCache.clear()
    quickStatsCache.clear()
    bucketStatCache.clear()
    subsetStatCache.clear()
    sidecarRunStatsCache.clear()
  }

  /** Total (bytes, cells) of one segment; memoized per immutable file. */
  def segmentStats(file: Path): SegmentStats =
    statsCache.computeIfAbsent(cacheKey(file), _ =>
      SegmentStats(Files.size(file), runInfos(file).map(_.cellCount.toLong).sum))

  /** Sparse key sample of one segment (~1 key per [[IndexEvery]] cells, from
    * the run indexes only — no cell data read); memoized per immutable file. */
  def sampleKeys(file: Path): Seq[Array[Byte]] =
    sampleCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).flatMap(ri => r.readIndex(ri).keys) finally r.close()
    })

  /** (min, max) key of one segment — min over each run's first indexed key,
    * max over each run's lastKey, from the run indexes only (no cell data
    * read); memoized per immutable file. (null, null) = empty segment. The
    * planning-time bucket-skip check for index range probes: a bucket none
    * of whose segments intersect `[lo, hi)` is provably posting-free and is
    * never opened. */
  def keyBounds(file: Path): (Array[Byte], Array[Byte]) =
    boundsCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try {
        var lo: Array[Byte] = null
        var hi: Array[Byte] = null
        runInfos(file).foreach { ri =>
          if (ri.cellCount > 0) {
            val idx = r.readIndex(ri)
            if (lo == null || Codecs.compareBytes(idx.keys(0), lo) < 0)
              lo = idx.keys(0)
            if (hi == null || Codecs.compareBytes(idx.lastKey, hi) > 0)
              hi = idx.lastKey
          }
        }
        (lo, hi)
      } finally r.close()
    })

  /** Everything a metadata-only aggregate needs about one run, read from
    * the run index alone (no cell payload IO): exact cell/tombstone/
    * distinct counts from the STAT tail (-1s on legacy runs — the caller
    * must decline), the first/last key and the run-wide column/sub
    * windows. */
  final case class RunStats(cells: Int,
      firstKey: Array[Byte], lastKey: Array[Byte],
      colMin: Array[Byte], colMax: Array[Byte],
      subMin: Array[Byte], subMax: Array[Byte],
      tombstones: Int, distinctKeys: Int, distinctAddrs: Int,
      /** every index entry carries non-null col bytes — the precondition
        * of composite (key, col) boundary arithmetic */
      colEntries: Boolean = false,
      /** every index entry carries non-null sub bytes — the precondition
        * of (key, col, sub) boundary arithmetic */
      subEntries: Boolean = false,
      /** the run carries the KPFX distinct-key prefix tail — the
        * precondition of positional distinct-key range counts */
      hasKeyPrefix: Boolean = false,
      /** the run carries the VSUM value-sum prefix tail (every value an
        * 8-byte long, run total long-representable) */
      hasValSums: Boolean = false,
      /** whole-run value sum; valid iff [[hasValSums]] */
      valTotal: Long = 0L,
      /** the run carries the VMMX per-span value min/max tail (every
        * value an 8-byte long; extremes never overflow, so this can hold
        * where [[hasValSums]] dropped) */
      hasValRange: Boolean = false,
      /** run-wide value min/max; valid iff [[hasValRange]] */
      valMin: Long = 0L,
      valMax: Long = 0L,
      /** per-COLUMN run totals from the CVAL tail; null = tail absent
        * (legacy run or over-cap distinct columns) — per-column
        * aggregates then decline to the fold */
      colVals: Array[ColValStat] = null,
      /** certified delete-epoch run (DCRT marker — see
        * [[writeRun]]'s contract): every cell a tombstone shadowing a
        * then-visible cell, whole keys tombstoned together */
      certDeletes: Boolean = false,
      /** run-wide cell-timestamp window (TSRG); valid iff hasTsRange —
        * what proves an AS-OF bound covers every cell */
      tsMin: Long = 0L,
      tsMax: Long = 0L,
      hasTsRange: Boolean = false)

  /** The STAT counters of one run, without the rest of its index. */
  final case class QuickStats(cells: Int, tombstones: Int,
      distinctKeys: Int, distinctAddrs: Int)

  /** STAT counters of every non-empty run, read from the FIXED 16-byte
    * suffix of each index block — STAT is always the LAST tail
    * ([[serializeIndex]] keeps that invariant; any future tail appended
    * after it must bump this reader). O(16 bytes) per run, so cheap
    * enough for every planning's exact-numRows check, where parsing full
    * index tails (blooms included) would be a driver-side terabyte at
    * 100-TB segment counts. A legacy run whose trailing bytes happen to
    * spell the magic is rejected by the range sanity checks (counts must
    * be within the run's cell count and mutually consistent) — and a
    * false negative only costs the exact statistic, never correctness.
    * tombstones = -1 marks a run without a (valid) tail. */
  def quickRunStats(file: Path): Array[QuickStats] =
    quickStatsCache.computeIfAbsent(cacheKey(file), _ => {
      val ch = java.nio.channels.FileChannel.open(file)
      try runInfos(file).filter(_.cellCount > 0).map { ri =>
        val legacy = QuickStats(ri.cellCount, -1, -1, -1)
        if (ri.indexByteLen < 16) legacy
        else {
          val buf = java.nio.ByteBuffer.allocate(16)
          val pos = ri.indexOffset + ri.indexByteLen - 16
          while (buf.hasRemaining) {
            if (ch.read(buf, pos + buf.position()) < 0)
              throw new EOFException(s"truncated index tail: $file")
          }
          val (m, t, k, a) = (buf.getInt(0), buf.getInt(4), buf.getInt(8), buf.getInt(12))
          if (m != StatsMagic || t < 0 || k < 1 || a < k ||
              t > ri.cellCount || a > ri.cellCount) legacy
          else QuickStats(ri.cellCount, t, k, a)
        }
      }.toArray
      finally ch.close()
    })

  /** Cells of one segment whose key falls in [lo, hi) (null = unbounded),
    * counted from the sparse index: runs fully inside the range count
    * positionally (cellCount, no IO beyond the memoized stats), runs
    * disjoint from it count zero, and only a BOUNDARY-crossing run reads
    * its index and scans the one span containing each boundary — at most
    * 2×[[IndexEvery]] cell decodes per run, however wide the range. The
    * metadata-count companion to the seek machinery: a range COUNT over a
    * compacted store costs O(runs) metadata instead of O(range) decodes.
    *
    * Counts CELLS. The caller must have proven every counted cell is a
    * distinct visible row (STAT distinctAddrs == cells per run, pairwise
    * run-disjointness, zero tombstones) before treating this as a row
    * count — see [[graft.sources.cassandralike.MetadataAggReader]]. */
  def countCellsInRange(file: Path, lo: Array[Byte], hi: Array[Byte]): Long = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file) // aligned: runStats skips empty runs too
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) total += ri.cellCount
          else {
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            // f(hi) - f(lo), where a null bound contributes its identity
            // (f(-inf) = 0 cells below a missing lower bound, f(+inf) =
            // cellCount below a missing upper bound)
            total +=
              (if (hi == null) ri.cellCount.toLong
               else cellsBelow(reader, ri, idx, hi)) -
              (if (lo == null) 0L else cellsBelow(reader, ri, idx, lo))
          }
        }
        i += 1
      }
    } finally if (reader != null) reader.close()
    total
  }

  /** f(x) = #cells of one run with key < x (x non-null), from its parsed
    * index. Entry keys are non-decreasing (a hot key spans entries), so
    * binary-search the LAST entry strictly below x: every earlier span is
    * fully below and counts positionally; only the found span is scanned
    * (sorted — stops at the first key >= x). */
  private def cellsBelow(reader: SegmentReader, ri: RunInfo, idx: RunIndex,
      x: Array[Byte]): Long = {
    val keys = idx.keys
    if (Codecs.compareBytes(keys(0), x) >= 0) return 0L
    if (Codecs.compareBytes(idx.lastKey, x) < 0) return ri.cellCount.toLong
    val m = lastEntryBelow(keys, x)
    var n = idx.cellPos(m).toLong
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var scanning = true
    while (scanning && it.hasNext) {
      if (Codecs.compareBytes(it.next().key, x) < 0) n += 1
      else scanning = false
    }
    n
  }

  /** Largest entry index with keys(i) < x; caller guarantees keys(0) < x. */
  private def lastEntryBelow(keys: Array[Array[Byte]], x: Array[Byte]): Int = {
    var a = 0
    var b = keys.length - 1
    while (a < b) {
      val mid = (a + b + 1) >>> 1
      if (Codecs.compareBytes(keys(mid), x) < 0) a = mid else b = mid - 1
    }
    a
  }

  private def spanLength(ri: RunInfo, idx: RunIndex, e: Int): Int =
    (if (e == idx.cellPos.length - 1) ri.cellCount else idx.cellPos(e + 1)) -
      idx.cellPos(e)

  /** k ++ 0x00 — the immediate successor of `k` in unsigned-lexicographic
    * byte order: the exclusive upper bound admitting exactly the byte
    * strings equal to `k`. The ONE successor primitive of the package —
    * [[KeyLookupBounds.succ]] delegates here, so every half-open envelope
    * shares the same boundary convention. */
  private[cassandralike] def byteSucc(k: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(k, k.length + 1)
    out(k.length) = 0
    out
  }

  /** Per-point present-cell counts over one segment — the IN twin of
    * [[countCellsInRange]]: a run whose memoized key window or key bloom
    * rejects every point is skipped without ANY index IO, and one index
    * parse per surviving run answers all its points (a large pushed IN
    * must not parse the index once per key). Returned counts align with
    * `points`. Same cells-not-rows caveat as [[countCellsInRange]].
    *
    * `colLo`/`colHi` (optional, half-open) restrict each point to its
    * cells with clustering-column bytes in [colLo, colHi) — the wide-row
    * "how many columns of row k in [a, b)" count, answered from COMPOSITE
    * (key, col) boundaries (a key's cells are col-sorted within a run, so
    * the restriction is still one contiguous interval). `colPoints`
    * (mutually exclusive with the col window) restricts each key to the
    * listed clustering columns instead — each (key, col) pair its own
    * contiguous interval — optionally narrowed further to sub-column
    * bytes in [subLo, subHi) (sub bytes are sorted within one (key, col)
    * group, null sub ordering as empty). Callers must have proven every
    * candidate run carries complete per-entry col bytes
    * ([[RunStats.colEntries]]) before passing col bounds, and sub bytes
    * ([[RunStats.subEntries]]) before passing sub bounds. */
  def countCellsAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte] = null, colHi: Array[Byte] = null,
      colPoints: Seq[Array[Byte]] = null,
      subLo: Array[Byte] = null, subHi: Array[Byte] = null): Array[Long] = {
    val out = new Array[Long](points.length)
    if (points.isEmpty) return out
    val infosAll = runInfos(file)
    val blooms = runBlooms(file) // aligned with infosAll (unfiltered)
    val statsIt = runStats(file).iterator // aligned with non-empty runs
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                pointProbeIndexReads.incrementAndGet()
                idx = reader.readIndex(ri)
              }
              if (colPoints != null) {
                // one contiguous interval per (k, c):
                // [ (k, c, subLo) , (k, c, subHi) ), null sub bounds
                // falling back to the whole (k, c) group
                var ci = 0
                while (ci < colPoints.length) {
                  val c = colPoints(ci)
                  val below =
                    if (subHi == null)
                      cellsBelowComposite(reader, ri, idx, k, byteSucc(c))
                    else cellsBelowComposite(reader, ri, idx, k, c, subHi)
                  val above =
                    if (subLo == null) cellsBelowComposite(reader, ri, idx, k, c)
                    else cellsBelowComposite(reader, ri, idx, k, c, subLo)
                  out(p) += below - above
                  ci += 1
                }
              } else {
                // [ (k, colLo) , (k, colHi) ) — a null col bound falls back
                // to the key-only boundary: (k, -inf) = k, (k, +inf) = succ(k)
                val below =
                  if (colHi == null) cellsBelow(reader, ri, idx, byteSucc(k))
                  else cellsBelowComposite(reader, ri, idx, k, colHi)
                val above =
                  if (colLo == null) cellsBelow(reader, ri, idx, k)
                  else cellsBelowComposite(reader, ri, idx, k, colLo)
                out(p) += below - above
              }
            }
            p += 1
          }
        }
        r += 1
      }
    } finally if (reader != null) reader.close()
    out
  }

  /** f(X) for the COMPOSITE boundary X = (keyB[, colB[, subB]]): #cells of
    * one run whose (key, col, sub) address is lexicographically below X —
    * the multi-level twin of [[cellsBelow]]. A null colB compares at key
    * level only ((k) = "before any cell of k"); a null subB at (key, col)
    * level. Requires per-entry col/sub bytes down to the deepest non-null
    * bound (the caller gates on [[RunStats.colEntries]] /
    * [[RunStats.subEntries]]); entry addresses are non-decreasing in
    * (key, col, sub), so the same last-entry-below search applies and only
    * the boundary span is scanned. */
  private def cellsBelowComposite(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, keyB: Array[Byte], colB: Array[Byte],
      subB: Array[Byte] = null): Long = {
    def addrBelow(k: Array[Byte], c: Array[Byte], s: Array[Byte]): Boolean = {
      val kc = Codecs.compareBytes(k, keyB)
      if (kc != 0) return kc < 0
      if (colB == null) return false
      val cc = Codecs.compareBytes(c, colB)
      if (cc != 0) return cc < 0
      if (subB == null) return false
      // [[addressOrdering]] sorts a null sub as EMPTY bytes — compare the
      // same way, so hidden null-sub cells order consistently
      Codecs.compareBytes(
        if (s == null) Array.emptyByteArray else s, subB) < 0
    }
    val keys = idx.keys
    val cols = idx.cols
    val subs = idx.subs
    def entrySub(i: Int): Array[Byte] = if (subs == null) null else subs(i)
    if (!addrBelow(keys(0), cols(0), entrySub(0))) return 0L
    // binary search the LAST entry strictly below the boundary
    var a = 0
    var b = keys.length - 1
    while (a < b) {
      val mid = (a + b + 1) >>> 1
      if (addrBelow(keys(mid), cols(mid), entrySub(mid))) a = mid else b = mid - 1
    }
    var n = idx.cellPos(a).toLong
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(a),
      spanLength(ri, idx, a))
    var scanning = true
    while (scanning && it.hasNext) {
      val cell = it.next()
      if (addrBelow(cell.key, cell.col, cell.sub)) n += 1
      else scanning = false
    }
    n
  }

  /** The 8-byte big-endian long value of a cell under a VSUM-tailed run.
    * Tail presence proves every cell value in the run is an 8-byte long;
    * throws the same ArithmeticException the overflow paths use, so any
    * impossible shape surfaces as a decline, never a wrong sum. */
  private def valueLong(c: Cell): Long =
    if (c.value != null && c.value.length == 8) ByteBuffer.wrap(c.value).getLong
    else throw new ArithmeticException("non-8-byte value under VSUM tail")

  /** Value-sum of one segment's cells with key in [lo, hi) (null =
    * unbounded), from the VSUM prefix tails: runs fully inside the range
    * contribute their run total with no IO beyond the memoized stats, and
    * only boundary-crossing runs read their index and scan the ONE span
    * containing each boundary — the SUM twin of [[countCellsInRange]]
    * ("total volume in the window" without reading the range). None when
    * any non-disjoint run lacks the tail, or any accumulation overflows
    * Long (the fold then owns the query — Spark's own non-ANSI wrap-around
    * reproduces there; a wrapped metadata answer would silently disagree
    * with ANSI mode).
    *
    * Sums CELL values. The caller must have proven every summed cell a
    * distinct visible row (zero tombstones, disjoint runs, per-run
    * distinctAddrs == cells) — same proof obligations as the counts. */
  def sumCellsInRange(file: Path, lo: Array[Byte], hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (!s.hasValSums) return None
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) total = Math.addExact(total, s.valTotal)
          else {
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            val below =
              if (hi == null) idx.valTotal else sumBelow(reader, ri, idx, hi)
            val above =
              if (lo == null) 0L else sumBelow(reader, ri, idx, lo)
            total = Math.addExact(total, Math.subtractExact(below, above))
          }
        }
        i += 1
      }
      Some(total)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** Value-sum of one run's cells with key < x — [[cellsBelow]]'s VSUM
    * twin (caller guarantees idx.valSums != null). Prefix sums at entry
    * boundaries plus a scan of the one boundary span; every intermediate
    * is a true prefix of the run, so it fits Long by tail construction. */
  private def sumBelow(reader: SegmentReader, ri: RunInfo, idx: RunIndex,
      x: Array[Byte]): Long = {
    val keys = idx.keys
    if (Codecs.compareBytes(keys(0), x) >= 0) return 0L
    if (Codecs.compareBytes(idx.lastKey, x) < 0) return idx.valTotal
    val m = lastEntryBelow(keys, x)
    var s = idx.valSums(m)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var scanning = true
    while (scanning && it.hasNext) {
      val c = it.next()
      if (Codecs.compareBytes(c.key, x) < 0) s = Math.addExact(s, valueLong(c))
      else scanning = false
    }
    s
  }

  /** Per-point value sums over one segment — the SUM twin of
    * [[countCellsAtPoints]] (same pruning: a run whose key window or bloom
    * rejects every point is skipped without index IO and without needing a
    * VSUM tail). Supports the same col-window / col-point / sub-window
    * narrowing via composite boundaries. None when any CONSULTED run lacks
    * the tail or an accumulation overflows. Same cells-not-rows caveat. */
  def sumCellsAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte] = null, colHi: Array[Byte] = null,
      colPoints: Seq[Array[Byte]] = null,
      subLo: Array[Byte] = null, subHi: Array[Byte] = null): Option[Array[Long]] = {
    val out = new Array[Long](points.length)
    if (points.isEmpty) return Some(out)
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              if (!s.hasValSums) return None
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                idx = reader.readIndex(ri)
              }
              if (colPoints != null) {
                var ci = 0
                while (ci < colPoints.length) {
                  val c = colPoints(ci)
                  val below =
                    if (subHi == null)
                      sumBelowComposite(reader, ri, idx, k, byteSucc(c))
                    else sumBelowComposite(reader, ri, idx, k, c, subHi)
                  val above =
                    if (subLo == null) sumBelowComposite(reader, ri, idx, k, c)
                    else sumBelowComposite(reader, ri, idx, k, c, subLo)
                  out(p) = Math.addExact(out(p), Math.subtractExact(below, above))
                  ci += 1
                }
              } else {
                val below =
                  if (colHi == null) sumBelow(reader, ri, idx, byteSucc(k))
                  else sumBelowComposite(reader, ri, idx, k, colHi)
                val above =
                  if (colLo == null) sumBelow(reader, ri, idx, k)
                  else sumBelowComposite(reader, ri, idx, k, colLo)
                out(p) = Math.addExact(out(p), Math.subtractExact(below, above))
              }
            }
            p += 1
          }
        }
        r += 1
      }
      Some(out)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** Value-sum of one run's cells with (key, col, sub) address below the
    * composite boundary — [[cellsBelowComposite]]'s VSUM twin (caller
    * guarantees valSums, and col/sub entry bytes down to the deepest
    * non-null bound). */
  private def sumBelowComposite(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, keyB: Array[Byte], colB: Array[Byte],
      subB: Array[Byte] = null): Long = {
    def addrBelow(k: Array[Byte], c: Array[Byte], s: Array[Byte]): Boolean = {
      val kc = Codecs.compareBytes(k, keyB)
      if (kc != 0) return kc < 0
      if (colB == null) return false
      val cc = Codecs.compareBytes(c, colB)
      if (cc != 0) return cc < 0
      if (subB == null) return false
      Codecs.compareBytes(
        if (s == null) Array.emptyByteArray else s, subB) < 0
    }
    val keys = idx.keys
    val cols = idx.cols
    val subs = idx.subs
    def entrySub(i: Int): Array[Byte] = if (subs == null) null else subs(i)
    if (!addrBelow(keys(0), cols(0), entrySub(0))) return 0L
    var a = 0
    var b = keys.length - 1
    while (a < b) {
      val mid = (a + b + 1) >>> 1
      if (addrBelow(keys(mid), cols(mid), entrySub(mid))) a = mid else b = mid - 1
    }
    var n = idx.valSums(a)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(a),
      spanLength(ri, idx, a))
    var scanning = true
    while (scanning && it.hasNext) {
      val cell = it.next()
      if (addrBelow(cell.key, cell.col, cell.sub)) n = Math.addExact(n, valueLong(cell))
      else scanning = false
    }
    n
  }

  /** Extremal decoded VALUE over the cell POSITIONS [loPos, hiPos) of one
    * run, from the VMMX tail (caller guarantees idx.valMins != null):
    * spans fully inside the interval contribute their tail min/max with
    * no IO, only the (at most two) partial boundary spans scan cells —
    * the value twin of the positional counts. None = empty interval. */
  private def extremalValueBetween(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, loPos: Long, hiPos: Long,
      wantMin: Boolean): Option[Long] = {
    if (loPos >= hiPos) return None
    val n = idx.cellPos.length
    var has = false
    var best = 0L
    def consider(v: Long): Unit =
      if (!has || (if (wantMin) v < best else v > best)) { has = true; best = v }
    // first span that can overlap: the last span starting at or below loPos
    var s = {
      var a = 0
      var b = n - 1
      while (a < b) {
        val mid = (a + b + 1) >>> 1
        if (idx.cellPos(mid) <= loPos) a = mid else b = mid - 1
      }
      a
    }
    while (s < n && idx.cellPos(s) < hiPos) {
      val start = idx.cellPos(s).toLong
      val end = (if (s == n - 1) ri.cellCount else idx.cellPos(s + 1)).toLong
      if (end > loPos) {
        if (start >= loPos && end <= hiPos)
          consider(if (wantMin) idx.valMins(s) else idx.valMaxs(s))
        else {
          val it = reader.runIterator(ri.payloadOffset + idx.offsets(s),
            (end - start).toInt)
          var p = start
          while (p < end && p < hiPos && it.hasNext) {
            val c = it.next()
            if (p >= loPos) consider(valueLong(c))
            p += 1
          }
        }
      }
      s += 1
    }
    if (has) Some(best) else None
  }

  /** Extremal decoded VALUE of one segment's cells with key in [lo, hi)
    * (null = unbounded) — "the peak reading in the window" from the VMMX
    * tails: runs fully inside answer from run-wide min/max with no IO,
    * boundary runs resolve the interval POSITIONS with the usual boundary
    * searches and take interior spans from the tail. Some(None) = no cell
    * in range; None = a non-disjoint run lacks the tail (decline → fold).
    *
    * Values of OVERWRITTEN addresses would contribute here — the caller
    * must have proven every cell visible (zero tombstones, disjoint runs,
    * per-run distinctAddrs == cells), the same proofs the counts use. */
  def extremalValueInRange(file: Path, lo: Array[Byte], hi: Array[Byte],
      wantMin: Boolean): Option[Option[Long]] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var has = false
    var best = 0L
    def consider(v: Long): Unit =
      if (!has || (if (wantMin) v < best else v > best)) { has = true; best = v }
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (!s.hasValRange) return None
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) consider(if (wantMin) s.valMin else s.valMax)
          else {
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            val loPos = if (fullLow) 0L else cellsBelow(reader, ri, idx, lo)
            val hiPos =
              if (fullHigh) ri.cellCount.toLong else cellsBelow(reader, ri, idx, hi)
            extremalValueBetween(reader, ri, idx, loPos, hiPos, wantMin)
              .foreach(consider)
          }
        }
        i += 1
      }
      Some(if (has) Some(best) else None)
    } catch {
      // a corrupt run whose VMMX tail coexists with a non-8-byte value
      // declines like the SUM twin does, instead of crashing the query
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** Per-point extremal VALUES over one segment — the value twin of
    * [[countCellsAtPoints]], with the same col-window / col-point /
    * sub-window narrowing (interval positions from the composite boundary
    * searches, interior spans from the VMMX tail). Returned array aligns
    * with `points`; a null element = that key has no cell in its
    * interval. None = a consulted run lacks the tail (decline). Same
    * visible-row proof obligations as [[extremalValueInRange]]. */
  def extremalValuesAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte] = null, colHi: Array[Byte] = null,
      colPoints: Seq[Array[Byte]] = null,
      subLo: Array[Byte] = null, subHi: Array[Byte] = null,
      wantMin: Boolean = true): Option[Array[java.lang.Long]] = {
    val out = new Array[java.lang.Long](points.length)
    if (points.isEmpty) return Some(out)
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    def merge(p: Int, v: Option[Long]): Unit = v.foreach { x =>
      if (out(p) == null || (if (wantMin) x < out(p) else x > out(p)))
        out(p) = x
    }
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              if (!s.hasValRange) return None
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                idx = reader.readIndex(ri)
              }
              if (colPoints != null) {
                var ci = 0
                while (ci < colPoints.length) {
                  val c = colPoints(ci)
                  val hiPos =
                    if (subHi == null)
                      cellsBelowComposite(reader, ri, idx, k, byteSucc(c))
                    else cellsBelowComposite(reader, ri, idx, k, c, subHi)
                  val loPos =
                    if (subLo == null) cellsBelowComposite(reader, ri, idx, k, c)
                    else cellsBelowComposite(reader, ri, idx, k, c, subLo)
                  merge(p, extremalValueBetween(reader, ri, idx, loPos, hiPos, wantMin))
                  ci += 1
                }
              } else {
                val hiPos =
                  if (colHi == null) cellsBelow(reader, ri, idx, byteSucc(k))
                  else cellsBelowComposite(reader, ri, idx, k, colHi)
                val loPos =
                  if (colLo == null) cellsBelow(reader, ri, idx, k)
                  else cellsBelowComposite(reader, ri, idx, k, colLo)
                merge(p, extremalValueBetween(reader, ri, idx, loPos, hiPos, wantMin))
              }
            }
            p += 1
          }
        }
        r += 1
      }
      Some(out)
    } catch {
      // same decline-not-crash contract as the range form above
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** DISTINCT-KEY count of one segment within [lo, hi) (null = unbounded)
    * — rows of a REGULAR store in a key range (one row per key, however
    * many cells it carries): runs fully inside contribute their STAT
    * distinctKeys with no IO, disjoint runs zero, and boundary runs count
    * key STARTS below each boundary from the KPFX prefix tail plus one
    * boundary-span scan. None when a boundary run lacks the tail or a
    * counted run lacks STAT keys.
    *
    * Additivity across runs (and files) is the CALLER's obligation: every
    * pair of runs in the store must be strictly key-disjoint
    * ([[graft.sources.cassandralike.MetadataAggReader.exactRows]]' check),
    * or a key split across runs would count twice. */
  def countDistinctKeysInRange(file: Path, lo: Array[Byte], hi: Array[Byte])
    : Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (s.distinctKeys < 0) return None
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) total += s.distinctKeys.toLong
          else {
            if (!s.hasKeyPrefix) return None
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            total +=
              (if (hi == null) s.distinctKeys.toLong
               else dkBelow(reader, ri, idx, hi, s.distinctKeys)) -
              (if (lo == null) 0L else dkBelow(reader, ri, idx, lo, s.distinctKeys))
          }
        }
        i += 1
      }
      Some(total)
    } finally if (reader != null) reader.close()
  }

  /** #distinct keys of one run with key < x — [[cellsBelow]]'s KPFX twin:
    * keyPrefix(m) counts the keys that STARTED before the boundary span,
    * keyStart(m) says whether the span's first cell starts a new key (a
    * hot key can straddle the entry boundary; counting it again would
    * double-count), and the span scan counts the key changes below x. */
  private def dkBelow(reader: SegmentReader, ri: RunInfo, idx: RunIndex,
      x: Array[Byte], statKeys: Int): Long = {
    val keys = idx.keys
    if (Codecs.compareBytes(keys(0), x) >= 0) return 0L
    if (Codecs.compareBytes(idx.lastKey, x) < 0) return statKeys.toLong
    val m = lastEntryBelow(keys, x)
    var n = idx.keyPrefix(m).toLong
    // prev != null suppresses counting the straddling key again: its start
    // was before the span and is already inside keyPrefix(m)
    var prev: Array[Byte] = if (idx.keyStart(m)) null else keys(m)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var scanning = true
    while (scanning && it.hasNext) {
      val c = it.next()
      if (Codecs.compareBytes(c.key, x) < 0) {
        if (prev == null || !java.util.Arrays.equals(c.key, prev)) {
          n += 1; prev = c.key
        }
      } else scanning = false
    }
    n
  }

  // ---- per-COLUMN positional aggregates (CVAL tails): the regular-
  // mapping value family — SUM/MIN/MAX/COUNT of one NAMED column's cells
  // under a key envelope, the per-column twins of countCellsInRange /
  // sumCellsInRange / extremalValueInRange. Same caller obligations:
  // every consulted cell must be a distinct visible row (zero tombstones,
  // disjoint runs, per-run distinctAddrs == cells), and the planner must
  // have proven the column TYPE a binary 8-byte-long marshal before
  // trusting sums/extremes. ----

  private def findColVal(cvs: Array[ColValIdx], col: Array[Byte]): ColValIdx = {
    if (cvs == null) return null
    var i = 0
    while (i < cvs.length) {
      if (java.util.Arrays.equals(cvs(i).col, col)) return cvs(i)
      i += 1
    }
    null
  }

  private def findColValStat(cvs: Array[ColValStat], col: Array[Byte]): ColValStat = {
    if (cvs == null) return null
    var i = 0
    while (i < cvs.length) {
      if (java.util.Arrays.equals(cvs(i).col, col)) return cvs(i)
      i += 1
    }
    null
  }

  /** #cells NAMED `cvi.col` of one run with key < x — [[cellsBelow]]'s
    * CVAL twin: the per-entry prefix count plus a scan of the one
    * boundary span filtering on the column name. */
  private def colCountBelow(reader: SegmentReader, ri: RunInfo, idx: RunIndex,
      cvi: ColValIdx, x: Array[Byte]): Long = {
    val keys = idx.keys
    if (Codecs.compareBytes(keys(0), x) >= 0) return 0L
    if (Codecs.compareBytes(idx.lastKey, x) < 0) return cvi.totalCount.toLong
    val m = lastEntryBelow(keys, x)
    var n = cvi.prefixCounts(m).toLong
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var scanning = true
    while (scanning && it.hasNext) {
      val c = it.next()
      if (Codecs.compareBytes(c.key, x) < 0) {
        if (c.col != null && java.util.Arrays.equals(c.col, cvi.col)) n += 1
      } else scanning = false
    }
    n
  }

  /** Value-sum of one run's `cvi.col` cells with key < x — [[sumBelow]]'s
    * CVAL twin (caller guarantees cvi.sumsOk). */
  private def colSumBelow(reader: SegmentReader, ri: RunInfo, idx: RunIndex,
      cvi: ColValIdx, x: Array[Byte]): Long = {
    val keys = idx.keys
    if (Codecs.compareBytes(keys(0), x) >= 0) return 0L
    if (Codecs.compareBytes(idx.lastKey, x) < 0) return cvi.totalSum
    val m = lastEntryBelow(keys, x)
    var s = cvi.prefixSums(m)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var scanning = true
    while (scanning && it.hasNext) {
      val c = it.next()
      if (Codecs.compareBytes(c.key, x) < 0) {
        if (c.col != null && java.util.Arrays.equals(c.col, cvi.col))
          s = Math.addExact(s, valueLong(c))
      } else scanning = false
    }
    s
  }

  /** Extremal value of one run's `cvi.col` cells over the cell POSITIONS
    * [loPos, hiPos) — [[extremalValueBetween]]'s CVAL twin (caller
    * guarantees cvi.rangeOk): interior spans take their per-span extreme
    * from the tail (empty-span sentinels skipped), boundary spans scan
    * with the column-name filter. None = no such cell in the interval. */
  private def colExtremalBetween(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, cvi: ColValIdx, loPos: Long, hiPos: Long,
      wantMin: Boolean): Option[Long] = {
    if (loPos >= hiPos) return None
    val n = idx.cellPos.length
    var has = false
    var best = 0L
    def consider(v: Long): Unit =
      if (!has || (if (wantMin) v < best else v > best)) { has = true; best = v }
    var s = {
      var a = 0
      var b = n - 1
      while (a < b) {
        val mid = (a + b + 1) >>> 1
        if (idx.cellPos(mid) <= loPos) a = mid else b = mid - 1
      }
      a
    }
    while (s < n && idx.cellPos(s) < hiPos) {
      val start = idx.cellPos(s).toLong
      val end = (if (s == n - 1) ri.cellCount else idx.cellPos(s + 1)).toLong
      if (end > loPos) {
        if (start >= loPos && end <= hiPos) {
          val mn = cvi.spanMins(s)
          val mx = cvi.spanMaxs(s)
          if (mn != Long.MaxValue || mx != Long.MinValue)
            consider(if (wantMin) mn else mx)
        } else {
          val it = reader.runIterator(ri.payloadOffset + idx.offsets(s),
            (end - start).toInt)
          var p = start
          while (p < end && p < hiPos && it.hasNext) {
            val c = it.next()
            if (p >= loPos && c.col != null &&
                java.util.Arrays.equals(c.col, cvi.col))
              consider(valueLong(c))
            p += 1
          }
        }
      }
      s += 1
    }
    if (has) Some(best) else None
  }

  /** Per-point COUNT (and optionally value-SUM) of cells NAMED `col` at
    * the given key points, with optional tombstone NETTING — the BATCHED
    * point twin of [[countColCellsInRange]]/[[sumColCellsInRange]]
    * (round 13, indexed candidate aggregates). The per-envelope form
    * re-reads a run's index tail for EVERY candidate
    * (O(files × candidates × aggs) readIndex calls — measured 150×
    * slower than the scan it was meant to beat at 1.5k candidates); here
    * a consulted run parses its index ONCE for all points, each point is
    * a per-column prefix diff at its two key boundaries, and only
    * boundary spans are scanned. Runs whose key window or bloom rejects
    * every point are skipped without IO.
    *
    * Returns (counts, sums) aligned with `points`; `sums` is null unless
    * `wantSums`. Under a CLEAN store a point's count for a named cell is
    * 0 or 1, so when it is 1 the point's sum IS the cell's value — the
    * caller's per-candidate MIN/MAX source. None = a consulted run lacks
    * the CVAL tail (or is unclassifiable under `netted`), the column's
    * sums are invalid where sums were requested, or an accumulation
    * overflows (decline → fold). */
  def colAggAtPoints(file: Path, points: Seq[Array[Byte]], col: Array[Byte],
      wantSums: Boolean, netted: Boolean): Option[(Array[Long], Array[Long])] = {
    val counts = new Array[Long](points.length)
    val sums = if (wantSums) new Array[Long](points.length) else null
    if (points.isEmpty) return Some((counts, sums))
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          def hits(k: Array[Byte]): Boolean =
            Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0 &&
              (blooms(r) == null || blooms(r).mightContain(k))
          if (points.exists(hits)) {
            // consulted: the run must be classifiable and fully tailed
            // even when it holds no `col` cells (its tombstones could
            // still shadow them)
            val sign =
              if (!netted) 1
              else nettedSign(s) match {
                case Some(x) => x
                case None => return None
              }
            if (s.colVals == null) return None
            val cv = findColValStat(s.colVals, col)
            if (cv != null) { // absent column = zero cells, exactly
              if (wantSums && !cv.sumsOk) return None
              if (reader == null) reader = new SegmentReader(file)
              pointProbeIndexReads.incrementAndGet()
              val idx = reader.readIndex(ri)
              var p = 0
              while (p < points.length) {
                val k = points(p)
                if (hits(k)) {
                  // fused per-point walk: ONE seek + one span-bounded
                  // scan yields count AND sum together (the prefix-diff
                  // form costs four separate seek+stream constructions
                  // per point — the dominant cost at ~50 candidates per
                  // bucket, measured 4× this)
                  val start =
                    if (Codecs.compareBytes(idx.keys(0), k) >= 0) 0
                    else lastEntryBelow(idx.keys, k)
                  val it = reader.runIterator(
                    ri.payloadOffset + idx.offsets(start),
                    ri.cellCount - idx.cellPos(start))
                  var cnt = 0L
                  var sm = 0L
                  var scanning = true
                  while (scanning && it.hasNext) {
                    val c = it.next()
                    val kc = Codecs.compareBytes(c.key, k)
                    if (kc > 0) scanning = false
                    else if (kc == 0 && c.col != null &&
                        java.util.Arrays.equals(c.col, col)) {
                      cnt += 1
                      if (wantSums) sm = Math.addExact(sm, valueLong(c))
                    }
                  }
                  counts(p) += sign * cnt
                  if (wantSums)
                    sums(p) =
                      if (sign > 0) Math.addExact(sums(p), sm)
                      else Math.subtractExact(sums(p), sm)
                }
                p += 1
              }
            }
          }
        }
        r += 1
      }
      Some((counts, sums))
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** Per-point VALUE BYTES of one named cell column — the round-16
    * primitive behind asymmetric-budget conjunctions: `type = rare AND
    * ts BETWEEN <wide>` resolves the needle's candidates through its
    * index, then VERIFIES the wide conjunct per candidate by reading the
    * actual base cell value here (today's per-point passes yield
    * counts/sums, not comparable values). Returns one entry per input
    * point: the (key, col) cell's value bytes, or null when this file
    * holds no such cell. CLEAN-ONLY by contract (the caller's proof
    * established tombstone-free + all-addresses-distinct buckets): a
    * tombstoned or DUPLICATE match — either would make "the value"
    * ambiguous — declines with None instead of guessing. Cost mirrors
    * [[colAggAtPoints]]: one seek + span-bounded scan per (hitting run,
    * point). */
  def colBytesAtPoints(file: Path, points: Seq[Array[Byte]],
      col: Array[Byte]): Option[Array[Array[Byte]]] = {
    val out = new Array[Array[Byte]](points.length)
    if (points.isEmpty) return Some(out)
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          def hits(k: Array[Byte]): Boolean =
            Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0 &&
              (blooms(r) == null || blooms(r).mightContain(k))
          if (points.exists(hits)) {
            if (s.colVals == null) return None
            val cv = findColValStat(s.colVals, col)
            if (cv != null) { // absent column = no values here, exactly
              if (reader == null) reader = new SegmentReader(file)
              pointProbeIndexReads.incrementAndGet()
              val idx = reader.readIndex(ri)
              var p = 0
              while (p < points.length) {
                val k = points(p)
                if (hits(k)) {
                  val start =
                    if (Codecs.compareBytes(idx.keys(0), k) >= 0) 0
                    else lastEntryBelow(idx.keys, k)
                  val it = reader.runIterator(
                    ri.payloadOffset + idx.offsets(start),
                    ri.cellCount - idx.cellPos(start))
                  var scanning = true
                  while (scanning && it.hasNext) {
                    val c = it.next()
                    val kc = Codecs.compareBytes(c.key, k)
                    if (kc > 0) scanning = false
                    else if (kc == 0 && c.col != null &&
                        java.util.Arrays.equals(c.col, col)) {
                      // the clean proof promises one live cell per
                      // address; a tombstone or a second match breaks
                      // the promise — decline, never guess
                      if (c.tombstone || out(p) != null) return None
                      out(p) = c.value
                    }
                  }
                }
                p += 1
              }
            }
          }
        }
        r += 1
      }
      Some(out)
    } finally if (reader != null) reader.close()
  }

  /** COUNT of one segment's cells NAMED `col` with key in [lo, hi) (null =
    * unbounded), from the CVAL prefix-count tails: runs fully inside the
    * envelope contribute their per-column run total with no IO beyond the
    * memoized stats, runs whose tail lists no such column contribute zero
    * EXACTLY (tail presence proves complete coverage), and only boundary-
    * crossing runs scan the one span holding each boundary. None when a
    * non-disjoint run lacks the tail (decline → fold). On a REGULAR
    * mapping this IS `COUNT(c)` in a key range — non-missing `c` cells. */
  def countColCellsInRange(file: Path, col: Array[Byte],
      lo: Array[Byte], hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (s.colVals == null) return None
          val cv = findColValStat(s.colVals, col)
          if (cv != null) { // absent column = zero cells, exactly
            val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
            val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
            if (fullLow && fullHigh) total += cv.count
            else {
              if (reader == null) reader = new SegmentReader(file)
              val idx = reader.readIndex(ri)
              val cvi = findColVal(idx.colVals, col)
              if (cvi == null) return None // tail/stat drift: decline
              total +=
                (if (hi == null) cvi.totalCount.toLong
                 else colCountBelow(reader, ri, idx, cvi, hi)) -
                (if (lo == null) 0L else colCountBelow(reader, ri, idx, cvi, lo))
            }
          }
        }
        i += 1
      }
      Some(total)
    } finally if (reader != null) reader.close()
  }

  /** Value-sum of one segment's cells NAMED `col` with key in [lo, hi) —
    * [[countColCellsInRange]]'s SUM twin, from the CVAL prefix-sum tails.
    * None when a non-disjoint run lacks the tail, the column's sums are
    * invalid there (non-8-byte value or write-time overflow), or any
    * accumulation overflows Long (the fold then owns the query). */
  def sumColCellsInRange(file: Path, col: Array[Byte],
      lo: Array[Byte], hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (s.colVals == null) return None
          val cv = findColValStat(s.colVals, col)
          if (cv != null) {
            if (!cv.sumsOk) return None
            val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
            val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
            if (fullLow && fullHigh) total = Math.addExact(total, cv.sum)
            else {
              if (reader == null) reader = new SegmentReader(file)
              val idx = reader.readIndex(ri)
              val cvi = findColVal(idx.colVals, col)
              if (cvi == null || !cvi.sumsOk) return None
              val below =
                if (hi == null) cvi.totalSum
                else colSumBelow(reader, ri, idx, cvi, hi)
              val above =
                if (lo == null) 0L else colSumBelow(reader, ri, idx, cvi, lo)
              total = Math.addExact(total, Math.subtractExact(below, above))
            }
          }
        }
        i += 1
      }
      Some(total)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** Extremal value of one segment's cells NAMED `col` with key in
    * [lo, hi) — "peak reading of THIS series in the window" — from the
    * CVAL per-span extremes. Some(None) = no such cell in range; None = a
    * non-disjoint run lacks the tail or its extremes are invalid for the
    * column (decline → fold). */
  def extremalColValueInRange(file: Path, col: Array[Byte],
      lo: Array[Byte], hi: Array[Byte],
      wantMin: Boolean): Option[Option[Long]] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var has = false
    var best = 0L
    def consider(v: Long): Unit =
      if (!has || (if (wantMin) v < best else v > best)) { has = true; best = v }
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          if (s.colVals == null) return None
          val cv = findColValStat(s.colVals, col)
          if (cv != null) {
            if (!cv.rangeOk) return None
            val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
            val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
            if (fullLow && fullHigh) {
              if (cv.count > 0) consider(if (wantMin) cv.min else cv.max)
            } else {
              if (reader == null) reader = new SegmentReader(file)
              val idx = reader.readIndex(ri)
              val cvi = findColVal(idx.colVals, col)
              if (cvi == null || !cvi.rangeOk) return None
              val loPos = if (fullLow) 0L else cellsBelow(reader, ri, idx, lo)
              val hiPos =
                if (fullHigh) ri.cellCount.toLong
                else cellsBelow(reader, ri, idx, hi)
              colExtremalBetween(reader, ri, idx, cvi, loPos, hiPos, wantMin)
                .foreach(consider)
            }
          }
        }
        i += 1
      }
      Some(if (has) Some(best) else None)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  // ---- TOMBSTONE-NETTED positional counts: visible rows of a store with
  // UNCOMPACTED certified delete epochs = (live cells) − (certified
  // tombstones), per envelope, because the bucket-level proofs
  // ([[BucketStat.nettedOk]]) make every live cell a distinct visible row
  // and every certified tombstone the shadow of exactly one of them —
  // and a tombstone shares its victim's ADDRESS, so both fall in the same
  // key envelope and the subtraction is exact per range, per point and
  // per column. SUM/MIN/MAX never net (a tombstone doesn't carry the
  // shadowed value) — they keep declining until compaction. ----

  /** +1 for a live run, −1 for a certified pure-tombstone delete epoch,
    * None for anything else (mixed or uncertified tombstones → the
    * caller must decline). */
  private def nettedSign(s: RunStats): Option[Int] =
    if (s.tombstones == 0) Some(1)
    else if (s.tombstones == s.cells && s.certDeletes) Some(-1)
    else None

  /** acc ± x with overflow → ArithmeticException (a bare `sign * x`
    * would silently wrap on x == Long.MinValue). */
  private def addSigned(acc: Long, sign: Int, x: Long): Long =
    if (sign >= 0) Math.addExact(acc, x) else Math.subtractExact(acc, x)

  /** [[countCellsInRange]]'s tombstone-netting twin: live runs add,
    * certified delete epochs subtract. None when an envelope-overlapping
    * run is neither (decline → fold). Caller must have proven
    * [[BucketStat.nettedOk]]. */
  def nettedCountCellsInRange(file: Path, lo: Array[Byte],
      hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val sign = nettedSign(s) match {
            case Some(x) => x
            case None => return None
          }
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) total += sign * ri.cellCount.toLong
          else {
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            total += sign *
              ((if (hi == null) ri.cellCount.toLong
                else cellsBelow(reader, ri, idx, hi)) -
               (if (lo == null) 0L else cellsBelow(reader, ri, idx, lo)))
          }
        }
        i += 1
      }
      Some(total)
    } finally if (reader != null) reader.close()
  }

  /** [[countCellsAtPoints]]' tombstone-netting twin (same col-window /
    * col-point / sub-window narrowing). None when a consulted run is
    * unclassifiable. */
  def nettedCountCellsAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte] = null, colHi: Array[Byte] = null,
      colPoints: Seq[Array[Byte]] = null,
      subLo: Array[Byte] = null, subHi: Array[Byte] = null)
    : Option[Array[Long]] = {
    val out = new Array[Long](points.length)
    if (points.isEmpty) return Some(out)
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var sign = 0
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              if (sign == 0) sign = nettedSign(s) match {
                case Some(x) => x
                case None => return None
              }
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                pointProbeIndexReads.incrementAndGet()
                idx = reader.readIndex(ri)
              }
              if (colPoints != null) {
                var ci = 0
                while (ci < colPoints.length) {
                  val c = colPoints(ci)
                  val below =
                    if (subHi == null)
                      cellsBelowComposite(reader, ri, idx, k, byteSucc(c))
                    else cellsBelowComposite(reader, ri, idx, k, c, subHi)
                  val above =
                    if (subLo == null) cellsBelowComposite(reader, ri, idx, k, c)
                    else cellsBelowComposite(reader, ri, idx, k, c, subLo)
                  out(p) += sign * (below - above)
                  ci += 1
                }
              } else {
                val below =
                  if (colHi == null) cellsBelow(reader, ri, idx, byteSucc(k))
                  else cellsBelowComposite(reader, ri, idx, k, colHi)
                val above =
                  if (colLo == null) cellsBelow(reader, ri, idx, k)
                  else cellsBelowComposite(reader, ri, idx, k, colLo)
                out(p) += sign * (below - above)
              }
            }
            p += 1
          }
        }
        r += 1
      }
      Some(out)
    } finally if (reader != null) reader.close()
  }

  /** [[sumCellsInRange]]'s tombstone-netting twin: certified delete
    * epochs carry their VICTIMS' value bytes (deleteWhere records the
    * just-read visible cell), so their VSUM tails hold the SHADOWED sums
    * and `visible sum = live sums − certified sums` per envelope. None
    * when an overlapping run is unclassifiable, lacks the VSUM tail
    * (e.g. non-long victims), or any accumulation overflows. */
  def nettedSumCellsInRange(file: Path, lo: Array[Byte],
      hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val sign = nettedSign(s) match {
            case Some(x) => x
            case None => return None
          }
          if (!s.hasValSums) return None
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh)
            total = addSigned(total, sign, s.valTotal)
          else {
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            val below =
              if (hi == null) idx.valTotal else sumBelow(reader, ri, idx, hi)
            val above =
              if (lo == null) 0L else sumBelow(reader, ri, idx, lo)
            total = addSigned(total, sign,
              Math.subtractExact(below, above))
          }
        }
        i += 1
      }
      Some(total)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** [[sumCellsAtPoints]]' tombstone-netting twin (same col-window /
    * col-point / sub-window narrowing). */
  def nettedSumCellsAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte] = null, colHi: Array[Byte] = null,
      colPoints: Seq[Array[Byte]] = null,
      subLo: Array[Byte] = null, subHi: Array[Byte] = null)
    : Option[Array[Long]] = {
    val out = new Array[Long](points.length)
    if (points.isEmpty) return Some(out)
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var sign = 0
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              if (sign == 0) sign = nettedSign(s) match {
                case Some(x) => x
                case None => return None
              }
              if (!s.hasValSums) return None
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                idx = reader.readIndex(ri)
              }
              if (colPoints != null) {
                var ci = 0
                while (ci < colPoints.length) {
                  val c = colPoints(ci)
                  val below =
                    if (subHi == null)
                      sumBelowComposite(reader, ri, idx, k, byteSucc(c))
                    else sumBelowComposite(reader, ri, idx, k, c, subHi)
                  val above =
                    if (subLo == null) sumBelowComposite(reader, ri, idx, k, c)
                    else sumBelowComposite(reader, ri, idx, k, c, subLo)
                  out(p) = addSigned(out(p), sign,
                    Math.subtractExact(below, above))
                  ci += 1
                }
              } else {
                val below =
                  if (colHi == null) sumBelow(reader, ri, idx, byteSucc(k))
                  else sumBelowComposite(reader, ri, idx, k, colHi)
                val above =
                  if (colLo == null) sumBelow(reader, ri, idx, k)
                  else sumBelowComposite(reader, ri, idx, k, colLo)
                out(p) = addSigned(out(p), sign,
                  Math.subtractExact(below, above))
              }
            }
            p += 1
          }
        }
        r += 1
      }
      Some(out)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** [[sumColCellsInRange]]'s tombstone-netting twin: a certified
    * epoch's CVAL tails sum its victims' values per column name. */
  def nettedSumColCellsInRange(file: Path, col: Array[Byte],
      lo: Array[Byte], hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val sign = nettedSign(s) match {
            case Some(x) => x
            case None => return None
          }
          if (s.colVals == null) return None
          val cv = findColValStat(s.colVals, col)
          if (cv != null) {
            if (!cv.sumsOk) return None
            val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
            val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
            if (fullLow && fullHigh)
              total = addSigned(total, sign, cv.sum)
            else {
              if (reader == null) reader = new SegmentReader(file)
              val idx = reader.readIndex(ri)
              val cvi = findColVal(idx.colVals, col)
              if (cvi == null || !cvi.sumsOk) return None
              val below =
                if (hi == null) cvi.totalSum
                else colSumBelow(reader, ri, idx, cvi, hi)
              val above =
                if (lo == null) 0L else colSumBelow(reader, ri, idx, cvi, lo)
              total = addSigned(total, sign,
                Math.subtractExact(below, above))
            }
          }
        }
        i += 1
      }
      Some(total)
    } catch {
      case _: ArithmeticException => None
    } finally if (reader != null) reader.close()
  }

  /** [[countDistinctKeysInRange]]'s tombstone-netting twin: a certified
    * delete epoch tombstones WHOLE keys (writeRun's contract), so its
    * distinct keys in the envelope subtract exactly the rows it removed
    * from the live side. */
  def nettedCountDistinctKeysInRange(file: Path, lo: Array[Byte],
      hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val sign = nettedSign(s) match {
            case Some(x) => x
            case None => return None
          }
          if (s.distinctKeys < 0) return None
          val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
          val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
          if (fullLow && fullHigh) total += sign * s.distinctKeys.toLong
          else {
            if (!s.hasKeyPrefix) return None
            if (reader == null) reader = new SegmentReader(file)
            val idx = reader.readIndex(ri)
            total += sign *
              ((if (hi == null) s.distinctKeys.toLong
                else dkBelow(reader, ri, idx, hi, s.distinctKeys)) -
               (if (lo == null) 0L else dkBelow(reader, ri, idx, lo, s.distinctKeys)))
          }
        }
        i += 1
      }
      Some(total)
    } finally if (reader != null) reader.close()
  }

  /** [[countColCellsInRange]]'s tombstone-netting twin: a certified
    * epoch's tombstones carry their victims' column names, so per-column
    * counts net the same way (a victim cell and its tombstone land in the
    * same column bucket). */
  def nettedCountColCellsInRange(file: Path, col: Array[Byte],
      lo: Array[Byte], hi: Array[Byte]): Option[Long] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var total = 0L
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val sign = nettedSign(s) match {
            case Some(x) => x
            case None => return None
          }
          if (s.colVals == null) return None
          val cv = findColValStat(s.colVals, col)
          if (cv != null) {
            val fullLow = lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0
            val fullHigh = hi == null || Codecs.compareBytes(s.lastKey, hi) < 0
            if (fullLow && fullHigh) total += sign * cv.count
            else {
              if (reader == null) reader = new SegmentReader(file)
              val idx = reader.readIndex(ri)
              val cvi = findColVal(idx.colVals, col)
              if (cvi == null) return None
              total += sign *
                ((if (hi == null) cvi.totalCount.toLong
                  else colCountBelow(reader, ri, idx, cvi, hi)) -
                 (if (lo == null) 0L else colCountBelow(reader, ri, idx, cvi, lo)))
            }
          }
        }
        i += 1
      }
      Some(total)
    } finally if (reader != null) reader.close()
  }

  /** Per-point extremal CLUSTERING-COLUMN bytes within the half-open col
    * window [colLo, colHi) (null = unbounded) over one segment — the
    * per-group MIN/MAX(col) of the grouped metadata aggregates
    * ("first/last reading of each row in the window"). Returned array
    * aligns with `points`; a null element = that row has no cell in the
    * window in this segment. A run whose key window or bloom rejects
    * every point is skipped without IO; a consulted run parses its index
    * ONCE for all points, binary-searches the COMPOSITE (key, col)
    * entries per point and scans only the span holding each boundary.
    * Caller must have proven every run's per-entry col bytes
    * ([[RunStats.colEntries]]); needs neither run disjointness nor
    * address dedup (an overwrite never removes an address), but the usual
    * zero-tombstone proof (a tombstoned cell would surface as extremal). */
  def extremalColsAtPoints(file: Path, points: Seq[Array[Byte]],
      colLo: Array[Byte], colHi: Array[Byte],
      wantMin: Boolean): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](points.length)
    if (points.isEmpty) return out
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              require(s.colEntries, "extremalColsAtPoints needs per-entry col bytes")
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                idx = reader.readIndex(ri)
              }
              val cand =
                if (wantMin) firstColAtLeast(reader, ri, idx, k, colLo)
                else lastColBelow(reader, ri, idx, k, colHi)
              val ok = cand != null &&
                (colLo == null || Codecs.compareBytes(cand, colLo) >= 0) &&
                (colHi == null || Codecs.compareBytes(cand, colHi) < 0)
              if (ok && (out(p) == null ||
                  (Codecs.compareBytes(cand, out(p)) < 0) == wantMin))
                out(p) = cand
            }
            p += 1
          }
        }
        r += 1
      }
    } finally if (reader != null) reader.close()
    out
  }

  /** Per-point extremal SUB-COLUMN bytes of the pinned (key, col) groups
    * within the half-open sub window [subLo, subHi) (null = unbounded)
    * over one segment — the per-group MIN/MAX(sub) of the grouped super-
    * mapping aggregates ("first/last sub-entry of each row's pinned
    * column"). For each point key and each pinned col, cells of the
    * (key, col) group are SUB-sorted within a run, so the extremal sub is
    * the first/last cell of the group's composite interval — one boundary
    * binary search + at most one span scan per (point, col) per run.
    * Returned array aligns with `points` (reduced across the pinned
    * cols); null element = no cell in any pinned group in this segment.
    * Caller must have proven per-entry col AND sub bytes
    * ([[RunStats.colEntries]]/[[RunStats.subEntries]]) and the usual
    * zero-tombstone proof; like the col seeks, needs neither run
    * disjointness nor address dedup (an overwrite never removes an
    * address). */
  def extremalSubsAtPoints(file: Path, points: Seq[Array[Byte]],
      colPoints: Seq[Array[Byte]],
      subLo: Array[Byte], subHi: Array[Byte],
      wantMin: Boolean): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](points.length)
    if (points.isEmpty || colPoints == null || colPoints.isEmpty) return out
    val infosAll = runInfos(file)
    val blooms = runBlooms(file)
    val statsIt = runStats(file).iterator
    var reader: SegmentReader = null
    def better(cand: Array[Byte], best: Array[Byte]): Boolean =
      best == null || (Codecs.compareBytes(cand, best) < 0) == wantMin
    try {
      var r = 0
      while (r < infosAll.length) {
        val ri = infosAll(r)
        if (ri.cellCount > 0) {
          val s = statsIt.next()
          var idx: RunIndex = null
          var p = 0
          while (p < points.length) {
            val k = points(p)
            val inWindow = Codecs.compareBytes(k, s.firstKey) >= 0 &&
              Codecs.compareBytes(k, s.lastKey) <= 0
            if (inWindow && (blooms(r) == null || blooms(r).mightContain(k))) {
              require(s.colEntries && s.subEntries,
                "extremalSubsAtPoints needs per-entry col and sub bytes")
              if (idx == null) {
                if (reader == null) reader = new SegmentReader(file)
                idx = reader.readIndex(ri)
              }
              var ci = 0
              while (ci < colPoints.length) {
                val c = colPoints(ci)
                val cand =
                  if (wantMin) firstSubAtLeast(reader, ri, idx, k, c, subLo)
                  else lastSubBelow(reader, ri, idx, k, c, subHi)
                val ok = cand != null &&
                  (subLo == null || Codecs.compareBytes(cand, subLo) >= 0) &&
                  (subHi == null || Codecs.compareBytes(cand, subHi) < 0)
                if (ok && better(cand, out(p))) out(p) = cand
                ci += 1
              }
            }
            p += 1
          }
        }
        r += 1
      }
    } finally if (reader != null) reader.close()
    out
  }

  /** addr < (keyB, colB[, subB]) at full composite level — the boundary
    * predicate of the extremal-sub seeks (null subB = (key, col) level;
    * null cell sub compares as EMPTY bytes, same as [[addressOrdering]]). */
  private def addrBelowKCS(k: Array[Byte], c: Array[Byte], s: Array[Byte],
      keyB: Array[Byte], colB: Array[Byte], subB: Array[Byte]): Boolean = {
    val kc = Codecs.compareBytes(k, keyB)
    if (kc != 0) return kc < 0
    val cc = Codecs.compareBytes(
      if (c == null) Array.emptyByteArray else c, colB)
    if (cc != 0) return cc < 0
    if (subB == null) return false
    Codecs.compareBytes(if (s == null) Array.emptyByteArray else s, subB) < 0
  }

  /** Sub bytes of the FIRST cell of one run with address >= (k, c, subLo)
    * (null subLo = (k, c) itself), when that cell belongs to group
    * (k, c) — else null. ≤ one span scan + 1 cell. */
  private def firstSubAtLeast(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, k: Array[Byte], c: Array[Byte],
      subLo: Array[Byte]): Array[Byte] = {
    val keys = idx.keys
    val cols = idx.cols
    val subs = idx.subs
    def entrySub(i: Int): Array[Byte] = if (subs == null) null else subs(i)
    val start =
      if (!addrBelowKCS(keys(0), cols(0), entrySub(0), k, c, subLo)) 0
      else {
        var a = 0
        var b = keys.length - 1
        while (a < b) {
          val mid = (a + b + 1) >>> 1
          if (addrBelowKCS(keys(mid), cols(mid), entrySub(mid), k, c, subLo))
            a = mid
          else b = mid - 1
        }
        a
      }
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(start),
      ri.cellCount - idx.cellPos(start))
    while (it.hasNext) {
      val cell = it.next()
      if (!addrBelowKCS(cell.key, cell.col, cell.sub, k, c, subLo))
        return if (java.util.Arrays.equals(cell.key, k) &&
          cell.col != null && java.util.Arrays.equals(cell.col, c))
          cell.sub
        else null
    }
    null
  }

  /** Sub bytes of the LAST cell of one run with address < (k, c, subHi)
    * (null subHi = the last cell of group (k, c)), when that cell belongs
    * to group (k, c) — else null. */
  private def lastSubBelow(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, k: Array[Byte], c: Array[Byte],
      subHi: Array[Byte]): Array[Byte] = {
    // null subHi: bound at (k, succ(c)) — the first address past the group
    val (colB, subB) =
      if (subHi != null) (c, subHi) else (byteSucc(c), null)
    val keys = idx.keys
    val cols = idx.cols
    val subs = idx.subs
    def entrySub(i: Int): Array[Byte] = if (subs == null) null else subs(i)
    if (!addrBelowKCS(keys(0), cols(0), entrySub(0), k, colB, subB)) return null
    var a = 0
    var b = keys.length - 1
    while (a < b) {
      val mid = (a + b + 1) >>> 1
      if (addrBelowKCS(keys(mid), cols(mid), entrySub(mid), k, colB, subB))
        a = mid
      else b = mid - 1
    }
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(a),
      spanLength(ri, idx, a))
    var lastKey: Array[Byte] = null
    var lastCol: Array[Byte] = null
    var lastSub: Array[Byte] = null
    var scanning = true
    while (scanning && it.hasNext) {
      val cell = it.next()
      if (addrBelowKCS(cell.key, cell.col, cell.sub, k, colB, subB)) {
        lastKey = cell.key; lastCol = cell.col; lastSub = cell.sub
      } else scanning = false
    }
    if (lastKey != null && java.util.Arrays.equals(lastKey, k) &&
      lastCol != null && java.util.Arrays.equals(lastCol, c)) lastSub
    else null
  }

  /** addr < (keyB[, colB]) at (key, col) level — the shared boundary
    * predicate of the extremal-col seeks (null colB = key level only). */
  private def addrBelowKC(k: Array[Byte], c: Array[Byte],
      keyB: Array[Byte], colB: Array[Byte]): Boolean = {
    val kc = Codecs.compareBytes(k, keyB)
    if (kc != 0) return kc < 0
    if (colB == null) return false
    Codecs.compareBytes(if (c == null) Array.emptyByteArray else c, colB) < 0
  }

  /** Col bytes of the FIRST cell of one run with address >= (k, colLo)
    * (null colLo = (k) itself), when that cell belongs to row k — else
    * null (row k has no cell at/after the boundary in this run). The
    * first such address lies in the boundary span or is the next entry's
    * own cell, so the scan is ≤ one span + 1. */
  private def firstColAtLeast(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, k: Array[Byte], colLo: Array[Byte]): Array[Byte] = {
    val keys = idx.keys
    val cols = idx.cols
    val start =
      if (!addrBelowKC(keys(0), cols(0), k, colLo)) 0
      else {
        var a = 0
        var b = keys.length - 1
        while (a < b) {
          val mid = (a + b + 1) >>> 1
          if (addrBelowKC(keys(mid), cols(mid), k, colLo)) a = mid else b = mid - 1
        }
        a
      }
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(start),
      ri.cellCount - idx.cellPos(start))
    while (it.hasNext) {
      val c = it.next()
      if (!addrBelowKC(c.key, c.col, k, colLo))
        return if (java.util.Arrays.equals(c.key, k)) c.col else null
    }
    null
  }

  /** Col bytes of the LAST cell of one run with address < (k, colHi)
    * (null colHi = < succ(k), i.e. the last cell of row k), when that
    * cell belongs to row k — else null. The last such address lies in the
    * span holding the boundary (every later span starts at an entry >=
    * the boundary). */
  private def lastColBelow(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, k: Array[Byte], colHi: Array[Byte]): Array[Byte] = {
    val (keyB, colB) =
      if (colHi != null) (k, colHi) else (byteSucc(k), null)
    val keys = idx.keys
    val cols = idx.cols
    if (!addrBelowKC(keys(0), cols(0), keyB, colB)) return null
    var a = 0
    var b = keys.length - 1
    while (a < b) {
      val mid = (a + b + 1) >>> 1
      if (addrBelowKC(keys(mid), cols(mid), keyB, colB)) a = mid else b = mid - 1
    }
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(a),
      spanLength(ri, idx, a))
    var lastKey: Array[Byte] = null
    var lastCol: Array[Byte] = null
    var scanning = true
    while (scanning && it.hasNext) {
      val c = it.next()
      if (addrBelowKC(c.key, c.col, keyB, colB)) { lastKey = c.key; lastCol = c.col }
      else scanning = false
    }
    if (lastKey != null && java.util.Arrays.equals(lastKey, k)) lastCol else null
  }

  /** Extremal key BYTES of one segment within [lo, hi) (null = unbounded),
    * or None when the segment holds no cell in the range. wantMin = the
    * smallest key >= lo; else the largest key < hi. A run whose window
    * sits inside the binding bound answers from the memoized stats with
    * no IO (firstKey/lastKey IS the answer); only a run whose window
    * straddles the bound scans the ONE span containing it. */
  def extremalKeyInRange(file: Path, lo: Array[Byte], hi: Array[Byte],
      wantMin: Boolean): Option[Array[Byte]] = {
    val infos = runInfos(file).filter(_.cellCount > 0)
    val stats = runStats(file)
    var best: Array[Byte] = null
    var reader: SegmentReader = null
    try {
      var i = 0
      while (i < infos.length) {
        val ri = infos(i)
        val s = stats(i)
        val disjoint =
          (lo != null && Codecs.compareBytes(s.lastKey, lo) < 0) ||
            (hi != null && Codecs.compareBytes(s.firstKey, hi) >= 0)
        if (!disjoint) {
          val cand: Array[Byte] =
            if (wantMin) {
              if (lo == null || Codecs.compareBytes(lo, s.firstKey) <= 0) s.firstKey
              else {
                // !disjoint gives s.lastKey >= lo: a first-at-least exists
                if (reader == null) reader = new SegmentReader(file)
                firstKeyAtLeast(reader, ri, reader.readIndex(ri), lo)
              }
            } else {
              if (hi == null || Codecs.compareBytes(s.lastKey, hi) < 0) s.lastKey
              else {
                // !disjoint gives s.firstKey < hi: a last-below exists
                if (reader == null) reader = new SegmentReader(file)
                lastKeyBelow(reader, ri, reader.readIndex(ri), hi)
              }
            }
          // the one-sided seek can still land outside the OTHER bound —
          // then this run has no cell in the range at all
          val inRange = cand != null &&
            (lo == null || Codecs.compareBytes(cand, lo) >= 0) &&
            (hi == null || Codecs.compareBytes(cand, hi) < 0)
          if (inRange &&
              (best == null || (Codecs.compareBytes(cand, best) < 0) == wantMin))
            best = cand
        }
        i += 1
      }
    } finally if (reader != null) reader.close()
    Option(best)
  }

  /** Smallest key >= lo of one run (caller guarantees lastKey >= lo and
    * firstKey < lo): scan the span holding the boundary; if it exhausts
    * below lo, the NEXT entry's key is the answer (it is >= lo by the
    * entry search, and it IS the first cell of its span). */
  private def firstKeyAtLeast(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, lo: Array[Byte]): Array[Byte] = {
    val m = lastEntryBelow(idx.keys, lo)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    while (it.hasNext) {
      val k = it.next().key
      if (Codecs.compareBytes(k, lo) >= 0) return k
    }
    if (m + 1 < idx.keys.length) idx.keys(m + 1) else null // null: unreachable
  }

  /** Largest key < hi of one run (caller guarantees firstKey < hi and
    * lastKey >= hi): cells past the boundary span start at an entry
    * key >= hi, so the answer is inside the ONE span holding the
    * boundary — scan it tracking the last key below. */
  private def lastKeyBelow(reader: SegmentReader, ri: RunInfo,
      idx: RunIndex, hi: Array[Byte]): Array[Byte] = {
    val m = lastEntryBelow(idx.keys, hi)
    val it = reader.runIterator(ri.payloadOffset + idx.offsets(m),
      spanLength(ri, idx, m))
    var last: Array[Byte] = null
    var scanning = true
    while (scanning && it.hasNext) {
      val k = it.next().key
      if (Codecs.compareBytes(k, hi) < 0) last = k else scanning = false
    }
    last
  }

  /** Per-run [[RunStats]] of one segment; memoized per immutable file,
    * index-tail reads only. Empty runs are skipped. */
  /** Diagnostic: number of run-index-tail parses that actually hit the
    * file (cache misses). The incremental-sidecar spec pins commit-time
    * refreshes to O(new files) by watching this not move for carried
    * files. */
  val runTailReads = new java.util.concurrent.atomic.AtomicLong()

  /** Diagnostic: run-index parses performed by the per-point probe
    * functions (countCellsAtPoints / colAggAtPoints /
    * nettedCountCellsAtPoints / sumCellsAtPoints). The batched grouped
    * indexed-aggregate path pins "G groups cost the parses of one" by
    * watching this stay flat as the IN widens (IndexedAggProbe wide-IN
    * arm). */
  val pointProbeIndexReads = new java.util.concurrent.atomic.AtomicLong()

  def runStats(file: Path): Array[RunStats] =
    runStatsCache.computeIfAbsent(cacheKey(file), _ => {
      runTailReads.incrementAndGet()
      val r = new SegmentReader(file)
      try runInfos(file).filter(_.cellCount > 0).map { ri =>
        val idx = r.readIndex(ri)
        RunStats(ri.cellCount, idx.keys(0), idx.lastKey,
          idx.colMin, idx.colMax, idx.subMin, idx.subMax,
          idx.statTombstones, idx.statKeys, idx.statAddrs,
          colEntries = idx.cols != null && !idx.cols.exists(_ == null),
          subEntries = idx.subs != null && !idx.subs.exists(_ == null),
          hasKeyPrefix = idx.keyPrefix != null,
          hasValSums = idx.valSums != null,
          valTotal = idx.valTotal,
          hasValRange = idx.valMins != null,
          valMin = idx.valMin,
          valMax = idx.valMax,
          colVals = if (idx.colVals == null) null
            else idx.colVals.map(cv => ColValStat(cv.col, cv.sumsOk,
              cv.rangeOk, cv.totalCount.toLong, cv.totalSum,
              cv.runMin, cv.runMax)),
          certDeletes = idx.certDeletes,
          tsMin = idx.tsMin,
          tsMax = idx.tsMax,
          hasTsRange = idx.hasTsRange)
      }.toArray
      finally r.close()
    })

  // ---- per-bucket STAT sidecar: cold-driver planning in O(buckets) ----

  /** Aggregated run-stat judgment of ONE bucket — everything the
    * complete-pushdown planner and the exact-statistics path ask of a
    * bucket, reduced to a fixed-size record so a cold driver plans a
    * 4096-bucket `count(*)` from 4096 tiny sidecar reads instead of
    * walking every segment's full index tails (VERDICT r10 #3; the
    * `_range_digests/` sidecar-plus-self-healing-fallback pattern).
    * `files` is the EXACT (name, size) listing the record was computed
    * from — a reader whose own listing differs ignores the sidecar and
    * walks (stale sidecars can cost IO, never correctness). */
  final case class BucketStat(
      files: Seq[(String, Long)],
      runs: Int, cells: Long,
      tombstoneFree: Boolean, disjoint: Boolean, allAddrsDistinct: Boolean,
      colEntriesAll: Boolean, subEntriesAll: Boolean,
      distinctKeys: Long, distinctAddrs: Long,
      valSumsAll: Boolean, valTotalOk: Boolean, valTotal: Long,
      firstKey: Array[Byte], lastKey: Array[Byte],
      colWindowsAll: Boolean, colMin: Array[Byte], colMax: Array[Byte],
      subWindowsAll: Boolean, subMin: Array[Byte], subMax: Array[Byte],
      valRangeAll: Boolean = false, valMin: Long = 0L, valMax: Long = 0L,
      /** every run's STAT counters are present (no -1 legacy sentinels):
        * distinctKeys/distinctAddrs are trustworthy numbers, not clamped
        * unknowns — consumers beyond the tombstoneFree gate must check
        * this before reading the counts */
      statsValid: Boolean = false,
      /** every run carries the CVAL per-column tail; only then is
        * [[colVals]] the complete per-column reduction (a column absent
        * from it provably has zero cells in the bucket) */
      colValsAll: Boolean = false,
      colVals: Seq[ColValStat] = Nil,
      /** TOMBSTONE-NETTING eligibility: every run is either live
        * (zero tombstones, per-run address-deduped, live runs pairwise
        * key-disjoint) or a CERTIFIED pure-tombstone delete epoch (DCRT,
        * per-run address-deduped) — then a positional count can subtract
        * deletions instead of declining until compaction. Certified
        * epochs are address-disjoint from EACH OTHER by construction
        * (each deleteWhere reads the then-visible view, which excludes
        * earlier victims), so their counts are additive without a range
        * check. */
      nettedOk: Boolean = false,
      /** visible cell addresses under netting: Σ live distinctAddrs −
        * Σ certified tombstones; valid iff [[nettedOk]] */
      nettedAddrs: Long = 0L,
      /** visible distinct keys under netting: Σ live distinctKeys −
        * Σ certified-run distinctKeys (a certified run tombstones whole
        * keys); valid iff [[nettedOk]] */
      nettedKeys: Long = 0L,
      /** every run carries the TSRG timestamp window */
      tsAll: Boolean = false,
      /** newest cell timestamp across the bucket; valid iff [[tsAll]] —
        * an AS-OF bound ≥ this proves the bounded view IS the current
        * view, keeping every metadata fast path */
      maxTs: Long = 0L,
      /** netted whole-bucket VALUE sum (live totals − certified shadowed
        * totals — certified tombstones carry their victims' values):
        * valid iff [[nettedSumOk]] (nettedOk + VSUM tails on every run +
        * no overflow) */
      nettedSumOk: Boolean = false,
      nettedSum: Long = 0L,
      /** per-column NETTED reductions (live CVAL − certified CVAL): a
        * victim cell and its certified tombstone share a column name, and
        * the tombstone carries the victim's value bytes, so count = the
        * column's VISIBLE cells and sum = its visible value total. Valid
        * iff [[nettedColValsOk]] (nettedOk + CVAL tails on every run,
        * live and certified — then a column absent from the list provably
        * has zero visible cells). Extremes never net: entries carry
        * rangeOk = false, so no consumer can surface a deleted extreme. */
      nettedColValsOk: Boolean = false,
      nettedColVals: Seq[ColValStat] = Nil)

  val BucketStatsDir = "_bucket_stats"
  // "BST8" — bumped twice in r13: per-column NETTED reductions, then the
  // per-file RUN-STATS section that makes the commit-time refresh
  // incremental (BST6 added statsValid + CVAL + netting + TSRG); older
  // sidecars parse as corrupt → one walk, then the rewrite upgrades them
  private val BucketStatMagic = 0x42535438

  /** Diagnostic: number of bucket-stat requests that fell back to walking
    * run index tails (sidecar absent, stale, or corrupt). Tests pin the
    * sidecar fast path by asserting this does not move. */
  val bucketStatWalks = new java.util.concurrent.atomic.AtomicLong()

  private def fileSig(files: Seq[Path]): Seq[(String, Long)] =
    files.map(f => (f.getFileName.toString, Files.size(f)))
      .sortBy(_._1)

  /** Reduce one bucket's per-run stats to its [[BucketStat]] record. */
  private def aggregateBucketStat(sig: Seq[(String, Long)],
      stats: Seq[RunStats]): BucketStat = {
    val tombstoneFree = !stats.exists(_.tombstones != 0) // legacy -1 counts dirty
    val disjoint =
      if (stats.lengthCompare(1) <= 0) true
      else {
        val byFirst = stats.sortWith((a, b) =>
          Codecs.compareBytes(a.firstKey, b.firstKey) < 0)
        (1 until byFirst.length).forall(i =>
          Codecs.compareBytes(byFirst(i - 1).lastKey, byFirst(i).firstKey) < 0)
      }
    def reduceB(vs: Seq[Array[Byte]], wantMin: Boolean): Array[Byte] =
      if (vs.isEmpty || vs.exists(_ == null)) null
      else vs.reduce((a, b) =>
        if ((Codecs.compareBytes(a, b) < 0) == wantMin) a else b)
    var valTotal = 0L
    var valOk = stats.forall(_.hasValSums)
    if (valOk) try stats.foreach(s => valTotal = Math.addExact(valTotal, s.valTotal))
    catch { case _: ArithmeticException => valOk = false; valTotal = 0L }
    // per-column CVAL reduction: columns union across runs (a run whose
    // tail lacks a column contributes zero cells of it — exact, because
    // tail presence asserts complete coverage); sums add with overflow →
    // per-column sumsOk=false, extremes reduce
    var colValsAll = stats.forall(_.colVals != null)
    val colVals: Seq[ColValStat] =
      if (!colValsAll) Nil
      else {
        val m = mutable.LinkedHashMap.empty[java.nio.ByteBuffer, ColValStat]
        stats.foreach(_.colVals.foreach { cv =>
          val k = java.nio.ByteBuffer.wrap(cv.col)
          m.get(k) match {
            case None => m.put(k, cv)
            case Some(prev) =>
              var sumsOk = prev.sumsOk && cv.sumsOk
              var sum = 0L
              if (sumsOk)
                try sum = Math.addExact(prev.sum, cv.sum)
                catch { case _: ArithmeticException => sumsOk = false }
              val rangeOk = prev.rangeOk && cv.rangeOk
              m.put(k, ColValStat(cv.col, sumsOk, rangeOk,
                prev.count + cv.count, sum,
                if (rangeOk) math.min(prev.min, cv.min) else 0L,
                if (rangeOk) math.max(prev.max, cv.max) else 0L))
          }
        })
        // runaway union (schema churn across many runs): drop rather than
        // grow the sidecar unboundedly — costs the fast path, never truth
        if (m.size > 4 * MaxColValCols) { colValsAll = false; Nil }
        else m.values.toSeq
      }
    // tombstone-netting judgment: live runs vs certified delete epochs
    // (see [[BucketStat.nettedOk]]); any mixed or uncertified-tombstone
    // run disqualifies the whole bucket
    val liveRuns = stats.filter(_.tombstones == 0)
    val certRuns = stats.filter(s =>
      s.tombstones > 0 && s.tombstones == s.cells && s.certDeletes)
    val statsValid0 = stats.forall(s =>
      s.tombstones >= 0 && s.distinctKeys >= 0 && s.distinctAddrs >= 0)
    val liveDisjoint =
      if (liveRuns.lengthCompare(1) <= 0) true
      else {
        val byFirst = liveRuns.sortWith((a, b) =>
          Codecs.compareBytes(a.firstKey, b.firstKey) < 0)
        (1 until byFirst.length).forall(i =>
          Codecs.compareBytes(byFirst(i - 1).lastKey, byFirst(i).firstKey) < 0)
      }
    val nettedOk = statsValid0 &&
      liveRuns.length + certRuns.length == stats.length &&
      liveDisjoint &&
      liveRuns.forall(s => s.distinctAddrs == s.cells) &&
      certRuns.forall(s => s.distinctAddrs == s.cells)
    val nettedAddrs =
      liveRuns.map(_.distinctAddrs.toLong).sum - certRuns.map(_.cells.toLong).sum
    val nettedKeys =
      liveRuns.map(_.distinctKeys.toLong).sum - certRuns.map(_.distinctKeys.toLong).sum
    var nettedSum = 0L
    var nettedSumOk = nettedOk && stats.forall(_.hasValSums)
    if (nettedSumOk)
      try {
        liveRuns.foreach(s => nettedSum = Math.addExact(nettedSum, s.valTotal))
        certRuns.foreach(s => nettedSum = Math.subtractExact(nettedSum, s.valTotal))
      } catch {
        case _: ArithmeticException => nettedSumOk = false; nettedSum = 0L
      }
    // per-column NETTED twins (live − certified; see
    // [[BucketStat.nettedColValsOk]]) — the whole-store "column totals
    // after a purge" answer. Extremes never net (rangeOk = false).
    val nettedColValsOk = nettedOk && colValsAll
    val nettedColVals: Seq[ColValStat] =
      if (!nettedColValsOk) Nil
      else {
        val m = mutable.LinkedHashMap.empty[java.nio.ByteBuffer, ColValStat]
        def fold(runs: Seq[RunStats], live: Boolean): Unit =
          runs.foreach(_.colVals.foreach { cv =>
            val k = java.nio.ByteBuffer.wrap(cv.col)
            val prev = m.getOrElse(k,
              ColValStat(cv.col, sumsOk = true, rangeOk = false, 0L, 0L, 0L, 0L))
            var sumsOk = prev.sumsOk && cv.sumsOk
            var sum = prev.sum
            if (sumsOk)
              try sum =
                if (live) Math.addExact(prev.sum, cv.sum)
                else Math.subtractExact(prev.sum, cv.sum)
              catch { case _: ArithmeticException => sumsOk = false }
            m.put(k, ColValStat(cv.col, sumsOk, rangeOk = false,
              prev.count + (if (live) cv.count else -cv.count), sum, 0L, 0L))
          })
        fold(liveRuns, live = true)
        fold(certRuns, live = false)
        m.values.toSeq
      }
    BucketStat(
      files = sig,
      runs = stats.length,
      cells = stats.map(_.cells.toLong).sum,
      tombstoneFree = tombstoneFree,
      disjoint = disjoint,
      allAddrsDistinct = !stats.exists(s => s.distinctAddrs != s.cells),
      colEntriesAll = stats.forall(_.colEntries),
      subEntriesAll = stats.forall(_.subEntries),
      distinctKeys = stats.map(s => math.max(0, s.distinctKeys).toLong).sum,
      distinctAddrs = stats.map(s => math.max(0, s.distinctAddrs).toLong).sum,
      valSumsAll = stats.forall(_.hasValSums),
      valTotalOk = valOk,
      valTotal = valTotal,
      firstKey = reduceB(stats.map(_.firstKey), wantMin = true),
      lastKey = reduceB(stats.map(_.lastKey), wantMin = false),
      colWindowsAll = stats.nonEmpty && stats.forall(s =>
        s.colMin != null && s.colMax != null),
      colMin = reduceB(stats.map(_.colMin), wantMin = true),
      colMax = reduceB(stats.map(_.colMax), wantMin = false),
      subWindowsAll = stats.nonEmpty && stats.forall(s =>
        s.subMin != null && s.subMax != null),
      subMin = reduceB(stats.map(_.subMin), wantMin = true),
      subMax = reduceB(stats.map(_.subMax), wantMin = false),
      valRangeAll = stats.forall(_.hasValRange),
      valMin = if (stats.isEmpty) 0L else stats.map(_.valMin).min,
      valMax = if (stats.isEmpty) 0L else stats.map(_.valMax).max,
      statsValid = statsValid0,
      colValsAll = colValsAll,
      colVals = colVals,
      nettedOk = nettedOk,
      nettedAddrs = if (nettedOk) nettedAddrs else 0L,
      nettedKeys = if (nettedOk) nettedKeys else 0L,
      tsAll = stats.forall(_.hasTsRange),
      maxTs = if (stats.nonEmpty && stats.forall(_.hasTsRange))
        stats.map(_.tsMax).max else 0L,
      nettedSumOk = nettedSumOk,
      nettedSum = nettedSum,
      nettedColValsOk = nettedColValsOk,
      nettedColVals = nettedColVals)
  }

  private def bucketStatFile(tableDir: String, bucket: Int): Path =
    Paths.get(tableDir, BucketStatsDir, s"b$bucket.stat")

  /** (Re)write one bucket's sidecar from its CURRENT committed listing —
    * called at write commit and after compaction (the two points segments
    * change under the single-maintainer discipline). An empty bucket
    * deletes its sidecar. Atomic temp+rename; a crash mid-write leaves a
    * temp file nothing reads.
    *
    * INCREMENTAL (round 13): the sidecar carries a per-file RUN-STATS
    * section after the reduction, so a refresh re-reads index tails only
    * for files the previous sidecar has not seen — O(new tails) per
    * commit instead of O(all tails), the difference between a constant
    * and a linear commit cost at thousands of segments per bucket.
    * Files removed by compaction simply drop out of the carried map
    * (matched by (name, size), the same signature the staleness
    * authority trusts for the whole record). Planning reads are
    * unaffected: [[readBucketStats]] stops parsing BEFORE the per-file
    * section, keeping planning IO at the reduction's ~fixed bytes. */
  def writeBucketStats(tableDir: String, bucket: Int): Unit = {
    val target = bucketStatFile(tableDir, bucket)
    val files = segmentFiles(tableDir, bucket)
    if (files.isEmpty) { Files.deleteIfExists(target); return }
    // probe knob (tools only): -Dgraft.sidecar.incremental=false replays
    // the pre-r13 full re-read so SidecarRefreshProbe can measure the
    // incremental refresh in isolation; never set on a production path
    val prev: Map[(String, Long), Array[RunStats]] =
      if (sys.props.get("graft.sidecar.incremental").contains("false"))
        Map.empty
      else readSidecarRunStats(target)
    val perFile: Seq[(Path, Array[RunStats])] = files.map { f =>
      val sig = (f.getFileName.toString, Files.size(f))
      f -> prev.getOrElse(sig, runStats(f))
    }
    val rec = aggregateBucketStat(fileSig(files),
      perFile.flatMap(_._2.toSeq))
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s"b$bucket-${UUID.randomUUID()}.tmp")
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(tmp)))
    try {
      out.writeInt(BucketStatMagic)
      out.writeInt(rec.files.length)
      rec.files.foreach { case (n, sz) => out.writeUTF(n); out.writeLong(sz) }
      out.writeInt(rec.runs)
      out.writeLong(rec.cells)
      out.writeBoolean(rec.tombstoneFree)
      out.writeBoolean(rec.disjoint)
      out.writeBoolean(rec.allAddrsDistinct)
      out.writeBoolean(rec.colEntriesAll)
      out.writeBoolean(rec.subEntriesAll)
      out.writeLong(rec.distinctKeys)
      out.writeLong(rec.distinctAddrs)
      out.writeBoolean(rec.valSumsAll)
      out.writeBoolean(rec.valTotalOk)
      out.writeLong(rec.valTotal)
      writeBytes(out, rec.firstKey)
      writeBytes(out, rec.lastKey)
      out.writeBoolean(rec.colWindowsAll)
      writeBytes(out, rec.colMin)
      writeBytes(out, rec.colMax)
      out.writeBoolean(rec.subWindowsAll)
      writeBytes(out, rec.subMin)
      writeBytes(out, rec.subMax)
      out.writeBoolean(rec.valRangeAll)
      out.writeLong(rec.valMin)
      out.writeLong(rec.valMax)
      out.writeBoolean(rec.statsValid)
      out.writeBoolean(rec.colValsAll)
      out.writeInt(rec.colVals.length)
      rec.colVals.foreach { cv =>
        writeBytes(out, cv.col)
        out.writeBoolean(cv.sumsOk)
        out.writeBoolean(cv.rangeOk)
        out.writeLong(cv.count)
        out.writeLong(cv.sum)
        out.writeLong(cv.min)
        out.writeLong(cv.max)
      }
      out.writeBoolean(rec.nettedOk)
      out.writeLong(rec.nettedAddrs)
      out.writeLong(rec.nettedKeys)
      out.writeBoolean(rec.tsAll)
      out.writeLong(rec.maxTs)
      out.writeBoolean(rec.nettedSumOk)
      out.writeLong(rec.nettedSum)
      out.writeBoolean(rec.nettedColValsOk)
      out.writeInt(rec.nettedColVals.length)
      rec.nettedColVals.foreach { cv =>
        writeBytes(out, cv.col)
        out.writeBoolean(cv.sumsOk)
        out.writeLong(cv.count)
        out.writeLong(cv.sum)
      }
      // per-file RUN-STATS section (incremental refresh; parse-optional —
      // planning readers stop before it)
      out.writeInt(perFile.length)
      perFile.foreach { case (f, rs) =>
        out.writeUTF(f.getFileName.toString)
        out.writeLong(Files.size(f))
        out.writeInt(rs.length)
        rs.foreach(writeRunStats(out, _))
      }
    } finally out.close()
    Files.move(tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeRunStats(out: DataOutputStream, s: RunStats): Unit = {
    out.writeInt(s.cells)
    writeBytes(out, s.firstKey)
    writeBytes(out, s.lastKey)
    writeBytes(out, s.colMin)
    writeBytes(out, s.colMax)
    writeBytes(out, s.subMin)
    writeBytes(out, s.subMax)
    out.writeInt(s.tombstones)
    out.writeInt(s.distinctKeys)
    out.writeInt(s.distinctAddrs)
    out.writeBoolean(s.colEntries)
    out.writeBoolean(s.subEntries)
    out.writeBoolean(s.hasKeyPrefix)
    out.writeBoolean(s.hasValSums)
    out.writeLong(s.valTotal)
    out.writeBoolean(s.hasValRange)
    out.writeLong(s.valMin)
    out.writeLong(s.valMax)
    if (s.colVals == null) out.writeInt(-1)
    else {
      out.writeInt(s.colVals.length)
      s.colVals.foreach { cv =>
        writeBytes(out, cv.col)
        out.writeBoolean(cv.sumsOk)
        out.writeBoolean(cv.rangeOk)
        out.writeLong(cv.count)
        out.writeLong(cv.sum)
        out.writeLong(cv.min)
        out.writeLong(cv.max)
      }
    }
    out.writeBoolean(s.certDeletes)
    out.writeLong(s.tsMin)
    out.writeLong(s.tsMax)
    out.writeBoolean(s.hasTsRange)
  }

  private def readRunStats0(in: DataInputStream): RunStats = {
    val cells = in.readInt()
    val firstKey = readBytes(in)
    val lastKey = readBytes(in)
    val colMin = readBytes(in)
    val colMax = readBytes(in)
    val subMin = readBytes(in)
    val subMax = readBytes(in)
    val tombstones = in.readInt()
    val distinctKeys = in.readInt()
    val distinctAddrs = in.readInt()
    val colEntries = in.readBoolean()
    val subEntries = in.readBoolean()
    val hasKeyPrefix = in.readBoolean()
    val hasValSums = in.readBoolean()
    val valTotal = in.readLong()
    val hasValRange = in.readBoolean()
    val valMin = in.readLong()
    val valMax = in.readLong()
    val ncv = in.readInt()
    val colVals =
      if (ncv < 0) null
      else Array.fill(ncv)(ColValStat(readBytes(in), in.readBoolean(),
        in.readBoolean(), in.readLong(), in.readLong(), in.readLong(),
        in.readLong()))
    RunStats(cells, firstKey, lastKey, colMin, colMax, subMin, subMax,
      tombstones, distinctKeys, distinctAddrs, colEntries, subEntries,
      hasKeyPrefix, hasValSums, valTotal, hasValRange, valMin, valMax,
      colVals, in.readBoolean(), in.readLong(), in.readLong(),
      in.readBoolean())
  }

  /** Seed [[runStats]]' memo from one bucket's sidecar per-file section:
    * a COLD driver's per-run judgments (as-of gating, subset stats) then
    * answer from ONE sidecar read instead of opening every segment's
    * tail — the planning twin of the incremental commit refresh. Only
    * files whose (name, size) signature matches a live segment seed (the
    * same staleness authority as the reduction); files already memoized
    * are untouched. Cheap to call repeatedly: parses are memoized per
    * sidecar identity. */
  def seedRunStatsFromSidecar(tableDir: String, bucket: Int,
      files: Seq[Path]): Unit = {
    if (files.forall(f => runStatsCache.containsKey(cacheKey(f)))) return
    val carried = readSidecarRunStats(bucketStatFile(tableDir, bucket))
    if (carried.isEmpty) return
    files.foreach { f =>
      carried.get((f.getFileName.toString, Files.size(f))).foreach { rs =>
        runStatsCache.putIfAbsent(cacheKey(f), rs)
      }
    }
  }

  /** Parse the per-file run-stats section of one sidecar, skipping the
    * reduction — the commit-path companion of [[readBucketStats]]. An
    * absent, legacy, or corrupt sidecar returns empty (the refresh then
    * reads every tail, exactly the pre-incremental behavior). Memoized
    * per sidecar file identity (sidecars are replaced atomically, never
    * appended). */
  private def readSidecarRunStats(p: Path)
    : Map[(String, Long), Array[RunStats]] = {
    if (!Files.exists(p)) return Map.empty
    sidecarRunStatsCache.computeIfAbsent(cacheKey(p), _ =>
      readSidecarRunStats0(p))
  }

  private val sidecarRunStatsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Map[(String, Long), Array[RunStats]]]()

  private def readSidecarRunStats0(p: Path)
    : Map[(String, Long), Array[RunStats]] = {
    if (!Files.exists(p)) return Map.empty
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(p)))
    try {
      if (in.readInt() != BucketStatMagic) return Map.empty
      readReduction(in) // discard — only the section after it is wanted
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val name = in.readUTF()
        val size = in.readLong()
        val nr = in.readInt()
        (name, size) -> Array.fill(nr)(readRunStats0(in))
      }.toMap
    } catch {
      case _: IOException | _: RuntimeException => Map.empty
    } finally in.close()
  }

  private val bucketStatCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), BucketStat]()

  /** Parse one bucket's sidecar IF it exists, parses, and its recorded
    * listing matches `files` exactly — else None (never a stale answer).
    * Parsed records memoize per sidecar file identity; the listing
    * comparison reruns per call (it is the staleness authority). */
  def readBucketStats(tableDir: String, bucket: Int,
      files: Seq[Path]): Option[BucketStat] = {
    val p = bucketStatFile(tableDir, bucket)
    if (!Files.exists(p)) return None
    val rec =
      try bucketStatCache.computeIfAbsent(cacheKey(p), _ => {
        val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(p)))
        try {
          if (in.readInt() != BucketStatMagic)
            throw new IOException(s"not a bucket-stat sidecar: $p")
          // the REDUCTION only — the per-file run-stats section after it
          // is never read at planning (commit-path readers parse it via
          // readSidecarRunStats), keeping planning IO at the reduction's
          // ~fixed bytes however many runs the bucket carries
          readReduction(in)
        } finally in.close()
      })
      catch { case _: IOException | _: RuntimeException => return None }
    if (rec.files == fileSig(files)) Some(rec) else None
  }

  /** Parse the sidecar's REDUCTION record (everything before the
    * per-file run-stats section); the stream is left positioned at the
    * section's file count. */
  private def readReduction(in: DataInputStream): BucketStat = {
    val nf = in.readInt()
    val sig = (0 until nf).map(_ => (in.readUTF(), in.readLong()))
    val base = BucketStat(sig, in.readInt(), in.readLong(),
      in.readBoolean(), in.readBoolean(), in.readBoolean(),
      in.readBoolean(), in.readBoolean(),
      in.readLong(), in.readLong(),
      in.readBoolean(), in.readBoolean(), in.readLong(),
      readBytes(in), readBytes(in),
      in.readBoolean(), readBytes(in), readBytes(in),
      in.readBoolean(), readBytes(in), readBytes(in),
      in.readBoolean(), in.readLong(), in.readLong())
    val statsValid = in.readBoolean()
    val colValsAll = in.readBoolean()
    val ncv = in.readInt()
    val colVals = (0 until ncv).map { _ =>
      ColValStat(readBytes(in), in.readBoolean(), in.readBoolean(),
        in.readLong(), in.readLong(), in.readLong(), in.readLong())
    }
    val withNet = base.copy(statsValid = statsValid,
      colValsAll = colValsAll,
      colVals = colVals,
      nettedOk = in.readBoolean(),
      nettedAddrs = in.readLong(),
      nettedKeys = in.readLong(),
      tsAll = in.readBoolean(),
      maxTs = in.readLong(),
      nettedSumOk = in.readBoolean(),
      nettedSum = in.readLong())
    val nettedColValsOk = in.readBoolean()
    val nncv = in.readInt()
    val nettedColVals = (0 until nncv).map { _ =>
      ColValStat(readBytes(in), in.readBoolean(), rangeOk = false,
        in.readLong(), in.readLong(), 0L, 0L)
    }
    withNet.copy(nettedColValsOk = nettedColValsOk,
      nettedColVals = nettedColVals)
  }

  /** One bucket's [[BucketStat]]: the sidecar when fresh, else computed by
    * walking the run index tails (counted in [[bucketStatWalks]]). The
    * aggregate-planning entry point — NEVER call from a plain-scan path
    * (the walk reads full index tails, blooms included). */
  def bucketStats(tableDir: String, bucket: Int, files: Seq[Path]): BucketStat =
    readBucketStats(tableDir, bucket, files).getOrElse {
      bucketStatWalks.incrementAndGet()
      aggregateBucketStat(fileSig(files), files.flatMap(f => runStats(f).toSeq))
    }

  /** PER-RUN as-of gating (SURVEY §7.4 #5, round 13): partition one
    * bucket's segment files under an AS-OF bound into the COVERED subset.
    * Some(covered) when every run of every file carries the TSRG window
    * and is either fully covered (tsMax ≤ bound — every cell is in the
    * bounded view) or fully newer (tsMin > bound — no cell is, its
    * tombstones included); None when any run straddles the bound,
    * predates TSRG, or shares a file with runs on the other side (files
    * are immutable commit units, so all runs of one file share a commit —
    * a mixed file never arises from the write path, and declining keeps
    * the proof local to what the tails state).
    *
    * Soundness: the bounded view replays exactly the cells with
    * ts ≤ bound under LWW — which is exactly the covered files' cells.
    * So every per-run judgment (disjointness, dedup, netting, CVAL/VSUM
    * tails) recomputed over the covered subset describes the bounded
    * view the way the committed sidecar describes the current one.
    * Reads memoized index tails only — no cell payload IO. */
  def asOfCoveredFiles(files: Seq[Path], bound: Long): Option[Seq[Path]] = {
    val out = Seq.newBuilder[Path]
    var i = 0
    val arr = files.toIndexedSeq
    while (i < arr.length) {
      val rs = runStats(arr(i))
      if (rs.exists(!_.hasTsRange)) return None
      if (rs.forall(_.tsMax <= bound)) out += arr(i)
      else if (!rs.forall(_.tsMin > bound)) return None
      i += 1
    }
    Some(out.result())
  }

  /** Bucket-stat reduction over an explicit file SUBSET (the as-of
    * covered files): the same judgments the sidecar record carries,
    * recomputed over the subset from per-file memoized index tails.
    * Memoized per file list — segments are immutable, so a signature
    * seen once reduces the same way forever. */
  def subsetBucketStats(files: Seq[Path]): BucketStat =
    subsetStatCache.computeIfAbsent(files.map(cacheKey).sorted.mkString("\n"),
      _ => aggregateBucketStat(fileSig(files),
        files.flatMap(f => runStats(f).toSeq)))

  private val subsetStatCache =
    new java.util.concurrent.ConcurrentHashMap[String, BucketStat]()

  /** Per-run key blooms of one segment (null element = pre-bloom run);
    * memoized per immutable file, so after the first lookup against a
    * segment its blooms answer from memory — Cassandra's posture, where
    * SSTable blooms are resident and a point read that misses every bloom
    * touches no data file at all. Reads index blocks only, never cells. */
  def runBlooms(file: Path): Array[KeyBloom] =
    bloomCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).map(ri => r.readIndex(ri).bloom).toArray
      finally r.close()
    })

  /** Per-run [colMin, colMax] windows (null element = legacy run or no
    * non-null cols) — Cassandra's sstable min/max clustering, memoized per
    * immutable file. A slice lookup skips a run whose window provably holds
    * no wanted column, without touching its payload. */
  def runColRanges(file: Path): Array[(Array[Byte], Array[Byte])] =
    colRangeCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).map { ri =>
        val idx = r.readIndex(ri)
        if (idx.colMin == null || idx.colMax == null) null
        else (idx.colMin, idx.colMax)
      }.toArray
      finally r.close()
    })

  /** Per-run DISTINCT-column bloom CHUNKS (null element = legacy pre-bloom
    * run); memoized per immutable file. A point slice skips a run when
    * EVERY chunk's bloom rejects every wanted column — the false-window
    * case min/max windows can't prune (wanted column INSIDE
    * [colMin, colMax] but absent — interleaved-column wide rows). No false
    * negatives, and the blooms saw tombstone cells' columns too, so a
    * skipped run provably holds no cell (live or tombstone) of any wanted
    * address. Single-chunk (CBLM) runs surface as a 1-element array. */
  def runColBlooms(file: Path): Array[Array[KeyBloom]] =
    colBloomCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).map(ri => r.readIndex(ri).colBlooms).toArray
      finally r.close()
    })

  /** Per-run [subMin, subMax] windows over `:subcolumn` bytes (null
    * element = legacy run or no non-null subs) — the sub twin of
    * [[runColRanges]], memoized per immutable file. A sub-slice lookup
    * skips a run whose window provably holds no wanted sub, without
    * touching its payload. */
  def runSubRanges(file: Path): Array[(Array[Byte], Array[Byte])] =
    subRangeCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).map { ri =>
        val idx = r.readIndex(ri)
        if (idx.subMin == null || idx.subMax == null) null
        else (idx.subMin, idx.subMax)
      }.toArray
      finally r.close()
    })

  /** Per-run distinct-SUB bloom chunks (null element = legacy run); the
    * sub twin of [[runColBlooms]], memoized per immutable file. A point
    * sub lookup skips a run when every chunk rejects every wanted sub —
    * the false-window case the [subMin, subMax] check can't prune. */
  def runSubBlooms(file: Path): Array[Array[KeyBloom]] =
    subBloomCache.computeIfAbsent(cacheKey(file), _ => {
      val r = new SegmentReader(file)
      try runInfos(file).map(ri => r.readIndex(ri).subBlooms).toArray
      finally r.close()
    })

  /** Any member of the SORTED col set inside the inclusive window [a, b]? */
  def anyColIn(colSet: Array[Array[Byte]], a: Array[Byte], b: Array[Byte]): Boolean = {
    if (a == null || b == null) return true // unknown window -> must read
    var lo = 0
    var hi = colSet.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (Codecs.compareBytes(colSet(m), a) < 0) lo = m + 1 else hi = m
    }
    lo < colSet.length && Codecs.compareBytes(colSet(lo), b) <= 0
  }

  /** InputStream over positional FileChannel reads: any number of run
    * cursors share ONE os file handle per segment, so reader fd usage is
    * O(segments), never O(runs). */
  private final class ChannelRangeInputStream(ch: java.nio.channels.FileChannel, start: Long)
    extends InputStream {
    private var pos = start
    override def read(): Int = {
      val b = new Array[Byte](1)
      if (read(b, 0, 1) < 0) -1 else b(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = ch.read(java.nio.ByteBuffer.wrap(b, off, len), pos)
      if (n > 0) pos += n
      n
    }
  }

  /** Read handle for one segment file: one FileChannel, N run cursors doing
    * buffered positional reads against it. */
  final class SegmentReader(file: Path) extends AutoCloseable {
    private val ch = java.nio.channels.FileChannel.open(
      file, java.nio.file.StandardOpenOption.READ)
    def runs(): Seq[Iterator[Cell]] =
      runOffsets(file).map { case (off, n) => runIterator(off, n) }
    def runIterator(offset: Long, cellCount: Int): Iterator[Cell] = new Iterator[Cell] {
      private val in = new DataInputStream(new BufferedInputStream(
        new ChannelRangeInputStream(ch, offset), 1 << 15))
      private var remaining = cellCount
      def hasNext: Boolean = remaining > 0
      def next(): Cell = { val c = readCell(in); remaining -= 1; c }
    }

    def readIndex(ri: RunInfo): RunIndex = {
      val buf = new Array[Byte](ri.indexByteLen)
      val in = new DataInputStream(new ChannelRangeInputStream(ch, ri.indexOffset))
      in.readFully(buf)
      parseIndex(buf)
    }

    /** Cells of one run restricted to key range [lo, hi) (null = unbounded):
      * the sparse index prunes non-overlapping runs outright and seeks the
      * cursor to the last indexed key <= lo, so a range partition reads
      * O(range + IndexEvery) cells of the run, not the whole run.
      *
      * `colSet` (sorted, non-null together with a col-tailed index) is the
      * point-slice SEEK: every index entry is a (key, col) address prefix,
      * so a span that provably lies inside ONE key and whose [col, nextCol]
      * window contains no wanted column is never read at all — a wanted-3-
      * columns slice of a million-cell row costs O(matches × IndexEvery)
      * cell reads instead of the row width. Sound because a skipped span
      * can hold no cell (live OR tombstone) of any wanted (key, col)
      * address, and reconciliation is per-address; spans containing a key
      * boundary are always read (their cols are not monotone across keys).
      * The exact byte filter downstream (BucketMergeIterator colLookup)
      * still applies to every cell that IS read. */
    def rangeRun(ri: RunInfo, lo: Array[Byte], hi: Array[Byte],
        colSet: Array[Array[Byte]] = null,
        counters: ScanCounters = null,
        colWindow: (Array[Byte], Array[Byte]) = null,
        subSet: Array[Array[Byte]] = null,
        subWindow: (Array[Byte], Array[Byte]) = null): Iterator[Cell] = {
      if (ri.cellCount == 0) return Iterator.empty
      val idx = readIndex(ri)
      if (lo != null && Codecs.compareBytes(idx.lastKey, lo) < 0) return Iterator.empty
      if (hi != null && Codecs.compareBytes(idx.keys(0), hi) >= 0) return Iterator.empty
      var e = 0
      if (lo != null) {
        // seek to the last index entry STRICTLY below lo: entries equal to
        // lo must not be skipped — cells with key == lo can start before
        // them (a hot key spans many index entries, all bearing that key;
        // advancing on <= here seeked past the whole run and dropped every
        // cell but the tail — the sf0.1 widerow regression)
        while (e + 1 < idx.keys.length && Codecs.compareBytes(idx.keys(e + 1), lo) < 0) e += 1
      }
      val seekable = idx.cols != null &&
        (colSet != null || colWindow != null ||
          ((subSet != null || subWindow != null) && idx.subs != null))
      val base =
        if (!seekable)
          runIterator(ri.payloadOffset + idx.offsets(e), ri.cellCount - idx.cellPos(e))
        else seekSpans(ri, idx, e, hi, colSet, colWindow, subSet, subWindow, counters)
      val from =
        if (lo == null) base
        else base.dropWhile(c => Codecs.compareBytes(c.key, lo) < 0)
      if (hi == null) from
      else from.takeWhile(c => Codecs.compareBytes(c.key, hi) < 0)
    }

    /** The colSet/subSet span walk of [[rangeRun]]: group must-read index
      * spans into contiguous cursors, count the skipped spans' cells. */
    private def seekSpans(ri: RunInfo, idx: RunIndex, e0: Int,
        hi: Array[Byte], colSet: Array[Array[Byte]],
        colWindow: (Array[Byte], Array[Byte]),
        subSet: Array[Array[Byte]],
        subWindow: (Array[Byte], Array[Byte]),
        counters: ScanCounters): Iterator[Cell] = {
      val n = idx.cellPos.length
      def spanCells(i: Int): Int =
        (if (i == n - 1) ri.cellCount else idx.cellPos(i + 1)) - idx.cellPos(i)
      // any wanted col in the inclusive span window [a, b]? Wanted = a
      // member of the pushed point set AND/OR the pushed range window
      // (both over-approximations re-checked exactly downstream;
      // sub-columns make a span's last col potentially EQUAL its end
      // entry's col, hence b inclusive; null = unknown → must read)
      def wantedIn(a: Array[Byte], b: Array[Byte]): Boolean = {
        if (a == null || b == null) return true
        (colSet == null || anyColIn(colSet, a, b)) &&
          (colWindow == null ||
            ((colWindow._1 == null || Codecs.compareBytes(colWindow._1, b) <= 0) &&
             (colWindow._2 == null || Codecs.compareBytes(a, colWindow._2) <= 0)))
      }
      // the sub twin, applied only to spans that provably sit inside ONE
      // (key, col) group — sub bytes are monotone only at equal (key, col)
      def subWantedIn(a: Array[Byte], b: Array[Byte]): Boolean = {
        if (a == null || b == null) return true
        (subSet == null || anyColIn(subSet, a, b)) &&
          (subWindow == null ||
            ((subWindow._1 == null || Codecs.compareBytes(subWindow._1, b) <= 0) &&
             (subWindow._2 == null || Codecs.compareBytes(a, subWindow._2) <= 0)))
      }
      // chunked column blooms: span i lies entirely inside chunk
      // cellPos/chunkCells (ChunkCells is a multiple of IndexEvery), so a
      // chunk whose bloom rejects every wanted point column excludes the
      // span OUTRIGHT — even across key boundaries, because the bloom saw
      // every non-null col byte form in the chunk regardless of key. The
      // final span may straddle chunks and must check all it touches.
      def bloomChunkMightContain(i: Int, set: Array[Array[Byte]],
          blooms: Array[KeyBloom], chunkCells: Int): Boolean = {
        if (set == null || blooms == null || chunkCells <= 0) return true
        val first = math.min(blooms.length - 1, idx.cellPos(i) / chunkCells)
        val last =
          if (i < n - 1) first
          else blooms.length - 1 // final span: through the run's end
        var ci = first
        while (ci <= last) {
          if (set.exists(blooms(ci).mightContain)) return true
          ci += 1
        }
        false
      }
      def chunkMightContain(i: Int): Boolean =
        bloomChunkMightContain(i, colSet, idx.colBlooms, idx.colChunkCells) &&
          bloomChunkMightContain(i, subSet, idx.subBlooms, idx.subChunkCells)
      def mustRead(i: Int): Boolean = {
        if (!chunkMightContain(i)) return false
        if (i == n - 1) {
          // final span ends at lastKey with no col upper bound: readable
          // unless it provably sits inside one key with every wanted col
          // below its first col
          !java.util.Arrays.equals(idx.keys(i), idx.lastKey) ||
            idx.cols(i) == null ||
            ((colSet == null ||
              Codecs.compareBytes(colSet(colSet.length - 1), idx.cols(i)) >= 0) &&
             (colWindow == null || colWindow._2 == null ||
              Codecs.compareBytes(idx.cols(i), colWindow._2) <= 0))
        } else if (!java.util.Arrays.equals(idx.keys(i), idx.keys(i + 1))) true
        else if (!wantedIn(idx.cols(i), idx.cols(i + 1))) false
        else if ((subSet != null || subWindow != null) && idx.subs != null &&
            idx.cols(i) != null && idx.cols(i + 1) != null &&
            java.util.Arrays.equals(idx.cols(i), idx.cols(i + 1)))
          // one (key, col) group: the span's subs run [subs(i), subs(i+1)]
          subWantedIn(idx.subs(i), idx.subs(i + 1))
        else true
      }
      val groups = mutable.ArrayBuffer.empty[Array[Int]] // [startEntry, endEntry)
      var i = e0
      var stop = false
      while (i < n && !stop) {
        if (hi != null && Codecs.compareBytes(idx.keys(i), hi) >= 0) stop = true
        else {
          if (mustRead(i)) {
            if (groups.nonEmpty && groups.last(1) == i) groups.last(1) = i + 1
            else groups += Array(i, i + 1)
          } else if (counters != null) counters.cellsSeekSkipped += spanCells(i)
          i += 1
        }
      }
      groups.iterator.flatMap { g =>
        val endPos = if (g(1) >= n) ri.cellCount else idx.cellPos(g(1))
        runIterator(ri.payloadOffset + idx.offsets(g(0)), endPos - idx.cellPos(g(0)))
      }
    }

    /** Range cursors over every run, bloom-pruned when the scan is a point
      * lookup: `lookupKeys` non-null asserts the caller needs ONLY cells
      * whose key is in the set (pushed EqualTo/In, re-checked row-exact
      * downstream), so a run whose bloom rejects every key is skipped
      * without reading its index or payload. Blooms have no false
      * negatives, and LWW/tombstone reconciliation is per-address, so
      * dropping runs that provably hold none of the keys reconciles
      * identically for the keys that remain. */
    def rangeRuns(lo: Array[Byte], hi: Array[Byte],
        lookupKeys: Seq[Array[Byte]] = null,
        counters: ScanCounters = null,
        colSet: Array[Array[Byte]] = null,
        colWindow: (Array[Byte], Array[Byte]) = null,
        subSet: Array[Array[Byte]] = null,
        subWindow: (Array[Byte], Array[Byte]) = null): Seq[Iterator[Cell]] = {
      val infos = runInfos(file)
      val blooms = if (lookupKeys == null) null else runBlooms(file)
      val colRanges =
        if (colSet == null && colWindow == null) null else runColRanges(file)
      val colBlooms = if (colSet == null) null else runColBlooms(file)
      val subRanges =
        if (subSet == null && subWindow == null) null else runSubRanges(file)
      val subBlooms = if (subSet == null) null else runSubBlooms(file)
      def colExcluded(r: (Array[Byte], Array[Byte])): Boolean =
        (colSet != null && !anyColIn(colSet, r._1, r._2)) ||
          (colWindow != null &&
            ((colWindow._1 != null && Codecs.compareBytes(colWindow._1, r._2) > 0) ||
             (colWindow._2 != null && Codecs.compareBytes(colWindow._2, r._1) < 0)))
      def subExcluded(r: (Array[Byte], Array[Byte])): Boolean =
        (subSet != null && !anyColIn(subSet, r._1, r._2)) ||
          (subWindow != null &&
            ((subWindow._1 != null && Codecs.compareBytes(subWindow._1, r._2) > 0) ||
             (subWindow._2 != null && Codecs.compareBytes(subWindow._2, r._1) < 0)))
      infos.zipWithIndex.map { case (ri, i) =>
        if (blooms != null && blooms(i) != null &&
            !lookupKeys.exists(blooms(i).mightContain)) {
          if (counters != null) counters.runsBloomSkipped += 1
          Iterator.empty
        } else if (colRanges != null && colRanges(i) != null &&
            colExcluded(colRanges(i))) {
          // run-wide min/max clustering: no wanted column can be in this
          // run, so neither can a tombstone for one — skip it whole
          if (counters != null) counters.runsColSkipped += 1
          Iterator.empty
        } else if (colBlooms != null && colBlooms(i) != null &&
            !colSet.exists(c => colBlooms(i).exists(_.mightContain(c)))) {
          // distinct-column blooms: the wanted columns fall INSIDE the
          // run's [colMin, colMax] window (or the window check would have
          // fired) but none is present in ANY chunk — the false-window IO
          // the min/max check can't prune. No false negatives; tombstone
          // cells' columns were added too, so reconciliation is unaffected.
          if (counters != null) counters.runsColBloomSkipped += 1
          Iterator.empty
        } else if (subRanges != null && subRanges(i) != null &&
            subExcluded(subRanges(i))) {
          // run-wide [subMin, subMax]: no wanted SUB-column can be in this
          // run (nor a tombstone for one — tombstones carry their sub
          // bytes and fed the window too) — skip it whole
          if (counters != null) counters.runsSubSkipped += 1
          Iterator.empty
        } else if (subBlooms != null && subBlooms(i) != null &&
            !subSet.exists(s => subBlooms(i).exists(_.mightContain(s)))) {
          // distinct-SUB blooms: the wanted subs fall inside the run's
          // [subMin, subMax] window but none is present in any chunk —
          // the sub twin of the column false-window skip
          if (counters != null) counters.runsSubSkipped += 1
          Iterator.empty
        } else {
          if (counters != null) counters.runsRead += 1
          rangeRun(ri, lo, hi, colSet, counters, colWindow, subSet, subWindow)
        }
      }
    }

    def close(): Unit = ch.close()
  }

  /** All cells of a segment in stored (run) order — eager test/tooling view
    * (materializes, then closes the channel deterministically). */
  def readSegment(file: Path): Seq[Cell] = {
    val r = new SegmentReader(file)
    try r.runs().flatMap(_.toSeq) finally r.close()
  }

  /** K-way streaming merge of sorted cell runs: yields cells in address
    * order, reconciling duplicate addresses by timestamp (LWW, value-byte
    * tie-break) as they surface; holds one buffered head per run.
    * `dropTombstones=true` is the scan view (the scan-level filter,
    * input/CassandraHiveRecordReader.java:205-207); `false` preserves
    * tombstones for compaction, where they must keep shadowing older cells
    * in OTHER segments.
    *
    * `counterMerge=true` switches reconciliation from LWW to SUMMING: every
    * same-address cell is an 8-byte-long increment and the merged value is
    * their total — the store-level counter semantic the reference left as a
    * TODO (serde2/CassandraPut.java:103 in /root/reference). A tombstone
    * resets the counter: increments at or below the newest tombstone
    * timestamp are discarded. As in Cassandra, deleting then re-incrementing
    * a counter is only reliable when the new increments carry timestamps
    * above the delete's; compaction collapses increment history. Memory is
    * O(one address's cells) — the same bound as one wide row. */
  final class MergeIterator(runSeq: Seq[Iterator[Cell]], dropTombstones: Boolean,
      counterMerge: Boolean = false, counters: ScanCounters = null)
    extends Iterator[Cell] {
    private val heap =
      new mutable.PriorityQueue[scala.collection.BufferedIterator[Cell]]()(
        Ordering.by[scala.collection.BufferedIterator[Cell], Cell](_.head)(
          addressOrdering.reverse))
    runSeq.foreach { r => val b = r.buffered; if (b.hasNext) heap.enqueue(b) }

    private var nextCell: Cell = advance()

    private def advance(): Cell = {
      while (heap.nonEmpty) {
        var winner: Cell = null
        val group = if (counterMerge) mutable.ArrayBuffer.empty[Cell] else null
        var addr: Cell = null // fixed representative for address comparisons
        // drain every run whose head sits at the globally-least address
        var more = true
        while (more) {
          val it = heap.dequeue()
          var c = it.next()
          if (addr == null) addr = c
          if (counterMerge) group += c
          else if (winner == null || newerThan(c, winner)) winner = c
          while (it.hasNext && addrEq(it.head, addr)) {
            c = it.next()
            if (counterMerge) group += c
            else if (newerThan(c, winner)) winner = c
          }
          if (it.hasNext) heap.enqueue(it)
          more = heap.nonEmpty && addrEq(heap.head.head, addr)
        }
        val out = if (counterMerge) reconcileCounter(group.toSeq) else winner
        if (dropTombstones && out.tombstone) {
          if (counters != null) counters.tombstonesDropped += 1
        } else {
          if (counters != null) counters.cellsMerged += 1
          return out
        }
      }
      null
    }

    def hasNext: Boolean = nextCell != null
    def next(): Cell = { val c = nextCell; nextCell = advance(); c }
  }

  /** Counter reconciliation of one address group: sum the live 8-byte-long
    * increments newer than the newest tombstone; the merged cell carries the
    * newest contributing timestamp. All increments gone (or shadowed) ->
    * the tombstone survives with its own timestamp. */
  private def reconcileCounter(group: Seq[Cell]): Cell = {
    var tombTs = Long.MinValue
    group.foreach(c => if (c.tombstone) tombTs = math.max(tombTs, c.ts))
    var sum = 0L
    var maxTs = Long.MinValue
    var live = false
    group.foreach { c =>
      if (!c.tombstone && c.ts > tombTs) {
        if (c.value == null || c.value.length != 8)
          throw new IOException(
            s"counter.merge requires 8-byte long increment cells, got ${
              if (c.value == null) "null" else c.value.length.toString} bytes")
        sum += ByteBuffer.wrap(c.value).getLong
        maxTs = math.max(maxTs, c.ts)
        live = true
      }
    }
    val t = group.head
    if (!live) Cell(t.key, t.col, t.sub, Array.emptyByteArray, tombTs, tombstone = true)
    else Cell(t.key, t.col, t.sub,
      ByteBuffer.allocate(8).putLong(sum).array(), maxTs, tombstone = false)
  }

  /** Whether a table reconciles same-address cells by counter summation
    * (`counter.merge` table property) — the policy compaction must honor. */
  def counterMergeEnabled(tableDir: String): Boolean =
    readMeta(tableDir).exists(_.properties.get("counter.merge").exists(_.toBoolean))

  /** The bucket scan: merge every run of every segment, live cells only,
    * optionally restricted to key range [lower, upper) — the sub-bucket
    * split unit. Every segment participates in every range, so LWW and
    * tombstone reconciliation stay exact no matter how a bucket is split;
    * the run index makes each range read ~its share of the bytes. */
  final class BucketMergeIterator(tableDir: String, bucket: Int,
      lower: Array[Byte] = null, upper: Array[Byte] = null,
      asOf: Long = Long.MaxValue,
      ttl: Long = 0L, now: Long = 0L,
      counterMerge: Boolean = false,
      lookupKeys: Seq[Array[Byte]] = null,
      onlyFiles: Seq[Path] = null,
      counters: ScanCounters = null,
      colLookup: Seq[Array[Byte]] = null,
      colWindow: (Array[Byte], Array[Byte]) = null,
      subLookup: Seq[Array[Byte]] = null,
      subWindow: (Array[Byte], Array[Byte]) = null)
    extends Iterator[Cell] with AutoCloseable {
    // onlyFiles: the change-feed restriction — merge ONLY these committed
    // segments (one micro-batch's delta) instead of the whole bucket; LWW
    // and tombstone reconciliation then apply within the restricted set,
    // which is exactly the batch-local view a change feed emits.
    private val segs =
      (if (onlyFiles != null) onlyFiles else segmentFiles(tableDir, bucket))
        .map(new SegmentReader(_))
    if (counters != null) counters.segmentsRead += segs.size
    private val colSorted: Array[Array[Byte]] =
      if (colLookup == null) null
      else colLookup.toArray.sortWith((a, b) => Codecs.compareBytes(a, b) < 0)
    private val subSorted: Array[Array[Byte]] =
      if (subLookup == null) null
      else subLookup.toArray.sortWith((a, b) => Codecs.compareBytes(a, b) < 0)
    private val raw =
      if (lower == null && upper == null && lookupKeys == null &&
          colSorted == null && colWindow == null &&
          subSorted == null && subWindow == null) {
        val rs = segs.flatMap(_.runs())
        if (counters != null) counters.runsRead += rs.size
        rs
      } else segs.flatMap(
        _.rangeRuns(lower, upper, lookupKeys, counters, colSorted, colWindow,
          subSorted, subWindow))
    // snapshot read: cells written after the as-of bound never enter LWW
    // reconciliation, so the winner per address is the latest cell <= asOf.
    // TTL (table-level default_time_to_live): a live cell expires once
    // now >= ts + ttl; tombstones never expire (they must keep shadowing).
    // colLookup: the MULTI-POINT SLICE seek (pushed EqualTo/In on the
    // clustering column) — only cells whose column name is one of the
    // listed byte forms enter the merge at all, so a wide row's
    // non-matching cells are never merged, reconciled, buffered, or
    // decoded (reader memory drops from O(row width) to O(matches); the
    // cellsMerged metric counts matches, not the row width), and the
    // (key, col)-prefixed run-index entries let rangeRun skip whole index
    // spans' IO (cellsSeekSkipped counts them). Sound for
    // LWW/tombstone reconciliation because it is per-ADDRESS: every cell
    // of a matching (key, col) address is kept, every cell of a
    // non-matching one dropped — the kept addresses reconcile exactly as
    // in the full merge, and a tombstone for a matching column shares its
    // column bytes, so it is kept and keeps shadowing.
    private def setMatch(set: Array[Array[Byte]], b: Array[Byte]): Boolean = {
      if (b == null) return false
      var lo = 0
      var hi = set.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = Codecs.compareBytes(set(mid), b)
        if (c == 0) return true
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      false
    }
    private def inWindow(w: (Array[Byte], Array[Byte]), b: Array[Byte]): Boolean =
      b != null &&
        (w._1 == null || Codecs.compareBytes(w._1, b) <= 0) &&
        (w._2 == null || Codecs.compareBytes(b, w._2) <= 0)
    // subLookup/subWindow: the `:subcolumn` twins of colLookup/colWindow —
    // cells whose sub bytes miss the pushed point set / byte window never
    // enter the merge (a null sub fails both, matching SQL NULL comparison
    // semantics downstream). Per-ADDRESS sound exactly like the col twins:
    // a tombstone for a wanted (key, col, sub) shares its sub bytes, so it
    // is kept and keeps shadowing.
    private def prune(it: Iterator[Cell]): Iterator[Cell] = {
      val w0 = if (colWindow == null) it else it.filter(c => inWindow(colWindow, c.col))
      val a0 = if (colSorted == null) w0 else w0.filter(c => setMatch(colSorted, c.col))
      val s0 = if (subWindow == null) a0 else a0.filter(c => inWindow(subWindow, c.sub))
      val s1 = if (subSorted == null) s0 else s0.filter(c => setMatch(subSorted, c.sub))
      val a = if (asOf == Long.MaxValue) s1 else s1.filter(_.ts <= asOf)
      if (ttl <= 0L || now <= 0L) a
      else a.filter(c => c.tombstone || now < c.ts + ttl)
    }
    private val inner = new MergeIterator(raw.map(prune), dropTombstones = true,
      counterMerge = counterMerge, counters = counters)
    def hasNext: Boolean = inner.hasNext
    def next(): Cell = inner.next()
    def close(): Unit = segs.foreach(_.close())
  }

  /** Task-local compaction: rewrite a multi-run segment as a single sorted
    * run (streaming merge — memory stays O(runs), not O(cells)). Runs at
    * DataWriter.commit, so every COMMITTED segment holds exactly one run and
    * a bucket read needs one cursor per segment. Tombstones survive (they
    * shadow cells in other segments); duplicate addresses within the segment
    * reconcile here — LWW is associative, so merging a subset first yields
    * the same winner the full merge would. */
  def compactSegment(file: Path): Unit = {
    if (runOffsets(file).size <= 1) return
    // counter tables skip segment-scope collapse: LWW would EAT increments,
    // and a partial counter collapse can't preserve a tombstone alongside
    // the newer increments it must not absorb. Full-bucket compaction (all
    // segments, whole groups visible) is the collapse point for counters.
    if (counterMergeEnabled(file.getParent.getParent.toString)) return
    val tmp = file.resolveSibling(file.getFileName.toString + ".compact")
    val reader = new SegmentReader(file)
    try {
      writeSingleRun(tmp, new MergeIterator(reader.runs(), dropTombstones = false))
    } finally reader.close()
    Files.move(tmp, file, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Make staged segments visible with a MONOTONE commit stamp: every new
    * segment's mtime is strictly above every already-visible segment's
    * (and at least the wall clock), then the atomic rename publishes it.
    * The mtime is the change feed's admission-order authority — stamping
    * makes cross-epoch commit order exact even when two commits land
    * within one clock millisecond, where raw rename times would tie and
    * fall back to (order-meaningless) name comparison. Files of ONE commit
    * share one stamp (one epoch — intra-commit order is meaningless by
    * construction). Single-maintainer discipline means no racing
    * committers per table; a reader's (path, size, mtime) cache keys see
    * only the final stamped value because the stamp lands BEFORE the
    * rename. */
  def commitSegments(tableDir: String, staged: Seq[(Path, String)]): Unit = {
    if (staged.isEmpty) return
    val sst = Paths.get(tableDir, SstDir)
    val floor = allSegmentFiles(tableDir).values.flatten.foldLeft(0L) { (m, p) =>
      math.max(m, try Files.getLastModifiedTime(p).toMillis
        catch { case _: java.io.IOException => 0L })
    }
    val stamp = java.nio.file.attribute.FileTime.fromMillis(
      math.max(System.currentTimeMillis(), floor + 1))
    staged.foreach { case (tmp, _) => Files.setLastModifiedTime(tmp, stamp) }
    staged.foreach { case (tmp, name) =>
      Files.move(tmp, sst.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def segmentFiles(tableDir: String, bucket: Int): Seq[Path] = {
    val d = Paths.get(tableDir, SstDir)
    if (!Files.isDirectory(d)) return Nil
    val prefix = s"b$bucket-"
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      // committed segments are exactly `b<bucket>-<uuid>.bin`: the suffix
      // requirement makes EVERY staging convention (tmp- prefix or any
      // extra suffix) invisible to readers, not just the ones we know about
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.startsWith(prefix) && n.endsWith(".bin")
      }.toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  /** Every segment file grouped by bucket, from ONE directory listing — the
    * planning path (stats + bucket pruning + partition planning) shares a
    * single walk instead of listing per bucket per step; at many-segment
    * scale the listing itself is the driver-side cost. */
  def allSegmentFiles(tableDir: String): Map[Int, Seq[Path]] = {
    val d = Paths.get(tableDir, SstDir)
    if (!Files.isDirectory(d)) return Map.empty
    val Name = "b(\\d+)-.*\\.bin".r // same committed-name contract as segmentFiles
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case Name(b) => Some(b.toInt -> p)
          case _ => None
        }
      }.toSeq.groupMap(_._1)(_._2)
        .view.mapValues(_.sortBy(_.getFileName.toString)).toMap
    } finally s.close()
  }

  /** All live cells of one bucket after last-write-wins reconciliation, in
    * address order — materialized convenience over [[BucketMergeIterator]]
    * for tests and tooling; the scan itself streams. */
  def mergedBucket(tableDir: String, bucket: Int): Seq[Cell] = {
    val it = new BucketMergeIterator(tableDir, bucket)
    try it.toSeq finally it.close()
  }

  /** Timestamp reconciliation; ties break on value bytes then liveness,
    * deterministically (Cassandra breaks ts ties on value comparison). */
  private def newerThan(a: Cell, b: Cell): Boolean =
    if (a.ts != b.ts) a.ts > b.ts
    else if (a.tombstone != b.tombstone) a.tombstone
    else Codecs.compareBytes(
      if (a.value == null) Array.emptyByteArray else a.value,
      if (b.value == null) Array.emptyByteArray else b.value) > 0

  // ---- meta.json ----

  final case class Meta(schemaDdl: String, mapping: String, properties: Map[String, String])

  def writeMeta(tableDir: String, meta: Meta): Unit = {
    Files.createDirectories(Paths.get(tableDir, SstDir))
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val props = meta.properties.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val json = s"""{"schema": ${q(meta.schemaDdl)}, "mapping": ${q(meta.mapping)}, "properties": $props}"""
    Files.write(Paths.get(tableDir, MetaFile), json.getBytes(UTF_8))
  }

  def readMeta(tableDir: String): Option[Meta] = {
    val p = Paths.get(tableDir, MetaFile)
    if (!Files.exists(p)) return None
    val json = new String(Files.readAllBytes(p), UTF_8)
    // Minimal JSON object parser for the flat shape written above.
    def unq(s: String): String = {
      val b = new StringBuilder; var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' =>
            s.charAt(i + 1) match {
              case 'n' => b.append('\n'); i += 2
              case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
              case c => b.append(c); i += 2
            }
          case c => b.append(c); i += 1
        }
      }
      b.toString
    }
    val strLit = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
    def field(name: String): String = {
      val m = (s""""$name"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
        .findFirstMatchIn(json).getOrElse(
          throw new IllegalStateException(s"meta.json missing $name"))
      unq(m.group(1))
    }
    val propsJson = json.substring(json.indexOf("\"properties\""))
    val props = strLit.findAllMatchIn(propsJson).map(m => unq(m.group(1)))
      .toSeq.drop(1).grouped(2).collect { case Seq(k, v) => k -> v }.toMap
    Some(Meta(field("schema"), field("mapping"), props))
  }

  /** Full-bucket compaction (maintenance): merge every segment of a bucket
    * into one single-run segment. Because ALL segments participate, nothing
    * older can remain shadowed, so tombstones are dropped here — the LSM
    * answer to unbounded segment growth under many append jobs (each job's
    * tasks add one segment per touched bucket). Single-maintainer discipline:
    * concurrent readers keep their already-open channels (files are deleted
    * only after the replacement is visible), but concurrent writers must be
    * quiesced, as with any compaction. */
  def compactBucket(tableDir: String, bucket: Int): Unit = {
    val files = segmentFiles(tableDir, bucket)
    if (files.size <= 1 && files.forall(runOffsets(_).size <= 1)) return
    val readers = files.map(new SegmentReader(_))
    try {
      // counter tables collapse increment history here — ALL segments
      // participate, so every address group is complete and the summed
      // cell is exact (the segment-scope path must not do this)
      val merged = new MergeIterator(readers.flatMap(_.runs()),
        dropTombstones = true, counterMerge = counterMergeEnabled(tableDir))
      val target = Paths.get(tableDir, SstDir, newSegmentName(bucket))
      // stage under the writer's `tmp-` convention: a `b<bucket>-…` name
      // (even with an extra suffix) matches segmentFiles' prefix filter, so
      // a crash between write and move would leave a truncated file every
      // later scan opens as a real segment — the same trap the advisor
      // caught in deleteWhere's old `.tmp` staging
      val tmp = target.resolveSibling(
        s"tmp-compact-${UUID.randomUUID()}-b$bucket.bin")
      writeSingleRun(tmp, merged)
      // provenance sidecar BEFORE the segment becomes visible: a compacted
      // segment carries no information beyond its inputs (merge only
      // shadows and drops), so a change feed that has consumed every input
      // can mark the output consumed WITHOUT re-emitting the bucket — the
      // feed-aware compaction contract (see CellChangeFeedStream). A crash
      // between the two writes leaves an orphan sidecar, which nothing
      // reads (readers key off the segment name).
      Files.write(provFile(target),
        files.map(_.getFileName.toString).sorted.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      commitSegments(tableDir, Seq(tmp -> target.getFileName.toString))
    } finally readers.foreach(_.close())
    files.foreach { f =>
      Files.deleteIfExists(f)
      Files.deleteIfExists(provFile(f)) // an input may itself be a compaction output
    }
    // refresh the bucket-stat sidecar to the post-compaction listing —
    // compaction is exactly when a bucket becomes single-run and every
    // metadata fast path starts to qualify
    writeBucketStats(tableDir, bucket)
  }

  /** Compaction-provenance sidecar of a committed segment: the input
    * segment names its merge consumed, one per line. Not a `.bin`, so
    * invisible to every segment listing. */
  def provFile(segment: Path): Path =
    segment.resolveSibling(segment.getFileName.toString + ".prov")

  /** Input names recorded for a compacted segment; None = not a compaction
    * output (or written before provenance existed — treated as fresh data,
    * the safe direction). */
  def provenance(tableDir: String, segmentName: String): Option[Set[String]] = {
    val p = Paths.get(tableDir, SstDir, segmentName + ".prov")
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).toSet)
  }

  /** Long-counting wrapper: DataOutputStream.size() is an Int, which
    * overflows on multi-GB compacted runs. */
  private final class CountingOutputStream(os: OutputStream) extends OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { os.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      os.write(b, off, len); count += len
    }
    override def flush(): Unit = os.flush()
    override def close(): Unit = os.close()
  }

  /** Stream an already-sorted cell sequence into `target` as ONE run in the
    * same `[count][payloadLen][idxLen] payload index` layout [[writeRun]]
    * emits (the r4 regression was this writer lagging a format revision —
    * now both paths share the header/index shape and [[runInfos]] verifies
    * magic/version, so a future drift fails fast instead of corrupting).
    * The sparse index is accumulated while streaming — memory O(cells /
    * IndexEvery), never O(cells). */
  private def writeSingleRun(target: Path, cells: Iterator[Cell]): Unit = {
    val raf = new java.io.RandomAccessFile(target.toFile, "rw")
    try {
      raf.setLength(0L)
      raf.seek(SegmentHeaderLen + RunHeaderLen) // placeholder headers, patched below
      val counting = new CountingOutputStream(new BufferedOutputStream(
        java.nio.channels.Channels.newOutputStream(raf.getChannel), 1 << 16))
      val out = new DataOutputStream(counting)
      val entries = mutable.ArrayBuffer.empty[IndexEntry]
      val bloom = new KeyBloom.Builder
      val colBloom = new ColBloomBuilder
      val subBloom = new ColBloomBuilder
      var count = 0
      var lastKey: Array[Byte] = null
      var colMin: Array[Byte] = null
      var colMax: Array[Byte] = null
      var subMin: Array[Byte] = null
      var subMax: Array[Byte] = null
      var prevCol: Array[Byte] = null
      var prevSub: Array[Byte] = null
      var sawAddr = false
      var tombs = 0
      var dKeys = 0
      var dAddrs = 0
      // KPFX/VSUM prefix tails, accumulated streaming exactly as in
      // [[writeRun]] — compaction's merged runs must keep the positional
      // machinery or every compacted store would decline to the fold
      val kPrefix = mutable.ArrayBuffer.empty[Int]
      val kStart = mutable.ArrayBuffer.empty[Boolean]
      val vPrefix = mutable.ArrayBuffer.empty[Long]
      val vals = new ValueTailBuilder
      val colVals = new ColValTailBuilder
      var tsMin = Long.MaxValue
      var tsMax = Long.MinValue
      cells.foreach { c =>
        val newKey = lastKey == null || !java.util.Arrays.equals(lastKey, c.key)
        if (count % IndexEvery == 0) {
          entries += IndexEntry(count, counting.count, c.key, c.col, c.sub)
          kPrefix += dKeys
          kStart += newKey
          vPrefix += vals.sum
          vals.startSpan()
          colVals.startSpan()
        }
        if (newKey) { bloom.add(c.key); dKeys += 1 }
        if (newKey || !sawAddr || !eqNullable(prevCol, c.col) ||
            !eqNullable(prevSub, c.sub)) dAddrs += 1
        prevCol = c.col; prevSub = c.sub; sawAddr = true
        if (c.tombstone) tombs += 1
        if (c.ts < tsMin) tsMin = c.ts
        if (c.ts > tsMax) tsMax = c.ts
        vals.add(c)
        colVals.add(c)
        colBloom.add(count, c.col)
        subBloom.add(count, c.sub)
        if (c.col != null) {
          if (colMin == null || Codecs.compareBytes(c.col, colMin) < 0) colMin = c.col
          if (colMax == null || Codecs.compareBytes(c.col, colMax) > 0) colMax = c.col
        }
        if (c.sub != null) {
          if (subMin == null || Codecs.compareBytes(c.sub, subMin) < 0) subMin = c.sub
          if (subMax == null || Codecs.compareBytes(c.sub, subMax) > 0) subMax = c.sub
        }
        writeCell(out, c)
        count += 1
        lastKey = c.key
      }
      val payloadLen = counting.count
      out.write(serializeIndex(entries.toSeq, lastKey, bloom.build(),
        colMin, colMax, colBloom.build(), subMin, subMax, subBloom.build(),
        tombs, dKeys, dAddrs,
        kPrefix.toArray, kStart.toArray,
        if (vals.sumOk) vPrefix.toArray else null,
        if (vals.sumOk) vals.sum else 0L,
        vals, colVals.result(), tsMin = tsMin, tsMax = tsMax))
      out.flush()
      val indexLen = (counting.count - payloadLen).toInt
      raf.seek(0L)
      raf.writeInt(SegmentMagic)
      raf.writeInt(FormatVersion)
      raf.writeInt(count)
      raf.writeLong(payloadLen)
      raf.writeInt(indexLen)
    } finally raf.close()
  }

  def dropTable(tableDir: String): Unit = {
    val root = Paths.get(tableDir)
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()
  }

  /** Drop every COMMITTED segment. Runs inside the overwrite job's commit,
    * AFTER tasks have staged their `tmp-*` files in the same directory —
    * those must survive (they are the overwrite's own data, renamed right
    * after this call), so only `b<bucket>-*.bin` committed names go. */
  def truncate(tableDir: String): Unit = {
    val sst = Paths.get(tableDir, SstDir)
    if (!Files.isDirectory(sst)) return
    import scala.jdk.CollectionConverters._
    val s = Files.list(sst)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("b"))
      .foreach(Files.delete)
    finally s.close()
    // bucket-stat sidecars describe the segments just removed; stale ones
    // would only cost a walk (listing mismatch) but clearing is cleaner
    val bs = Paths.get(tableDir, BucketStatsDir)
    if (Files.isDirectory(bs)) {
      val l = Files.list(bs)
      try l.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally l.close()
    }
  }

  def newSegmentName(bucket: Int): String = s"b$bucket-${UUID.randomUUID()}.bin"
}

/** Chunked per-key cell iteration — the wide-row paged scan (S4). The store
  * equivalent of the reference's slice paging over Thrift
  * (input/ColumnFamilyWideRowRecordReader.java:240-385): fetch `pageSize`
  * cells from a start column, advance the slice start past the last cell
  * seen, and trim the overlap of every subsequent page (the reference drops
  * the duplicate first COLUMN at :352-356 — for a super CF that unit is the
  * whole super column); terminate when a page comes back short, with a
  * no-progress guard (:319-322).
  *
  * `fetch(startCol, count)` models the remote call: it returns up to `count`
  * cells with col >= startCol (or <= for reversed order) in comparator order.
  * `order` compares two column names in SCAN order (negated comparator when
  * reversed) so the no-progress guard works in either direction.
  *
  * Paging tracks the full cell ADDRESS (col, sub), not the column alone:
  * super-column cells share a column name across sub-cells, so a page
  * boundary can fall mid-column-group. The col-only form either replayed
  * the group's remainder or tripped the no-progress guard and silently
  * truncated the row at one page — invisible until a row outgrew a single
  * page (the sf1 super-pivot regression: every 6000-cell row read exactly
  * pageSize cells). When a single column group outgrows the page, the
  * re-fetch widens geometrically until it clears the group — the memory
  * bound is one column group, the same unit the reference materializes. */
final class WideRowIterator(
    fetch: (Array[Byte], Int) => Seq[Cell],
    pageSize: Int,
    order: (Array[Byte], Array[Byte]) => Int = Codecs.compareBytes) extends Iterator[Cell] {
  require(pageSize > 1, "pageSize must exceed 1 for paging to progress")
  private def nb(b: Array[Byte]): Array[Byte] =
    if (b == null) Array.emptyByteArray else b
  /** Scan-order comparison of a cell's address vs the last address seen. */
  private def addrCmp(c: Cell, col: Array[Byte], sub: Array[Byte]): Int = {
    val k = order(c.col, col)
    if (k != 0) k else order(nb(c.sub), nb(sub))
  }
  private var page: Seq[Cell] = fetch(null, pageSize)
  // a raw (untrimmed) page shorter than requested is the row's last page
  private var finalPage = page.length < pageSize
  private var idx = 0
  private var lastCol: Array[Byte] = _
  private var lastSub: Array[Byte] = _
  private var exhausted = page.isEmpty

  def hasNext: Boolean = {
    if (exhausted) return false
    if (idx < page.length) return true
    if (finalPage) { exhausted = true; return false }
    // next page re-slices from the last column seen (inclusive start on the
    // remote side) and trims every cell at or before the last ADDRESS —
    // widening the fetch when a whole column group was already consumed
    // (its cells all trim away and a same-size re-fetch could never
    // progress past a group larger than one page)
    var cnt = pageSize
    var np = fetch(lastCol, cnt)
    var fp = np.length < cnt
    var trimmed = np.dropWhile(c => addrCmp(c, lastCol, lastSub) <= 0)
    while (trimmed.isEmpty && !fp) {
      cnt *= 2
      np = fetch(lastCol, cnt)
      fp = np.length < cnt
      trimmed = np.dropWhile(c => addrCmp(c, lastCol, lastSub) <= 0)
    }
    finalPage = fp
    // no-progress guard: the page must advance strictly past the last
    // address seen, else a misbehaving fetch would replay cells forever
    // (reference guard: ColumnFamilyWideRowRecordReader.java:319-322)
    if (trimmed.isEmpty || addrCmp(trimmed.head, lastCol, lastSub) <= 0) {
      exhausted = true; return false
    }
    page = trimmed
    idx = 0
    true
  }

  def next(): Cell = {
    if (!hasNext) throw new NoSuchElementException
    val c = page(idx); idx += 1; lastCol = c.col; lastSub = c.sub; c
  }
}
