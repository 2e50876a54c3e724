package graft.sources.cassandralike

import java.io._
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
  */
object CellStore {
  val MetaFile = "meta.json"
  val SstDir = "sst"

  // ---- segment file format: length-prefixed cells, one stream per bucket ----

  def writeCell(out: DataOutputStream, c: Cell): Unit = {
    writeBytes(out, c.key)
    writeBytes(out, c.col)
    writeBytes(out, c.sub)
    writeBytes(out, c.value)
    out.writeLong(c.ts)
    out.writeBoolean(c.tombstone)
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }

  def readSegment(file: Path): Iterator[Cell] = {
    val in = new DataInputStream(new BufferedInputStream(
      Files.newInputStream(file), 1 << 16))
    new Iterator[Cell] {
      private var nextCell: Cell = advance()
      private def advance(): Cell =
        try Cell(readBytes(in), readBytes(in), readBytes(in), readBytes(in),
          in.readLong(), in.readBoolean())
        catch { case _: EOFException => in.close(); null }
      def hasNext: Boolean = nextCell != null
      def next(): Cell = { val c = nextCell; nextCell = advance(); c }
    }
  }

  def segmentFiles(tableDir: String, bucket: Int): Seq[Path] = {
    val d = Paths.get(tableDir, SstDir)
    if (!Files.isDirectory(d)) return Nil
    val prefix = s"b$bucket-"
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.startsWith(prefix))
        .toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  /** All live cells of one bucket after last-write-wins reconciliation,
    * ordered by (key unsigned-bytes, col, sub). Tombstoned cells are dropped
    * here — the scan-level filter (input/CassandraHiveRecordReader.java:
    * 205-207). Per-bucket memory is bounded by the split size, the same
    * bound the reference's 64Ki-row splits impose; the 100-TB path swaps
    * this for a k-way streaming merge over sorted segments with identical
    * semantics. */
  def mergedBucket(tableDir: String, bucket: Int): Seq[Cell] = {
    val best = new mutable.HashMap[CellKey, Cell]()
    for (f <- segmentFiles(tableDir, bucket); c <- readSegment(f)) {
      val k = CellKey(c.key, c.col, c.sub)
      best.get(k) match {
        case Some(prev) if !newerThan(c, prev) => ()
        case _ => best.update(k, c)
      }
    }
    best.values.filterNot(_.tombstone).toSeq.sortWith { (a, b) =>
      val k = Codecs.compareBytes(a.key, b.key)
      if (k != 0) k < 0
      else {
        val c = Codecs.compareBytes(a.col, b.col)
        if (c != 0) c < 0
        else Codecs.compareBytes(
          if (a.sub == null) Array.emptyByteArray else a.sub,
          if (b.sub == null) Array.emptyByteArray else b.sub) < 0
      }
    }
  }

  /** Timestamp reconciliation; ties break on value bytes then liveness,
    * deterministically (Cassandra breaks ts ties on value comparison). */
  private def newerThan(a: Cell, b: Cell): Boolean =
    if (a.ts != b.ts) a.ts > b.ts
    else if (a.tombstone != b.tombstone) a.tombstone
    else Codecs.compareBytes(
      if (a.value == null) Array.emptyByteArray else a.value,
      if (b.value == null) Array.emptyByteArray else b.value) > 0

  private final case class CellKey(key: Array[Byte], col: Array[Byte], sub: Array[Byte]) {
    override val hashCode: Int = {
      var h = java.util.Arrays.hashCode(key) * 31 + java.util.Arrays.hashCode(col)
      h = h * 31 + (if (sub == null) 0 else java.util.Arrays.hashCode(sub))
      h
    }
    override def equals(o: Any): Boolean = o match {
      case that: CellKey =>
        java.util.Arrays.equals(key, that.key) &&
          java.util.Arrays.equals(col, that.col) &&
          ((sub == null && that.sub == null) ||
            (sub != null && that.sub != null && java.util.Arrays.equals(sub, that.sub)))
      case _ => false
    }
  }

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

  def dropTable(tableDir: String): Unit = {
    val root = Paths.get(tableDir)
    if (!Files.exists(root)) return
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()
  }

  def truncate(tableDir: String): Unit = {
    val sst = Paths.get(tableDir, SstDir)
    if (!Files.isDirectory(sst)) return
    import scala.jdk.CollectionConverters._
    val s = Files.list(sst)
    try s.iterator().asScala.foreach(Files.delete) finally s.close()
  }

  def newSegmentName(bucket: Int): String = s"b$bucket-${UUID.randomUUID()}.bin"
}

/** Chunked per-key cell iteration — the wide-row paged scan (S4). The store
  * equivalent of the reference's slice paging over Thrift
  * (input/ColumnFamilyWideRowRecordReader.java:240-385): fetch `pageSize`
  * cells from a start column, advance the slice start to the last column
  * seen, and trim the overlapping first cell of every subsequent page
  * (the reference drops the duplicate at :352-356); terminate when a page
  * comes back short, with a no-progress guard (:319-322).
  *
  * `fetch(startCol, count)` models the remote call: it returns up to `count`
  * cells with col >= startCol (or <= for reversed order) in comparator order.
  * `order` compares two column names in SCAN order (negated comparator when
  * reversed) so the no-progress guard works in either direction.
  */
final class WideRowIterator(
    fetch: (Array[Byte], Int) => Seq[Cell],
    pageSize: Int,
    order: (Array[Byte], Array[Byte]) => Int = Codecs.compareBytes) extends Iterator[Cell] {
  require(pageSize > 1, "pageSize must exceed 1 for paging to progress")
  private var page: Seq[Cell] = fetch(null, pageSize)
  // a raw (untrimmed) page shorter than requested is the row's last page
  private var finalPage = page.length < pageSize
  private var idx = 0
  private var lastCol: Array[Byte] = _
  private var exhausted = page.isEmpty

  def hasNext: Boolean = {
    if (exhausted) return false
    if (idx < page.length) return true
    if (finalPage) { exhausted = true; return false }
    // next page re-slices from the last column seen (inclusive start on the
    // remote side) and trims the overlap
    val np = fetch(lastCol, pageSize)
    finalPage = np.length < pageSize
    val trimmed =
      if (np.nonEmpty && java.util.Arrays.equals(np.head.col, lastCol)) np.tail
      else np
    // no-progress guard: the page must advance strictly past the last column
    // seen, else a misbehaving fetch would replay cells forever
    // (reference guard: ColumnFamilyWideRowRecordReader.java:319-322)
    if (trimmed.isEmpty || order(trimmed.head.col, lastCol) <= 0) {
      exhausted = true; return false
    }
    page = trimmed
    idx = 0
    true
  }

  def next(): Cell = {
    if (!hasNext) throw new NoSuchElementException
    val c = page(idx); idx += 1; lastCol = c.col; c
  }
}
