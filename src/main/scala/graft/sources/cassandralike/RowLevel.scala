package graft.sources.cassandralike

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 row-level operations — SQL `UPDATE`, `MERGE INTO`, and DELETE with
  * arbitrary predicates — as DELTA operations, the natural fit for an LSM
  * store: an update is just newer cells, a delete is tombstones; nothing is
  * copied or rewritten. (Copy-on-write "group" rewrites are the parquet
  * answer; a cell store already IS a merge-on-read structure.)
  *
  * Shape at scale: Spark plans the affected-row scan through the normal
  * pushdown-capable scan (filters prune buckets/segments/runs exactly like
  * any read), and the delta writer emits O(changed cells) — a MERGE that
  * touches 0.1% of a 100-TB store writes 0.1% worth of cells and zero
  * rewrite IO. Updates are represented as DELETE + INSERT
  * ([[CellRowLevelOperation.representUpdateAsDeleteAndInsert]]): the delete
  * leg tombstones every declared cell of the old row id and the insert leg
  * writes the new values — which makes key-changing UPDATEs and
  * set-to-NULL exact with one mechanism. The two legs land one logical
  * tick apart (tombstones at ts, inserts at ts+1) because same-timestamp
  * LWW ties break toward the tombstone — at equal ts the delete leg would
  * eat its own insert.
  *
  * Supported on regular (non-transposed) mappings without a `cf:` family
  * map and without counter merge: those three need a read to know which
  * cells exist, which breaks the write-only delta contract. (Key-predicate
  * DELETE keeps its metadata fast path via SupportsDelete —
  * OptimizeMetadataOnlyDeleteFromTable picks it when the predicate
  * qualifies; everything else now runs as a distributed delta job instead
  * of failing.) */
final class CellRowLevelOperation(
    table: CassandraLikeTable,
    info: RowLevelOperationInfo) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command()

  override def description(): String =
    s"cassandralike delta ${info.command()} ${table.dir}"

  /** The affected-row scan is the ordinary pushdown-capable scan. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)

  /** The row identity is the full cell ADDRESS: the key alone on regular
    * mappings (one SQL row = one storage row), (key, column[, sub]) on
    * transposed ones (one SQL row = one cell — Cassandra's native
    * single-cell UPDATE/DELETE shape). */
  override def rowId(): Array[NamedReference] =
    CellRowLevelOperation.rowIdFields(table.mapping)
      .map(f => Expressions.column(f.name)).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = {
          import scala.jdk.CollectionConverters._
          val merged = table.withConfOverrides(
            info.options().asCaseSensitiveMap().asScala.toMap)
          new CellDeltaBatchWrite(table, merged)
        }
      }
    }
}

object CellRowLevelOperation {
  /** Row-id columns in the order Spark projects them into id rows. */
  def rowIdFields(mapping: ColumnMapping): Seq[MappedField] =
    if (!mapping.transposed) Seq(mapping.keyField)
    else {
      val sub =
        if (mapping.hasSubColumn) Seq(mapping.field(FieldRole.TransSubColumn))
        else Nil
      mapping.keyField +: mapping.field(FieldRole.TransColumn) +: sub
    }
}

final class CellDeltaBatchWrite(
    table: CassandraLikeTable,
    options: Map[String, String]) extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    CellDeltaWriterFactory(CellCommit.writerFactory(table,
      // set-to-NULL must clear the old cell: the insert leg writes rows
      // whose null columns become tombstones instead of absent cells
      options + (Options.NullsAsTombstones -> "true")))

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    CellCommit.commitEpoch(table, options, truncate = false, messages)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CellCommit.abortEpoch(table, messages)
}

final case class CellDeltaWriterFactory(factory: CellWriterFactory)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new CellDeltaWriter(
      factory.createWriter(partitionId, taskId).asInstanceOf[CellDataWriter],
      ColumnMapping(factory.mappedFields))
}

/** Delta writer over the ordinary cell writer: inserts write cells one
  * logical tick ABOVE the epoch timestamp, deletes tombstone the row id's
  * cells at the epoch timestamp — every declared cell of the key on
  * regular mappings, exactly the addressed cell on transposed ones — so a
  * delete+insert update pair reconciles to the inserted values, while
  * plain deletes still shadow everything older. update() is never called
  * (representUpdateAsDeleteAndInsert). */
final class CellDeltaWriter(inner: CellDataWriter, mapping: ColumnMapping)
  extends DeltaWriter[InternalRow] {

  private val idTypes =
    CellRowLevelOperation.rowIdFields(mapping).map(_.dataType)

  override def insert(row: InternalRow): Unit = inner.writeAt(row, inner.baseTs + 1)

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    if (!mapping.transposed) inner.writeDeleteAll(id.get(0, idTypes(0)))
    else inner.writeDeleteCell(
      id.get(0, idTypes(0)),
      id.get(1, idTypes(1)),
      if (idTypes.length > 2) id.get(2, idTypes(2)) else null)

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException(
      "updates are represented as delete+insert") // representUpdateAsDeleteAndInsert

  override def commit(): WriterCommitMessage = inner.commit()
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}
