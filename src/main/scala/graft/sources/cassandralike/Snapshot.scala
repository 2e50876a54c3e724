package graft.sources.cassandralike

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Consistent snapshot EXPORT to parquet and RESTORE into a fresh store —
  * the backup / data-lake-export path.
  *
  * Export reads the store through the normal DSv2 scan pinned `read.asof`
  * a timestamp: segments are immutable once visible and LWW/tombstone
  * reconciliation at a fixed as-of is deterministic, so the image is
  * consistent even while writers keep appending — new segments carry later
  * write timestamps and fall outside the pinned view. The store's meta
  * (schema DDL, mapping, table properties) travels as a manifest under
  * `_snapshot/` next to the parquet (underscore-prefixed, so parquet
  * listings ignore it), and a restore recreates the SAME physical layout
  * (buckets, mapping, encoding, index columns) — storage-partitioned joins
  * and co-bucketed writes against the restored store behave exactly as
  * against the original.
  *
  * Both directions are distributed jobs (DSv2 scan → parquet write;
  * parquet scan → DSv2 write) — nothing is collected on the driver.
  */
object Snapshot {

  private def manifestDir(parquetDir: String): String = s"$parquetDir/_snapshot"

  /** Export the store's `asOf` image to `parquetDir` (parquet + manifest).
    * `asOf = Long.MaxValue` snapshots the current state. */
  def export(spark: SparkSession, storeDir: String, asOf: Long,
      parquetDir: String): Unit = {
    val meta = CellStore.readMeta(storeDir).getOrElse(
      throw new IllegalArgumentException(s"no cassandralike table at $storeDir"))
    Seed.read(spark, storeDir, Map(Options.ReadAsOf -> asOf.toString))
      .write.mode("overwrite").parquet(parquetDir)
    CellStore.writeMeta(manifestDir(parquetDir), meta.copy(
      properties = meta.properties + ("snapshot.asof" -> asOf.toString)))
  }

  /** Restore an exported snapshot into a fresh store at `newStoreDir`,
    * recreating the original layout from the manifest. The restored rows
    * are written at one pinned logical timestamp (the snapshot is a
    * consistent image — original per-cell timestamps are reconciliation
    * history, not data). */
  def restore(spark: SparkSession, parquetDir: String, newStoreDir: String): Unit = {
    val meta = CellStore.readMeta(manifestDir(parquetDir)).getOrElse(
      throw new IllegalArgumentException(s"no snapshot manifest in $parquetDir"))
    CellStore.dropTable(newStoreDir)
    CellStore.writeMeta(newStoreDir,
      meta.copy(properties = meta.properties - "snapshot.asof"))
    Seed.append(
      spark.read.schema(StructType.fromDDL(meta.schemaDdl)).parquet(parquetDir),
      newStoreDir)
  }
}
