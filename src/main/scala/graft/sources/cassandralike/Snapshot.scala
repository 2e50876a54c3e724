package graft.sources.cassandralike

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** CDC between two snapshots: every row whose reconciled state differs
    * between `asOfOld` and `asOfNew`, classified `insert` / `update` /
    * `delete`, with the non-key columns surfaced as `old_*` / `new_*`.
    *
    * Shape at scale: BOTH sides are as-of scans of the SAME store reporting
    * their token-bucket layout, so the full-outer key join is a
    * storage-partitioned join — per-bucket, ZERO exchange on either side
    * (plan-asserted). Diffing a 100-TB store moves no rows across the
    * network; each bucket's task reads its own two images and joins
    * locally. Presence markers (not value-nullness) drive classification,
    * so a live row whose cells are all NULL still diffs correctly. */
  def diff(spark: SparkSession, storeDir: String,
      asOfOld: Long, asOfNew: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val meta = CellStore.readMeta(storeDir).getOrElse(
      throw new IllegalArgumentException(s"no cassandralike table at $storeDir"))
    val schema = StructType.fromDDL(meta.schemaDdl)
    val keyName = ColumnMapping.parse(meta.mapping, schema).keyField.name
    val valueCols = schema.fieldNames.filterNot(_ == keyName).toSeq
    // The as-of scans must resolve through a catalog: the reported
    // KeyGroupedPartitioning's bucket transform binds via the catalog's
    // FunctionCatalog, and a bare path read (format().load()) has none —
    // Spark then degrades both sides to UnknownPartitioning and plants two
    // full-image hash exchanges. One catalog per parent directory (name
    // derived from a SHA-256 prefix of the normalized path — catalog
    // instances are cached by name, so a fixed name would pin the FIRST
    // warehouse it ever saw, and a weak 32-bit hash could collide two
    // different warehouses onto one cached catalog, silently diffing the
    // wrong store). NOTE: the registration is session-global state — the
    // two conf keys stay set after diff returns (the returned DataFrame's
    // scans keep resolving through them lazily); names are deterministic
    // per path, so repeated diffs of the same store reuse one registration
    // rather than accumulating.
    val path = java.nio.file.Paths.get(storeDir).toAbsolutePath.normalize()
    val parent = path.getParent.toString
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(parent.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cat = "cassandralike_diff_" +
      digest.take(8).map(b => f"$b%02x").mkString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[CassandraLikeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", parent)
    def side(asOf: Long, pre: String, marker: String) =
      spark.read
        .option(Options.ReadAsOf, asOf.toString)
        .option(Options.ReportPartitioning, "true")
        .table(s"$cat.`${path.getFileName.toString}`")
        .select(col(keyName) +: valueCols.map(c => col(c).as(s"$pre$c")): _*)
        .withColumn(marker, lit(true))
    val o = side(asOfOld, "old_", "_old_p")
    val n = side(asOfNew, "new_", "_new_p")
    val changed =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c => !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    o.join(n, Seq(keyName), "full_outer")
      .withColumn("change",
        when(col("_old_p").isNull, lit("insert"))
          .when(col("_new_p").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change").isNotNull)
      .drop("_old_p", "_new_p")
  }
}
