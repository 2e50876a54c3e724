package graft.sources.cassandralike

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Helpers that materialize a parquet-test-table DataFrame INTO a
  * cassandralike cell store (through the real DSv2 write path) so judged
  * queries can read it back through the real DSv2 scan. Stores live under a
  * deterministic per-dataset root; seeding is idempotent (drop + rewrite)
  * and pinned to a fixed logical write timestamp so reruns are
  * byte-deterministic. */
object Seed {

  /** Seeded stores are run-scratch (dropped and rewritten by every seeding
    * query), so they live on the fastest local medium available: tmpfs when
    * present (measured 6-8x the sandbox's virtio-disk write bandwidth, and
    * immune to its latency stalls), plain /tmp otherwise — the same
    * placement rule the streaming checkpoints use (StreamOps). A production
    * deployment stores tables on provisioned storage, not here. */
  private val scratchRoot: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm)) "/dev/shm" else "/tmp"
  }

  def storeRoot(sfDir: String): String =
    s"$scratchRoot/graft_cellstore/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** (Re)create a cassandralike table at a deterministic dir and write `df`
    * into it. Returns the table dir. */
  def table(
      spark: SparkSession,
      sfDir: String,
      name: String,
      df: DataFrame,
      mapping: Option[String] = None,
      props: Map[String, String] = Map.empty,
      writeOptions: Map[String, String] = Map.empty): String = {
    val dir = s"${storeRoot(sfDir)}/$name"
    CellStore.dropTable(dir)
    val m = mapping.getOrElse(ColumnMapping.auto(df.schema))
    ColumnMapping.parse(m, df.schema) // validate before any IO
    CellStore.writeMeta(dir, CellStore.Meta(df.schema.toDDL, m, props))
    append(df, dir, writeOptions)
    dir
  }

  /** Append into an existing store through the DSv2 writer. */
  def append(df: DataFrame, dir: String, writeOptions: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format("cassandralike")
      .mode(SaveMode.Append)
      .option(Options.Path, dir)
      .option(Options.WriteTimestamp,
        writeOptions.getOrElse(Options.WriteTimestamp, "1"))
    writeOptions.foreach { case (k, v) => w = w.option(k, v) }
    w.save()
  }

  /** Read a cassandralike store back through the DSv2 scan. */
  def read(spark: SparkSession, dir: String, readOptions: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format("cassandralike").option(Options.Path, dir)
    readOptions.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
