package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.cassandralike.{CellStore, Options, Seed}

/** Isolates the COMMIT-TIME cost of the bucket-stat sidecar refresh as
  * segments accumulate (SURVEY §7.4 r13 incremental-sidecar item):
  * `runMain graft.tools.SidecarRefreshProbe [sfDir] [epochs]`.
  *
  * Seeds a store WITHOUT `compact.segments.max` (segments grow with every
  * append — the posture where the pre-r13 refresh re-read every tail),
  * then appends E key-disjoint epochs, clearing the driver's planning
  * memos before each commit to emulate the production fleet (each writer
  * is a fresh JVM that holds no tails in memory). Two arms, interleaved
  * stores: the r13 INCREMENTAL refresh (per-file stats carried in the
  * sidecar) vs `-Dgraft.sidecar.incremental=false` (the pre-r13 full
  * re-read). Reports Σ commit-path tail reads (exactly the counter the
  * spec pins) and total append wall per arm: reads grow O(E) vs O(E²),
  * wall follows once tails outgrow the page cache. */
object SidecarRefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val epochs = args.lift(1).map(_.toInt).getOrElse(40)
    val cpus = math.max(4, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = Tables.load(spark, sfDir, "lineitem").select(
      lpad(col("l_orderkey").cast("string"), 10, "0").as("row_key"),
      lpad(col("l_linenumber").cast("string"), 4, "0").as("column_name"),
      (col("l_orderkey") % 97).cast("bigint").as("value"))
      .dropDuplicates("row_key", "column_name")
      .cache()
    val total = src.count()
    println(s"cells=$total epochs=$epochs")

    def run(arm: String, incremental: Boolean): Unit = {
      if (incremental) System.clearProperty("graft.sidecar.incremental")
      else System.setProperty("graft.sidecar.incremental", "false")
      val store = Seed.table(spark, sfDir, s"probe_sidecar_$arm",
        src.filter(col("row_key") < lit(f"${0}%010d")), // empty epoch 0
        mapping = Some(":key,:column,:value"),
        props = Map(Options.Buckets -> "2"))
      var reads = 0L
      var wall = 0.0
      var lastReads = 0L
      (1 to epochs).foreach { e =>
        // fresh-driver emulation: a production commit holds no memoized
        // tails from previous jobs
        CellStore.clearPlannerCaches()
        val slice = src.filter(
          abs(hash(col("row_key"))) % epochs === (e - 1))
        val r0 = CellStore.runTailReads.get()
        val t0 = System.nanoTime()
        Seed.append(slice.repartition(1), store,
          Map(Options.WriteTimestamp -> e.toString))
        wall += (System.nanoTime() - t0) / 1e9
        lastReads = CellStore.runTailReads.get() - r0
        reads += lastReads
      }
      val segs = CellStore.allSegmentFiles(store).values.map(_.size).sum
      println(f"$arm%-12s commits=$epochs segments=$segs " +
        f"tail_reads_total=$reads last_commit_reads=$lastReads " +
        f"append_wall=$wall%.2f s")
      System.clearProperty("graft.sidecar.incremental")
    }
    // interleaved, first round is JVM warm-up — read the second pair
    run("incr_warm", incremental = true)
    run("full_warm", incremental = false)
    run("incremental", incremental = true)
    run("full_reread", incremental = false)
    spark.stop()
  }
}
