package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.cassandralike.{CellStore, Options, Seed}

/** Measures COLD-DRIVER complete-aggregate planning with the per-bucket
  * STAT sidecars against the full index-tail walk on the same store:
  * `runMain graft.tools.SidecarProbe <sfDir> [buckets]`.
  *
  * Seeds a transposed lineitem store across `buckets` (default 512 — the
  * shape where per-bucket planning IO starts to matter), then times
  * `count(*) + sum(value) + min(key)` collect()s with the planner memos
  * cleared before every run ([[CellStore.clearPlannerCaches]] — each run
  * replays a fresh driver): once with the sidecars in place (reads
  * O(buckets) fixed-size records) and once with them deleted (walks every
  * segment's full index tails, blooms included). Also reports the byte
  * totals each mode reads. Min-of-5, interleaved. */
object SidecarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = if (args.length > 1) args(1).toInt else 512
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
      (col("l_orderkey") % 97 * 100 + col("l_linenumber")).cast("bigint")
        .as("value"))
      .dropDuplicates("row_key", "column_name")
    val store = Seed.table(spark, sfDir, s"sidecar_probe_$buckets", src,
      props = Map(Options.Buckets -> buckets.toString),
      mapping = Some(":key,:column,:value"))
    // compact to the steady state (one run per bucket): multi-task seeding
    // leaves overlapping per-task segments, where the complete path
    // correctly declines and BOTH arms would just measure the fold
    (0 until buckets).foreach(b => CellStore.compactBucket(store, b))
    val bsDir = java.nio.file.Paths.get(store, CellStore.BucketStatsDir)
    import scala.jdk.CollectionConverters._
    def listSidecars(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(bsDir)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val sidecarBytes = listSidecars().map(java.nio.file.Files.size).sum
    val segs = CellStore.allSegmentFiles(store)
    val tailBytes = segs.values.flatten
      .flatMap(CellStore.runInfos(_)).map(_.indexByteLen.toLong).sum
    // stash the sidecars so the walk arm can run without them, restorably
    val stash = java.nio.file.Files.createTempDirectory("sidecar_stash")
    def hideSidecars(): Unit = listSidecars().foreach(p =>
      java.nio.file.Files.move(p, stash.resolve(p.getFileName)))
    def restoreSidecars(): Unit = {
      val s = java.nio.file.Files.list(stash)
      try s.iterator().asScala.foreach(p =>
        java.nio.file.Files.move(p, bsDir.resolve(p.getFileName)))
      finally s.close()
    }
    def run(): (Double, Long) = {
      CellStore.clearPlannerCaches() // replay a cold driver
      val t0 = System.nanoTime()
      val r = Seed.read(spark, store)
        .agg(count(lit(1)), sum("value"), min("row_key"))
        .collect()(0)
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }
    run() // warm Spark itself (JIT, codegen) — planner memos still cleared per run
    val withS = collection.mutable.ArrayBuffer.empty[Double]
    val without = collection.mutable.ArrayBuffer.empty[Double]
    var rows = 0L
    (1 to 5).foreach { _ =>
      val w0 = CellStore.bucketStatWalks.get()
      val (t1, n1) = run()
      require(CellStore.bucketStatWalks.get() == w0, "sidecar arm walked")
      hideSidecars()
      val (t2, n2) = run()
      restoreSidecars()
      require(n1 == n2, s"arms disagree: $n1 vs $n2")
      rows = n1; withS += t1; without += t2
    }
    println(f"buckets=$buckets segments=${segs.values.map(_.size).sum} rows=$rows")
    println(f"sidecar_bytes=$sidecarBytes tail_bytes=$tailBytes " +
      f"(${tailBytes.toDouble / math.max(1L, sidecarBytes)}%.1fx)")
    println(f"plan_sidecar_min=${withS.min}%.3f plan_walk_min=${without.min}%.3f " +
      f"ratio=${without.min / withS.min}%.1f")
    spark.stop()
  }
}
