package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.cassandralike.{Options, Seed}

/** Measures the RANGE-CONSTRAINED metadata COUNT against its seek-pruned
  * cell-fold fallback on the SAME seeded store:
  * `runMain graft.tools.RangeCountProbe <sfDir> [loKey] [hiKey]`.
  *
  * Seeds a transposed store from orders (one cell per unique order key),
  * compacts every bucket to the single-run steady state, then times
  * `count(*) WHERE key >= lo AND key < hi` two ways — the plain read
  * (range-count path: positional index arithmetic, boundary spans only)
  * and a `metadata.agg = false` read (same visible cells; the explicit
  * escape hatch forces the fold — the old asof=MaxValue trick now
  * legitimately keeps the fast paths, round 12). The delta is exactly the in-range decode the
  * positional count avoids; min-of-5 each, interleaved. */
object RangeCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val lo = if (args.length > 1) args(1) else "000000100000"
    val hi = if (args.length > 2) args(2) else "000005000000"
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
    val src = Tables.load(spark, sfDir, "orders").select(
      lpad(col("o_orderkey").cast("string"), 12, "0").as("row_key"),
      lit("o").as("column_name"),
      floor(col("o_totalprice")).cast("bigint").as("value"))
    val store = Seed.table(spark, sfDir, "range_count_probe", src,
      mapping = Some(":key,:column,:value"))
    (0 until Options.DefaultBuckets).foreach(b =>
      graft.sources.cassandralike.CellStore.compactBucket(store, b))
    def q(opts: Map[String, String]) =
      Seed.read(spark, store, opts)
        .filter(col("row_key") >= lo && col("row_key") < hi)
        .agg(count(lit(1)).as("n"))
    def run(opts: Map[String, String]): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = q(opts).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // prove the fast path engages on the plain read
    locally {
      val df = q(Map.empty)
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
          }.orNull
      }.filter(_ != null).head
      val d = scan.description()
      println(s"complete=${d.contains("AggStats: complete")} " +
        s"rangeCount=${d.contains("AggStats: range-count")}")
      val batch = scan.toBatch
      val parts = batch.planInputPartitions()
      val factory = batch.createReaderFactory()
      var statsOnly = 0L
      parts.foreach { pt =>
        val r = factory.createReader(pt)
        try { while (r.next()) r.get() } finally {
          r.currentMetricsValues().foreach(m =>
            if (m.name() == "partitionsStatsOnly") statsOnly += m.value())
          r.close()
        }
      }
      println(s"partitions=${parts.length} statsOnly=$statsOnly")
    }
    run(Map.empty); run(Map(Options.MetadataAgg -> "false"))
    val metas = collection.mutable.ArrayBuffer.empty[Double]
    val folds = collection.mutable.ArrayBuffer.empty[Double]
    var rows = 0L
    (1 to 5).foreach { _ =>
      val (tm, n1) = run(Map.empty)
      val (tf, n2) = run(Map(Options.MetadataAgg -> "false"))
      require(n1 == n2, s"paths disagree: $n1 vs $n2")
      rows = n1; metas += tm; folds += tf
    }
    println(f"rows_in_range=$rows metadata_min=${metas.min}%.4f " +
      f"fold_min=${folds.min}%.4f ratio=${folds.min / metas.min}%.1f")
    spark.stop()
  }
}
