package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.cassandralike.{Options, Seed}

/** Measures the metadata-only aggregate path against its cell-fold
  * fallback on the SAME seeded store:
  * `runMain graft.tools.MetaAggProbe <sfDir>`.
  *
  * Seeds a single-task (one commit-compacted run per bucket) store from
  * <table> (default customer) once, then times
  * `count(*) + min(key) + max(key)` two ways —
  * the plain read (metadata path: STAT index tails only) and a
  * `metadata.agg = false` read (same visible cells; the explicit escape
  * hatch forces the fold — the old asof=MaxValue trick now legitimately
  * keeps the fast paths, round 12). The delta is pure scan IO + decode;
  * min-of-5 each, interleaved. */
object MetaAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val table = if (args.length > 1) args(1) else "customer"
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
    val src = Tables.load(spark, sfDir, table)
    val Seq(keyCol, valCol) = src.columns.take(2).toSeq
    // ordered key encoding: numeric keys must be order-preserving for the
    // MIN/MAX half of the gate (string keys qualify under plain bytes)
    val props =
      if (src.schema.head.dataType == org.apache.spark.sql.types.StringType)
        Map.empty[String, String]
      else Map(Options.KeyEncoding -> "ordered")
    val store = Seed.table(spark, sfDir, s"meta_agg_probe_$table",
      src.select(col(keyCol), col(valCol)), props = props)
    // compact: the write's required key-hash distribution leaves every
    // bucket with one overlapping run per writer task (the honest LSM
    // ingest state, where the metadata count correctly declines);
    // compaction collapses each bucket to a single run — the steady state
    // an auto-compacted production store converges to, and the state the
    // metadata path is built for
    (0 until Options.DefaultBuckets).foreach(b =>
      graft.sources.cassandralike.CellStore.compactBucket(store, b))
    def run(opts: Map[String, String]): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Seed.read(spark, store, opts)
        .agg(count(lit(1)), min(keyCol), max(keyCol))
        .collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // prove the fast path engages: description flags eligibility and every
    // partition reader answers from metadata
    locally {
      val df = Seed.read(spark, store)
        .agg(count(lit(1)), min(keyCol), max(keyCol))
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collectFirst {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
          }.orNull
      }.filter(_ != null).head
      val d = scan.description()
      println(s"complete=${d.contains("AggStats: complete")} " +
        s"eligible=${d.contains("AggStats")}")
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
    // warm-up both paths once, then interleaved min-of-5
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
    println(f"rows=$rows metadata_min=${metas.min}%.4f fold_min=${folds.min}%.4f " +
      f"ratio=${folds.min / metas.min}%.1f")
    spark.stop()
  }
}
