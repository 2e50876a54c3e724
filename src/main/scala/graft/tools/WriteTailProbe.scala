package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.cassandralike.{CellStore, Options, Seed}

/** Isolates the WRITE-path cost of the optional index tails (COLS, CRNG,
  * CBBB, SRNG/SUBS/SBLM, KPFX, VSUM, STAT — everything after the key
  * bloom): `runMain graft.tools.WriteTailProbe <sfDir>` seeds the same
  * transposed lineitem DataFrame into a store repeatedly, interleaving
  * `-Dgraft.write.tails=true|false` (the writer knob CellStore honors),
  * and reports min-of-N wall time per arm plus the stores' index-byte
  * share — the isolated before/after VERDICT r10 #2 asked for, where the
  * ±15% sweep-bench jitter can't resolve it. A full-scan read of each
  * store is timed too (tails must never slow the read path — they only
  * ever remove IO). The input is cached and materialized first so both
  * arms time the write job alone. */
object WriteTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = sys.env.get("SPARK_GRAFT_TIME_RUNS").map(_.toInt).getOrElse(5)
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
      .cache()
    val cells = src.count() // materialize: both arms time the write only
    def seed(name: String, tails: Boolean): (Double, String) = {
      sys.props("graft.write.tails") = tails.toString
      val t0 = System.nanoTime()
      val store = Seed.table(spark, sfDir, name, src,
        mapping = Some(":key,:column,:value"))
      ((System.nanoTime() - t0) / 1e9, store)
    }
    def indexBytes(store: String): (Long, Long) = {
      val files = CellStore.allSegmentFiles(store).values.flatten.toSeq
      val total = files.map(java.nio.file.Files.size).sum
      val idx = files.flatMap(CellStore.runInfos(_)).map(_.indexByteLen.toLong).sum
      (idx, total)
    }
    def scanOnce(store: String): Double = {
      val t0 = System.nanoTime()
      Seed.read(spark, store).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up one seed per arm, then interleaved min-of-N; the finally
    // guarantees the process-global knob never outlives the probe — a seed
    // that throws must not leave the JVM silently writing tail-less runs
    val on = collection.mutable.ArrayBuffer.empty[Double]
    val off = collection.mutable.ArrayBuffer.empty[Double]
    var storeOn = ""; var storeOff = ""
    try {
      seed("wtp_warm_on", tails = true); seed("wtp_warm_off", tails = false)
      (1 to runs).foreach { i =>
        val (tOn, sOn) = seed(s"wtp_on_$i", tails = true)
        val (tOff, sOff) = seed(s"wtp_off_$i", tails = false)
        on += tOn; off += tOff; storeOn = sOn; storeOff = sOff
      }
    } finally sys.props.remove("graft.write.tails")
    val (idxOn, totOn) = indexBytes(storeOn)
    val (idxOff, totOff) = indexBytes(storeOff)
    scanOnce(storeOn); scanOnce(storeOff) // warm-up
    val scanOn = (1 to runs).map(_ => scanOnce(storeOn)).min
    val scanOff = (1 to runs).map(_ => scanOnce(storeOff)).min
    println(f"cells=$cells runs=$runs")
    println(f"write_tails_on  min=${on.min}%.2f runs=${on.map(t => f"$t%.2f").mkString(",")}")
    println(f"write_tails_off min=${off.min}%.2f runs=${off.map(t => f"$t%.2f").mkString(",")}")
    println(f"tail_cost=${(on.min / off.min - 1) * 100}%.1f%% of the write job")
    println(f"index_bytes_on=$idxOn/$totOn (${idxOn * 100.0 / totOn}%.1f%%) " +
      f"index_bytes_off=$idxOff/$totOff (${idxOff * 100.0 / totOff}%.1f%%)")
    println(f"scan_on=${scanOn}%.2f scan_off=${scanOff}%.2f")
    spark.stop()
  }
}
