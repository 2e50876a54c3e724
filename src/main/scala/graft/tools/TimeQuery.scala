package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one judged query N times: `runMain graft.tools.TimeQuery <name> [n]`.
  * Same session shape as Bench; prints per-run wall-clock. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    (0 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = q(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name run$i ($rows rows): $sec%.3f s" +
        (if (i == 0) " (warmup)" else ""))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
