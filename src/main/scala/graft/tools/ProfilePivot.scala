package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfilePivot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.cassandralike._
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $l%-24s ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
    val src = graft.Tables.load(spark, dir, "lineitem").select(
      lpad(col("l_orderkey").cast("string"), 10, "0").as("row_key"),
      lpad(col("l_linenumber").cast("string"), 4, "0").as("column_name"),
      col("l_quantity").cast("string").as("value"))
    (1 to 3).foreach { r =>
      val store = time(s"r$r seed (write)") { Seed.table(spark, dir, "transposed", src) }
      time(s"r$r plan+count") { println("  rows: " + Seed.read(spark, store).count()) }
      time(s"r$r full pivot+sort") {
        Seed.read(spark, store).select(col("row_key"), col("column_name"), col("value"))
          .orderBy(col("row_key"), col("column_name")).write.format("noop").mode("overwrite").save()
      }
      val segs = java.nio.file.Files.list(java.nio.file.Paths.get(store, "sst")).count()
      println(s"  segments: $segs")
    }
    spark.stop()
  }
}
