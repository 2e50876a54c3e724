package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing for the restructured minhash pipeline. */
object ProfileMinhash2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $l%-28s ${(System.nanoTime()-t0)/1e9}%.3f s"); r }

    val d = graft.Tables.load(spark, dir, "documents")
    (1 to 4).foreach { r =>
      spark.catalog.clearCache()
      val sig = d.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), expr(
          """minhash_signature_arr(transform(
            |  array_distinct(transform(sequence(1, size(w)-4),
            |                           i -> concat_ws(' ', slice(w, i, 5)))),
            |  s -> pmod(xxhash64(s), 1000000007L)))""".stripMargin).as("sig"))
      time(s"r$r sig only") { sig.write.format("noop").mode("overwrite").save() }
      val bands = sig.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 31), j -> xxhash64(slice(sig, j*4+1, 4), j))"))
        .as(Seq("band", "bh")))
      val cand = bands.as("x").join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val candP = time(s"r$r cand (sig+band+join)") {
        val c = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val cdocs = candP.select(col("doc_a").as("doc_id"))
        .union(candP.select(col("doc_b"))).distinct()
      val shc = d.join(broadcast(cdocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(w)-4), i -> concat_ws(' ', slice(w, i, 5))))"))
          .as("shingle"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"r$r shc restrict+explode") { shc.count() }
      time(s"r$r exact jaccard") {
        val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = shc.as("a")
          .join(shc.as("b"), col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("common"))
          .join(candP, Seq("doc_a", "doc_b"), "left_semi")
        val res = inter
          .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            (col("common").cast("double") / (col("na") + col("nb") - col("common"))).as("jac"))
          .filter(col("jac") >= 0.8)
        println("  pairs: " + res.count())
      }
    }
    spark.stop()
  }
}
