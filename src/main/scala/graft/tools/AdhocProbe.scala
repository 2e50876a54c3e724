package graft.tools

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe [sfDir]`. Contents change per
  * investigation; nothing depends on it.
  *
  * Current body: r16 optimization round — interleaved A/Bs:
  *   1. minhash band self-join as AQE-chosen broadcast (computes the
  *      banding kernel once per side, single-task each) vs forced
  *      sort-merge (one Exchange(band,bh) + ReusedExchange — the kernel
  *      runs once, and SMJ is the only shape that survives a corpus-sized
  *      band table anyway);
  *   2. llm_dedup_ngram's verifyBlocks knob at 16 (shipped) vs 4 vs 2 —
  *      spec-proven result-identical; per-doc state replicates B ways, so
  *      a fixture-sized corpus may be paying 8x the replication it needs. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("adhoc")
    val d = graft.Tables.load(spark, sfDir, "documents")

    def bandCand(merge: Boolean): Long = {
      val bands = d.select(col("doc_id"),
        posexplode(expr("minhash_bands(shingle_hashes(text))")).as(Seq("band", "bh")))
      val left = if (merge) bands.hint("MERGE") else bands
      left.as("x").join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().count()
    }
    require(bandCand(false) == bandCand(true), "band candidate count mismatch")

    def ab(label: String, n: Int)(a: => Unit)(b: => Unit): Unit = {
      a; b // warm-up
      val as, bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime(); a; as += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); b; bs += (System.nanoTime() - t1) / 1e9
      }
      println(f"[$label A] min=${as.min}%.2f runs=${as.map(t => f"$t%.2f").mkString(",")}")
      println(f"[$label B] min=${bs.min}%.2f runs=${bs.map(t => f"$t%.2f").mkString(",")}")
    }

    // bandjoin settled: SMJ wins all pairs

    // ngram verify blocks: shipped 16 vs 2
    def ngram(b: Int): Array[org.apache.spark.sql.Row] =
      graft.operators.LlmPipeline.ngramDedup(spark, sfDir, b, 128).collect()
    val r16 = ngram(16); val r2 = ngram(2)
    require(r16.length == r2.length && r16.zip(r2).forall { case (x, y) => x == y },
      s"ngram mismatch: ${r16.length} vs ${r2.length}")
    println(s"[ngram equal] ${r16.length} pairs")
    ab("ngram blocks 16-vs-2", 5)(ngram(16))(ngram(2))

    spark.stop()
  }
}
