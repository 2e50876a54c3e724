package graft.tools

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe [sfDir]`. Contents change per
  * investigation; nothing depends on it.
  *
  * Current body: r17 optimization round — re-adjudicate the two r16 llm
  * changes the driver's 32-core bench contradicted (the contradiction is
  * attributed to the since-reverted tmpfs scratch): the minhash band
  * self-join MERGE hint and the ngram size-derived verify-block count.
  * Interleaved A/B in one JVM (variants alternate run to run, min over
  * trials) at the session's full width with scratch on DISK. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("adhoc")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache(); System.gc(); t
    }
    import graft.operators.LlmPipeline
    import org.apache.spark.sql.functions._
    def docs = graft.Tables.load(spark, sfDir, "documents")
    // incremental probe-stage A/B: the judged query (run once to seed the
    // band index), then candidate generation with the In(row_key) pushdown
    // vs the full-index equi-join — both end in the same distinct count
    graft.SparkEntry.queries("llm_dedup_incremental")(spark, sfDir).count()
    spark.catalog.clearCache()
    def incrCand(pruned: Boolean): Long = {
      val store = s"${graft.sources.cassandralike.Seed.storeRoot(sfDir)}/minhash_band_index"
      val probe = docs.filter(col("doc_id") % 8 === 0).select(col("doc_id"),
          posexplode(expr("minhash_bands(shingle_hashes(text))")).as(Seq("band", "bh")))
        .select(col("doc_id"), concat_ws("#", col("band"), col("bh")).as("row_key"))
      val index0 = graft.sources.cassandralike.Seed.read(spark, store)
        .select(col("row_key"), col("column_name").cast("long").as("doc_ix"))
      val index = if (pruned)
        LlmPipeline.probePrunedIndex(index0, probe, store,
          minIndexCells = 0L, cellsPerKey = 0L)
      else index0
      probe.join(index, Seq("row_key"))
        .filter(col("doc_id") =!= col("doc_ix"))
        .select(least(col("doc_id"), col("doc_ix")).as("doc_a"),
          greatest(col("doc_id"), col("doc_ix")).as("doc_b"))
        .distinct().count()
    }
    val variants: Seq[(String, () => Unit)] = Seq(
      ("minhash_smj", () => { LlmPipeline.minhashPairs(docs).count(); () }),
      ("minhash_bcast", () => { LlmPipeline.minhashPairs(docs, merge = false).count(); () }),
      ("ngram_auto_blocks", () => { LlmPipeline.ngramDedup(spark, sfDir,
        LlmPipeline.NgramVerifyBlocksAuto, LlmPipeline.NgramHistBuckets).count(); () }),
      ("ngram_16_blocks", () => { LlmPipeline.ngramDedup(spark, sfDir,
        16, LlmPipeline.NgramHistBuckets).count(); () }),
      ("incr_cand_pushdown", () => { incrCand(pruned = true); () }),
      ("incr_cand_fullscan", () => { incrCand(pruned = false); () }),
      ("incr_full_query", () => { graft.SparkEntry
        .queries("llm_dedup_incremental")(spark, sfDir).count(); () }))
    // one warm-up each, then 4 interleaved trials with alternating order
    variants.foreach { case (_, f) => timed(f()) }
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (trial <- 0 until 4) {
      val order = if (trial % 2 == 0) variants else variants.reverse
      order.foreach { case (name, f) =>
        val t = timed(f())
        times(name) = t :: times(name)
        println(f"[trial $trial] $name%-18s $t%.2f s")
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (name, ts) =>
      println(f"[min] $name%-18s ${ts.min}%.2f s  runs=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
