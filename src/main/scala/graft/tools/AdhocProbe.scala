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
    def docs = graft.Tables.load(spark, sfDir, "documents")
    val variants: Seq[(String, () => Unit)] = Seq(
      ("minhash_smj", () => { LlmPipeline.minhashPairs(docs).count(); () }),
      ("minhash_bcast", () => { LlmPipeline.minhashPairs(docs, merge = false).count(); () }),
      ("ngram_auto_blocks", () => { LlmPipeline.ngramDedup(spark, sfDir,
        LlmPipeline.NgramVerifyBlocksAuto, LlmPipeline.NgramHistBuckets).count(); () }),
      ("ngram_16_blocks", () => { LlmPipeline.ngramDedup(spark, sfDir,
        16, LlmPipeline.NgramHistBuckets).count(); () }))
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
