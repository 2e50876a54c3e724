package graft.tools

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe [sfDir]`. Contents change per
  * investigation; nothing depends on it.
  *
  * Current body: r16 optimization round — repeated-run stability of the
  * seedOnce-hoisted incremental index queries: run 2+ re-appends the delta
  * onto the memoized store (extra segments, identical cells at the pinned
  * timestamp), so the judged rows must be byte-identical run to run. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.get("adhoc")
    Seq("llm_dedup_incremental", "llm_ann_incremental", "llm_ann_ivfpq")
      .foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        def rows() = {
          val r = fn(spark, sfDir).collect().map(_.toString).toSeq
          spark.catalog.clearCache(); r
        }
        val r1 = rows(); val r2 = rows(); val r3 = rows()
        require(r1 == r2 && r2 == r3,
          s"$name unstable across reruns: ${r1.length}/${r2.length}/${r3.length}")
        println(s"[stable] $name ${r1.length} rows x3")
      }
    spark.stop()
  }
}
