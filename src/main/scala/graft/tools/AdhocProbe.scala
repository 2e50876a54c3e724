package graft.tools

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe [sfDir]`. Contents change per
  * investigation; nothing depends on it. The current body reads the
  * `idx_agg_probe_on` store that [[IndexedAggProbe]] seeds — run that
  * first on the same sfDir or this fails on a missing store. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    // current investigation: where do the indexed-stats positional arm's
    // milliseconds go — planning (proofs + postings + point arithmetic)
    // or execution (the one-partition answer job)?
    import org.apache.spark.sql.functions._
    import graft.sources.cassandralike.{Options, Seed}
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sp = graft.GraftSession.get("adhoc")
    val dir = s"${Seed.storeRoot(sfDir)}/idx_agg_probe_on"
    def q() = Seed.read(sp, dir).filter(col("src") === "1-URGENT#7")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        sum(col("v")).as("sv"), min(col("row_key")).as("mk"))
    (1 to 2).foreach(_ => q().collect()) // warm memos
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val df = q()
      val plan = df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      println(f"plan=${(t1 - t0) / 1e3}%.0fus exec=${(t2 - t1) / 1e3}%.0fus " +
        s"cls=${plan.getClass.getSimpleName}")
    }
    sp.stop()
  }
}
