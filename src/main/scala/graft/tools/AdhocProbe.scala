package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe`. Contents change per investigation;
  * nothing depends on it. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    val sp = graft.GraftSession.get("adhoc")
    import sp.implicits._
    val df = (1L to 100L).map(i => (i, f"c${i % 5}%02d", i * 3L)).toDF("k", "c", "v")
    val store = graft.sources.cassandralike.Seed.table(sp,
      "/root/testdata/sf0.001", "avg_probe", df.repartition(1),
      mapping = Some(":key,:column,:value"),
      props = Map(graft.sources.cassandralike.Options.KeyEncoding -> "ordered"))
    val q = graft.sources.cassandralike.Seed.read(sp, store)
      .filter($"k" >= 10L && $"k" < 50L)
      .agg(avg($"v").as("a"), min($"v").as("mn"), max($"v").as("mx"))
    q.explain("formatted")
    q.show()
    sp.stop()
  }
}
