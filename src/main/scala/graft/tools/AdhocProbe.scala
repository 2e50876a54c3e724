package graft.tools

/** Scratch driver for plan-shape exploration during development:
  * `runMain graft.tools.AdhocProbe <queryName> [sfDir]`. Contents change
  * per investigation; nothing depends on it. */
object AdhocProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("conn_agg_regular_value")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val sp = graft.GraftSession.get("adhoc")
    val df = graft.SparkEntry.queries(name)(sp, sfDir)
    df.explain("formatted")
    df.show(false)
    sp.stop()
  }
}
