package graft.tools

/** Run one judged query and print its result: `runMain graft.tools.RunQuery
  * <name> [sfDir]` — debugging aid for oracle mismatches. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.get("graft-run")
    graft.SparkEntry.queries(name)(spark, sfDir).show(50, false)
    spark.stop()
  }
}
