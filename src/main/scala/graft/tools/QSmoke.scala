package graft.tools
import graft._
/** Throwaway single-query oracle smoke: runMain graft.tools.QSmoke <sfDir> <name> */
object QSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("qsmoke")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.write.mode("overwrite").parquet("/tmp/qsmoke_out")
    println("ROWS=" + spark.read.parquet("/tmp/qsmoke_out").count())
    spark.stop()
  }
}
