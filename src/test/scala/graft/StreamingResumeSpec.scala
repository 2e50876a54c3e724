package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once resumption: a streaming query stopped after a backlog and
  * restarted against the SAME checkpoint must process only the newly
  * arrived files, and the union of its emissions must equal the batch
  * answer over everything — the recovery contract production streaming
  * jobs rely on, which the per-run fresh-checkpoint judged queries don't
  * exercise. */
class StreamingResumeSpec extends SparkSpec {

  test("restart from checkpoint processes only new files, no loss, no dups") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("resume").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def writeBatch(tag: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(name: String): Map[Long, Long] = {
      val stream = spark.readStream
        .schema("id BIGINT, v STRING")
        .parquet(srcDir)
        .groupBy($"id").agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    writeBatch("a", Seq((1L, "x"), (2L, "y"), (1L, "z")))
    val first = runOnce("resume_run1")
    assert(first == Map(1L -> 2L, 2L -> 1L), s"first run: $first")

    // new data arrives while the query is DOWN; the restart must pick up
    // exactly the delta from the checkpointed offsets and fold it into the
    // recovered state (complete mode re-emits the full aggregate)
    writeBatch("b", Seq((2L, "w"), (3L, "q")))
    val second = runOnce("resume_run2")
    assert(second == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), s"after resume: $second")

    // batch ground truth over everything
    val batch = spark.read.parquet(srcDir).groupBy($"id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(second == batch)
  }
}
