package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.EventsOps
import graft.streaming.StreamOps

/** Structured Streaming path: the streaming windowed aggregation over the
  * staged events fixture must agree with the batch tumbling form on the
  * same data (same engine semantics, incremental execution).
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowedCounts == batch tumblingCounts on events sf0.001") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-stream").toFile
    try {
      // stage the fixture file as the stream input dir
      val target = new java.io.File(stage, "events.parquet")
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        target.toPath)

      val stream = StreamOps.windowedCounts(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        "1 hour", "1 hour")
      val q = stream.writeStream
        .format("memory").queryName("win_counts").outputMode("complete")
        .start()
      try q.processAllAvailable() finally q.stop()

      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = EventsOps.tumblingCounts(
          Tables.load(spark, src, "events"), 3600)
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }
}
