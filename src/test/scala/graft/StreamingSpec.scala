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

  test("stateful sessionize across two micro-batches == batch sessions " +
      "(minus each user's still-open last session)") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val events = Tables.load(spark, src, "events")
      .withColumn("ts_num", unix_timestamp(col("ts")).cast("double"))
    val median = events.stat.approxQuantile("ts_num", Array(0.5), 0.0)(0)
    val stage = Files.createTempDirectory("graft-sess").toFile
    try {
      // batch 1: first half by time; batch 2: second half — the stream
      // must merge sessions that straddle the boundary via state
      events.where(col("ts_num") <= median).drop("ts_num")
        .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      val stream = StreamOps.statefulSessionize(
        spark.readStream.schema(events.drop("ts_num").schema)
          .parquet(stage.getAbsolutePath), 1800)
      val q = stream.writeStream.format("memory").queryName("sess")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        events.where(col("ts_num") > median).drop("ts_num")
          .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.table("sess")
        .as[StreamOps.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
        .toSet

      val batch = graft.ops.EventsOps.sessionize(
        Tables.load(spark, src, "events"), 1800)
      val lastPerUser = batch.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("session_id")
          .as("session_id"))
      val closedBatch = batch.join(lastPerUser,
          Seq("user_id", "session_id"), "left_anti")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet

      assert(streamed === closedBatch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("streaming dedup drops cross-micro-batch duplicates == batch " +
      "distinct") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-dedup").toFile
    try {
      // the same fixture staged twice: every event_id arrives in two
      // different micro-batches (maxFilesPerTrigger=1)
      for (i <- 1 to 2)
        Files.copy(new java.io.File(s"$src/events.parquet").toPath,
          new java.io.File(stage, s"copy$i.parquet").toPath)
      val stream = StreamOps.streamingDedup(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        Seq("event_id"), watermark = "30 days")
      val q = stream.writeStream.format("memory").queryName("dedup")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("dedup").count()
      val exact = Tables.load(spark, src, "events")
        .select("event_id").distinct().count()
      assert(streamed === exact)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("stream-stream windowed join == the same join run in batch") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-ssj").toFile
    try {
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        new java.io.File(stage, "events.parquet").toPath)
      def purchases(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "purchase")
      def clicks(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "click")

      val in = StreamOps.eventsStream(spark, stage.getAbsolutePath)
      val q = StreamOps.streamStreamJoin(purchases(in), clicks(in), 3600)
        .writeStream.format("memory").queryName("ssj")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("ssj")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet

      val batchIn = Tables.load(spark, src, "events")
      val batch = StreamOps.streamStreamJoin(
          purchases(batchIn), clicks(batchIn), 3600)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

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
