package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (north-star extension; SURVEY.md §7.3 M4).
  *
  * The aggregation logic is shared with the batch forms in
  * graft.ops.EventsOps — here the same transforms run incrementally with
  * watermark-bounded state. Batch forms are the oracle-checked truth;
  * these are the streaming deployment path.
  */
object StreamOps {

  /** Tumbling/sliding windowed counts with a watermark: state for a window
    * is dropped `watermark` after its end — bounded state at any scale.
    */
  def windowedCounts(events: DataFrame, size: String, slide: String,
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based session windows per user via the built-in session_window —
    * Spark manages merging/expiry; watermark bounds the state.
    */
  def sessionCounts(events: DataFrame, gap: String,
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Read a directory of events-schema parquet files as a (bounded) stream
    * — tests stage `events.parquet` into a temp dir and drive the query
    * with one processAllAvailable() pass.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(graft.Tables.events)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      // same ns→µs conversion as Tables.load (events.ts is TIMESTAMP(NANOS))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
