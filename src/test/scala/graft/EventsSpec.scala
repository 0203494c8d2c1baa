package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.EventsOps

/** Event-window operators: tumbling/sliding counts, sessionize, as-of join,
  * JSON extraction — crafted micro-tables with known answers.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  /** (user_id, event_id, epoch-sec, type, value) */
  private def ev(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.toDF("user_id", "event_id", "es", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("es"))).drop("es")

  test("tumblingCounts: hour buckets with exact decimal sums") {
    val df = ev(
      (1L, 1L, 3600L, "click", 1.10),
      (1L, 2L, 3700L, "click", 2.20),
      (1L, 3L, 7200L, "click", 3.30),
      (2L, 4L, 3650L, "buy", 5.00))
    val got = EventsOps.tumblingCounts(df, 3600)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === Set(
      (3600L, "click", 2L, 3.30), (3600L, "buy", 1L, 5.00),
      (7200L, "click", 1L, 3.30)))
  }

  test("slidingCounts: each event lands in size/slide windows") {
    val df = ev((1L, 1L, 7200L, "click", 0.0))
    val got = EventsOps.slidingCounts(df, 7200, 3600)
      .as[(Long, String, Long)].collect().toSet
    // event at 7200 is inside [7200, 14400) and [3600, 10800)
    assert(got === Set((7200L, "click", 1L), (3600L, "click", 1L)))
  }

  test("sessionize: gap > threshold starts a new session") {
    val df = ev(
      (1L, 1L, 1000L, "a", 0.0),
      (1L, 2L, 1500L, "a", 0.0),   // same session (gap 500 <= 1800)
      (1L, 3L, 4000L, "a", 0.0),   // new session (gap 2500 > 1800)
      (2L, 4L, 1000L, "a", 0.0))   // other user
    val got = EventsOps.sessionize(df, 1800)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1000L, 1500L, 2L), (1L, 2L, 4000L, 4000L, 1L),
      (2L, 1L, 1000L, 1000L, 1L)))
  }

  test("asOfJoin: most recent right row at-or-before each left row") {
    val left = ev((1L, 10L, 2000L, "p", 0.0), (1L, 11L, 999L, "p", 0.0))
    val right = ev(
      (1L, 20L, 1000L, "c", 0.0), (1L, 21L, 1500L, "c", 0.0),
      (1L, 22L, 2000L, "c", 0.0), // simultaneous: visible to left ts=2000
      (1L, 23L, 3000L, "c", 0.0)) // after: never matched
    val got = EventsOps.asOfJoin(left, right)
      .select(col("event_id"), col("matched_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(10L -> Some(22L), 11L -> None))
  }

  test("jsonProp extracts integer property, null when absent") {
    val df = Seq((1L, """{"k": 87}"""), (2L, """{"x": 1}"""),
        (3L, """{"k": -4}"""))
      .toDF("event_id", "props")
    val got = df.select(col("event_id"),
        EventsOps.jsonProp(col("props"), "k").as("k"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(87L), 2L -> None, 3L -> Some(-4L)))
    // regex metacharacters in the key must be treated literally
    val meta = Seq((1L, """{"a.b": 7, "axb": 9}"""))
      .toDF("event_id", "props")
      .select(EventsOps.jsonProp(col("props"), "a.b"))
      .as[Option[Long]].head()
    assert(meta === Some(7L))
  }
}
