package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Fixture loaders: declared schemas and the TIMESTAMP(NANOS) events fix
  * must hold even for sessions that weren't built by Sessions.local.
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all fixture tables load with declared schemas and rows") {
    Tables.schemas.keys.foreach { t =>
      assert(Tables.load(spark, dir, t).count() > 0, s"table $t empty")
    }
  }

  test("events.ts arrives as a usable microsecond timestamp") {
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val yr = ev.select(year(col("ts"))).distinct()
      .collect().map(_.getInt(0))
    assert(yr.forall(y => y >= 2024 && y <= 2026), yr.toSeq.toString)
  }

  test("events load works from a session missing the nanos flag") {
    val fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert(Tables.load(fresh, dir, "events").count() === 1000L)
  }
}
