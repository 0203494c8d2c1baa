package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Sources

/** Skew salting and bucketed co-located joins (SCALE.md techniques). */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  // one hot key holding most rows + a long tail
  private def skewed = (1 to 2000).map(i =>
      (if (i <= 1600) "hot" else s"k${i % 50}", i.toDouble))
    .toDF("k", "v")

  test("saltedCount == plain groupBy count on skewed data") {
    val salted = Skew.saltedCount(skewed, Seq("k"))
      .as[(String, Long)].collect().toMap
    val plain = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    assert(salted("hot") === 1600L)
  }

  test("saltedStats re-reduces sum/count/avg/min/max exactly") {
    val salted = Skew.saltedStats(skewed, Seq("k"), "v")
      .where($"k" === "hot")
      .select("sum", "n", "avg", "min", "max")
      .as[(Double, Long, Double, Double, Double)].head()
    // hot rows are v = 1..1600: sum = 1600*1601/2
    assert(salted === ((1280800.0, 1600L, 800.5, 1.0, 1600.0)))
  }

  test("salted partial phase actually fans the hot key out") {
    val partial = skewed
      .withColumn("__salt", Skew.rowSalt(skewed, 16))
      .where($"k" === "hot")
      .select("__salt").distinct().count()
    assert(partial > 8, s"hot key only landed in $partial salt buckets")
  }

  test("bucketed tables join without a shuffle and match unbucketed join") {
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (1L to 500L).filter(_ % 2 == 0)
      .map(i => (i, s"r$i")).toDF("id", "rv")
    // clear catalog entries AND their on-disk locations (a previous JVM's
    // warehouse dir survives even though its in-memory catalog didn't)
    Seq("bkt_left", "bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        sys.props("java.io.tmpdir") + "/graft-warehouse/" + t)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    Sources.writeBucketed(left, "bkt_left", "id", 8)
    Sources.writeBucketed(right, "bkt_right", "id", 8)
    // forbid broadcast so the join planner must pick sort-merge — the
    // co-located path under test (tiny test tables would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(1200))
      assert(joined.count() === 250)
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
