package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Star}

/** Ops 13-15 (star build/join, surrogate keys, upsert-ignore) and 16-22
  * (pivot, argmax, top-n per group).
  */
class StarAggSpec extends SparkSpec {
  import spark.implicits._

  private val posts = Seq(
    (1L, "srA", 2023), (2L, "srA", 2024), (3L, "srB", 2023),
    (4L, "srC", 2024), (5L, null.asInstanceOf[String], 2024)
  ).toDF("id", "subreddit", "year")

  test("dim: ranked distinct, nulls excluded, ids stable and dense") {
    val d = Star.dim(posts, "subreddit", "sid")
      .as[(String, Long)].collect().toSeq.sorted
    assert(d === Seq(("srA", 1L), ("srB", 2L), ("srC", 3L)))
  }

  test("dimUpsert: existing ids unchanged, new keys appended after max") {
    val existing = Seq(("srA", 1L), ("srB", 2L)).toDF("subreddit", "sid")
    val got = Star.dimUpsert(existing, posts, "subreddit", "sid")
      .as[(String, Long)].collect().toSeq.sorted
    assert(got === Seq(("srA", 1L), ("srB", 2L), ("srC", 3L)))
  }

  test("dimUpsert from empty existing assigns from 1") {
    val empty = Seq.empty[(String, Long)].toDF("subreddit", "sid")
    val got = Star.dimUpsert(empty, posts, "subreddit", "sid")
      .as[(String, Long)].collect().toSeq.sorted
    assert(got === Seq(("srA", 1L), ("srB", 2L), ("srC", 3L)))
  }

  test("lookup + starJoin reconstruct the natural key") {
    val dim = Star.dim(posts, "subreddit", "sid")
    val fact = Star.lookup(posts, dim, "subreddit")
      .select(col("id"), col("sid"))
    val back = Star.starJoin(fact, Seq((dim, "sid")))
      .select(col("id"), col("subreddit"))
      .as[(Long, String)].collect().toMap
    assert(back === Map(1L -> "srA", 2L -> "srA", 3L -> "srB", 4L -> "srC"))
  }

  test("upsertIgnore: only new keys survive (INSERT IGNORE semantics)") {
    val existing = posts.where(col("id") <= 2L)
    val got = Star.upsertIgnore(existing, posts, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(3L, 4L, 5L))
  }

  test("pivotCounts fills missing cells with 0 and keeps declared columns") {
    val df = Seq(("srA", "pos"), ("srA", "pos"), ("srB", "neg"))
      .toDF("sr", "label")
    val out = Agg.pivotCounts(df, "sr", "label", Seq("neg", "neu", "pos"))
    assert(out.columns.toSeq === Seq("sr", "neg", "neu", "pos"))
    val rows = out.as[(String, Long, Long, Long)].collect().toMap2
    assert(rows("srA") === ((0L, 0L, 2L)))
    assert(rows("srB") === ((1L, 0L, 0L)))
  }

  test("argmaxByCount breaks frequency ties on the smaller key") {
    val df = Seq("b", "b", "a", "a", "c").toDF("k")
    val got = Agg.argmaxByCount(df, "k").as[(String, Long)].head()
    assert(got === (("a", 2L)))
  }

  test("topNPerGroup returns n rows per group in rank order") {
    val df = Seq(("g1", 10), ("g1", 30), ("g1", 20), ("g2", 5))
      .toDF("g", "v")
    val got = Agg.topNPerGroup(df, Seq("g"),
        Seq(col("v").desc), 2)
      .select("g", "v", "rk").as[(String, Int, Int)].collect().toSet
    assert(got === Set(("g1", 30, 1), ("g1", 20, 2), ("g2", 5, 1)))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
