package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Agg, EventsOps, Star}

/** Round-3 operators: RANGE frames, lead/lag gaps, first/last, SCD2
  * intervals, map aggregates, orphan audits, stratified sampling.
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.toDF("event_id", "user_id", "es0", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("es0")).as("ts"), col("event_type"),
        col("value"))

  test("rangeMovingSum frame is value-bounded: only events within the " +
    "trailing window count, and equal-es peers share a frame") {
    val events = ev(
      (1L, 7L, 1000L, "a", 1.0),
      (2L, 7L, 1500L, "a", 2.0),   // 500s after e1  -> frame {e1,e2}
      (3L, 7L, 1601L, "a", 4.0),   // 601s after e1  -> frame {e2,e3}
      (4L, 7L, 1601L, "a", 8.0),   // peer of e3     -> same frame + e4
      (5L, 9L, 1000L, "a", 16.0))  // other user
    val got = EventsOps.rangeMovingSum(events, 600)
      .orderBy("event_id")
      .select("event_id", "mv_sum", "n_frame")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1.0, 1L), (2L, 3.0, 2L),
      (3L, 14.0, 3L), (4L, 14.0, 3L),  // peers: identical frame
      (5L, 16.0, 1L)))
  }

  test("eventGaps: null on each user's first event, event_id breaks ties") {
    val events = ev(
      (1L, 7L, 1000L, "a", 0.0),
      (2L, 7L, 1250L, "b", 0.0),
      (3L, 7L, 1250L, "c", 0.0),  // same es as e2: e2 first by event_id
      (4L, 9L, 5000L, "d", 0.0))
    val got = EventsOps.eventGaps(events).orderBy("event_id")
      .select("event_id", "gap_s", "prev_type")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq === Seq(
      (1L, None, None),
      (2L, Some(250L), Some("a")),
      (3L, Some(0L), Some("b")),
      (4L, None, None)))
  }

  test("firstLast collapses to one row per user with ordered endpoints") {
    val events = ev(
      (2L, 7L, 1000L, "signup", 0.0),
      (1L, 7L, 2000L, "purchase", 0.0),  // later despite smaller id
      (3L, 7L, 1500L, "browse", 0.0),
      (4L, 9L, 100L, "error", 0.0))
    val got = EventsOps.firstLast(events).orderBy("user_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (7L, "signup", "purchase", 3L),
      (9L, "error", "error", 1L)))
  }

  test("scd2Intervals builds versioned runs with [from, to) chaining") {
    val events = ev(
      (1L, 7L, 1000L, "trial", 0.0),
      (2L, 7L, 1100L, "trial", 0.0),
      (3L, 7L, 1200L, "paid", 0.0),
      (4L, 7L, 1300L, "trial", 0.0),  // back to trial: NEW run, not merged
      (5L, 9L, 50L, "free", 0.0))
    val got = EventsOps.scd2Intervals(events).orderBy("user_id", "run_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)), r.getLong(5)))
    assert(got.toSeq === Seq(
      (7L, 1L, "trial", 1000L, Some(1200L), 2L),
      (7L, 2L, "paid", 1200L, Some(1300L), 1L),
      (7L, 3L, "trial", 1300L, None, 1L),
      (9L, 1L, "free", 50L, None, 1L)))
  }

  test("scd2 valid_to of each closed run equals next run's valid_from " +
    "(intervals tile the user's timeline)") {
    val events = ev((1 to 40).map { i =>
      (i.toLong, (i % 3).toLong, i * 100L, s"t${i % 4}", 0.0)
    }: _*)
    val scd = EventsOps.scd2Intervals(events).cache()
    val broken = scd.as("a").join(scd.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.run_id") + 1 === col("b.run_id") &&
          col("a.valid_to") =!= col("b.valid_from"))
      .count()
    assert(broken === 0)
    val openPerUser = scd.where(col("valid_to").isNull)
      .groupBy("user_id").count().where(col("count") =!= 1).count()
    assert(openPerUser === 0)  // exactly one open version per user
  }

  test("mapCounts emits canonical sorted-key JSON of a real map column") {
    val events = ev(
      (1L, 7L, 1L, "b", 0.0), (2L, 7L, 2L, "a", 0.0),
      (3L, 7L, 3L, "b", 0.0), (4L, 9L, 4L, "z", 0.0))
    val rows = Agg.mapCounts(events, "user_id", "event_type")
      .orderBy("user_id").as[(Long, String)].collect().toSeq
    assert(rows === Seq(
      (7L, """{"a":1,"b":2}"""),
      (9L, """{"z":1}""")))
  }

  test("orphanCount: null and missing FKs are orphans, matches are not") {
    val fact = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None))
      .toDF("k", "fk")
      .select(col("k"), col("fk").as("dk"))
    val dim = Seq(10L, 11L).toDF("dk")
    val got = Star.orphanCount(fact, "dk", dim, "dk", "orphans")
      .as[Long].head()
    assert(got === 2L)  // fk=99 and fk=null
  }

  test("stratifiedSample takes exactly min(n, stratum size) per stratum " +
    "and is stable across runs") {
    val docs = (1 to 50).map(i => (i.toLong, if (i <= 40) "en" else "zh"))
      .toDF("doc_id", "lang")
    val s1 = Agg.stratifiedSample(docs, "lang", "doc_id", 15)
    val counts = s1.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(counts === Map("en" -> 15L, "zh" -> 10L))
    val s2 = Agg.stratifiedSample(docs, "lang", "doc_id", 15)
    assert(s1.orderBy("doc_id").collect().toSeq ===
      s2.orderBy("doc_id").collect().toSeq)
  }

  test("minLabelPropagate: 2 rounds reach ids two hops away; longer " +
    "chains need more rounds (bounded-round semantics are explicit)") {
    import graft.ops.Dedup
    // chain 1-2-3-4-5 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val r2 = Dedup.minLabelPropagate(pairs, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // node 4 is 3 hops from 1: after 2 rounds its label is 2 (= min id
    // within 2 hops), not yet 1
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      10L -> 10L, 11L -> 10L))
    val r4 = Dedup.minLabelPropagate(pairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("bm25: term in fewer docs outscores the everywhere-term; ranks " +
    "are dense per doc") {
    import graft.ops.Text
    val docs = Seq(
      (1L, "common rare common filler words here"),
      (2L, "common filler words more padding tokens"),
      (3L, "common other vocabulary entirely padding")).toDF("doc_id", "text")
    val got = Text.bm25TopK(docs, "doc_id", "text", 6)
      .where(col("id") === 1)
      .select("term", "score", "rk")
      .as[(String, Double, Int)].collect()
    val byTerm = got.map(r => r._1 -> r._2).toMap
    assert(byTerm("rare") > byTerm("common"),
      s"idf must dominate: $byTerm")
    assert(got.map(_._3).sorted.toSeq === (1 to got.length))
    // every score is finite and floor-stabilized to 4dp
    got.foreach { case (_, s, _) =>
      assert(!s.isNaN && !s.isInfinite)
      assert(s === math.floor(s * 10000) / 10000)
    }
  }

  test("gapFillForwardFill: missing buckets appear with n=0 and carry " +
    "the last observed total forward") {
    val events = ev(
      (1L, 7L, 3600L, "a", 2.0),
      (2L, 7L, 3700L, "a", 3.0),   // same bucket as e1
      (3L, 7L, 5 * 3600L, "a", 10.0))  // 3 empty buckets between
    val got = EventsOps.gapFillForwardFill(events, 3600)
      .orderBy("user_id", "bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq === Seq(
      (3600L, 2L, Some(5.0)),
      (7200L, 0L, Some(5.0)),   // forward-filled
      (10800L, 0L, Some(5.0)),
      (14400L, 0L, Some(5.0)),
      (18000L, 1L, Some(10.0))))
  }

  test("shareOfTotal: shares sum to ~1 per partition and rank follows " +
    "frequency with key tie-break") {
    val docs = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "en"), ("s1", "de"),
      ("s2", "fr"), ("s2", "zh")).toDF("source", "lang")
    val got = Agg.shareOfTotal(docs, "source", "lang")
      .orderBy("source", "rk")
      .as[(String, String, Long, Double, Int)].collect().toSeq
    assert(got === Seq(
      ("s1", "en", 3L, 0.75, 1), ("s1", "de", 1L, 0.25, 2),
      ("s2", "fr", 1L, 0.5, 1), ("s2", "zh", 1L, 0.5, 2)))
  }

  test("exactMoments equals the closed-form on a hand-checked table and " +
    "is invariant to row order/partitioning") {
    import graft.ops.Agg
    val vals = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = vals.map(("k", _)).toDF("key", "x")
    val r = Agg.exactMoments(df, "key", "x").head()
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 5.0)      // mean
    // sample variance of the classic 2,4,4,4,5,5,7,9 set = 32/7
    assert(math.abs(r.getDouble(3) - 32.0 / 7) < 1e-4)
    val shuffled = scala.util.Random.shuffle(vals).map(("k", _))
      .toDF("key", "x").repartition(7)
    assert(Agg.exactMoments(shuffled, "key", "x").head().getDouble(3)
      === r.getDouble(3))  // bit-equal despite different accumulation order
  }

  test("exactCorr is 1 for a perfect linear relation, ~0 for a balanced " +
    "anti-pattern") {
    import graft.ops.Agg
    val linear = (1 to 20).map(i => ("a", i.toDouble, 3.0 * i + 7))
    val df = linear.toDF("key", "x", "y")
    val r = Agg.exactCorr(df, "key", "x", "y").head()
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    val anti = Seq(("b", 1.0, 1.0), ("b", 1.0, -1.0),
      ("b", -1.0, 1.0), ("b", -1.0, -1.0)).toDF("key", "x", "y")
    assert(math.abs(Agg.exactCorr(anti, "key", "x", "y")
      .head().getDouble(2)) < 1e-6)
  }

  test("fuzzyPairs finds within-block near matches only (blocking " +
    "contract is explicit)") {
    import graft.ops.Dedup
    val names = Seq("red bolt", "red bolts", "red widget", "blue bolt")
      .toDF("name")
    val got = Dedup.fuzzyPairs(names, "name", "name", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(String, String, Int)]
      .collect().toSet
    // "red bolt"~"red bolts" dist 1; "blue bolt" blocked apart despite
    // dist 3 to "red bolt"; "red widget" too far within block
    assert(got === Set(("red bolt", "red bolts", 1)))
  }

  test("topKAgg (typed Aggregator) is result-identical to the window " +
    "topK plan on the fixture") {
    import graft.ops.Sim
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where(col("vec_id") < 10)
    val viaWindow = Sim.topK(q, emb, 5).orderBy("q_id", "rk")
      .collect().map(_.toSeq).toSeq
    val viaAgg = Sim.topKAgg(q, emb, 5).orderBy("q_id", "rk")
      .collect().map(_.toSeq).toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("TopKAgg keeps k best with deterministic tie-break across " +
    "partition splits") {
    import graft.functions.{ScoredId, TopKAgg}
    val agg = new TopKAgg(3)
    val items = Seq(ScoredId(5, 0.9), ScoredId(2, 0.9), ScoredId(9, 0.5),
      ScoredId(1, 0.7), ScoredId(7, 0.9), ScoredId(3, 0.2))
    // reduce in one pass vs merge of arbitrary splits: same answer
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = items.splitAt(2)
    val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(whole) === agg.finish(split))
    // ties on sim 0.9 break by smaller c_id first
    assert(agg.finish(whole) ===
      Seq(ScoredId(2, 0.9), ScoredId(5, 0.9), ScoredId(7, 0.9)))
  }

  test("snapshotDiff classifies added/deleted/changed/unchanged") {
    import graft.ops.Star
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val newSnap = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val got = Star.snapshotDiff(oldSnap, newSnap, "k", Seq(col("v")))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "deleted", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("weightedSample: stable across runs, and heavier rows are " +
    "overrepresented vs a uniform sample") {
    val docs = (1 to 2000).map { i =>
      (i.toLong, if (i % 10 == 0) 1000L else 10L)  // 10% heavy rows
    }.toDF("doc_id", "w")
    val s1 = Agg.weightedSample(docs, "doc_id", "w", 200)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Agg.weightedSample(docs, "doc_id", "w", 200)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    val heavyShare = s1.count(_ % 10 == 0).toDouble / s1.size
    // heavy rows are 10% of the population but 100x weight: their sample
    // share must far exceed 10% (they should dominate)
    assert(heavyShare > 0.5, s"heavy share only $heavyShare")
  }

  test("funnelConversion golden: converts within window only, first " +
    "events only, never-purchasers counted as starts") {
    val events = ev(
      (1L, 1L, 1000L, "signup", 0.0),
      (2L, 1L, 2000L, "purchase", 0.0),   // converts (gap 1000)
      (3L, 2L, 1000L, "signup", 0.0),
      (4L, 2L, 999L, "purchase", 0.0),    // BEFORE signup: no conversion
      (5L, 3L, 1000L, "signup", 0.0),
      (6L, 3L, 90000L, "purchase", 0.0),  // past the 24h window
      (7L, 4L, 1000L, "signup", 0.0),     // never purchases
      (8L, 5L, 500L, "purchase", 0.0))    // purchase with no signup
    val r = EventsOps.funnelConversion(events, "signup", "purchase", 86400)
      .head()
    assert(r.getLong(0) === 4L)   // users 1-4 signed up
    assert(r.getLong(1) === 1L)   // only user 1 converted
    assert(r.getDouble(2) === 25.0)
  }

  test("transitionCounts golden: per-user ordering, no cross-user pairs, " +
    "first events excluded") {
    val events = ev(
      (1L, 1L, 100L, "a", 0.0), (2L, 1L, 200L, "b", 0.0),
      (3L, 1L, 300L, "b", 0.0),
      (4L, 2L, 150L, "c", 0.0), (5L, 2L, 250L, "a", 0.0))
    val got = EventsOps.transitionCounts(events)
      .as[(String, String, Long)].collect().toSet
    // NOT (b -> c): users never share a chain
    assert(got === Set(("a", "b", 1L), ("b", "b", 1L), ("c", "a", 1L)))
  }

  test("cohortRetention golden: offsets relative to first week, multiple " +
    "events in one week count once") {
    val wk = 7 * 86400L
    val events = ev(
      (1L, 1L, 0 * wk + 10, "a", 0.0),       // u1 cohort week 0
      (2L, 1L, 0 * wk + 20, "a", 0.0),       // same week: counted once
      (3L, 1L, 2 * wk + 10, "a", 0.0),       // offset 2
      (4L, 2L, 1 * wk + 10, "a", 0.0),       // u2 cohort week 1
      (5L, 2L, 2 * wk + 10, "a", 0.0))       // offset 1
    val got = EventsOps.cohortRetention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("unionByName(allowMissing) null-fills the absent column") {
    val a = Seq((1L, 5.0)).toDF("k", "price")
      .withColumn("src", lit("fin"))
    val b = Seq(2L).toDF("k").withColumn("src", lit("open"))
    val got = a.unionByName(b, allowMissingColumns = true)
      .orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2)))
    assert(got.toSeq === Seq((1L, Some(5.0), "fin"), (2L, None, "open")))
  }
}
