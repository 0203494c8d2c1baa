package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, EventsOps, Skew, Text}

/** Round-2 operators: SimHash near-dup pairs, salted exact sums, moving
  * window stats, built-in session windows, TF-IDF.
  */
class Round2OpsSpec extends SparkSpec {
  import spark.implicits._

  test("simhashDupPairs equals brute-force hamming<=3 (banding recall is " +
    "exact by pigeonhole: 3 differing bits can't touch all 4 bands)") {
    val docs = (0 until 30).map { i =>
      (i.toLong, s"shared words alpha beta gamma delta token$i extra${i % 5}")
    }.toDF("doc_id", "text")
    val got = Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet

    val sigs = docs
      .select(col("doc_id"), Text.cleanText(col("text")).as("c"))
      .withColumn("t", Text.tokens(col("c")))
      .select(col("doc_id"), Dedup.simhash16Native(col("t")).as("sh"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      .where(col("h") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
  }

  test("simhashDupPairs60 equals brute-force hamming<=3 over 60-bit sigs") {
    val docs = (0 until 30).map { i =>
      (i.toLong, s"shared words alpha beta gamma delta token$i extra${i % 5}")
    }.toDF("doc_id", "text")
    val got = Dedup.simhashDupPairs60(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sigs = docs
      .select(col("doc_id"), Text.cleanText(col("text")).as("c"))
      .withColumn("t", Text.tokens(col("c")))
      .select(col("doc_id"), Dedup.simhash60Native(col("t")).as("sh"))
    val brute = sigs.as("a").crossJoin(sigs.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      .where(col("h") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
  }

  test("simhashDupPairs: exact duplicates pair at hamming 0") {
    val docs = Seq(
      (1L, "identical content about spark engines and data"),
      (2L, "identical content about spark engines and data"),
      (3L, "entirely unrelated vocabulary concerning gardening tulips")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashDupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(got.contains((1L, 2L, 0)))
  }

  test("saltedMoneySum is bit-identical to the unsalted decimal sum") {
    val ev = (1 to 500).map(i =>
      (s"k${i % 3}", i * 0.07 + 0.001 * (i % 11))).toDF("event_type", "value")
    val salted = Skew.saltedMoneySum(ev, Seq("event_type"), "value", salts = 7)
      .select("event_type", "total", "n").as[(String, Double, Long)]
      .collect().toSet
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted === plain)
  }

  test("movingStats: lag and 3-row decimal frame sum per user") {
    val ev = Seq(
      (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 30L, 102L, 4.0),
      (1L, 40L, 103L, 8.0), (2L, 50L, 200L, 5.0)
    ).toDF("user_id", "event_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = EventsOps.movingStats(ev)
      .select("user_id", "event_id", "prev_value", "mv_sum")
      .as[(Long, Long, Option[Double], Double)].collect().toSet
    assert(got === Set(
      (1L, 10L, None, 1.0), (1L, 20L, Some(1.0), 3.0),
      (1L, 30L, Some(2.0), 7.0), (1L, 40L, Some(4.0), 14.0),
      (2L, 50L, None, 5.0)))
  }

  test("sessionWindows: gap == threshold MERGES (touching intervals), " +
    "gap just above splits — same semantics as sessionize") {
    val ev = Seq(
      (1L, 10L, 0L), (1L, 20L, 1800L),  // exactly the gap: merges
      (1L, 30L, 3601L),                 // +1801 > gap: NEW session
      (2L, 40L, 100L)
    ).toDF("user_id", "event_id", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val got = EventsOps.sessionWindows(ev, 1800)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 3600L, 2L),      // [0, 1800] + gap -> end 1800+1800=3600
      (1L, 3601L, 5401L, 1L),
      (2L, 100L, 1900L, 1L)))
    // the window-function formulation (q62) agrees on session membership
    val viaLag = EventsOps.sessionize(ev, 1800)
    assert(viaLag.where(col("user_id") === 1).count() === 2)
  }

  test("kmeansCells: deterministic assignment feeding topKIvf") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val c1 = graft.ops.Sim.kmeansCells(emb, k = 8, iters = 2)
    val c2 = graft.ops.Sim.kmeansCells(emb, k = 8, iters = 2)
    val a1 = c1.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(a1 === c2.select("vec_id", "cell").as[(Long, Int)].collect().toMap)
    assert(a1.size === emb.count())
    assert(a1.values.toSet.size > 1 && a1.values.forall(c => c >= 0 && c < 8))
    val probed = graft.ops.Sim.topKIvf(
      c1.where(col("vec_id") < 5), c1, 3, "cell")
    assert(probed.groupBy("q_id").count()
      .agg(max("count")).head().getLong(0) <= 3)
    assert(probed.count() > 0)
  }

  test("md5 hash split: deterministic, disjoint, and near the 80/20 target") {
    val q = SparkEntry.queries("q74_hash_split")
    val dir = "/root/testdata/sf0.01"
    val a = q(spark, dir).collect().map(_.toSeq).toSeq
    val b = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(a === b)
    val bySplit = q(spark, dir).groupBy("split")
      .agg(sum("n").as("n")).as[(String, Long)].collect().toMap
    val frac = bySplit("train").toDouble /
      (bySplit("train") + bySplit("eval"))
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("asOfJoinTolerance: a match older than the bound becomes null") {
    def ev(rows: (Long, Long, Long)*) =
      rows.toSeq.toDF("user_id", "event_id", "epoch")
        .withColumn("ts", timestamp_seconds(col("epoch")))
    val left = ev((1L, 100L, 1000L), (1L, 101L, 2000L))
    val right = ev((1L, 50L, 100L))   // 900s before left 100, 1900s before 101
    val got = EventsOps.asOfJoinTolerance(left, right, tolSeconds = 900)
      .select("event_id", "matched_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(100L -> Some(50L), 101L -> None))
  }

  test("tfIdfTopK: a doc-unique term outranks corpus-wide terms") {
    // distinct terms must differ in LETTERS: cleanText strips digits, so
    // "unique1"/"unique2" would collapse into one corpus-wide term
    val docs = Seq(
      (1L, "shared shared alpha"),
      (2L, "shared shared bravo"),
      (3L, "shared shared charlie")
    ).toDF("doc_id", "text")
    val top1 = Text.tfIdfTopK(docs, "doc_id", "text", 1)
      .select("id", "term").as[(Long, String)].collect().toSet
    assert(top1 === Set((1L, "alpha"), (2L, "bravo"), (3L, "charlie")))
  }
}
