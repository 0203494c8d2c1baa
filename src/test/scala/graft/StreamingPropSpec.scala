package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming ≡ batch on GENERATED adversarial inputs — the
  * EnginePairPropSpec campaign pointed at the streaming engines, where
  * the fixtures are weakest: event streams with timestamps ON the
  * gap/window/watermark boundaries, duplicates split across micro-batch
  * files, and join matches exactly at the window edge. Each property
  * replays a generated stream through REAL micro-batches (one file per
  * trigger, forced-ascending mtimes) and asserts the drained output
  * equals an in-memory reference computed by independent logic — no
  * driver gate needed, so these run on shapes the sf fixtures never
  * produce. (scalacheck Gen sampled directly — the BpeMmrPropSpec
  * discipline.)
  *
  * Watermark discipline for the sessionize property: with GLOBALLY
  * time-ordered contiguous slices, every event in batch k+1 is ≥ every
  * event in batch k, so for ANY positive watermark delay W no event is
  * ever late and no open session is evicted before a mergeable
  * successor arrives (watermark_prev ≤ t_next − W < session_end + gap
  * + 1ms when t_next − end ≤ gap) — which is exactly why a pure
  * gap-merge reference is valid against the watermarked engine.
  */
class StreamingPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Write event rows (event_id, sec, user_id, event_type, value, props)
    * as one parquet file PER SLICE with ascending mtimes, so
    * eventsStream's maxFilesPerTrigger=1 replays slice i as micro-batch
    * i. ts is TIMESTAMP(MICROS) via timestamp_seconds.
    */
  private def stageSlices(
      slices: Seq[Seq[(Long, Long, Long, String, Double, String)]])
      : String = {
    val stage = TempDirs.register(
      Files.createTempDirectory("graft-sprop").toString)
    slices.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory("graft-sprop-tmp").toFile
      rows.toDF("event_id", "sec", "user_id", "event_type", "value",
          "props")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .select("event_id", "ts", "user_id", "event_type", "value",
          "props")
        .coalesce(1).write.mode("overwrite")
        .parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stage, f"f$i%03d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000L * (i + 1))
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(tmp)
    }
    stage
  }

  // base a month off the epoch: a stateful operator's initial watermark
  // is 0, and epoch-adjacent fixtures get shed as late (FIXTURES.md
  // epoch-watermark trap)
  private val base = 30L * 86400L

  test("watermarked sessionize ≡ pure gap-merge reference on generated " +
      "boundary-timed streams (deltas AT the gap, short watermark, " +
      "timeout-driven emission)") {
    val gap = 60L
    // deltas pinned to the merge boundary: 0 and gap merge, gap+1 splits
    val userTimes: Gen[List[Long]] = Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(0L, 1L, gap - 1, gap, gap + 1, 400L)))
    val cases: Gen[Map[Long, List[Long]]] = Gen.sequence[List[(Long,
      List[Long])], (Long, List[Long])]((1L to 3L).map(u =>
        userTimes.map(ds => u -> ds.scanLeft(base + u)(_ + _).tail)).toList)
      .map(_.toMap)
    samples(cases, 3).zipWithIndex.foreach { case (byUser, ci) =>
      val all = byUser.toSeq.flatMap { case (u, ts) => ts.map(t => (u, t)) }
        .sortBy(_._2)
      val rows = all.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, t, u, "click", 0.0, "{}") }
      val nFiles = 4
      val slices = rows.grouped(math.max(1, (rows.size + nFiles - 1)
        / nFiles)).toSeq
      val far = base + 10L * 86400L
      val sentinels = (0 until 2).map(i => Seq(
        (90000L + i, far + i, 999L, "click", 0.0, "{}")))
      val stage = stageSlices(slices ++ sentinels)
      val got = StreamOps.runToAppendTable(
          StreamOps.statefulSessionizeWatermarked(
            StreamOps.eventsStream(spark, stage), gap, "1 second").toDF())
        .where(col("user_id") < 999L)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      // independent reference: greedy gap-merge over each user's sorted
      // times (duplicates count)
      val want = byUser.flatMap { case (u, ts) =>
        val sorted = ts.sorted
        val sess = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)]
        sorted.foreach { t =>
          if (sess.nonEmpty && t - sess.last._2 <= gap) {
            val (s, e, n) = sess.remove(sess.size - 1)
            sess += ((s, math.max(e, t), n + 1))
          } else sess += ((t, t, 1L))
        }
        sess.map { case (s, e, n) => (u, s, e, n) }
      }.toSet
      assert(got === want, s"case $ci: sessions differ")
    }
  }

  test("streamingDedup ≡ batch dropDuplicates on generated streams with " +
      "duplicates split across micro-batches (identical replayed rows, " +
      "same-second collisions)") {
    val ev: Gen[List[(Long, Long)]] = Gen.choose(20, 50).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 14L),
        Gen.choose(base, base + 3600L))))
    samples(ev, 3).zipWithIndex.foreach { case (arrivals, ci) =>
      // one canonical row per key: a replay re-delivers the SAME row,
      // so every duplicate arrival carries identical content
      val canon = arrivals.toMap
      val rows = arrivals.map { case (k, _) =>
        (k, canon(k), 7L + k % 3, "click", k.toDouble, "{}") }
      val slices = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      val stage = stageSlices(slices)
      val got = StreamOps.runToAppendTable(
          StreamOps.streamingDedup(
            StreamOps.eventsStream(spark, stage), Seq("event_id"),
            watermark = "1000 hours"))
        .select(col("event_id"), unix_timestamp(col("ts")).as("es"),
          col("user_id"), col("value"))
        .as[(Long, Long, Long, Double)].collect().toSeq
      val want = canon.toSeq.map { case (k, t) =>
        (k, t, 7L + k % 3, k.toDouble) }
      assert(got.sorted === want.sorted, s"case $ci: dedup rows differ")
      assert(got.size === canon.size, s"case $ci: duplicate survived")
    }
  }

  test("stream-stream inner join ≡ brute in-memory window join on " +
      "generated click/purchase streams with matches AT the window " +
      "edges (r_ts = l_ts − W and r_ts = l_ts)") {
    val w = 30L
    // a coarse time grid forces boundary-exact and equal-ts pairs
    val ev: Gen[List[(Long, Long, Boolean)]] = Gen.choose(15, 40)
      .flatMap(n => Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L),
        Gen.choose(0L, 8L).map(base + w * _), Gen.oneOf(true, false))))
    samples(ev, 3).zipWithIndex.foreach { case (evs, ci) =>
      val rows = evs.zipWithIndex.map { case ((u, t, isClick), i) =>
        (i.toLong, t, u, if (isClick) "click" else "purchase", 0.0, "{}") }
      val slices = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      val stage = stageSlices(slices)
      def in = StreamOps.eventsStream(spark, stage)
      val got = StreamOps.runToAppendTable(
          StreamOps.streamStreamJoin(
            in.where(col("event_type") === "click"),
            in.where(col("event_type") === "purchase"),
            windowSeconds = w, watermark = "1000 hours"))
        .select("user_id", "l_id", "r_id", "l_es", "r_es")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val clicks = rows.filter(_._4 == "click")
      val purchases = rows.filter(_._4 == "purchase")
      val want = (for {
        l <- clicks
        r <- purchases
        if r._3 == l._3 && r._2 >= l._2 - w && r._2 <= l._2
      } yield (l._3, l._1, r._1, l._2, r._2)).toSet
      assert(got === want, s"case $ci: join pairs differ " +
        s"(got ${got.size}, want ${want.size})")
    }
  }

  test("sliding windowedCounts ≡ in-memory per-window tally on generated " +
      "streams with events ON the slide boundaries") {
    val size = 60L
    val slide = 30L
    val ev: Gen[List[(Long, Double)]] = Gen.choose(15, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 6L).map(base + slide * _),
        Gen.choose(0, 400).map(_ / 100.0))))
    samples(ev, 3).zipWithIndex.foreach { case (evs, ci) =>
      val rows = evs.zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, t, 1L, if (i % 2 == 0) "click" else "purchase", v, "{}") }
      val slices = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      val stage = stageSlices(slices)
      val got = StreamOps.runToCompleteTable(
          StreamOps.windowedCounts(
            StreamOps.eventsStream(spark, stage), s"$size seconds",
            s"$slide seconds", watermark = "1000 hours"))
        .select("window_start", "event_type", "n", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      // brute: event t belongs to every window starting in
      // (t − size, t] on the slide grid; decimal(18,2) tally replayed
      // with BigDecimal
      val want = (for {
        (id, t, _, ty, v, _) <- rows
        ws <- (t - size + 1 to t).filter(s => (s - 0L) % slide == 0)
      } yield (ws, ty, v)).groupBy { case (ws, ty, _) => (ws, ty) }
        .map { case ((ws, ty), vs) =>
          (ws, ty, vs.size.toLong,
            vs.map(x => BigDecimal(x._3).setScale(2,
              BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
        }.toSet
      assert(got === want, s"case $ci: window tallies differ")
    }
  }
}
