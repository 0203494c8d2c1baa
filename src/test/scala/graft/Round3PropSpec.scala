package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Agg, Dedup, EventsOps}

/** Property tests for the round-3 operators, over generated event streams
  * and graphs (scalacheck Gen sampled directly — scalatestplus is not on
  * the offline classpath).
  */
class Round3PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 20): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Random small event stream: (event_id, user_id, es, value). */
  private val eventsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.listOfN(60, for {
      u <- Gen.choose(1L, 4L)
      es <- Gen.choose(1000L, 50000L)
      v <- Gen.choose(0, 9999).map(_ / 100.0)
    } yield (u, es, v)).map(_.zipWithIndex.map {
      case ((u, es, v), i) => (i.toLong, u, es, v)
    })

  private def toEventsDf(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "es0", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("es0")).as("ts"),
        lit("t").as("event_type"), col("value"))

  test("gapFill (property): buckets are contiguous per user, n sums to " +
    "the user's event count, zero-n buckets carry a forward-filled total") {
    for (rows <- samples(eventsGen, 8)) {
      val df = toEventsDf(rows)
      val got = EventsOps.gapFillForwardFill(df, 3600)
        .orderBy("user_id", "bucket")
        .select("user_id", "bucket", "n")
        .as[(Long, Long, Long)].collect().toSeq
      got.groupBy(_._1).foreach { case (_, seq) =>
        val buckets = seq.map(_._2)
        assert(buckets === (buckets.min to buckets.max by 3600).toSeq,
          "buckets must be a contiguous 3600-step range")
      }
      val perUserN = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val expected = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(perUserN === expected)
    }
  }

  test("scd2 (property): per-user n_events sums to event count, " +
    "intervals chain exactly, adjacent runs differ in type") {
    for (rows <- samples(eventsGen, 8)) {
      // derive a type that actually changes: bucket the value
      val df = toEventsDf(rows)
        .withColumn("event_type",
          concat(lit("t"), (col("value") * 100).cast("long") % 3))
      val scd = EventsOps.scd2Intervals(df)
        .orderBy("user_id", "run_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getLong(5)))
      val perUser = scd.groupBy(_._1)
      perUser.foreach { case (_, runs) =>
        // chain: valid_to(run i) == valid_from(run i+1); last is open
        runs.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5.contains(b._4), s"interval break: $a -> $b")
            assert(a._3 != b._3,
              s"adjacent runs must differ in type (runs are maximal): " +
                s"$a -> $b")
          case _ =>
        }
        assert(runs.last._5.isEmpty, "last run must be open")
      }
      val total = scd.map(_._6).sum
      assert(total === rows.size.toLong)
    }
  }

  test("minLabelPropagate (property): labels are min-of-component once " +
    "rounds cover the diameter, and never increase with more rounds") {
    val pairsGen = Gen.listOfN(25, for {
      a <- Gen.choose(1L, 15L); b <- Gen.choose(1L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.distinct)
    for (pairs <- samples(pairsGen, 6) if pairs.nonEmpty) {
      val df = pairs.toDF("id_a", "id_b")
      val r2 = Dedup.minLabelPropagate(df, rounds = 2)
        .as[(Long, Long)].collect().toMap
      // 14 rounds = node count - 1: guaranteed to cover the diameter of
      // ANY 15-node graph, so the exact-component assertion cannot fail
      // on a path-shaped component however the generator seeds shift
      val r8 = Dedup.minLabelPropagate(df, rounds = 14)
        .as[(Long, Long)].collect().toMap
      // brute-force components on the driver (15 nodes)
      var comp = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> x).toMap
      var changed = true
      while (changed) {
        changed = false
        pairs.foreach { case (a, b) =>
          val m = math.min(comp(a), comp(b))
          if (comp(a) != m || comp(b) != m) {
            comp += a -> m; comp += b -> m; changed = true
          }
        }
      }
      assert(r8 === comp, "n-1 rounds must reach the true component min " +
        "on a 15-node graph")
      r2.foreach { case (id, l2) =>
        assert(l2 >= r8(id), s"more rounds can only lower labels: $id")
        assert(l2 <= id, "label never exceeds own id")
      }
    }
  }

  test("shareOfTotal (property): per-partition shares sum to ~1 and " +
    "each share is in (0, 1]") {
    val gen = Gen.listOfN(80, for {
      s <- Gen.oneOf("s1", "s2", "s3"); l <- Gen.oneOf("a", "b", "c", "d")
    } yield (s, l))
    for (rows <- samples(gen, 8)) {
      val got = Agg.shareOfTotal(rows.toDF("source", "lang"),
          "source", "lang")
        .select("source", "share").as[(String, Double)].collect()
      got.groupBy(_._1).foreach { case (_, shares) =>
        val sum = shares.map(_._2).sum
        assert(math.abs(sum - 1.0) < 1e-4, s"shares must sum to ~1: $sum")
      }
      got.foreach { case (_, sh) => assert(sh > 0 && sh <= 1.0) }
    }
  }
}
