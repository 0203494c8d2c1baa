package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.Agg

/** Engine-pair equality on GENERATED inputs — the property behind the
  * one-oracle-N-engines bindings (q253≡q256≡q272, q29≡q262≡q273,
  * q209≡q230≡q233): the driver gate proves each pair on one fixture;
  * these prove the pairs agree on arbitrary shapes, including the
  * tie-heavy and skewed ones a fixture can miss. Skyline additionally
  * answers to a brute in-memory dominance filter, so the pair cannot
  * agree on a shared mistake. (scalacheck Gen sampled directly — the
  * BpeMmrPropSpec discipline.)
  */
class EnginePairPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("skyline == skylineTwoLevel == brute dominance on generated " +
      "point sets (tie-heavy: small integer domains)") {
    val pts: Gen[List[(Long, Long)]] = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L))))
    samples(pts, 8).zipWithIndex.foreach { case (ps, ci) =>
      val df = ps.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
      def ids(r: org.apache.spark.sql.DataFrame) =
        r.select("id").as[Long].collect().toSet
      val one = ids(Agg.skyline(df, "x", "y"))
      val two = ids(Agg.skylineTwoLevel(df, "x", "y", ranges = 3))
      // brute: p survives iff no q strictly dominates (>= both, > one)
      val brute = ps.zipWithIndex.filter { case ((x, y), _) =>
        !ps.exists { case (qx, qy) =>
          qx >= x && qy >= y && (qx > x || qy > y) }
      }.map(_._2.toLong).toSet
      assert(one === brute, s"set $ci: one-level != brute")
      assert(two === brute, s"set $ci: two-level != brute")
    }
  }

  test("quantilesByBuffer == quantilesByDomain on generated skewed " +
      "groups (bit-equal doubles, no floor)") {
    val grps: Gen[List[(String, Long)]] = Gen.choose(5, 80).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(-500L, 500L))))
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
    samples(grps, 8).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("k", "v")
      def run(f: => org.apache.spark.sql.DataFrame) =
        f.orderBy("k").collect().map(r => (r.getString(0),
          r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
          .toSeq
      val b = run(Agg.quantilesByBuffer(df, "k", "v", ps))
      val d = run(Agg.quantilesByDomain(df, "k", "v", ps, buckets = 4))
      assert(b === d, s"table $ci: buffer != domain")
      // forced two-level cumulant (see the spearman pair test)
      val d2 = run(Agg.quantilesByDomain(df, "k", "v", ps, buckets = 4,
        oneLevelMaxDomain = 0L))
      assert(b === d2, s"table $ci: buffer != two-level domain")
    }
  }

  test("CC triple on generated edge lists: converged == big-star == " +
      "incremental(base+delta split) == brute union-find") {
    import graft.ops.Dedup
    val edges: Gen[List[(Long, Long)]] = Gen.choose(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L))))
    samples(edges, 8).zipWithIndex.foreach { case (es0, ci) =>
      val es = es0.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (es.nonEmpty) {
        val pairs = es.toDF("id_a", "id_b")
        def labels(r: org.apache.spark.sql.DataFrame) =
          r.select("doc_id", "component").collect()
            .map(x => (x.getLong(0), x.getLong(1))).toSet
        val conv = labels(Dedup.componentsConverged(pairs))
        val star = labels(Dedup.componentsBigStar(pairs))
        // split into base/delta by pair parity; incremental folds the
        // delta into exact CC over the base
        val base = pairs.where((col("id_a") + col("id_b")) % 2 === 0)
        val delta = pairs.where((col("id_a") + col("id_b")) % 2 =!= 0)
        val incr =
          if (base.isEmpty || delta.isEmpty) conv
          else labels(Dedup.componentsIncremental(
            Dedup.componentsConverged(base), delta))
        // brute union-find with min-id roots
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parent(hi) = lo
          }
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        val brute = nodes.map(n => (n, find(n))).toSet
        assert(conv === brute, s"set $ci: converged != union-find")
        assert(star === brute, s"set $ci: big-star != union-find")
        assert(incr === brute, s"set $ci: incremental != union-find")
      }
    }
  }

  test("prefixFilterPairs (both orders) == brute all-pairs Jaccard on " +
      "generated mini-corpora — the PPJoin exact-recall claim") {
    import graft.ops.Dedup
    // small shared vocab so near-dup pairs actually occur
    val word: Gen[String] = Gen.oneOf(
      "aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val doc: Gen[String] = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpora = samples(Gen.listOfN(10, doc), 8)
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def pairs(ordered: Boolean) =
        Dedup.prefixFilterPairs(df, "doc_id", "text", w = 3,
            minJaccard = 0.5, dfOrdered = ordered)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute: distinct 3-gram sets, floored jaccard >= 0.5
      def shs(t: String): Set[String] = {
        val toks = t.split("\\s+").filter(_.nonEmpty)
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map(shs)
      val brute = (for {
        a <- docs.indices; b <- docs.indices if a < b
        sa = sets(a); sb = sets(b)
        if sa.nonEmpty && sb.nonEmpty
        c = (sa & sb).size
        j = math.floor(c.toDouble / (sa.size + sb.size - c) * 10000) /
          10000
        if j >= 0.5
      } yield (a.toLong, b.toLong)).toSet
      assert(pairs(true) === brute, s"corpus $ci: df-ordered != brute")
      assert(pairs(false) === brute, s"corpus $ci: lexicographic != brute")
    }
  }

  test("medianByRank / madByRank == sorted in-memory references on " +
      "generated groups") {
    val grps: Gen[List[(String, Long)]] = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-50L, 50L))))
    samples(grps, 8).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("k", "v")
      def refMedian(xs: Seq[Long]): Double = {
        val s = xs.sorted.map(_.toDouble)
        val n = s.length
        (s((n - 1) / 2) + s(n / 2)) / 2
      }
      val med = Agg.medianByRank(df, "k", "v")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      rows.groupBy(_._1).foreach { case (k, vs) =>
        assert(med(k) === refMedian(vs.map(_._2)),
          s"table $ci key $k: median mismatch")
      }
      val mad = Agg.madByRank(df, "k", "v")
        .collect().map(r => (r.getString(0), r.getDouble(2),
          r.getDouble(3)))
      mad.foreach { case (k, p50, m) =>
        val vs = rows.filter(_._1 == k).map(_._2)
        val rm = refMedian(vs)
        val rmad = refMedian2(vs.map(v => math.abs(v - rm)))
        assert(p50 === math.floor(rm * 1e4) / 1e4,
          s"table $ci key $k: mad p50")
        assert(m === math.floor(rmad * 1e4) / 1e4,
          s"table $ci key $k: mad value")
      }
    }
  }

  private def refMedian2(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    (s((n - 1) / 2) + s(n / 2)) / 2
  }

  test("sessionize == a gaps-and-islands in-memory reference on " +
      "generated event streams, boundary gaps included") {
    import graft.ops.EventsOps
    // ts drawn from a small range so gap == gapSeconds EXACTLY occurs
    // (strictly-greater splits; equal-to-gap must NOT split)
    val evs: Gen[List[(Long, Long, Long)]] = Gen.choose(1, 50).flatMap(
      n => Gen.listOfN(n, Gen.zip(Gen.choose(0L, 2L),
        Gen.choose(0L, 200L), Gen.choose(0L, 999L))).map(
        _.zipWithIndex.map { case ((u, t, _), i) => (i.toLong, u, t) }))
    samples(evs, 8).zipWithIndex.foreach { case (rows, ci) =>
      val gap = 10L
      val df = rows.toDF("event_id", "user_id", "sec")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("sec")).as("ts"))
      val got = EventsOps.sessionize(df, gap)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // reference: per user, order by (sec, event_id), split on
      // delta > gap
      val ref = rows.groupBy(_._2).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._1)).map(_._3)
        val sessions = sorted.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) =>
            if (t - cur.head > gap) List(t) :: cur :: done
            else (t :: cur) :: done
        }
        sessions.map(s => (u, s.min, s.max, s.length.toLong))
      }.toSet
      assert(got === ref, s"stream $ci: sessions mismatch")
    }
  }

  test("asOfJoin and asOfJoinTolerance == in-memory references on " +
      "generated streams — simultaneous rows and staleness boundaries") {
    import graft.ops.EventsOps
    // small ts range so exact-simultaneous left/right rows occur, and
    // deltas straddle the tolerance boundary
    val evs: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
      for {
        nl <- Gen.choose(1, 25); nr <- Gen.choose(1, 25)
        l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 2L),
          Gen.choose(0L, 40L), Gen.const(0L)))
        r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 2L),
          Gen.choose(0L, 40L), Gen.const(0L)))
      } yield (
        l.zipWithIndex.map { case ((u, t, _), i) => (i.toLong, u, t) },
        r.zipWithIndex.map { case ((u, t, _), i) =>
          (1000L + i, u, t) })
    samples(evs, 8).zipWithIndex.foreach { case ((ls, rs), ci) =>
      def df(rows: Seq[(Long, Long, Long)]) = rows
        .toDF("event_id", "user_id", "sec")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("sec")).as("ts"))
      // reference: most recent right of same user at-or-before the
      // left ts; ties broken by LARGEST (es, event_id) — the window's
      // last-value over es asc, id asc order
      def refMatch(u: Long, t: Long, tol: Option[Long]): Option[Long] = {
        val c = rs.filter(r => r._2 == u && r._3 <= t &&
          tol.forall(b => t - r._3 <= b))
        if (c.isEmpty) None
        else Some(c.maxBy(r => (r._3, r._1))._1)
      }
      val plain = EventsOps.asOfJoin(df(ls), df(rs))
        .collect().map(r => (r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toList
        .groupBy(identity).view.mapValues(_.size).toMap
      val refPlain = ls.map(l =>
          (l._1, refMatch(l._2, l._3, None))).map(t => (t._1, t._2))
      // compare per left event id via a keyed map
      val gotById = EventsOps.asOfJoin(df(ls), df(rs))
        .collect().map(r => r.getLong(1) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      refPlain.foreach { case (id, m) =>
        assert(gotById(id) === m, s"stream $ci left $id: as-of mismatch")
      }
      val gotTol = EventsOps.asOfJoinTolerance(df(ls), df(rs), 5L)
        .collect().map(r => r.getLong(1) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      ls.foreach { l =>
        // tolerance applies to the WINDOW'S chosen last right row (the
        // engine checks staleness post-selection), so the reference is
        // the unbounded match filtered by staleness
        val m = refMatch(l._2, l._3, None)
          .filter(rid => l._3 - rs.find(_._1 == rid).get._3 <= 5L)
        assert(gotTol(l._1) === m,
          s"stream $ci left ${l._1}: tolerance as-of mismatch")
      }
      assert(plain.values.sum == ls.size)
    }
  }

  test("pageRankFixed == an in-memory integer reference on generated " +
      "weighted graphs (identical div/damp arithmetic)") {
    import graft.ops.Graph
    val edges: Gen[List[(Long, Long, Long)]] = Gen.choose(1, 30).flatMap(
      n => Gen.listOfN(n, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L),
        Gen.choose(1L, 5L))))
    samples(edges, 6).zipWithIndex.foreach { case (es0, ci) =>
      val es = es0.filter { case (a, b, _) => a != b }
      if (es.nonEmpty) {
        val df = es.toDF("src", "dst", "w")
        val got = Graph.pageRankFixed(df, iters = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // reference replicating the engine's exact integer arithmetic
        val scale = 1000000000000L
        val ew = es.groupBy(e => (e._1, e._2))
          .map { case ((s, d), g) => (s, d, g.map(_._3).sum) }.toSeq
        val outw = ew.groupBy(_._1).map { case (s, g) =>
          s -> g.map(_._3).sum }
        val nodes = (ew.map(_._1) ++ ew.map(_._2)).distinct
        val n = nodes.length
        val base = (scale - scale * 85 / 100) / n
        var r = nodes.map(_ -> scale / n).toMap
        for (_ <- 1 to 3) {
          val inflow = ew.groupBy(_._2).map { case (d, g) =>
            d -> g.map { case (s, _, w) =>
              Math.floorDiv(r(s) * w, outw(s)) }.sum }
          r = nodes.map(nd =>
            nd -> (base + Math.floorDiv(
              85 * inflow.getOrElse(nd, 0L), 100))).toMap
        }
        assert(got === r, s"graph $ci: pagerank mismatch")
      }
    }
  }

  test("spearmanCorr == spearmanCorrDomain on generated tie-heavy " +
      "groups") {
    val grps: Gen[List[(String, Long, Long)]] =
      Gen.choose(8, 60).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0L, 9L),
          Gen.choose(0L, 9L))))
    samples(grps, 8).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("k", "x", "y")
      def run(f: => org.apache.spark.sql.DataFrame) =
        f.orderBy("k").collect()
          .map(r => (r.getString(0), r.get(1))).toSeq
      val w = run(Agg.spearmanCorr(df, "k", "x", "y"))
      val d = run(Agg.spearmanCorrDomain(df, "k", "x", "y"))
      assert(w === d, s"table $ci: windowed != domain")
      // force the two-level cumulant (the generated domains are small,
      // so the default dispatch routes one-level — this keeps the
      // bucketed path under generated-input coverage too)
      val d2 = run(Agg.spearmanCorrDomain(df, "k", "x", "y",
        oneLevelMaxDomain = 0L))
      assert(w === d2, s"table $ci: windowed != two-level domain")
    }
  }

  test("domainCum one-level == forced two-level on generated " +
      "histograms — the round-12 internal size dispatch cannot change " +
      "__cum") {
    val grps: Gen[List[(String, Long)]] = Gen.choose(5, 80).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(-50L, 50L))))
    samples(grps, 8).zipWithIndex.foreach { case (rows, ci) =>
      val h = rows.toDF("k", "v")
        .groupBy(col("k"), col("v").cast("double").as("__v"))
        .agg(count(lit(1)).as("__c"))
      def cum(oneLevelMax: Long) =
        Agg.domainCum(h, "k", "__v", "__c", 4, oneLevelMax)
          .select("k", "__v", "__cum").collect()
          .map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2)))
          .toMap
      assert(cum(Long.MaxValue) === cum(0L),
        s"table $ci: dispatch levels disagree")
    }
  }
}
