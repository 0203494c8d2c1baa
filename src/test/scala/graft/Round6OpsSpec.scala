package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Num, Text}

/** Round-6 wave: fixed-point integer PageRank and PMI collocation mining.
  * The PageRank values below are HAND-COMPUTED from the recurrence — the
  * integer formulation makes every intermediate exactly reproducible on
  * paper, which is the determinism claim under test.
  */
class Round6OpsSpec extends SparkSpec {

  import spark.implicits._

  private val S = 1000000000000L // default scale in Graph.pageRankFixed

  test("pageRankFixed: symmetric 2-cycle is a fixpoint at scale/2 each") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankFixed(edges, iters = 3)
      .orderBy("node").as[(String, Long)].collect()
    // base = (S - 0.85S)/2 = 75e9; inflow = 0.5S; r' = 75e9 + 0.85*0.5S
    // = 0.5S — every round reproduces r exactly
    assert(got === Array(("a", S / 2), ("b", S / 2)))
  }

  test("pageRankFixed: dangling sink keeps base share; values exact") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankFixed(edges, iters = 3)
      .orderBy("node").as[(String, Long)].collect().toMap
    // base = 75e9. a never receives: r(a) = base after round 1.
    // round 1: inflow(b) = r0(a) = 5e11 -> r1(b) = 75e9 + 425e9 = 5e11
    // rounds 2,3: inflow(b) = r(a) = 75e9 -> r(b) = 75e9 + 63.75e9
    assert(got("a") === 75000000000L)
    assert(got("b") === 138750000000L)
  }

  test("pageRankFixed: result is partitioning-invariant (the integer " +
      "determinism claim) and mass never exceeds scale") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val a = Graph.pageRankFixed(edges.repartition(7), iters = 2)
      .orderBy("node").as[(String, Long)].collect()
    val b = Graph.pageRankFixed(edges.repartition(2), iters = 2)
      .orderBy("node").as[(String, Long)].collect()
    assert(a === b)
    // floored shares strictly under-distribute: total mass <= scale,
    // and stays within 1% of it on a symmetrized (dangling-free) graph
    val mass = a.map(_._2).sum
    assert(mass <= S, s"mass $mass exceeds scale")
    assert(mass >= S - S / 100, s"mass $mass lost > 1% to flooring")
  }

  test("pmiTopK: perfectly-coupled bigram scores ln(n_uni^2/(n_bg*c_ab)); " +
      "minCount prunes hapax pairs") {
    // 5 docs of "a b": c_ab=5, c_a=c_b=5, n_uni=10, n_bg=5
    // pmi = ln((5/5) / ((5/10)*(5/10))) = ln 4
    val docs = (1L to 5L).map(i => (i, "a b")).toDF("doc_id", "text")
    val got = Text.pmiTopK(docs, "doc_id", "text", minCount = 5, k = 10)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (bigram, cab, ca, cb, pmi) = got.head
    assert(bigram === "a b" && cab === 5L && ca === 5L && cb === 5L)
    assert(pmi === math.floor(math.log(4.0) * 1e6) / 1e6)

    // the same corpus with one extra "x y" doc: the hapax pair is below
    // minCount and must not appear
    val docs2 = docs.unionByName(Seq((6L, "x y")).toDF("doc_id", "text"))
    val got2 = Text.pmiTopK(docs2, "doc_id", "text", minCount = 5, k = 10)
      .select("bigram").as[String].collect()
    assert(got2 === Array("a b"))
  }

  test("componentsIncremental: delta fold equals from-scratch CC — " +
      "merge of two standing components, attach, and new component") {
    import graft.ops.Dedup
    // standing graph: {1,2} root 1, {5,6} root 5, {10,11,12} root 10
    val base = Seq((1L, 2L), (5L, 6L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    // delta: merges {1,2}+{5,6} (via 2-5), attaches new node 13 to root
    // 10's component, creates brand-new {20,21}, and one edge internal
    // to an existing component (11-12, must be a no-op)
    val delta = Seq((2L, 5L), (13L, 12L), (20L, 21L), (11L, 12L))
      .toDF("id_a", "id_b")
    val standing = Dedup.componentsConverged(base)
    val inc = Dedup.componentsIncremental(standing, delta)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val scratch = Dedup.componentsConverged(base.unionByName(delta))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(inc === scratch)
    assert(inc.toMap === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("componentsIncremental: empty contracted graph (all-internal " +
      "delta) keeps standing labels; equality holds on the real " +
      "near-dup pair graph") {
    import graft.ops.Dedup
    val base = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val standing = Dedup.componentsConverged(base)
    val inc = Dedup.componentsIncremental(standing,
        Seq((1L, 3L)).toDF("id_a", "id_b"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(inc === Array((1L, 1L), (2L, 1L), (3L, 1L)))

    // the q140 composition on real data: incremental == from-scratch
    val pairs = Dedup.lshVerifiedPairs(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text", k = 8, bands = 4, minJaccard = 0.2)
      .localCheckpoint()
    val h = conv(substring(md5(concat(col("id_a"), lit(":"),
      col("id_b"))), 1, 8), 16, 10).cast("long")
    val incReal = Dedup.componentsIncremental(
        Dedup.componentsConverged(pairs.where(h % 5 =!= 0)),
        pairs.where(h % 5 === 0))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val scratchReal = Dedup.componentsConverged(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(incReal === scratchReal)
    assert(incReal.nonEmpty)
  }

  test("hardNegatives: every mined negative has a different label, ranks " +
      "are dense, and similarity is non-increasing per anchor") {
    import graft.ops.Sim
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val labels = emb.select(col("vec_id"), col("label"))
    val got = Sim.hardNegatives(emb.where(col("vec_id") < 5), emb, k = 5)
    val withLabels = got
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("ql")), "q_id")
      .join(labels.select(col("vec_id").as("c_id"),
        col("label").as("cl")), "c_id")
    assert(withLabels.where(col("ql") === col("cl")).count() === 0L,
      "a hard negative shares its anchor's label")
    val rows = got.orderBy("q_id", "rk")
      .as[(Long, Long, Double, Int)].collect()
    rows.groupBy(_._1).foreach { case (qId, rs) =>
      assert(rs.map(_._4).sorted === (1 to rs.length).toArray, s"q$qId")
      assert(rs.sortBy(_._4).map(_._3).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)), s"q$qId: sim not non-increasing")
    }
    assert(rows.nonEmpty)
  }

  test("pmiTopK: independent tokens score near zero, coupled pair ranks " +
      "first") {
    // "p q" always together (coupled); "u"/"v" mixed across docs so the
    // "u v" bigram occurs at roughly independence
    val docs = ((1L to 6L).map(i => (i, "p q u v")) ++
      (7L to 12L).map(i => (i, "v u p q"))).toDF("doc_id", "text")
    val top = Text.pmiTopK(docs, "doc_id", "text", minCount = 5, k = 1)
      .select("bigram").as[String].head()
    assert(top === "p q")
  }

  test("triangleStats: 4-clique counts C(4,3)=4 triangles, coeff 1.0") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("id_a", "id_b")
    val r = Graph.triangleStats(pairs)
      .as[(Long, Long, Long, Double)].head()
    // 6 edges; wedges = 4 nodes * C(3,2) = 12; 3*4/12 = 1.0
    assert(r === ((6L, 12L, 4L, 1.0)))
  }

  test("triangleStats: path graph has wedges but zero triangles") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Graph.triangleStats(pairs)
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((3L, 2L, 0L, 0.0)))
  }

  test("exactOls: perfect line recovers slope/intercept exactly, r2 -> 1") {
    // y = 2x + 3 over two groups; integer sums are decimal-exact so the
    // closed forms are exact up to the output floors
    val rows = for (g <- Seq("a", "b"); x <- 1 to 10)
      yield (g, x.toDouble, 2.0 * x + 3.0)
    val got = graft.ops.Agg.exactOls(rows.toDF("k", "x", "y"), "k", "x", "y")
      .orderBy("k").as[(String, Long, Double, Double, Double)].collect()
    got.foreach { case (k, n, slope, intercept, r2) =>
      assert(n === 10L, k)
      assert(slope === 2.0, s"$k slope")
      assert(intercept === 3.0, s"$k intercept")
      assert(r2 >= 0.999999, s"$k r2 $r2") // 6dp floor of an ulp-below-1
    }
  }

  test("tokenBudgetSample: admitted sets are prefix-closed per group, " +
      "within budget, and monotone in the budget") {
    val docs = (1L to 40L).map(i =>
      (i, s"src${i % 4}", Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val small = graft.ops.Curate.tokenBudgetSample(
      docs, "doc_id", "source", "text", budget = 12L)
      .as[(Long, String, Long, Long)].collect()
    val big = graft.ops.Curate.tokenBudgetSample(
      docs, "doc_id", "source", "text", budget = 25L)
      .as[(Long, String, Long, Long)].collect()
    assert(small.nonEmpty && small.length < 40)
    small.groupBy(_._2).foreach { case (g, rs) =>
      assert(rs.map(_._4).max <= 12L, s"group $g over budget")
      // cum_tokens of the admitted rows must be exactly the running sum
      // of their own token counts in cum order — i.e. a closed prefix
      val inOrder = rs.sortBy(_._4)
      assert(inOrder.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ===
        inOrder.map(_._4).toSeq, s"group $g not a closed prefix")
    }
    val smallIds = small.map(_._1).toSet
    val bigIds = big.map(_._1).toSet
    assert(smallIds.subsetOf(bigIds), "larger budget must be a superset")
    assert(bigIds.size > smallIds.size)
  }

  test("crossSourceOverlap: identical sources overlap fully, disjoint " +
      "vocab never pairs") {
    val docs = Seq(
      (1L, "A", "alpha beta gamma delta"),
      (2L, "B", "alpha beta gamma delta"),
      (3L, "C", "zig zag zoom whirl")).toDF("doc_id", "source", "text")
    val got = graft.ops.Curate.crossSourceOverlap(docs, "source", "text")
      .as[(String, String, Long, Double)].collect()
    assert(got.length === 1)
    val (a, b, n, coeff) = got.head
    assert(a === "A" && b === "B")
    assert(n === 2L) // two 3-gram shingles in a 4-token doc
    assert(coeff === 1.0)
  }

  test("dailyAnomalies: a 10x day trips the z-threshold, steady days " +
      "do not, and constant-count types are dropped") {
    // type "spiky": 11 days of 10 events + one day of 100 (z ~ 3.17);
    // type "flat": constant counts -> zero variance -> dropped
    val rows =
      (for (d <- 0 until 12; i <- 0 until (if (d == 11) 100 else 10))
        yield ("spiky", d.toLong * 86400 + i)) ++
      (for (d <- 0 until 12; i <- 0 until 5)
        yield ("flat", d.toLong * 86400 + i))
    val events = rows.toDF("event_type", "es")
      .select(col("event_type"), to_timestamp(col("es")).as("ts"))
    val got = graft.ops.EventsOps.dailyAnomalies(events)
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(got.forall(_._1 === "spiky"), "flat type must be dropped")
    assert(got.length === 12)
    val flagged = got.filter(_._5)
    assert(flagged.map(_._2).toSeq === Seq(11L), "only the spike day")
    assert(flagged.head._4 >= 3.0 && flagged.head._4 <= 3.2)
    assert(got.filterNot(_._5).forall(r => math.abs(r._4) < 3.0))
  }

  test("keyProfile: hand-computed skew stats, deterministic hot-key " +
      "tie-break, advisory threshold") {
    // key a: 8 rows, b: 1, c: 1 -> mean 10/3, skew = 8/(10/3) = 2.4
    val df = (Seq.fill(8)("a") ++ Seq("b", "c")).toDF("k")
    val r = graft.ops.Skew.keyProfile(df, "k")
      .as[(String, Long, Long, Long, String, Double, Double, Boolean)]
      .head()
    assert(r === (("k", 10L, 3L, 8L, "a", 3.3333, 2.4, false)))
    // tied counts resolve to the LARGEST key string (max_by on (cnt, k))
    val tied = Seq("x", "y").toDF("k")
    val rt = graft.ops.Skew.keyProfile(tied, "k")
      .as[(String, Long, Long, Long, String, Double, Double, Boolean)]
      .head()
    assert(rt._5 === "y" && rt._7 === 1.0 && !rt._8)
    // a genuinely hot key trips the advisory at the AQE-like factor
    val hot = (Seq.fill(96)("hot") ++ (1 to 16).map(_.toString)).toDF("k")
    val rh = graft.ops.Skew.keyProfile(hot, "k")
      .as[(String, Long, Long, Long, String, Double, Double, Boolean)]
      .head()
    // mean = 112/17 ~ 6.588, skew = 96/6.588 ~ 14.57 -> salt
    assert(rh._5 === "hot" && rh._8, s"skew ${rh._7} should advise salt")
  }

  test("overlapJoinBinned: equals the plain overlap predicate across " +
      "cell sizes; touching half-open intervals never match") {
    val a = Seq((1L, 0L, 10L), (2L, 30L, 35L), (3L, 95L, 130L))
      .toDF("a_id", "s", "e")
    val b = Seq((10L, 5L, 12L), (20L, 10L, 20L), (30L, 100L, 101L),
      (40L, 34L, 40L)).toDF("b_id", "bs", "be")
    val plain = a.crossJoin(b)
      .where(col("s") < col("be") && col("bs") < col("e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // a1-b10 overlap; a1-b20 touch at 10 (half-open: NO); a2-b40 overlap
    // at 34; a3-b30 spans a cell boundary for any cell <= 35
    assert(plain === Set((1L, 10L), (2L, 40L), (3L, 30L)))
    for (cell <- Seq(1L, 7L, 32L, 1000L)) {
      val binned = graft.ops.EventsOps.overlapJoinBinned(a, b, cell)
        .select("a_id", "b_id").distinct()
        .as[(Long, Long)].collect().toSet
      assert(binned === plain, s"cell=$cell")
    }
  }

  test("tombstoneSweep: removes exactly the tombstoned ids per table, " +
      "counts reconcile") {
    val d1 = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    val d2 = (5L to 14L).map(i => (i, i * 2)).toDF("k", "w")
    val tomb = Seq(2L, 5L, 14L, 99L).toDF("tomb_id") // 99 hits nothing
    val got = graft.ops.Curate.tombstoneSweep(
        Seq(("t1", d1, "id"), ("t2", d2, "k")), tomb)
      .orderBy("table_name")
      .as[(String, Long, Long, Long)].collect()
    assert(got === Array(("t1", 10L, 2L, 8L), ("t2", 10L, 2L, 8L)))
  }

  test("vocabEntropy: uniform vocabulary scores log2(V) bits, " +
      "single-token text scores zero") {
    val docs = Seq(
      (1L, "u", "aa bb cc dd aa bb cc dd"), // uniform over 4 terms
      (2L, "m", "aa aa aa aa")).toDF("doc_id", "source", "text")
    val got = graft.ops.Text.vocabEntropy(docs, "source", "text")
      .orderBy("grp").as[(String, Long, Long, Double)].collect()
    val byG = got.map(r => r._1 -> r).toMap
    assert(byG("u")._2 === 8L && byG("u")._3 === 4L)
    assert(byG("u")._4 === 2.0, "uniform over 4 terms = 2 bits exactly")
    assert(byG("m")._2 === 4L && byG("m")._3 === 1L && byG("m")._4 === 0.0)
  }

  test("mixtureWeights: alpha=1 reproduces shares, alpha=0 is uniform, " +
      "weights always sum to ~1") {
    val docs = Seq(
      (1L, "big", Seq.fill(90)("t").mkString(" ")),
      (2L, "sml", Seq.fill(10)("t").mkString(" ")))
      .toDF("doc_id", "source", "text")
    def run(a: Double) = graft.ops.Curate.mixtureWeights(
        docs, "source", "text", alpha = a, budget = 1000L)
      .orderBy("grp").as[(String, Long, Double, Double, Long)].collect()
    val prop = run(1.0)
    assert(prop.map(r => (r._1, r._2, r._3, r._4)) ===
      Array(("big", 90L, 0.9, 0.9), ("sml", 10L, 0.1, 0.1)))
    assert(prop.map(_._5).toSeq === Seq(900L, 100L))
    val unif = run(0.0)
    assert(unif.forall(_._4 === 0.5), "alpha=0 must be uniform")
    // alpha=0.5 sits strictly between: sml upweighted, big downweighted
    val mid = run(0.5)
    val byG = mid.map(r => r._1 -> r._4).toMap
    assert(byG("sml") > 0.1 && byG("sml") < 0.5)
    assert(byG("big") < 0.9 && byG("big") > 0.5)
    assert(math.abs(mid.map(_._4).sum - 1.0) < 1e-4)
  }

  test("multiTouchFunnel: every occurrence judged against the NEXT " +
      "target; same-timestamp target counts via event_id order; window " +
      "bound is inclusive") {
    val rows = Seq(
      // u1: view@0 -> purchase@100 (converts); view@8000 -> nothing
      (1L, 1L, "view", 0L), (2L, 1L, "purchase", 100L),
      (3L, 1L, "view", 8000L),
      // u2: view@0 -> purchase@9000 (outside 7200; no conversion)
      (4L, 2L, "view", 0L), (5L, 2L, "purchase", 9000L),
      // u3: purchase BEFORE the view never counts; same-ts purchase
      // with a LARGER event_id is "following" and converts at bound 0
      (6L, 3L, "purchase", 50L), (7L, 3L, "view", 200L),
      (8L, 3L, "purchase", 200L))
      .toDF("event_id", "user_id", "event_type", "es")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("es")).as("ts"))
    val got = graft.ops.EventsOps.multiTouchFunnel(
        rows, "view", "purchase", 7200)
      .orderBy("day").as[(Long, Long, Long, Double)].collect()
    // all events are on day 0: 4 views, converted = u1@0 and u3@200
    assert(got === Array((0L, 4L, 2L, 50.0)))
  }

  test("neymanAllocation: budget splits proportional to N*sigma, " +
      "constant strata get zero, weights sum to 1") {
    // stratum a: 4 rows of {0,0,10,10} -> sd = sqrt(100/3) ~ 5.7735
    // stratum b: 8 rows alternating {0,20} -> sd = sqrt(800/7) ~ 10.6904
    // stratum c: constant -> sd 0 -> weight 0
    val rows = Seq(("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 10.0)) ++
      (1 to 8).map(i => ("b", if (i % 2 == 0) 20.0 else 0.0)) ++
      Seq(("c", 7.0), ("c", 7.0))
    val got = graft.ops.Agg.neymanAllocation(
        rows.toDF("k", "v"), "k", "v", budget = 1000L)
      .orderBy("stratum").as[(String, Long, Double, Double, Long)]
      .collect()
    val byK = got.map(r => r._1 -> r).toMap
    assert(byK("c")._3 === 0.0 && byK("c")._4 === 0.0 &&
      byK("c")._5 === 0L)
    // N*sd: a = 4*5.7735 = 23.094, b = 8*10.6904 = 85.523 -> a gets
    // ~21.26%, b ~78.73%
    assert(byK("a")._4 > 0.21 && byK("a")._4 < 0.22, byK("a").toString)
    assert(byK("b")._4 > 0.78 && byK("b")._4 < 0.79, byK("b").toString)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
    assert(got.map(_._5).sum <= 1000L, "floor can undershoot, never over")
  }

  test("psiDrift: a mix swap across the midpoint trips the 0.2 line, " +
      "a stable mix does not, and absent-in-one-era types stay finite") {
    // days 0..9; era a = days 0..4, era b = 5..9 (midpoint 4.5)
    def ev(ty: String, day: Long, i: Long) = (ty, day * 86400 + i)
    // drifted: 'x' dominates era a, 'y' era b, 'z' ONLY in era b
    val drift = ((0L to 4L).flatMap(d => (0L until 20L).map(ev("x", d, _))) ++
      (5L to 9L).flatMap(d => (0L until 20L).map(ev("y", d, _))) ++
      (5L to 9L).flatMap(d => (0L until 4L).map(ev("z", d, _))))
      .toDF("event_type", "es")
      .select(col("event_type"), to_timestamp(col("es")).as("ts"))
    val got = graft.ops.EventsOps.psiDrift(drift)
      .as[(String, Double, Double, Double, Double, Boolean)].collect()
    assert(got.forall(_._6), "swap must read as drifted")
    assert(got.forall(r => !r._4.isNaN && !r._4.isInfinite),
      "smoothing must keep absent-era types finite")
    assert(got.head._5 > 0.2)
    // stable: the same mix in both eras
    val stable = ((0L to 9L).flatMap(d => (0L until 10L).map(ev("x", d, _))) ++
      (0L to 9L).flatMap(d => (0L until 10L).map(ev("y", d, _))))
      .toDF("event_type", "es")
      .select(col("event_type"), to_timestamp(col("es")).as("ts"))
    val s = graft.ops.EventsOps.psiDrift(stable)
      .as[(String, Double, Double, Double, Double, Boolean)].collect()
    assert(s.forall(!_._6), s"stable mix flagged: ${s.head._5}")
    assert(math.abs(s.head._5) < 0.01)
  }

  test("q157 survivor-by-quality: exactly one survivor per component " +
      "and it carries the component's max score") {
    val rows = SparkEntry.queries("q157_survivor_quality")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (comp, rs) =>
      val survivors = rs.filter(_._4)
      assert(survivors.length === 1, s"component $comp")
      assert(survivors.head._3 === rs.map(_._3).max,
        s"component $comp survivor is not the best")
    }
  }

  test("winsorize: hand-computed p-bounds on 1..100, clip counts " +
      "match, outliers bounded into [p_lo, p_hi]") {
    // values 1..100 in one group: rank floor(99*.05)+1 = 5 -> lo = 5,
    // rank floor(99*.95)+1 = 95 -> hi = 95; {1..4} clip low (4 values),
    // {96..100} clip high (5); mean = (4*5 + sum(5..95) + 5*95)/100
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = graft.ops.Agg.winsorize(df, "k", "v", 0.05, 0.95)
      .as[(String, Long, Double, Double, Long, Long, Double)].head()
    val mean = (4.0 * 5 + (5 to 95).sum + 5.0 * 95) / 100
    assert(r === (("g", 100L, 5.0, 95.0, 4L, 5L,
      math.floor(mean * 10000) / 10000)))
  }

  test("botProfile: bursty high-rate single-action user flags, slow " +
      "diverse user does not, entropy reflects action mix") {
    // bot: 10 events in one minute, one day, one type -> epd 10,
    // burst 10, entropy 0. human: 4 events over 2 days, 2 types,
    // spread minutes -> epd 2, burst 1.
    val rows =
      (0L until 10L).map(i => (100L + i, 1L, "click", i * 2)) ++
      Seq((200L, 2L, "click", 0L), (201L, 2L, "view", 3600L),
        (202L, 2L, "click", 86400L), (203L, 2L, "view", 90000L))
    val events = rows.toDF("event_id", "user_id", "event_type", "es")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("es")).as("ts"))
    val got = graft.ops.EventsOps.botProfile(events)
      .orderBy("user_id")
      .as[(Long, Long, Long, Double, Long, Double, Boolean)].collect()
    val (bot, human) = (got(0), got(1))
    assert(bot === ((1L, 10L, 1L, 10.0, 10L, 0.0, true)))
    assert(human._1 === 2L && human._5 === 1L && !human._7)
    assert(human._6 === 1.0, "2 types evenly mixed = 1 bit")
  }

  test("benfordProfile: exact Benford counts pass, all-9s data fails, " +
      "digits and shares hand-check") {
    // 1000 values distributed EXACTLY per Benford (301, 176, 125, 97,
    // 79, 67, 58, 51, 46): chi2 ~ 0 -> follows. Values d * 10.
    val bCounts = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
    val good = bCounts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(((i + 1) * 10).toDouble) }.toDF("v")
    val g = graft.ops.Agg.benfordProfile(good, "v")
      .orderBy("digit")
      .as[(Int, Long, Double, Double, Double, Double, Boolean)].collect()
    assert(g.map(_._1).toSeq === (1 to 9))
    assert(g.map(_._2).toSeq === bCounts.map(_.toLong))
    assert(g.forall(_._7), s"chi2 ${g.head._6} should pass")
    // 500 values all starting with 9: chi2 explodes -> fails
    val bad = Seq.fill(500)(99.0).toDF("v")
    val b = graft.ops.Agg.benfordProfile(bad, "v").collect()
    assert(b.forall(!_.getBoolean(6)))
  }

  test("kAnonymity: class sizes, below-k flags, and corpus k_min") {
    val df = (Seq.fill(12)(("a", "en")) ++ Seq.fill(3)(("a", "fr")) ++
      Seq.fill(10)(("b", "en"))).toDF("source", "lang")
    val r = graft.ops.Agg.kAnonymity(df, Seq("source", "lang"), k = 10)
      .orderBy("source", "lang")
      .as[(String, String, Long, Boolean, Long)].collect()
    assert(r === Array(("a", "en", 12L, false, 3L),
      ("a", "fr", 3L, true, 3L), ("b", "en", 10L, false, 3L)))
  }

  test("zipfFit: an exact 1/rank corpus fits alpha ~ 1 with r2 ~ 1; a " +
      "uniform corpus fits alpha ~ 0") {
    // term t<letter> occurs floor(720/rank) times for ranks 1..12
    // (letter-only tokens: clean_text strips digits)
    def tok(prefix: String, r: Int) = prefix + ('a' + r - 1).toChar
    val zipfToks = (1 to 12).flatMap(r => Seq.fill(720 / r)(tok("t", r)))
    val zipf = Seq(zipfToks.mkString(" ")).toDF("text")
    val z = graft.ops.Text.zipfFit(zipf, "text", k = 12)
      .as[(Long, Long, Double, Double)].head()
    assert(z._1 === 12L && z._2 === 720L)
    assert(z._3 > 0.95 && z._3 < 1.05, s"alpha ${z._3}")
    assert(z._4 > 0.99, s"r2 ${z._4}")
    val unif = Seq((1 to 12).flatMap(r =>
      Seq.fill(50)(tok("u", r))).mkString(" ")).toDF("text")
    val u = graft.ops.Text.zipfFit(unif, "text", k = 12)
      .as[(Long, Long, Double, Double)].head()
    assert(math.abs(u._3) < 0.01, s"uniform alpha ${u._3}")
  }

  test("keyUniquenessProfile: duplicate keys counted per table, clean " +
      "tables report zero, composite keys respected") {
    val t1 = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    val t2 = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L))
      .toDF("a", "b")
    val r = graft.ops.Dedup.keyUniquenessProfile(Seq(
        ("t1", t1, Seq("id")), ("t2", t2, Seq("a", "b"))))
      .orderBy("table_name")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r === Array(("t1", 3L, 2L, 1L, 0.333333),
      ("t2", 4L, 3L, 1L, 0.25)))
  }

  test("q166 dedup impact: removed docs+tokens reconcile with the CC " +
      "loser set; retention in (0, 1]") {
    val rows = SparkEntry.queries("q166_dedup_impact")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nRem, tokTot, tokRem, ret) =>
      assert(nRem <= nDocs && tokRem <= tokTot, src)
      assert(ret > 0.0 && ret <= 1.0, s"$src retention $ret")
    }
    // cross-check the removed-doc total against the CC loser count
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val losers = graft.ops.Dedup.componentsConverged(
        graft.ops.Dedup.lshVerifiedPairs(docs, "doc_id", "text",
          k = 8, bands = 4, minJaccard = 0.2))
      .where(col("doc_id") =!= col("component")).count()
    assert(rows.map(_._3).sum === losers)
  }

  test("triangleStats: star hub contributes wedges, never triangles — " +
      "and the orientation sends every edge AWAY from the leaves") {
    // hub 0 connected to 5 leaves: wedges = C(5,2) = 10, triangles 0.
    // With degree ordering every edge orients leaf->hub, so the wedge
    // self-join on src matches nothing — the hub never fans out.
    val pairs = (1L to 5L).map(l => (0L, l)).toDF("id_a", "id_b")
    val r = Graph.triangleStats(pairs)
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((5L, 10L, 0L, 0.0)))
  }
}
