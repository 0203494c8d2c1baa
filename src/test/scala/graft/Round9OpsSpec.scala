package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Round-9 ANN additions: cell centroids, multi-probe IVF, and the
  * measured recall sweep (the q155 contract for the ANN family).
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated cells on the x/y axes plus one boundary query:
  // vec 5 sits at 45 degrees, its OWN cell is 1 but its brute top-1
  // (vec 1, the x-axis unit) lives in cell 0 — the exact neighbor
  // single-probe loses and the second probe buys back
  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.1f, 0.9f, 0.0f, 0.0f), 1),
    (5L, Array(0.8f, 0.75f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cellCentroids: exact per-dimension means, one row per cell") {
    val got = Sim.cellCentroids(emb, "label")
      .orderBy("cell")
      .as[(Int, Seq[Float], Double)].collect()
    assert(got.length === 2)
    val (c0, v0, _) = got(0)
    assert(c0 === 0 && v0(0) === 0.95f && v0(1) === 0.05f)
    val (c1, v1, _) = got(1)
    assert(c1 === 1)
    assert(math.abs(v1(0) - 0.3f) < 1e-6 &&
      math.abs(v1(1) - (1.0 + 0.9 + 0.75) / 3) < 1e-6)
  }

  test("topKIvf probes=1 keeps the own-cell contract; probes=2 on a " +
      "2-cell table equals brute-force topK") {
    val one = Sim.topKIvf(emb.where($"vec_id" === 5), emb, 2, "label")
      .select("c_id").as[Long].collect().toSet
    assert(one === Set(3L, 4L), "own-cell probe must stay inside cell 1")
    val multi = Sim.topKIvf(emb.where($"vec_id" === 5), emb, 2, "label",
        probes = 2)
      .orderBy("rk").as[(Long, Long, Double, Int)].collect()
    val brute = Sim.topK(emb.where($"vec_id" === 5), emb, 2)
      .orderBy("rk").as[(Long, Long, Double, Int)].collect()
    assert(multi === brute, "probing every cell must equal brute force")
    // and the best neighbor — vec 2, which lives in the OTHER cell
    // (cos 0.80 vs 0.76 for the best own-cell candidate) — is found
    assert(multi.map(_._2).contains(2L))
  }

  test("spearmanCorrDomain == spearmanCorr bit-for-bit on a fixture " +
      "with heavy ties (the two engines share one oracle)") {
    val df = Seq(
      ("a", 1.0, 10.0), ("a", 1.0, 20.0), ("a", 2.0, 20.0),
      ("a", 3.0, 30.0), ("a", 3.0, 30.0), ("a", 3.0, 5.0),
      ("b", 1.0, 9.0), ("b", 2.0, 8.0), ("b", 3.0, 7.0),
      ("b", 4.0, 6.0)
    ).toDF("k", "x", "y")
    val w = graft.ops.Agg.spearmanCorr(df, "k", "x", "y")
      .orderBy("k").as[(String, Long, Double)].collect()
    val d = graft.ops.Agg.spearmanCorrDomain(df, "k", "x", "y")
      .orderBy("k").as[(String, Long, Double)].collect()
    assert(w === d)
    assert(w(1)._3 === -1.0, "group b is perfectly anti-monotone")
  }

  test("both Spearman engines listwise-delete null pairs identically " +
      "(n excludes them; rho over the complete pairs only)") {
    val df = Seq[(String, java.lang.Double, java.lang.Double)](
      ("a", 1.0, 5.0), ("a", null, 6.0), ("a", 2.0, 7.0),
      ("a", 3.0, null), ("a", 4.0, 2.0)
    ).toDF("k", "x", "y")
    val w = graft.ops.Agg.spearmanCorr(df, "k", "x", "y")
      .as[(String, Long, Double)].collect()
    val d = graft.ops.Agg.spearmanCorrDomain(df, "k", "x", "y")
      .as[(String, Long, Double)].collect()
    assert(w === d)
    assert(w.head._2 === 3L, "null-bearing pairs dropped from n")
  }

  test("ivfRecallSweep: recall is non-decreasing in probes and reaches " +
      "1.0 when every cell is probed; hit counts are exact integers") {
    val got = Sim.ivfRecallSweep(emb, emb, 2, "label", maxProbes = 2)
      .orderBy("probes")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1, 2))
    val recalls = got.map(_._5)
    assert(recalls(0) <= recalls(1))
    assert(recalls(1) === 1.0, "2 probes over 2 cells == brute truth")
    got.foreach { case (_, nT, nA, nH, _) =>
      assert(nT === 10L) // 5 queries x k=2
      assert(nH <= nA && nA <= nT)
    }
  }
}
