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
}
