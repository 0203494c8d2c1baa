package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sim, Text}

/** Round-8 operators: embedding audit (degenerate-vector paths the
  * fixture doesn't contain), containment pairs (the subset signature
  * Jaccard under-reports), vocabulary growth (hand-checked counts).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingAudit counts zero / non-finite / mixed-dim vectors and " +
      "profiles norms over the finite ones only") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f), 0),            // norm 5
      (2L, Array(0.0f, 0.0f), 0),            // zero vector
      (3L, Array(Float.NaN, 1.0f), 0),       // non-finite
      (4L, Array(Float.PositiveInfinity, 0.0f), 0), // non-finite
      (5L, Array(6.0f, 8.0f, 0.0f), 0),      // dim 3 (mixed), norm 10
      (6L, Array(1.0f, 0.0f), 1)             // second label, norm 1
    ).toDF("vec_id", "embedding", "label")
    val rows = Sim.embeddingAudit(emb).orderBy("label").collect()
    val l0 = rows(0)
    assert(l0.getAs[Long]("n_vecs") === 5L)
    assert(l0.getAs[Long]("n_dims") === 2L)
    assert(l0.getAs[Long]("n_zero") === 1L)
    assert(l0.getAs[Long]("n_nonfinite") === 2L)
    // finite norms: 5, 0, 10 -> mean 5.0, min 0, max 10
    assert(l0.getAs[Double]("mean_norm") === 5.0)
    assert(l0.getAs[Double]("min_norm") === 0.0)
    assert(l0.getAs[Double]("max_norm") === 10.0)
    val l1 = rows(1)
    assert(l1.getAs[Long]("n_vecs") === 1L &&
      l1.getAs[Double]("mean_norm") === 1.0)
  }

  test("containmentPairs: a doc fully embedded in a longer one reads " +
      "containment 1.0 on the short side while Jaccard stays moderate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),                    // 3 shingles
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota " +
        "kappa lambda"),                                         // superset
      (3L, "totally unrelated words here now")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentPairs(docs, pairs, "doc_id", "text")
      .collect().head
    // doc 1: 3 distinct shingles, all present in doc 2 (9 shingles)
    assert(r.getAs[Double]("containment_a") === 1.0)
    assert(r.getAs[Double]("containment_b") ===
      math.floor(3.0 / 9.0 * 10000) / 10000)
  }

  test("vocabGrowth hand-check: hapax/dis counts, TTR, hapax share") {
    val docs = Seq(
      ("s1", "aa bb aa cc"),   // s1 tokens: aa*2 bb cc
      ("s1", "bb dd"),         // s1: bb*2, dd
      ("s2", "xx xx yy")
    ).toDF("source", "text")
    val m = Text.vocabGrowth(docs, "source", "text")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val s1 = m("s1")
    // s1: 6 tokens; vocab {aa(2), bb(2), cc(1), dd(1)}
    assert(s1.getAs[Long]("n_docs") === 2L)
    assert(s1.getAs[Long]("n_tokens") === 6L)
    assert(s1.getAs[Long]("vocab") === 4L)
    assert(s1.getAs[Long]("hapax") === 2L)
    assert(s1.getAs[Long]("dis_legomena") === 2L)
    assert(s1.getAs[Double]("ttr") === math.floor(4.0 / 6 * 1e6) / 1e6)
    assert(s1.getAs[Double]("hapax_share") === 0.5)
    val s2 = m("s2")
    assert(s2.getAs[Long]("vocab") === 2L &&
      s2.getAs[Long]("hapax") === 1L)
  }
}
