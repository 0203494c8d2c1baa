package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Curate, Dedup, EventsOps, Sim, Text}

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

  test("ksTwoSample hand-check: D = 1/3 on offset triples, no rejection " +
      "at these sizes") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L)).toDF("grp", "x")
    val r = Agg.ksTwoSample(df, "grp", "x", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    // ECDF gap peaks at 1/3 (before v=2 and after v=3)
    assert(r.getAs[Double]("d_stat") ===
      math.floor(1.0 / 3.0 * 1e6) / 1e6)
    // crit = 1.358 * sqrt(6/9) ~ 1.108 > D
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("giniByGroup: 0 for equal values, hand-computed for a skewed " +
      "group, tie-stable") {
    val df = Seq(("eq", 5L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("sk", 1L), ("sk", 1L), ("sk", 1L), ("sk", 97L))
      .toDF("k", "x")
    val m = Agg.giniByGroup(df, "k", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(m("eq").getAs[Double]("gini") === 0.0)
    // sk: sum i*x = 1+2+3+4*97 = 394; G = 788/400 - 5/4 = 0.72
    assert(m("sk").getAs[Long]("total") === 100L)
    assert(m("sk").getAs[Double]("gini") === 0.72)
  }

  test("bagOfWordsDupGroups: reshuffled + repeated tokens share a key; " +
      "distinct vocab does not; keeper is min id") {
    val docs = Seq(
      (10L, "beta alpha alpha"),   // set {alpha, beta}
      (3L, "alpha beta"),          // same set, smaller id -> keeper
      (7L, "alpha beta gamma")     // superset: different key
    ).toDF("doc_id", "text")
    val r = Dedup.bagOfWordsDupGroups(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(3L, 10L))
    assert(r.head.getAs[Boolean]("is_keeper"))
    assert(!r(1).getAs[Boolean]("is_keeper"))
    assert(r.head.getAs[String]("bow_key") ===
      r(1).getAs[String]("bow_key"))
  }

  test("labelCentroidCosine: orthogonal and parallel centroids read 0 " +
      "and 1; n counts vectors per label") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 2.0f), 1),
      (4L, Array(2.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val m = Sim.labelCentroidCosine(emb).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) -> r)
      .toMap
    assert(m((0, 1)).getAs[Double]("cos_sim") === 0.0)
    assert(m((0, 2)).getAs[Double]("cos_sim") === 1.0)
    assert(m((1, 2)).getAs[Double]("cos_sim") === 0.0)
    assert(m((0, 1)).getAs[Long]("n_a") === 2L)
    assert(m((0, 1)).getAs[Long]("n_b") === 1L)
  }

  test("changepointScan picks the level-shift split with the " +
      "hand-computed scaled mean gap") {
    def at(day: Long, s: Long) = new Timestamp((day * 86400 + s) * 1000L)
    // day 0 mean 1, days 1-2 mean 5: best split after day 0
    val ev = Seq(
      (at(0, 10), 1.0), (at(0, 20), 1.0),
      (at(1, 10), 5.0), (at(1, 20), 5.0),
      (at(2, 10), 5.0), (at(2, 20), 5.0)
    ).toDF("ts", "value")
    val r = EventsOps.changepointScan(ev).collect().head
    assert(r.getAs[Long]("split_day") === 0L)
    assert(r.getAs[Long]("n_left") === 2L)
    assert(r.getAs[Long]("n_right") === 4L)
    // |1-5| * sqrt(2*4/6) = 4*sqrt(4/3)
    assert(r.getAs[Double]("shift_stat") ===
      math.floor(4.0 * math.sqrt(2.0 * 4.0 / 6.0) * 1e6) / 1e6)
  }

  test("commonRunPairs: a 4-token verbatim run reads 2 matching " +
      "shingles -> 4 tokens; a no-overlap pair reads 0") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "xx aa bb cc dd yy"),   // shares the run "aa bb cc dd"
      (3L, "qq rr ss tt uu vv")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val m = Dedup.commonRunPairs(docs, pairs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r)
      .toMap
    // w=3 shingles of the common run: "aa bb cc", "bb cc dd" -> 2
    // diagonal matches -> run 2, tokens 2 + 3 - 1 = 4
    assert(m((1L, 2L)).getAs[Long]("n_pos_matches") === 2L)
    assert(m((1L, 2L)).getAs[Long]("max_run_tokens") === 4L)
    assert(m((1L, 3L)).getAs[Long]("max_run_tokens") === 0L)
  }

  test("dupRateByBucket: k=2 median split, dup ids land in the short " +
      "bucket") {
    val docs = (1L to 10L).map(i => (i, i)).toDF("doc_id", "len")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Curate.dupRateByBucket(docs, pairs, "doc_id", "len", k = 2)
      .orderBy("bin").collect()
    // edge = min v with cum >= (10-1)*1 div 2 + 1 = 5 -> values 1..5
    // in bin 0 (with dups 1, 2), 6..10 in bin 1
    assert(r.length === 2)
    assert(r(0).getAs[Long]("n_docs") === 5L &&
      r(0).getAs[Long]("n_dup") === 2L &&
      r(0).getAs[Double]("dup_rate") === 0.4)
    assert(r(1).getAs[Long]("n_dup") === 0L)
  }

  test("idfWeightedJaccard hand-check: shared common term scores " +
      "below the unweighted Jaccard") {
    val docs = Seq(
      (1L, "aa bb"), (2L, "aa cc"), (3L, "dd")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.idfWeightedJaccard(docs, pairs, "doc_id", "text")
      .collect().head
    // N=3: idf(aa, df=2) = ln(4/2); idf(bb)=idf(cc)=ln(4/1); floored
    // at 6 dp the DECIMAL-exact ratio is 0.693147/3.465735 =
    // 0.1999999... -> floors to 0.199999 (a double-sum emulation lands
    // on the other side of the 0.2 boundary — the decimal sum is the
    // contract)
    assert(r.getAs[Long]("n_shared_tokens") === 1L)
    assert(r.getAs[Double]("w_jaccard") === 0.199999)
    // unweighted Jaccard would be 1/3 ~ 0.333; the stopword-ish shared
    // term drags the weighted score below it
    assert(r.getAs[Double]("w_jaccard") < 1.0 / 3.0)
  }

  test("bigramLogProb hand-check: twin two-token docs score " +
      "log2(0.5*1 + 0.5*1/2)") {
    val docs = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val r = Curate.bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    // c(aa bb)=2, c(aa.)=2, tf(bb)=2, N=4:
    // p = 0.5*2/2 + 0.5*2/4 = 0.75; log2 floored 9dp then mean
    // floored 6dp
    val lp9 = math.floor(math.log(0.75) / math.log(2.0) * 1e9) / 1e9
    val expect = math.floor(lp9 * 1e6) / 1e6
    r.foreach { row =>
      assert(row.getAs[Long]("n_bigrams") === 1L)
      assert(row.getAs[Double]("mean_log2p") === expect)
    }
  }

  test("vocabCoverage hand-check: top-1 and top-2 mass shares with " +
      "deterministic (tf desc, term) ties") {
    // tf: aa=3, bb=2, cc=1 -> total 6
    val docs = Seq((1L, "aa bb aa"), (2L, "aa bb cc")).toDF("doc_id", "text")
    val r = Text.vocabCoverage(docs, "text", Seq(1, 2, 10))
      .orderBy("k").collect()
    assert(r.map(_.getAs[Int]("k")).toSeq === Seq(1, 2, 10))
    assert(r(0).getAs[Long]("n_terms") === 1L &&
      r(0).getAs[Double]("coverage") === 0.5)
    assert(r(1).getAs[Double]("coverage") ===
      math.floor(5.0 / 6.0 * 1e6) / 1e6)
    // k beyond the vocab: n_terms clamps, coverage is 1.0
    assert(r(2).getAs[Long]("n_terms") === 3L &&
      r(2).getAs[Double]("coverage") === 1.0)
  }

  test("langConfusion: diagonal flag and row shares from a hand-built " +
      "prediction frame") {
    val preds = Seq(
      (1L, "en", "en"), (2L, "en", "en"), (3L, "en", "de"),
      (4L, "de", "de")
    ).toDF("doc_id", "lang", "pred_lang")
    val m = Text.langConfusion(preds).collect()
      .map(r => (r.getAs[String]("lang"),
        r.getAs[String]("pred_lang")) -> r).toMap
    assert(m(("en", "en")).getAs[Long]("n") === 2L)
    assert(m(("en", "en")).getAs[Double]("row_share") ===
      math.floor(2.0 / 3.0 * 1e6) / 1e6)
    assert(m(("en", "de")).getAs[Boolean]("is_correct") === false)
    assert(m(("de", "de")).getAs[Double]("row_share") === 1.0)
  }

  test("perplexityBuckets: 6 docs cut into exact terciles, head scores " +
      "above tail") {
    // distinct repetition levels -> distinct bigram scores
    val docs = Seq(
      (1L, "aa bb aa bb aa bb"), (2L, "aa bb aa bb cc dd"),
      (3L, "aa bb cc dd ee ff"), (4L, "gg hh ii jj kk ll"),
      (5L, "mm nn oo pp qq rr"), (6L, "ss tt uu vv ww xx")
    ).toDF("doc_id", "text")
    val r = Curate.perplexityBuckets(docs, "doc_id", "text")
      .orderBy("bucket").collect()
    assert(r.map(_.getAs[Int]("bucket")).toSeq === Seq(0, 1, 2))
    assert(r.map(_.getAs[Long]("n_docs")).toSeq === Seq(2L, 2L, 2L))
    // head bucket holds the highest (most fluent) scores
    assert(r(0).getAs[Double]("min_score") >=
      r(1).getAs[Double]("max_score"))
    assert(r(1).getAs[Double]("min_score") >=
      r(2).getAs[Double]("max_score"))
  }

  test("timeDecayedStats: one half-life halves the weight, anchored at " +
      "the corpus max ts") {
    val tmax = 100000L
    val ev = Seq(
      (new Timestamp(tmax * 1000L), "a", 2.0),
      (new Timestamp((tmax - 30L * 86400L) * 1000L), "a", 4.0),
      (new Timestamp(tmax * 1000L), "b", 10.0)
    ).toDF("ts", "event_type", "value")
    val m = EventsOps.timeDecayedStats(ev, halfLifeDays = 30.0)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    // w = 1 and w = 2^-1 = 0.5 exactly
    assert(m("a").getAs[Long]("n_events") === 2L)
    assert(m("a").getAs[Double]("decayed_count") === 1.5)
    assert(m("a").getAs[Double]("decayed_value") === 2.0 + 0.5 * 4.0)
    assert(m("b").getAs[Double]("decayed_count") === 1.0)
  }

  test("theilSenTrend: median pairwise slope on hand-built daily counts") {
    def at(day: Long, i: Long) = new Timestamp((day * 86400 + i) * 1000L)
    // type lin: counts 1,3,5 over days 0,1,2 -> every slope 2
    // type out: counts 1,2,9 -> slopes 1, 4, 7 -> median 4
    val rows =
      (0 until 1).map(i => (at(0, i), "lin")) ++
      (0 until 3).map(i => (at(1, i), "lin")) ++
      (0 until 5).map(i => (at(2, i), "lin")) ++
      (0 until 1).map(i => (at(0, i), "out")) ++
      (0 until 2).map(i => (at(1, i), "out")) ++
      (0 until 9).map(i => (at(2, i), "out"))
    val ev = rows.toDF("ts", "event_type")
    val m = EventsOps.theilSenTrend(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(m("lin").getAs[Long]("n_pairs") === 3L)
    assert(m("lin").getAs[Double]("slope") === 2.0)
    assert(m("out").getAs[Double]("slope") === 4.0)
  }

  test("winnowingFingerprints: identical text -> identical key; " +
      "selection density bounded; short docs absent") {
    val text1 = "aa bb cc dd ee ff gg hh ii jj kk ll"
    val docs = Seq(
      (1L, text1), (2L, text1),                    // twins
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo"), // disjoint
      (4L, "aa bb cc")                             // 1 shingle < window
    ).toDF("doc_id", "text")
    val r = Dedup.winnowingFingerprints(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 4 has 1 shingle < window=4 -> absent
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    assert(r(0).getAs[String]("fp_key") === r(1).getAs[String]("fp_key"))
    assert(r(0).getAs[String]("fp_key") !== r(2).getAs[String]("fp_key"))
    // 12 tokens -> 10 shingles -> 7 windows; between 1 and 7 selections
    assert(r(0).getAs[Int]("n_shingles") === 10)
    val ns = r(0).getAs[Int]("n_selected")
    assert(ns >= 1 && ns <= 7, ns.toString)
  }

  test("winnowingCandidatePairs: twins pair up on all their selected " +
      "hashes; disjoint docs never pair") {
    val text1 = "aa bb cc dd ee ff gg hh ii jj kk ll"
    val docs = Seq(
      (1L, text1), (2L, text1),
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingCandidatePairs(docs, "doc_id", "text")
      .collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getAs[Long]("id_a") === 1L && p.getAs[Long]("id_b") === 2L)
    val nSel = Dedup.winnowingFingerprints(docs, "doc_id", "text")
      .where(col("doc_id") === 1L).collect().head
      .getAs[Int]("n_selected")
    assert(p.getAs[Long]("n_shared_fp") === nSel.toLong)
  }

  test("spearmanCorr: +1 / -1 on monotone groups, hand-computed " +
      "tie-averaged case") {
    val df = Seq(
      ("up", 1L, 10.0), ("up", 2L, 20.0), ("up", 3L, 30.0),
      ("dn", 1L, 30.0), ("dn", 2L, 20.0), ("dn", 3L, 10.0),
      ("tie", 1L, 5.0), ("tie", 1L, 6.0), ("tie", 2L, 7.0)
    ).toDF("k", "x", "y")
    val m = Agg.spearmanCorr(df, "k", "x", "y").collect()
      .map(r => r.getAs[String]("k") -> r).toMap
    assert(m("up").getAs[Double]("rho") === 1.0)
    // sqrt(24)*sqrt(24) = 23.999999999999996, so the exact -1 ratio
    // lands at -1.0000000000000002 and the 6 dp FLOOR truncates DOWN
    // to -1.000001 — deterministic, and the DuckDB oracle replays the
    // identical IEEE ops (the floorAt contract trades the pretty
    // boundary for bit-equality)
    assert(m("dn").getAs[Double]("rho") === -1.000001)
    // ranks x: (1.5, 1.5, 3) vs y: (1, 2, 3) -> r = 1.5/sqrt(3)
    assert(m("tie").getAs[Double]("rho") ===
      math.floor(1.5 / math.sqrt(3.0) * 1e6) / 1e6)
  }

  test("pairDegreeProfile: triangle + disjoint edge histogram") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
      .toDF("id_a", "id_b")
    val r = Dedup.pairDegreeProfile(pairs).orderBy("deg").collect()
    assert(r.length === 2)
    assert(r(0).getAs[Long]("deg") === 1L &&
      r(0).getAs[Long]("n_docs") === 2L &&
      r(0).getAs[Long]("min_doc_id") === 4L)
    assert(r(1).getAs[Long]("deg") === 2L &&
      r(1).getAs[Long]("n_docs") === 3L &&
      r(1).getAs[Long]("min_doc_id") === 1L)
  }
}
