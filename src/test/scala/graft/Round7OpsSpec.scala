package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Artifacts, Dedup}

/** Round-7 composition operators: MAD, leakage-safe split. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("madByRank: hand-checked median and MAD; robust to one outlier") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 1000.0)).toDF("k", "x")
    val r = Agg.madByRank(df, "k", "x").collect().head
    // median = 3; deviations |x-3| = 2,1,0,1,997 -> median 1
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("p50") === 3.0)
    assert(r.getAs[Double]("mad") === 1.0)
    // the outlier moved stddev to ~446 but MAD stays 1 — the point
  }

  test("exactCorrMatrix: pairs agree with exactCorr; perfect linear " +
    "dependence hits 1.0") {
    import graft.ops.Text
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 3.0), (3.0, 6.0, 8.0),
      (4.0, 8.0, 1.0)).toDF("a", "b", "c")
    val m = Agg.exactCorrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("corr"))).toMap
    // b = 2a exactly; the 6dp FLOOR truncates the last-ulp sqrt wobble
    // downward, so perfect correlation reads 0.999999 or 1.0 — never
    // above, never lower
    assert(m(("a", "b")) >= 0.999999 && m(("a", "b")) <= 1.0)
    // pair result identical to the one-pair operator (keyed on a const)
    val one = Agg.exactCorr(df.withColumn("k", lit(1)), "k", "a", "c")
      .collect().head.getAs[Double]("corr")
    assert(m(("a", "c")) === one)
    assert(m.size === 3)
  }

  test("bm25Retrieve: doc with more query-term mass ranks first; " +
    "non-matching docs absent") {
    import graft.ops.Text
    val docs = Seq(
      (1L, "spark spark join fast"),
      (2L, "spark table"),
      (3L, "window sort batch")).toDF("doc_id", "text")
    val out = Text.bm25Retrieve(docs, "doc_id", "text",
      Seq(("q", "spark join")), k = 10).collect()
    assert(out.forall(_.getAs[String]("query_id") === "q"))
    val ranked = out.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("id"))
    assert(ranked.head === 1L, s"doc 1 must rank first: ${ranked.toSeq}")
    assert(!ranked.contains(3L), "doc 3 matches no query term")
    // doc 1 matched both terms, doc 2 one
    val matched = out.map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_matched")).toMap
    assert(matched(1L) === 2L && matched(2L) === 1L)
  }

  test("equiDepthHistogram: near-equal depths on a uniform column, " +
    "edges ordered, total count preserved") {
    val df = (1 to 80).map(i => i.toDouble).toDF("x")
    val h = Agg.equiDepthHistogram(df, "x", k = 8)
      .orderBy("bin").collect()
    assert(h.map(_.getAs[Long]("n")).sum === 80L)
    // distinct values, n divisible by k -> exactly equal depths
    assert(h.map(_.getAs[Long]("n")).forall(n => n >= 9 && n <= 11),
      h.map(_.getAs[Long]("n")).toSeq.toString)
    // bins tile the range in order
    val los = h.map(_.getAs[Double]("lo"))
    assert(los.sorted.toSeq === los.toSeq)
    assert(h.head.getAs[Double]("lo") === 1.0 &&
      h.last.getAs[Double]("hi") === 80.0)
  }

  test("lshDeltaPairs: delta == full-corpus pairs filtered to those " +
    "touching the batch (the ingest invariant), on sf0.001") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val delta = Dedup.lshDeltaPairs(
      docs.where(col("doc_id") % 5 =!= 0),
      docs.where(col("doc_id") % 5 === 0),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.lshVerifiedPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 }
    assert(delta === expected)
    assert(delta.subsetOf(full))
    // and it found something on the fixture, else the test is vacuous
    assert(expected.nonEmpty)
  }

  test("chi2Independence: diagonal 2x2 hits chi2 = n (zero-observed " +
    "cells enter via the closed form); independent table hits ~0") {
    val diag = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("s", "l")
    val r = Agg.chi2Independence(diag, "s", "l").collect().head
    assert(r.getAs[Long]("n") === 20L && r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("n_cells") === 2L) // zero cells NOT materialized
    assert(r.getAs[Double]("chi2_total") === 20.0) // phi = 1 -> chi2 = n
    val indep = (for (s <- Seq("a", "b"); l <- Seq("x", "y"); _ <- 1 to 5)
      yield (s, l)).toDF("s", "l")
    val r2 = Agg.chi2Independence(indep, "s", "l").collect().head
    assert(r2.getAs[Double]("chi2_total") === 0.0)
  }

  test("jsDivergence: identical distributions -> 0; partial overlap " +
    "strictly between 0 and 1") {
    import graft.ops.Curate
    val docs = Seq(
      ("s1", "alpha beta gamma alpha"),
      ("s2", "alpha beta gamma alpha"),
      ("s3", "alpha delta delta epsilon")).toDF("src", "text")
    val m = Curate.jsDivergence(docs, "src", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("jsd"))).toMap
    assert(m(("s1", "s2")) === 0.0)
    assert(m(("s1", "s3")) > 0.0 && m(("s1", "s3")) < 1.0)
    assert(m(("s1", "s3")) === m(("s2", "s3"))) // symmetry via identity
  }

  test("robustAnomalies: flags the outlier classic z-scores mask") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 1000.0)).toDF("k", "x")
    val r = Agg.robustAnomalies(df, "k", "x").collect().head
    // mean/sigma z of 1000 here is ~1.79 (sigma ~446, inflated by the
    // outlier itself — masking); the robust score is ~672
    assert(r.getAs[Long]("n_anomalies") === 1L)
    assert(r.getAs[Double]("max_score") > 100.0)
    assert(r.getAs[Double]("p50") === 3.0 && r.getAs[Double]("mad") === 1.0)
    // constant group: mad = 0 -> nothing flagged, by contract
    val const = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("k", "x")
    val rc = Agg.robustAnomalies(const, "k", "x").collect().head
    assert(rc.getAs[Long]("n_anomalies") === 0L &&
      rc.getAs[Double]("max_score") === 0.0)
  }

  test("batchNovelty: unseen content scores 1.0, copied content 0.0") {
    import graft.ops.Curate
    val standing = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // exact copy
      (20L, "one two three four five six"),         // fully novel
      (30L, "alpha beta gamma one two three"))      // half and half
      .toDF("doc_id", "text")
    val out = Curate.batchNovelty(standing, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("novelty"))
      .toMap
    assert(out(10L) === 0.0)
    assert(out(20L) === 1.0)
    assert(out(30L) > 0.0 && out(30L) < 1.0)
  }

  test("weightedMedian: hand-check incl. the tie-boundary case; " +
    "hhiConcentration: uniform -> 1/n, single group -> 1") {
    // weights: (1,1),(2,1),(3,4): W=6, half=3; W(<=1)=1, W(<=2)=2,
    // W(<=3)=6 -> first qualifying v = 3
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 4L))
      .toDF("k", "x", "w")
    val r = Agg.weightedMedian(df, "k", "x", "w").collect().head
    assert(r.getAs[Long]("total_weight") === 6L &&
      r.getAs[Double]("wmedian") === 3.0)
    // boundary: W=4, W(<=1)=2 -> 2*2 >= 4 qualifies -> lower median 1
    val b = Seq(("b", 1.0, 2L), ("b", 9.0, 2L)).toDF("k", "x", "w")
    assert(Agg.weightedMedian(b, "k", "x", "w").collect().head
      .getAs[Double]("wmedian") === 1.0)

    val uni = Seq(("s1", 10L), ("s2", 10L), ("s3", 10L), ("s4", 10L))
      .toDF("g", "m")
    val h = Agg.hhiConcentration(uni, "g", col("m")).collect().head
    assert(h.getAs[Double]("hhi") === 0.25 ||
      h.getAs[Double]("hhi") === 0.249999) // floor may truncate 1 ulp
    assert(math.abs(h.getAs[Double]("effective_groups") - 4.0) < 0.01)
    val one = Seq(("s1", 10L)).toDF("g", "m")
    val h1 = Agg.hhiConcentration(one, "g", col("m")).collect().head
    assert(h1.getAs[Double]("hhi") >= 0.999999)
  }

  test("leakage-safe split: every near-dup component lands in ONE fold") {
    Artifacts.clear()
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q172_leakage_safe_split")(spark, dir)
    // fold is constant within split_group by construction; assert it
    assert(out.groupBy("split_group")
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") =!= 1).count() === 0)
    // and split_group really is the CC component for paired docs
    val comp = Dedup.componentsConverged(
      Artifacts.nearDupPairs(spark, dir))
    val joined = out.join(comp, Seq("doc_id"))
    assert(joined.where(col("split_group") =!= col("component"))
      .count() === 0)
    // all 5 folds populated on the fixture
    assert(out.select("fold").distinct().count() === 5)
    Artifacts.clear()
  }
}
