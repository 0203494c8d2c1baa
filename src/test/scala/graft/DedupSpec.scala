package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** Op 7 (keep-first dedup) and the near-dup family (MinHash+LSH, SimHash,
  * n-gram Jaccard).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup
    (3L, "the quick brown fox jumps over the lazy cat tonight"), // near dup
    (4L, "completely different words about spark and big data engines"),
    (5L, ""),
    (6L, "too short") // < w tokens: no shingles, like doc 5
  ).toDF("doc_id", "text")

  test("admitBySignature: base twins excluded, in-batch twins keep the " +
      "smallest id, short docs share the sentinel signature — the batch " +
      "replay of the streaming near-dup filter's admission rule") {
    // with an EMPTY base, admission = first occurrence per signature:
    // exactly what streamingNearDupFilter admits from the same rows
    // (StreamingSpec's fixture: docs 1,2 then 3=twin-of-1, 4)
    val four = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "iota kappa lambda mu nu xi"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "rho sigma tau upsilon phi chi")).toDF("doc_id", "text")
    val empty = four.where(lit(false))
    assert(Dedup.admitBySignature(empty, four, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
    // a standing base excludes its content twins from the batch
    val base = four.where(col("doc_id") === 1)
    val batch = four.where(col("doc_id") >= 3)
    assert(Dedup.admitBySignature(base, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet === Set(4L))
    // short/empty docs (< w tokens) all carry the sentinel signature:
    // one survivor among them, by smallest id
    val shorts = Seq((7L, ""), (8L, "too short"), (9L, "x")).toDF("doc_id", "text")
    assert(Dedup.admitBySignature(empty, shorts, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet === Set(7L))
  }

  test("keepFirst keeps exactly the first row per key under the order") {
    val df = Seq(("a", 3, "x3"), ("a", 1, "x1"), ("b", 2, "y2"), ("a", 2, "x2"))
      .toDF("k", "seq", "v")
    val got = Dedup.keepFirst(df, Seq("k"), Seq(col("seq").asc))
      .select("k", "v").as[(String, String)].collect().toSet
    assert(got === Set(("a", "x1"), ("b", "y2")))
  }

  test("keepFirst output keys are unique and a subset of input") {
    val out = Dedup.keepFirst(docs, Seq("text"), Seq(col("doc_id").asc))
    assert(out.count() === out.select("text").distinct().count())
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("shingles: w-grams in order, short docs yield empty") {
    val got = Seq("a b c d").toDF("t")
      .withColumn("toks", Text.tokens(col("t")))
      .select(Dedup.shingles(col("toks"), 3)).as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .withColumn("toks", Text.tokens(col("t")))
      .select(Dedup.shingles(col("toks"), 3)).as[Seq[String]].head()
    assert(short === Seq())
  }

  test("minhash: identical docs share full signature, est_jaccard = 1.0") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", k = 8, bands = 4)
      .as[(Long, Long, Double)].collect().toSeq
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 1.0))
    // near-dup 1-3 should collide on at least one band with high estimate
    assert(pairs.find(p => p._1 == 1L && p._2 == 3L).exists(_._3 >= 0.5))
    // unrelated doc 4 never pairs with 1
    assert(!pairs.exists(p => p._2 == 4L && p._1 <= 3L && p._3 > 0.5))
    // shingle-less docs (5: empty, 6: < w tokens) are excluded entirely —
    // their '~empty' sentinel signatures must not pair them together
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L ||
      p._1 == 6L || p._2 == 6L))
  }

  test("lshBandKeys rejects k not divisible by bands") {
    intercept[IllegalArgumentException] {
      Dedup.lshBandKeys(col("sig"), k = 10, bands = 4)
    }
  }

  test("jaccardPairs: exact dup = 1.0; disjoint docs absent") {
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", w = 3,
        minJaccard = 0.05)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(got((1L, 2L)) === 1.0)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) < 1.0)
    assert(!got.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("prefixFilterPairs == brute jaccardPairs (exact recall of the " +
      "prefix filter), on the unit docs and the sf0.001 corpus") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    // unit docs: the exact dup (1,2) and near-dup pairs with j >= 0.5
    val brute = norm(Dedup.jaccardPairs(docs, "doc_id", "text",
      w = 3, minJaccard = 0.5))
    for (byDf <- Seq(false, true)) {
      val pf = norm(Dedup.prefixFilterPairs(docs, "doc_id", "text",
        w = 3, minJaccard = 0.5, dfOrdered = byDf))
      assert(pf === brute, s"dfOrdered=$byDf")
      assert(pf.contains((1L, 2L, 1.0)))
    }
    // fixture corpus: same equivalence at a lower threshold so the
    // candidate set is non-trivial — recall must be exact under BOTH
    // canonical orders (the guarantee is order-independent)
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bruteC = norm(Dedup.jaccardPairs(corpus, "doc_id", "text",
      w = 3, minJaccard = 0.3))
    for (byDf <- Seq(false, true)) {
      val pfC = norm(Dedup.prefixFilterPairs(corpus, "doc_id", "text",
        w = 3, minJaccard = 0.3, dfOrdered = byDf))
      assert(pfC === bruteC, s"dfOrdered=$byDf")
    }
  }

  test("simhash: identical docs equal; near dups within small hamming") {
    def hamming(a: Int, b: Int) = Integer.bitCount(a ^ b)
    val sig = docs
      .withColumn("t", Text.tokens(Text.cleanText(col("text"))))
      .select(col("doc_id"), Dedup.simhash16Native(col("t")).as("sh"))
      .as[(Long, Int)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(hamming(sig(1L), sig(3L)) <= 6)
    assert(sig(5L) === 0) // empty doc: all bit-sums 0, no bits set
  }

  test("planBands: derives the production (k=8, bands=4) from the " +
      "S-curve; the low-rate cap is load-bearing; the planned config's " +
      "MEASURED recall vs exact truth meets target on the fixture") {
    val bp = Dedup.planBands(threshold = 0.8, targetRecall = 0.98)
    assert(bp.k === 8 && bp.bands === 4 && bp.rowsPerBand === 2)
    assert(bp.recallAtThreshold >= 0.98 && bp.candRateAtLow <= 0.2)
    // the curve itself, closed form: 1 - (1 - .8^2)^4
    assert(math.abs(Dedup.candidateProb(0.8, 2, 4) - 0.98316) < 1e-4)
    // recall alone degenerates to 1-row bands; the jLow cap forces the
    // planner to buy sharpness with longer signatures instead
    assert(Dedup.planBands(0.8, 0.999).rowsPerBand >= 3)
    intercept[IllegalArgumentException](
      Dedup.planBands(0.8, 0.98, jLow = 0.9))

    // loop closure (the q155 eval, on the sf0.001 fixture): the
    // planner PREDICTS .9832 per-pair recall; measure the realized
    // recall of the planned config against exact prefix-filter truth
    val fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val truth = Dedup.prefixFilterPairs(fixture, "doc_id", "text",
      w = 3, minJaccard = 0.8).select("id_a", "id_b")
    val lsh = Dedup.lshVerifiedPairs(fixture, "doc_id", "text",
      bp.k, bp.bands, minJaccard = 0.8).select("id_a", "id_b")
    val nTruth = truth.count()
    val nCommon = truth.join(lsh, Seq("id_a", "id_b")).count()
    assert(nTruth > 0, "fixture must contain exact 0.8-dup pairs")
    assert(nCommon.toDouble / nTruth >= 0.9,
      s"measured recall ${nCommon.toDouble / nTruth} below target " +
        s"(predicted ${bp.recallAtThreshold}, small-sample margin 0.9)")
  }

  test("native shingles == HOF shingles; native hashedShingles == HOF " +
      "(builtin xxhash64) hashedShingles — incl. empty and <w docs") {
    val base = docs.withColumn("t", Text.cleanTokens(col("text")))
    val rows = base.select(col("doc_id"),
        Dedup.shingles(col("t"), 3).as("s_nat"),
        Dedup.shinglesHof(col("t"), 3).as("s_hof"),
        Dedup.hashedShingles(col("t"), 3).as("h_nat"),
        Dedup.hashedShinglesHof(col("t"), 3).as("h_hof"))
      .as[(Long, Seq[String], Seq[String], Seq[Long], Seq[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, sN, sH, hN, hH) =>
      assert(sN === sH, s"string-shingle mismatch doc $id")
      assert(hN === hH, s"hashed-shingle mismatch doc $id")
    }
    // w=2 and w=1 parity too (calibration sweeps vary w)
    Seq(1, 2).foreach { w =>
      base.select(Dedup.shingles(col("t"), w).as("a"),
          Dedup.shinglesHof(col("t"), w).as("b"))
        .as[(Seq[String], Seq[String])].collect()
        .foreach { case (a, b) => assert(a === b, s"w=$w") }
    }
  }

  test("native simhash == HOF simhash; native minhash == HOF minhash") {
    val base = docs
      .withColumn("c", Text.cleanText(col("text")))
      .withColumn("t", Text.tokens(col("c")))
      .withColumn("shs", Dedup.shingles(col("t")))
    val rows = base.select(col("doc_id"),
        Dedup.simhash16Native(col("t")).as("sh_native"),
        Dedup.simhash16(Dedup.tokenHashes16(col("c"))).as("sh_hof"),
        Dedup.minhashSignature(col("shs"), 8).as("mh_native"),
        Dedup.minhashSignatureHof(col("shs"), 8).as("mh_hof"))
      .as[(Long, Int, Int, Seq[String], Seq[String])].collect()
    rows.foreach { case (id, shN, shH, mhN, mhH) =>
      assert(shN === shH, s"simhash mismatch doc $id")
      assert(mhN === mhH, s"minhash mismatch doc $id")
    }
  }

  test("Md5Hex8ArrExpr == the composed conv(substring(md5)) transform") {
    import org.apache.spark.sql.graftbridge.Bridge
    val df = Seq(
      (1L, Array("a b c", "b c d", "", "unicode\u00e9", "x")),
      (2L, Array.empty[String])
    ).toDF("id", "arr")
    val composed = transform(col("arr"),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))
    val native = Bridge.column(graft.functions.Md5Hex8ArrExpr(
      Bridge.expression(col("arr"))))
    df.select(native.as("nat"), composed.as("hof")).collect()
      .foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("WinnowSelect native selection == the composed HOF form, " +
      "including rightmost ties and constant runs") {
    import org.apache.spark.sql.graftbridge.Bridge
    val window = 4
    val arrs = Seq(
      Array(5L, 3L, 8L, 3L, 9L, 1L, 7L),  // interior tie
      Array(2L, 2L, 2L, 2L, 2L),          // all tied: rightmost each
      Array(1L, 2L, 3L, 4L, 5L, 6L),      // ascending: leftmost min
      Array(6L, 5L, 4L, 3L, 2L, 1L),      // descending: rightmost edge
      Array(7L, 1L, 7L, 1L, 7L, 1L, 7L),  // alternating ties
      Array(4L, 4L, 4L, 4L)               // exactly one window
    )
    val df = arrs.zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("id", "h")
    val win = (i: org.apache.spark.sql.Column) =>
      slice(col("h"), i + 1, lit(window))
    val composed = array_sort(array_distinct(
      transform(sequence(lit(0), size(col("h")) - window),
        i => i + lit(window) -
          array_position(reverse(win(i)), array_min(win(i))))))
    val native = Bridge.column(graft.functions.WinnowSelect(
      Bridge.expression(col("h")), window))
    df.select(col("id"), native.as("nat"), composed.as("hof"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.get(0)}")
      }
  }
}
