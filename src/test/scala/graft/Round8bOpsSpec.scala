package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Curate, Dedup, EventsOps, Graph, Layout, Skew, Text}

/** Round-8b operators: layout audit invariants, multi-pass blocking
  * recall gain, incremental state-merge identity, k-core peeling on a
  * hand graph, preflight-vs-actual join size, EWMA closed forms,
  * quantile-normalization bounds, exact-sum mixture allocation,
  * threshold-sweep counts, burstiness separation, MI identities.
  */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("zoneMapAudit: natural layout reads everything, bydate is " +
      "perfect on date only, zorder skips on BOTH dimensions") {
    val li = Tables.load(spark, dir, "lineitem")
    val n = li.count()
    val rows = Layout.zoneMapAudit(li).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("predicate"))
        -> r).toMap
    assert(rows.size === 6)
    // every (layout, predicate) accounts for the whole table
    rows.values.foreach(r =>
      assert(r.getAs[Long]("rows_total") === n))
    // n_match is layout-independent
    assert(rows(("natural", "ship_month")).getAs[Long]("n_match") ===
      rows(("zorder", "ship_month")).getAs[Long]("n_match"))
    // natural: zone maps useless for both predicates
    assert(rows(("natural", "ship_month")).getAs[Double]("read_frac")
      === 1.0)
    assert(rows(("natural", "part_range")).getAs[Double]("read_frac")
      === 1.0)
    // single-column sort: near-perfect on its own dim, blind on the other
    assert(rows(("bydate", "ship_month")).getAs[Double]("read_frac")
      < 0.2)
    assert(rows(("bydate", "part_range")).getAs[Double]("read_frac")
      === 1.0)
    // z-order: real skipping on BOTH dims
    assert(rows(("zorder", "ship_month")).getAs[Double]("read_frac")
      <= 0.5)
    assert(rows(("zorder", "part_range")).getAs[Double]("read_frac")
      <= 0.5)
  }

  test("multiBlockFuzzyPairs catches the pair the single-pass first-" +
      "token blocking misses, and records per-pass provenance") {
    val names = Seq("red blue", "rad blue", "red blues")
      .toDF("name")
    val single = Dedup.fuzzyPairs(names, "name", "name", maxDist = 3)
      .collect()
    val multi = Dedup.multiBlockFuzzyPairs(names, "name", "name",
        maxDist = 3)
      .collect()
      .map(r => (r.getAs[String]("id_a"), r.getAs[String]("id_b")) ->
        (r.getAs[Int]("dist"), r.getAs[String]("passes"))).toMap
    // first-token blocking sees only the "red ..." block
    assert(single.length === 1)
    // multi-pass adds ("rad blue", "red blue") via the last-token block
    assert(multi.size === 2)
    assert(multi(("rad blue", "red blue")) === ((1, "last")))
    assert(multi(("red blue", "red blues"))._2 === "first")
  }

  test("incrementalMoments: decimal state merge is IDENTICAL to the " +
      "full exactMoments recompute, and side counts partition n") {
    val li = Tables.load(spark, dir, "lineitem")
    val merged = Agg.incrementalMoments(
        li.where(col("l_orderkey") % 5 =!= 0),
        li.where(col("l_orderkey") % 5 === 0),
        "l_returnflag", "l_extendedprice")
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val full = Agg.exactMoments(li, "l_returnflag", "l_extendedprice")
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(merged.keySet === full.keySet)
    merged.foreach { case (k, m) =>
      assert(m.getAs[Long]("n") === full(k).getAs[Long]("n"))
      assert(m.getAs[Double]("mean") === full(k).getAs[Double]("mean"))
      assert(m.getAs[Double]("var_samp") ===
        full(k).getAs[Double]("var_samp"))
      assert(m.getAs[Long]("n_standing") + m.getAs[Long]("n_delta")
        === m.getAs[Long]("n"))
    }
  }

  test("kCorePeel: triangle survives at k=2, tendril and isolated " +
      "pair peel away") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val out = Graph.kCorePeel(pairs, k = 2, rounds = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("deg")))
    assert(out.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("joinSizePreflight: total_pairs equals the ACTUAL join output " +
      "size; shares rank the hot key first") {
    val left = Seq(1, 1, 1, 2).toDF("k")
    val right = Seq(1, 1, 2, 2, 3).toDF("k")
    val rows = Skew.joinSizePreflight(left, right, "k").collect()
    val actual = left.join(right, "k").count()
    // pair counts are DECIMAL(38,0) internally (round-9 overflow fix)
    // but surfaced as STRING (round-11 hash-stability fix): wide
    // decimals canonicalize differently across engines
    assert(rows.head.getAs[String]("total_pairs").toLong === actual)
    assert(rows.head.getAs[Int]("k") === 1)
    assert(rows.head.getAs[String]("n_pairs").toLong === 6L)
    assert(rows.head.getAs[Double]("share") === 0.75)
    assert(rows.head.getAs[Long]("n_keys") === 2L)
    // key 3 has no left match: absent by the inner-histogram contract
    assert(rows.length === 2)
  }

  test("ewmaBounded: constant series is a fixpoint; two-step value " +
      "matches the closed form") {
    val ts = (i: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00")
    val ev = Seq(
      (1L, 1L, ts(1), 5.0), (1L, 2L, ts(2), 5.0), (1L, 3L, ts(3), 5.0),
      (2L, 4L, ts(1), 1.0), (2L, 5L, ts(2), 3.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = EventsOps.ewmaBounded(ev, depth = 16)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("ewma")))
      .toMap
    assert(out(1L) === 5.0 && out(2L) === 5.0 && out(3L) === 5.0)
    assert(out(4L) === 1.0)
    // (1*0.5 + 3*1) / (2 - 0.5) = 3.5 / 1.5 = 2.333333…
    assert(out(5L) === 2.333333)
  }

  test("quantileNormalize: pct spans [0,1] per source and is " +
      "monotone in the score") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Curate.quantileNormalize(docs, "doc_id", "source",
      "n_chars")
    val stats = out.groupBy("source")
      .agg(min("pct").as("lo"), max("pct").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    stats.foreach { r =>
      assert(r.getAs[Double]("lo") === 0.0)
      if (r.getAs[Long]("n") > 1) assert(r.getAs[Double]("hi") === 1.0)
    }
    // monotone: higher n_chars never gets a lower pct within a source
    val viol = out.as("a").join(out.as("b"),
        col("a.source") === col("b.source") &&
          col("a.n_chars") < col("b.n_chars") &&
          col("a.pct") > col("b.pct"))
      .count()
    assert(viol === 0L)
  }

  test("mixtureAllocation: integer allocations sum EXACTLY to the " +
      "budget, one row per source") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Curate.mixtureAllocation(docs, "source", target = 997L)
      .collect()
    assert(out.map(_.getAs[Long]("alloc")).sum === 997L)
    assert(out.length ===
      docs.select("source").distinct().count().toInt)
    assert(out.forall(_.getAs[Long]("alloc") >= 0L))
  }

  test("thresholdSweep counts pairs and touched docs per threshold") {
    val pairs = Seq((1L, 2L, 0.95), (1L, 3L, 0.5), (4L, 5L, 0.25))
      .toDF("id_a", "id_b", "jaccard")
    val out = Dedup.thresholdSweep(pairs, Seq(0.2, 0.6, 0.9))
      .orderBy("threshold").collect()
      .map(r => (r.getAs[Double]("threshold"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs")))
    assert(out.toSeq === Seq((0.2, 3L, 5L), (0.6, 1L, 2L),
      (0.9, 1L, 2L)))
  }

  test("termBurstiness: uniform once-per-doc term has VMR 0, bursty " +
      "term exceeds 1, counts exact") {
    val docs = (0 until 21).map(i =>
        (i.toLong, "x " + ("y " * (if (i < 10) 1 else 5)).trim))
      .toDF("doc_id", "text")
    val out = Text.termBurstiness(docs, "doc_id", "text", minDf = 20,
        topK = 10)
      .collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(out("x").getAs[Double]("vmr") === 0.0)
    assert(out("x").getAs[Long]("sum_tf") === 21L)
    assert(out("y").getAs[Long]("df") === 21L)
    assert(out("y").getAs[Long]("sum_tf") === 10L + 11L * 5L)
    assert(out("y").getAs[Double]("vmr") > 1.0)
  }

  test("text-log roundtrip: write + schema-on-read regex parse is " +
      "lossless on a hand corpus") {
    val path = sys.props("java.io.tmpdir") +
      s"/graft-spec-text-${ProcessHandle.current().pid}"
    val df = Seq((1L, "sA", "en", 10L), (2L, "sB", "de", 20L))
      .toDF("doc_id", "source", "lang", "n_chars")
    graft.sources.Sources.writeText(
      df.select(format_string("doc=%d src=%s lang=%s chars=%d",
        col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .as("value")), path)
    val re = "doc=(\\d+) src=(\\S+) lang=(\\S+) chars=(\\d+)"
    val back = graft.sources.Sources.readText(spark, path)
      .select(
        regexp_extract(col("value"), re, 1).cast("long").as("doc_id"),
        regexp_extract(col("value"), re, 2).as("source"),
        regexp_extract(col("value"), re, 3).as("lang"),
        regexp_extract(col("value"), re, 4).cast("long").as("n_chars"))
      .orderBy("doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq === Seq((1L, "sA", "en", 10L),
      (2L, "sB", "de", 20L)))
  }

  test("phrasePostings: the repeated phrase wins the ranking and its " +
      "postings count within-doc occurrences") {
    val docs = Seq(
      (1L, "the quick fox the quick fox jumps"),
      (2L, "the quick fox sleeps"),
      (3L, "lazy dogs sleep all day today")).toDF("doc_id", "text")
    val out = Text.phrasePostings(docs, "doc_id", "text", w = 3,
        topK = 1, docsPerPhrase = 10)
      .orderBy("rk").collect()
    assert(out.forall(_.getAs[String]("phrase") === "the quick fox"))
    assert(out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_occ"))).toSeq === Seq((1L, 2L), (2L, 1L)))
    assert(out.head.getAs[Long]("total") === 3L)
  }

  test("temporalSplit: integer cutoff at 80% of the time range; " +
      "straddling users counted as leaky") {
    val ts = (m: Int) => new java.sql.Timestamp(m * 60000L)
    // range 0..100 min -> cutoff at 80 min
    val ev = Seq(
      (1L, ts(0)), (1L, ts(50)), (1L, ts(90)),  // straddles
      (2L, ts(10)), (2L, ts(70)),               // train only
      (3L, ts(85)), (3L, ts(100)))              // test only
      .toDF("user_id", "ts")
    val r = EventsOps.temporalSplit(ev, testPct = 20).collect().head
    assert(r.getAs[Long]("cutoff_es") === 80L * 60L)
    assert(r.getAs[Long]("n_train") === 4L)
    assert(r.getAs[Long]("n_test") === 3L)
    assert(r.getAs[Long]("n_users_train") === 2L)
    assert(r.getAs[Long]("n_users_test") === 2L)
    assert(r.getAs[Long]("n_leaky_users") === 1L)
    assert(r.getAs[Double]("leak_rate") === 0.5)
  }

  test("mutualInformation: b == a makes MI = H(a) and H(b|a) = 0; " +
      "the identity holds at the floored precision") {
    val df = (Seq.fill(4)("p") ++ Seq.fill(2)("q") ++ Seq.fill(2)("r"))
      .map(v => (v, v)).toDF("a", "b")
    val r = Agg.mutualInformation(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Double]("h_b_given_a") === 0.0)
    assert(r.getAs[Double]("mi") === r.getAs[Double]("h_a"))
    assert(r.getAs[Double]("h_a") === r.getAs[Double]("h_joint"))
    // H = 1/2*1 + 1/4*2 + 1/4*2 = 1.5 bits
    assert(r.getAs[Double]("h_a") === 1.5)
  }
}
