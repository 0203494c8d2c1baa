package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Round-11 additions: the IVF-ADC composition (PQ codes scanned within
  * the multi-probe cell candidate set) and the parallel-subspace PQ
  * trainer's invariants.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ivfAdcRecallSweep with ONE cell equals the whole-corpus ADC " +
      "retriever's recall (flat scan = IVF with a single probed cell)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val one = emb.withColumn("onecell", lit(0))
    val books = Sim.pqCodebooks(emb, m = 4, k = 8, iters = 2)
    val q = one.where(col("vec_id") < 10)
    val sweep = Sim.ivfAdcRecallSweep(q, one, books, 5, "onecell",
        maxProbes = 2)
      .orderBy("probes")
      .select("probes", "n_approx", "n_hits").as[(Int, Long, Long)]
      .collect().toSeq
    // flat ADC reference: pqTopK hits vs the same exact-L2 truth
    val truth = Sim.topKL2(q, emb, 5).select(col("q_id"), col("c_id"))
    val flatHits = Sim.pqTopK(q, emb, books, 5)
      .select(col("q_id"), col("c_id"))
      .join(truth, Seq("q_id", "c_id")).count()
    val flatN = Sim.pqTopK(q, emb, books, 5).count()
    assert(sweep.map(_._1) === Seq(1, 2))
    sweep.foreach { case (p, nApprox, nHits) =>
      assert(nApprox === flatN, s"p=$p candidates != flat scan")
      assert(nHits === flatHits, s"p=$p hits != flat ADC hits")
    }
  }

  test("ivfAdcRecallSweep hits are monotone in probes and bounded by " +
      "the flat whole-corpus ADC scan on real cells") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Sim.pqCodebooks(emb, m = 4, k = 8, iters = 2)
    val rows = Sim.ivfAdcRecallSweep(emb.where(col("vec_id") < 10), emb,
        books, 5, "label", maxProbes = 3)
      .orderBy("probes")
      .select("probes", "n_hits").as[(Int, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(1, 2, 3))
    assert(rows.map(_._2) === rows.map(_._2).sorted,
      s"hits must be monotone in probes: $rows")
    val truth = Sim.topKL2(emb.where(col("vec_id") < 10), emb, 5)
      .select(col("q_id"), col("c_id"))
    val flatHits = Sim.pqTopK(emb.where(col("vec_id") < 10), emb, books, 5)
      .select(col("q_id"), col("c_id"))
      .join(truth, Seq("q_id", "c_id")).count()
    // cell-bounding can only LOSE candidates relative to the flat scan
    assert(rows.last._2 <= flatHits,
      s"IVF-ADC found more hits (${rows.last._2}) than flat ADC ($flatHits)")
  }

  test("bootstrapMeanCi: layout-invariant (identical resamples under " +
      "repartition) and the CI brackets the point mean") {
    import graft.ops.Agg
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    def run(df: org.apache.spark.sql.DataFrame) =
      Agg.bootstrapMeanCi(df, "event_type", "event_id", "value")
        .orderBy("event_type")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
    val a = run(ev)
    assert(a === run(ev.repartition(13)), "resamples must be a pure " +
      "function of (id, replicate), not the physical layout")
    a.foreach { case (k, n, point, lo, hi) =>
      assert(lo <= point && point <= hi,
        s"CI [$lo, $hi] must bracket the point mean $point for $k")
      assert(n > 0)
    }
  }

  test("Star.merge: UPDATE * semantics — incoming NULLs overwrite, " +
      "unmatched rows survive on both sides") {
    import graft.ops.Star
    val ex = Seq((1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)),
        (3L, Some("c"), Some(30.0)))
      .toDF("k", "s", "v")
    val inc = Seq((2L, None: Option[String], Some(99.0)),
        (4L, Some("d"), None: Option[Double]))
      .toDF("k", "s", "v")
    val got = Star.merge(ex, inc, Seq("k"))
      .orderBy("k")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, Some("a"), Some(10.0)),   // existing-only survives
      (2L, None, Some(99.0)),        // matched: incoming NULL OVERWRITES
      (3L, Some("c"), Some(30.0)),
      (4L, Some("d"), None)))        // insert, incoming NULL kept
  }

  test("quantilesByDomain is BIT-equal to percentile() before any " +
      "rounding — fixture groups plus integral-position/n=1/tie edges") {
    import graft.ops.Agg
    def both(df: org.apache.spark.sql.DataFrame, ps: Seq[(String, Double)])
        : (Seq[(String, Seq[Double])], Seq[(String, Seq[Double])]) = {
      val arr = ps.map(_._2).mkString(",")
      val ref = df.groupBy("k")
        .agg(expr(s"percentile(v, array($arr))").as("ps"))
        .select(col("k"), col("ps")).as[(String, Seq[Double])]
        .collect().sortBy(_._1).toSeq
      val dom = Agg.quantilesByDomain(df, "k", "v", ps)
        .select(col("k"), array(ps.map(p => col(p._1)): _*).as("ps"))
        .as[(String, Seq[Double])].collect().sortBy(_._1).toSeq
      (ref, dom)
    }
    // fixture-shaped: lineitem prices by returnflag
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag").as("k"),
        col("l_extendedprice").as("v"))
    val (r1, d1) = both(li, Seq("p50" -> 0.5, "p90" -> 0.9))
    assert(r1 === d1, "fixture divergence")
    // adversarial: odd group (integral pos), n=1 group, all-ties group
    val adv = Seq(
      ("odd", 1.0), ("odd", 2.0), ("odd", 3.0),
      ("one", 42.5),
      ("tie", 7.0), ("tie", 7.0), ("tie", 7.0), ("tie", 7.0),
      ("mix", 0.01), ("mix", 0.02), ("mix", 0.02), ("mix", 100.0))
      .toDF("k", "v")
    val (r2, d2) = both(adv,
      Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0))
    assert(r2 === d2, s"adversarial divergence: $r2 vs $d2")
  }

  test("partitioned upsert sink: date-partitioned target layout, and " +
      "the duplicated replay still collapses to exactly-once") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.streaming.StreamOps
      .runUpsertSinkGatePartitioned(spark, dir, 2, 2)
    assert(out.count() === Tables.load(spark, dir, "events").count(),
      "every fixture row exactly once despite arriving twice")
    // the pruning contract rests on the physical layout: every data
    // file must live under a __pday= partition directory
    val files = out.inputFiles
    assert(files.nonEmpty)
    files.foreach(f =>
      assert(f.contains("__pday="), s"unpartitioned file: $f"))
  }

  test("ivfAdcRerankSweep limits: R = k reproduces the pure-ADC hits " +
      "(re-ranking k of k is a no-op), and with one cell R = corpus " +
      "recovers exact recall 1.0") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Sim.pqCodebooks(emb, m = 4, k = 8, iters = 2)
    val q = emb.where(col("vec_id") < 10)
    val adcHitsP2 = Sim.ivfAdcRecallSweep(q, emb, books, 5, "label", 2)
      .where(col("probes") === 2)
      .select("n_hits").as[Long].head()
    val rer = Sim.ivfAdcRerankSweep(q, emb, books, 5, "label",
        probes = 2, rs = Seq(5, 20))
      .orderBy("rerank_r")
      .select("rerank_r", "n_hits", "n_truth").as[(Int, Long, Long)]
      .collect().toSeq
    assert(rer.head._1 === 5 && rer.head._2 === adcHitsP2,
      s"R=k must equal the pure ADC hits: $rer vs $adcHitsP2")
    assert(rer.last._2 >= rer.head._2, "hits must be monotone in R")
    val n = emb.count().toInt
    val one = emb.withColumn("onecell", lit(0))
    val full = Sim.ivfAdcRerankSweep(one.where(col("vec_id") < 10), one,
        books, 5, "onecell", probes = 1, rs = Seq(n))
      .select("n_hits", "n_truth").as[(Long, Long)].head()
    assert(full._1 === full._2,
      s"one cell + R=corpus must be the exact scan: $full")
  }

  test("trainLocal ≡ train (distributed per-merge jobs) on the fixture " +
      "corpus and on adversarial overlap/tie shapes") {
    import graft.ops.Bpe
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, String, String, Long)].collect().toSeq
    assert(rows(Bpe.trainLocal(docs, "text", 12)) ===
      rows(Bpe.train(docs, "text", 12)))
    // overlap counting ("aaa" counts (a,a) twice, merges once,
    // left-to-right) and count ties broken to the smallest pair
    val adv = Seq((1L, "aaa aaa"), (2L, "zy zy"), (3L, "zy aaa"))
      .toDF("doc_id", "text")
    assert(rows(Bpe.trainLocal(adv, "text", 6)) ===
      rows(Bpe.train(adv, "text", 6)))
    // exhaustion: more merges requested than pairs exist
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(rows(Bpe.trainLocal(tiny, "text", 10)) ===
      rows(Bpe.train(tiny, "text", 10)))
  }

  test("skylineTwoLevel ≡ skyline on tie-heavy fixtures, at every " +
      "ranges value including degenerate ones") {
    import graft.ops.Agg
    // duplicates of a frontier point, x-ties with different y, a
    // dominated duplicate, a single-x-value corner
    val pts = Seq(
      (1L, 10L, 5.0), (2L, 10L, 5.0),   // frontier duplicates (both live)
      (3L, 10L, 3.0),                   // x-tie, lower y (dominated)
      (4L, 8L, 7.0), (5L, 8L, 7.0),     // another duplicated frontier
      (6L, 8L, 6.0),
      (7L, 12L, 1.0),                   // max x, low y (frontier)
      (8L, 5L, 7.0),                    // same y as x=8 rows: dominated
      (9L, 4L, 9.0)                     // low x, max y (frontier)
    ).toDF("id", "x", "y")
    val expected = Agg.skyline(pts, "x", "y")
      .select("id").as[Long].collect().sorted.toSeq
    assert(expected === Seq(1L, 2L, 4L, 5L, 7L, 9L))
    for (r <- Seq(1, 2, 3, 8, 64)) {
      val got = Agg.skylineTwoLevel(pts, "x", "y", ranges = r)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got === expected, s"ranges=$r diverged")
    }
    // single-x-value domain: divisor guard path
    val one = Seq((1L, 3L, 1.0), (2L, 3L, 2.0), (3L, 3L, 2.0))
      .toDF("id", "x", "y")
    assert(Agg.skylineTwoLevel(one, "x", "y", ranges = 4)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("parallel-subspace pqCodebooks: iters=0 returns the k lowest-id " +
      "vectors' subvector slices verbatim") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Sim.pqCodebooks(emb, m = 4, k = 8, iters = 0)
    val seed = emb.orderBy("vec_id").limit(8)
      .select("embedding").collect().map(_.getSeq[Float](0))
    assert(books.size === 4)
    books.indices.foreach { s =>
      books(s).indices.foreach { j =>
        assert(books(s)(j) === seed(j).slice(s * 16, (s + 1) * 16),
          s"seed codebook ($s, $j) not the raw slice")
      }
    }
  }

  test("jlProject: native projection equals the in-memory reference, " +
      "signs are ±1 and deterministic, and an exact-duplicate pair " +
      "stays rank-1 through any projection") {
    val signs = Sim.jlSigns(16, 8)
    assert(signs.map(_.toSeq) === Sim.jlSigns(16, 8).map(_.toSeq))
    assert(signs.flatten.forall(s => s == 1.0f || s == -1.0f))
    // reference projection: sequential double sum, rounded to float
    val vecs = Seq(
      (1L, Array(0.5f, -1.25f, 2f, 0.125f, -3f, 0.75f, 1.5f, -0.25f)),
      (2L, Array(1f, 1f, -1f, 2f, 0.5f, -0.5f, 0.25f, 4f)),
      (3L, Array(0.5f, -1.25f, 2f, 0.125f, -3f, 0.75f, 1.5f, -0.25f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Sim.jlProject(col("embedding"), signs).as("jl"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    vecs.foreach { case (id, v) =>
      val want = signs.map(row =>
        v.indices.foldLeft(0.0)((acc, j) =>
          acc + v(j).toDouble * row(j).toDouble).toFloat)
      assert(got.toMap.apply(id) === want, s"projection of $id")
    }
    // vec 3 is vec 1 verbatim: identical projections, so the duplicate
    // is cosine-1.0 rank-1 in the projected space at every out_dim
    assert(got.toMap.apply(1L) === got.toMap.apply(3L))
    // r18: the single native node (JlProjectExpr) must equal the
    // unrolled array-of-dots reference form bit-for-bit, including the
    // all-null output on a NULL input vector
    val withNull = df.select(col("vec_id"),
      when(col("vec_id") === 2L, lit(null)).otherwise(col("embedding"))
        .as("embedding"))
    val nat = withNull.select(col("vec_id"),
        Sim.jlProject(col("embedding"), signs).as("jl"))
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.get(1))
    val ref = withNull.select(col("vec_id"),
        Sim.jlProjectRef(col("embedding"), signs).as("jl"))
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.get(1))
    assert(nat.toSeq === ref.toSeq)
    val sweep = Sim.jlRecallSweep(
      df.where(col("vec_id") === 1), df.where(col("vec_id") =!= 1),
      1, Seq(4, 8), vecCol = "embedding")
      .orderBy("out_dim").collect()
    // truth top-1 of vec 1 is its duplicate vec 3; projection keeps it
    sweep.foreach { r =>
      assert(r.getAs[Long]("n_hits") === 1L,
        s"out_dim ${r.getAs[Int]("out_dim")} lost the exact duplicate")
    }
  }

  test("pcaTopComponent equals the in-memory reference bit-for-bit " +
      "(decimal-emulated moment pass + identical power iteration) and " +
      "the loadings are unit-norm") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val got = Sim.pcaTopComponent(emb).orderBy("dim_pos").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    // in-memory reference replicating the engine's arithmetic exactly:
    // Spark's double->DECIMAL(27,10) cast rounds the SHORTEST decimal
    // representation (BigDecimal.valueOf) HALF_UP at 10 dp
    def dec(x: Double): JBD = JBD.valueOf(x).setScale(10,
      RoundingMode.HALF_UP)
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val n = rows.length
    val dim = rows.head.length
    val mu = Array.tabulate(dim) { j =>
      rows.foldLeft(JBD.ZERO)((a, v) => a.add(dec(v(j).toDouble)))
        .doubleValue / n
    }
    val c = Array.tabulate(dim, dim) { (i, j) =>
      rows.foldLeft(JBD.ZERO)((a, v) =>
          a.add(dec(v(i).toDouble * v(j).toDouble)))
        .doubleValue / n - mu(i) * mu(j)
    }
    var v = Array.fill(dim)(1.0)
    var lambda = 0.0
    for (_ <- 1 to 8) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      var s2 = 0.0; var i = 0
      while (i < dim) { s2 += w(i) * w(i); i += 1 }
      lambda = math.sqrt(s2)
      v = w.map(_ / lambda)
    }
    var trace = 0.0
    (0 until dim).foreach(i => trace += c(i)(i))
    val want = (0 until dim).map { i =>
      (i + 1, graft.ops.Num.floorDouble(v(i), 9),
        graft.ops.Num.floorDouble(lambda, 9),
        graft.ops.Num.floorDouble(lambda / trace, 9))
    }
    assert(got.toSeq === want)
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-12, s"loading norm^2 $norm2")
    assert(lambda > 0 && lambda / trace > 0 && lambda / trace <= 1.0)
  }

  test("CDC chunks survive a prefix insertion that shifts every fixed " +
      "block — the content-defined claim, measured") {
    import graft.ops.Curate
    val dir = "/root/testdata/sf0.001"
    // longest fixture doc — enough tokens for several chunks
    val base = Tables.load(spark, dir, "documents")
      .orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .select("text").as[String].head()
    val two = Seq((1L, base), (2L, "zzz " + base)).toDF("doc_id", "text")
      .withColumn("grp", lit("g"))
    val cdc = Curate.cdcChunkStats(two, "doc_id", "text", "grp")
      .select("dup_share").as[Double].head()
    // fixed 16-token frames: shared block share across the two docs
    val blocks = Curate.chunkWindows(two, "doc_id", "text",
        chunkTokens = 16, stride = 16)
      .select("doc_id", "chunk_md5")
    val nBlocks = blocks.count()
    val nDistinct = blocks.select("chunk_md5").distinct().count()
    val fixedShare = (nBlocks - nDistinct).toDouble / nBlocks
    // CDC keeps most chunks identical (each shared chunk halves the
    // distinct count); the shifted fixed frames share (almost) nothing
    assert(cdc > 0.3, s"CDC dup share $cdc — boundaries did not survive")
    assert(cdc > fixedShare + 0.2,
      s"CDC $cdc not materially above fixed-frame $fixedShare")
  }

  test("skylineAuto and quantilesAuto: the preflights route both ways " +
      "and the dispatched engine's output equals the explicit engines'") {
    import graft.ops.Agg
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("x"),
        sum(col("value")).as("y"))
    // fixture user domain is small -> global; a forced tiny threshold
    // -> ranged; outputs identical either way
    assert(Agg.skylineEngine(ev, "x", 262144L) === "global")
    assert(Agg.skylineEngine(ev, "x", 1L) === "ranged")
    val g = Agg.skylineAuto(ev, "x", "y")
      .select("user_id").as[Long].collect().toSet
    val r = Agg.skylineAuto(ev, "x", "y", maxDomainForGlobal = 1L)
      .select("user_id").as[Long].collect().toSet
    assert(g === r && g.nonEmpty)
    // quantiles: fixture groups are small -> buffer; forced -> domain;
    // values bit-equal (the q29/q262 one-oracle claim, asserted here
    // directly on the unfloored doubles)
    val li = Tables.load(spark, dir, "lineitem")
    assert(Agg.quantileEngine(li, "l_returnflag", 1000000L) === "buffer")
    assert(Agg.quantileEngine(li, "l_returnflag", 1L) === "domain")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val qb = Agg.quantilesAuto(li, "l_returnflag", "l_extendedprice", ps)
      .orderBy("l_returnflag")
      .collect().map(x => (x.get(0), x.getDouble(1), x.getDouble(2),
        x.getLong(3))).toSeq
    val qd = Agg.quantilesAuto(li, "l_returnflag", "l_extendedprice", ps,
        maxGroupForBuffer = 1L)
      .orderBy("l_returnflag")
      .collect().map(x => (x.get(0), x.getDouble(1), x.getDouble(2),
        x.getLong(3))).toSeq
    assert(qb === qd && qb.nonEmpty)
  }

  test("budgetedSample draws exactly the allocation per source and " +
      "the full budget in total when every source can fill its quota") {
    import graft.ops.Curate
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("wt", col("n_chars") + 1)
    val out = Curate.budgetedSample(docs, "doc_id", "wt", "source", 100L)
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("drawn"), max(col("alloc")).as("alloc"))
      .collect()
    val quota = Curate.mixtureAllocation(docs, "source", 100L)
      .select("source", "alloc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { r =>
      assert(r.getLong(1) === quota(r.getString(0)),
        s"source ${r.getString(0)} drew ${r.getLong(1)} != quota")
    }
    assert(out.count() === 100L)
    // and each slice is exactly the per-source A-Res top-alloc
    val manual = Curate.weightedSample(docs, "doc_id", "wt", 100,
        Some("source"))
      .join(broadcast(Curate.mixtureAllocation(docs, "source", 100L)
        .select("source", "alloc")), "source")
      .where(col("rk") <= col("alloc"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet === manual)
  }

  test("pcaTopComponent is layout-invariant: identical output under " +
      "repartition (the DECIMAL moment sums are order-insensitive)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val a = Sim.pcaTopComponent(emb).orderBy("dim_pos").collect().toSeq
    val b = Sim.pcaTopComponent(emb.repartition(13))
      .orderBy("dim_pos").collect().toSeq
    assert(a === b)
  }

  test("weightedSample: partition-invariant, uniform at equal weights, " +
      "and weight-followed in expectation") {
    import graft.ops.Curate
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("wt", col("n_chars") + 1)
    val pick = Curate.weightedSample(docs, "doc_id", "wt", 25)
      .select("doc_id").as[Long].collect().toSet
    // the draw is a function of ids+weights alone — any physical layout
    // must select the identical set
    val pickShuffled = Curate.weightedSample(docs.repartition(7),
        "doc_id", "wt", 25)
      .select("doc_id").as[Long].collect().toSet
    assert(pick === pickShuffled)
    // equal weights degenerate to a plain uniform top-k: ln(u)/1 is
    // monotone in u, so the rank order is u descending — the SAME
    // 48-bit uniform Agg.weightedSample draws
    val uni = Curate.weightedSample(docs.withColumn("wt", lit(1L)),
        "doc_id", "wt", 25)
      .select("doc_id").as[Long].collect().toSet
    val topByU = docs
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12),
          16, 10).cast("double") + 1) / 281474976710656.0)
      .orderBy(col("u").desc, col("doc_id").asc).limit(25)
      .select("doc_id").as[Long].collect().toSet
    assert(uni === topByU)
    // non-positive weights are filtered, not mis-ranked
    val withBad = docs.withColumn("wt",
      when(col("doc_id") % 2 === 0, lit(-5L)).otherwise(col("wt")))
    val clean = Curate.weightedSample(withBad, "doc_id", "wt", 25)
      .select("doc_id").as[Long].collect()
    assert(clean.forall(_ % 2 != 0), "negative-weight rows leaked in")
    // weighting steers composition: the selected docs' mean weight must
    // exceed the corpus mean (length-proportional sampling on a corpus
    // with varied lengths — a directional check, not a distribution fit)
    val meanSel = docs.where(col("doc_id").isin(pick.toSeq: _*))
      .agg(avg("wt")).head().getDouble(0)
    val meanAll = docs.agg(avg("wt")).head().getDouble(0)
    assert(meanSel > meanAll,
      s"selected mean weight $meanSel not above corpus mean $meanAll")
  }
}
