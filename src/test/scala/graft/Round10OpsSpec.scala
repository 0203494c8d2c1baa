package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Sim}

/** Round-10 additions: monotone own-cell multi-probe IVF, the
  * sweep/engine parity contract, OR-amplified sign-LSH, and the
  * Spearman engine auto-dispatch.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // the Round9 geometry plus vec 9 alone in cell 2: its own cell holds
  // no OTHER candidate, so single-probe returns nothing for it — the
  // zero-fill and own-cell-union cases both need exactly this shape
  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.1f, 0.9f, 0.0f, 0.0f), 1),
    (5L, Array(0.8f, 0.75f, 0.0f, 0.0f), 1),
    (9L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("topKIvf multi-probe always includes the query's own cell: " +
      "raising probes never loses a neighbor probes=1 found") {
    // vec 5's own cell is 1; cell 2's centroid (the z axis) is nearer
    // to NOTHING vec 5 cares about, but with arbitrary label cells the
    // own cell might not be centroid-ranked first — the union contract
    // says probes=1 results are always a subset of probes=p candidates
    for (q <- Seq(1L, 5L, 9L)) {
      val one = Sim.topKIvf(emb.where($"vec_id" === q), emb, 10, "label")
        .select("c_id").as[Long].collect().toSet
      for (p <- 2 to 3) {
        val multi = Sim.topKIvf(emb.where($"vec_id" === q), emb, 10,
            "label", probes = p)
          .select("c_id").as[Long].collect().toSet
        assert(one.subsetOf(multi),
          s"q=$q probes=$p lost ${one -- multi} that probes=1 found")
      }
    }
  }

  test("ivfRecallSweep row p equals the realized recall of " +
      "topKIvf(probes = p) — the sweep measures the shipped engine") {
    val q = emb.where($"vec_id".isin(1L, 5L, 9L))
    val truth = Sim.topK(q, emb, 2).select("q_id", "c_id")
      .as[(Long, Long)].collect().toSet
    val sweep = Sim.ivfRecallSweep(q, emb, 2, "label", maxProbes = 3)
      .orderBy("probes")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(sweep.map(_._1).toSeq === Seq(1, 2, 3))
    for ((p, nT, nA, nH, recall) <- sweep) {
      val eng = Sim.topKIvf(q, emb, 2, "label", probes = p)
        .select("q_id", "c_id").as[(Long, Long)].collect()
      assert(nT === truth.size.toLong)
      assert(nA === eng.length.toLong, s"n_approx mismatch at p=$p")
      val hits = eng.count(truth.contains)
      assert(nH === hits.toLong, s"n_hits mismatch at p=$p")
      val expect = math.floor(hits.toDouble / truth.size * 1e4) / 1e4
      assert(recall === expect, s"recall mismatch at p=$p")
    }
  }

  test("ivfRecallSweep zero-fills a probes row with no candidates " +
      "instead of dropping it") {
    // vec 9 is alone in its cell: p=1 probes only that cell and the
    // self-pair is excluded -> zero approx rows, which must still be a
    // row (n_approx = 0, recall = 0), not a missing group
    val got = Sim.ivfRecallSweep(emb.where($"vec_id" === 9L), emb, 2,
        "label", maxProbes = 2)
      .orderBy("probes")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got.length === 2, "every p in [1, maxProbes] emits a row")
    val (p1, nT1, nA1, nH1, r1) = got(0)
    assert(p1 === 1 && nA1 === 0L && nH1 === 0L && r1 === 0.0)
    assert(nT1 === 2L)
    val (_, _, nA2, _, r2) = got(1)
    assert(nA2 > 0L && r2 >= r1)
  }

  test("topKLsh tables=1 is the single-table engine unchanged; " +
      "hyperplanes table=0 keeps the original derivation") {
    assert(Sim.hyperplanes(4, 3).flatten.toSeq ===
      Sim.hyperplanes(4, 3, table = 0).flatten.toSeq)
    // independent tables differ (else OR-amplification buys nothing)
    assert(Sim.hyperplanes(4, 3, table = 1).flatten.toSeq !==
      Sim.hyperplanes(4, 3, table = 0).flatten.toSeq)
    val one = Sim.topKLsh(emb.where($"vec_id" === 1L), emb, 3, bits = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val oneExplicit = Sim.topKLsh(emb.where($"vec_id" === 1L), emb, 3,
        bits = 4, tables = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(one === oneExplicit)
  }

  test("topKLsh OR-amplification: candidate union grows with tables, " +
      "recall vs brute truth is non-decreasing in L, and a pair " +
      "matching in several tables is emitted exactly once") {
    val q = emb.where($"vec_id" < 10)
    val truth = Sim.topK(q, emb, 3).select("q_id", "c_id")
      .as[(Long, Long)].collect().toSet
    var prevRecall = -1.0
    for (l <- Seq(1, 2, 4)) {
      val got = Sim.topKLsh(q, emb, 3, bits = 4, tables = l)
        .select("q_id", "c_id").as[(Long, Long)].collect()
      // first-match-wins dedup: no (q, c) pair twice
      assert(got.length === got.toSet.size,
        s"duplicate pairs at tables=$l")
      val recall = got.count(truth.contains).toDouble / truth.size
      assert(recall >= prevRecall,
        s"recall fell from $prevRecall at tables=$l")
      prevRecall = recall
    }
  }

  test("streaming oracle gate: the windowed aggregation accumulated " +
      "across 4 real micro-batches equals the batch engine bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val stage = graft.streaming.StreamOps.stageEvents(spark, dir, 4)
    val parts = new java.io.File(stage).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts === 4, "4 staged files -> 4 micro-batches at " +
      "maxFilesPerTrigger=1")
    val streamed = graft.streaming.StreamOps
      .runBoundedGate(spark, dir, 4, 4)(in =>
        graft.streaming.StreamOps.windowedCounts(
          in, "3600 seconds", "3600 seconds"))
      .orderBy("window_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = graft.ops.EventsOps
      .tumblingCounts(Tables.load(spark, dir, "events"), 3600)
      .orderBy("window_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("spearmanEngine routes few-giant-TIE-HEAVY groups to domain, " +
      "many-groups OR near-unique measures to windowed (the round-10 " +
      "two-dimensional finding); spearmanAuto output is bit-identical " +
      "to both engines either way") {
    // 3 groups x 40 rows over 5x7-value domains: few giant groups AND
    // heavy ties (joint domain 36/240 = 0.15 of the row mass) — the
    // replication-shaped regime where the domain engine measured
    // 13.7x better
    val giant = (0 until 120).map { i =>
      (s"g${i % 3}", (i * 7 % 5).toDouble, (i * 11 % 7).toDouble)
    }.toDF("k", "x", "y")
    // 40 groups x 3 rows: the many-small-groups regime
    val many = (0 until 120).map { i =>
      (s"g${i % 40}", (i * 7 % 13).toDouble, (i * 11 % 17).toDouble)
    }.toDF("k", "x", "y")
    // 3 giant groups but NEAR-UNIQUE measures (joint domain ~= rows):
    // cardinality alone says domain; the tie ratio must veto it —
    // lineitem sf0.1 measured windowed 1.48 s vs domain 3.23 s here
    val nearUnique = (0 until 120).map { i =>
      (s"g${i % 3}", i.toDouble, (i * 7919 % 7907).toDouble)
    }.toDF("k", "x", "y")
    assert(Agg.spearmanEngine(giant, "k", "x", "y", 32L) === "domain")
    assert(Agg.spearmanEngine(many, "k", "x", "y", 32L) === "windowed")
    assert(Agg.spearmanEngine(nearUnique, "k", "x", "y", 32L) ===
      "windowed")
    for (df <- Seq(giant, many)) {
      val auto = Agg.spearmanAuto(df, "k", "x", "y", 32L)
        .orderBy("k").as[(String, Long, Double)].collect().toSeq
      val w = Agg.spearmanCorr(df, "k", "x", "y")
        .orderBy("k").as[(String, Long, Double)].collect().toSeq
      val d = Agg.spearmanCorrDomain(df, "k", "x", "y")
        .orderBy("k").as[(String, Long, Double)].collect().toSeq
      assert(auto === w && auto === d)
    }
  }

  test("the q240 custom-state oracle gate reproduces batch sessions " +
      "bit-for-bit on the RocksDB state store provider (the at-scale " +
      "backend) — watermark, timeouts, and sentinel flush included") {
    val dir = "/root/testdata/sf0.001"
    val rocks = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"))
    val streamed = graft.streaming.StreamOps
      .runOrderedGateAppend(spark, dir, 4, 4, extraConf = rocks)(in =>
        graft.streaming.StreamOps.statefulSessionizeWatermarked(
          in, 1800L, "30 minutes").toDF)
      .where(col("user_id") >= 0)
      // ClosedSession.session_end = last event es, same as the batch
      // sessionizer's max(es) (the q240 gate aligns to the q67 oracle's
      // +gap form in the REGISTRY projection, not here)
      .select(col("user_id"), col("session_start"),
        col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = graft.ops.EventsOps
      .sessionize(Tables.load(spark, dir, "events"), 1800L)
      .select("user_id", "session_start",
        "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("retrievalMetrics: a perfect run anchors at exactly 1e6/1e6, a " +
      "no-hit query contributes ZERO to MRR (the null-index element_at " +
      "trap), and position-degraded runs score between") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("q_id", "c_id", "rk")
    // run A: identical to truth. run B: q1 hits reversed positions,
    // q2 finds NOTHING relevant (the null-first_hit case).
    val runB = Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 98L, 1), (2L, 99L, 2))
      .toDF("q_id", "c_id", "rk")
    val m = graft.ops.Sim.retrievalMetrics(truth, 2,
        "perfect" -> truth, "degraded" -> runB)
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(m("perfect") === ((1000000L, 1000000L, 2L)))
    // degraded: q1 mrr 1e6 (hit at 1), q2 mrr 0 -> mean 500000.
    // q1 ndcg = full dcg (both hit, positions swapped but W1+W2 same
    // sum) -> 1e6; q2 ndcg 0 -> mean 500000.
    assert(m("degraded") === ((500000L, 500000L, 2L)))
  }

  test("compaction halves per-partition file counts to the " +
      "maxRecordsPerFile contract and preserves every row") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact-spec").toString
    val src = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.repartition(8).write.mode("overwrite")
      .partitionBy("lang").parquet(base + "/frag")
    def filesPerPartition(dir: String): Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerPartition(base + "/frag")
    assert(before.values.forall(_ >= 2), s"not fragmented: $before")
    graft.ops.Layout.compactPartitioned(spark, base + "/frag",
      base + "/compact", Seq("lang"), maxRecordsPerFile = 1000000L)
    val after = filesPerPartition(base + "/compact")
    assert(after.keySet === before.keySet)
    assert(after.values.forall(_ === 1),
      s"rows fit one file per partition, got $after")
    // content preserved bit-for-bit
    val a = spark.read.parquet(base + "/compact")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = src.select(spark.read.parquet(base + "/compact")
      .columns.map(col).toIndexedSeq: _*)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
    // maxRecordsPerFile contract: cap of 100 rows -> ceil(n/100) files
    graft.ops.Layout.compactPartitioned(spark, base + "/frag",
      base + "/cap", Seq("lang"), maxRecordsPerFile = 100L)
    val counts = src.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val capped = filesPerPartition(base + "/cap")
    counts.foreach { case (lang, n) =>
      assert(capped(s"lang=$lang") === ((n + 99) / 100).toInt,
        s"lang=$lang n=$n got ${capped(s"lang=$lang")}")
    }
  }

  test("MMR re-ranking diversifies where topK returns near-copies, " +
      "and degenerates to topK at lambda = 1") {
    // query along x; two EXACT-copy x-aligned candidates (mutual
    // cos = 1, the strongest possible redundancy); one diverse
    // z-leaning candidate with lower relevance
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.05f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f, 0.0f, 0.0f)),
      (3L, Array(0.6f, 0.0f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" === 0)
    val top = Sim.topK(q, vecs, 2).orderBy("rk")
      .select("c_id").as[Long].collect().toSeq
    assert(top === Seq(1L, 2L), "plain topK returns the exact copies")
    // mmr(copy)   = 0.3·0.9987 − 0.7·1.0   ≈ −0.400
    // mmr(diverse)= 0.3·0.6    − 0.7·0.599 ≈ −0.239  → diverse wins
    val mmr = Sim.mmrTopK(q, vecs, 2, lambda = 0.3).orderBy("rk")
      .select("c_id").as[Long].collect().toSeq
    assert(mmr === Seq(1L, 3L),
      "MMR's second pick must be the diverse candidate, not the copy")
    val lam1 = Sim.mmrTopK(q, vecs, 2, lambda = 1.0).orderBy("rk")
      .select("c_id").as[Long].collect().toSeq
    assert(lam1 === top, "lambda=1 removes the diversity penalty")
  }

  test("BPE trainer replays Sennrich greedy merges on a hand-computed " +
      "corpus, including the overlap case and the count-tie-break") {
    // "aaab" x3, "ab" x2: pairs at step 1: (a,a)=6 [two per 'aaab'],
    // (a,b)=5. Merge 1 = (a,a) -> 'aaab' becomes [aa, a, b] (greedy
    // left-to-right: the FIRST aa wins, no overlap re-use).
    // Step 2 pairs: (aa,a)=3, (a,b)=5 -> merge 2 = (a,b).
    // Step 3 pairs: (aa,ab)=3 -> merge 3.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab"), (3L, "ab"))
      .toDF("doc_id", "text")
    val ms = graft.ops.Bpe.train(docs, "text", merges = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(ms === Seq((1, "a", "a", 6L), (2, "a", "b", 5L),
      (3, "aa", "ab", 3L)))
    // exhaustion: only 3 merges exist; asking for 4 returns 3, and the
    // fully-merged dictionary encodes every word as ONE token
    val enc = graft.ops.Bpe.encodeStats(docs, "doc_id", "text", merges = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 2L, 8L, 2L), (2L, 2L, 6L, 2L),
      (3L, 1L, 2L, 1L)))
  }

  test("ordered staging replays oldest range first, and the flush " +
      "sentinels are LOAD-BEARING: without them the watermarked " +
      "custom-state engine strands each user's tail session in state") {
    val dir = "/root/testdata/sf0.001"
    val stage = graft.streaming.StreamOps.stageEventsOrdered(spark, dir, 4, 2)
    val parts = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified)
    assert(parts.length === 6, "4 range files + 2 sentinels")
    // mtime order == name order == ts-range order
    assert(parts.map(_.getName).toSeq === parts.map(_.getName).sorted.toSeq)
    val ranges = parts.take(4).map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"ranges overlap: $hi > $lo")
    }
    def run(sentinels: Int): Long =
      graft.streaming.StreamOps
        .runOrderedGateAppend(spark, dir, 4, 4, sentinels)(in =>
          graft.streaming.StreamOps.statefulSessionizeWatermarked(
            in, 1800L, "30 minutes").toDF)
        .where(col("user_id") >= 0).count()
    val withFlush = run(2)
    val withoutFlush = run(0)
    val batch = graft.ops.EventsOps
      .sessionize(Tables.load(spark, dir, "events"), 1800L).count()
    assert(withFlush === batch,
      s"flushed stream $withFlush != batch $batch")
    assert(withoutFlush < withFlush,
      "without sentinels every user's last session should be stranded " +
        s"in state, but $withoutFlush >= $withFlush")
  }

  test("BPE tie on pair count breaks to the lexicographically smallest " +
      "pair in both engines' order") {
    // (a,b) and (c,d) both count 2 -> (a,b) must win rank 1
    val docs = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("doc_id", "text")
    val ms = graft.ops.Bpe.train(docs, "text", merges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(ms === Seq((1, "a", "b", 2L)))
  }

  test("PQ engine matches a naive in-memory reference (codebooks, codes, " +
      "ADC and SDC top-k) on the sf0.001 fixture, and encoding is " +
      "partition-invariant") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val (m, k, iters, topN) = (4, 8, 2, 5)
    val books = Sim.pqCodebooks(emb, m, k, iters)

    // ---- naive reference, replaying the engine's exact disciplines ----
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val dim = vecs.head._2.length
    val sub = dim / m
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def fl9(x: Double): Double = math.floor(x * 1e9) / 1e9
    def slice(v: Array[Float], s: Int): Array[Double] =
      v.slice(s * sub, s * sub + sub).map(_.toDouble)
    def assign(sv: Array[Double], cents: IndexedSeq[Array[Double]]): Int =
      cents.zipWithIndex.map { case (c, j) => (fl9(l2(sv, c)), j) }.min._2
    val naiveBooks = (0 until m).map { s =>
      var cents: IndexedSeq[Array[Double]] =
        vecs.take(k).map(v => slice(v._2, s)).toIndexedSeq
      for (_ <- 1 to iters) {
        val byCode = vecs.map(v => assign(slice(v._2, s), cents) -> v._2)
          .groupBy(_._1)
        cents = cents.indices.map { j =>
          byCode.get(j).fold(cents(j)) { vs =>
            // decimal(27,10) HALF_UP sum -> double mean -> float roundtrip
            (0 until sub).map { p =>
              val tot = vs.map(x => BigDecimal(x._2(s * sub + p).toDouble)
                .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
              (tot.toDouble / vs.size).toFloat.toDouble
            }.toArray
          }
        }
      }
      cents
    }
    books.indices.foreach { s =>
      assert(books(s).map(_.map(_.toDouble.toFloat)) ===
        naiveBooks(s).map(_.map(_.toFloat)).map(_.toSeq),
        s"codebook $s diverged")
    }

    // codes: engine == naive, and invariant under repartition
    import spark.implicits._
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      Sim.pqEncode(df, books)
        .select(col("vec_id"), col("code_0"), col("code_1"),
          col("code_2"), col("code_3"))
        .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    val got = codesOf(emb)
    assert(got === codesOf(emb.repartition(7)), "codes not layout-stable")
    val naiveCodes = vecs.map { case (id, v) =>
      val cs = (0 until m).map(s => assign(slice(v, s), naiveBooks(s)))
      (id, cs(0), cs(1), cs(2), cs(3))
    }.toSeq
    assert(got === naiveCodes, "codes diverged from naive")

    // ADC + SDC top-k: engine == naive greedy over the same tables
    val naiveCodeMap = naiveCodes.map(c => c._1 ->
      Array(c._2, c._3, c._4, c._5)).toMap
    val qids = vecs.map(_._1).filter(_ < 10)
    def naiveTopK(symmetric: Boolean) = qids.flatMap { q =>
      val scored = vecs.filter(_._1 != q).map { case (cid, _) =>
        val d = (0 until m).map { s =>
          if (symmetric)
            l2(naiveBooks(s)(naiveCodeMap(q)(s)),
              naiveBooks(s)(naiveCodeMap(cid)(s)))
          else l2(slice(vecs.find(_._1 == q).get._2, s),
            naiveBooks(s)(naiveCodeMap(cid)(s)))
        }.reduceLeft(_ + _)
        (fl9(d), cid)
      }.sorted.take(topN)
      scored.zipWithIndex.map { case ((d, cid), i) => (q, cid, i + 1) }
    }.toSeq
    for (sym <- Seq(false, true)) {
      val eng = Sim.pqTopK(emb.where(col("vec_id") < 10), emb, books,
          topN, symmetric = sym)
        .select(col("q_id"), col("c_id"), col("rk"))
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(eng === naiveTopK(sym), s"symmetric=$sym top-k diverged")
    }
  }
}
