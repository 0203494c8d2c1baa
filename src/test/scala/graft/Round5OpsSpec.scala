package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Dedup, Text}
import graft.sources.Sources

/** Round-5 additions: Gopher-style repetition/quality filters, the
  * LSH-then-verify near-dup composition, and the physical JDBC round-trip.
  */
class Round5OpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetitionStats: top-bigram share, mean word length, symbol ratio") {
    val docs = Seq(
      (1L, "a b a b a b"),          // bigrams: ab,ba,ab,ba,ab -> 3/5
      (2L, "aa bbbb"),              // mean len 3.0, one bigram -> 1/1
      (3L, "x # y ... z"),          // 5 tokens, 1 '#' + 1 '...' -> 0.4
      (4L, "solo"),                 // no bigrams -> 0.0
      (5L, "")                      // empty -> all zeros
    ).toDF("id", "txt")
    val st = Text.repetitionStats(docs, "id", "txt")
      .orderBy("id")
      .select("id", "n_tokens", "mean_word_len", "symbol_ratio",
        "top_bigram_frac")
      .as[(Long, Int, Double, Double, Double)].collect()
    assert(st(0) === ((1L, 6, 1.0, 0.0, 0.6)))
    assert(st(1) === ((2L, 2, 3.0, 0.0, 1.0)))
    assert(st(2) === ((3L, 5, 1.4, 0.4, 0.25)))
    assert(st(3) === ((4L, 1, 4.0, 0.0, 0.0)))
    assert(st(4) === ((5L, 0, 0.0, 0.0, 0.0)))
  }

  test("gopherKeep applies the published bounds") {
    val rows = Seq(
      // n_tokens, mean_len, sym, bigram -> expected keep
      (10, 5.0, 0.0, 0.1, true),
      (9, 5.0, 0.0, 0.1, false),   // too short
      (10, 2.9, 0.0, 0.1, false),  // words too short
      (10, 10.5, 0.0, 0.1, false), // words too long
      (10, 5.0, 0.2, 0.1, false),  // symbol-heavy
      (10, 5.0, 0.0, 0.5, false)   // repetitive
    ).toDF("n", "ml", "sr", "bf", "expected")
    val got = rows.select(col("expected"),
        Text.gopherKeep(col("n"), col("ml"), col("sr"), col("bf"))
          .as("keep"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (expected, keep) => assert(keep === expected) }
  }

  test("lshVerifiedPairs == exact jaccard on LSH candidates (recall on " +
      "exact duplicates is certain)") {
    // exact duplicates collide on every band; distinct word-soup does not
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "iota kappa lambda mu nu xi omicron pi"),
      (4L, "iota kappa lambda mu nu xi omicron pi"),         // dup of 3
      (5L, "rho sigma tau upsilon phi chi psi omega")
    ).toDF("doc_id", "text")
    val got = Dedup.lshVerifiedPairs(docs, "doc_id", "text",
        k = 8, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 1.0), (3L, 4L, 1.0)))
    // the verified jaccard must equal the standalone exact computation
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text",
        w = 3, minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === exact)
  }

  test("packSequences: concat-and-chunk offsets and pack ids per shard") {
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens -> offset 0, pack 0
      (2L, "d e"),          // 2 tokens -> offset 3, pack 0
      (3L, "f g h i")       // 4 tokens -> offset 5, pack 1 (ctx=4)
    ).toDF("doc_id", "text")
    val got = Curate.packSequences(docs, "doc_id", "text",
        ctxTokens = 4, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "shard", "start_offset", "pack_id")
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 0, 0L, 0L), (2L, 2L, 0, 3L, 0L),
      (3L, 4L, 0, 5L, 1L)))
  }

  test("decontaminate flags train docs sharing shingles with the eval " +
      "set, with the shared count") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),   // eval
      (1L, "alpha beta gamma delta"),   // shares both shingles -> 2
      (2L, "iota kappa lambda mu")      // disjoint -> absent
    ).toDF("doc_id", "text")
    val got = Curate.decontaminate(docs, "doc_id", "text",
        isEval = col("doc_id") === 0, w = 3)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L)))
  }

  test("redactPii counts and replaces emails then phones") {
    val df = Seq((1L, "mail bob@x.co or +1-555-0100 now"),
      (2L, "nothing here")).toDF("id", "txt")
    val got = Curate.redactPii(df, "txt")
      .orderBy("id").select("n_pii", "redacted")
      .as[(Int, String)].collect().toSeq
    assert(got === Seq(
      (2, "mail <EMAIL> or <PHONE> now"),
      (0, "nothing here")))
  }

  test("aggState + mergeAggStates == full recompute, for any split") {
    val ev = Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", -1.0),
      (4L, "b", 4.0), (5L, "a", 0.25)).toDF("id", "k", "v")
    val full = graft.ops.Agg.aggState(ev, "k", "v")
    // split on id parity, then merge the two partial states
    val merged = graft.ops.Agg.mergeAggStates(Seq(
      graft.ops.Agg.aggState(ev.where($"id" % 2 === 0), "k", "v"),
      graft.ops.Agg.aggState(ev.where($"id" % 2 =!= 0), "k", "v")), "k")
    val norm = (df: org.apache.spark.sql.DataFrame) => df.orderBy("k")
      .select($"k", $"n", $"sx".cast("double"), $"mn".cast("double"),
        $"mx".cast("double"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(norm(merged) === norm(full))
    assert(norm(full) === Seq(("a", 3L, 4.25, 0.25, 2.5),
      ("b", 2L, 3.0, -1.0, 4.0)))
  }

  test("mixtureSample keeps by per-source rate, deterministically") {
    val docs = (0L until 200L).map(i => (i, s"src${i % 2}"))
      .toDF("doc_id", "source")
    val got = Curate.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), default = 0.5)
    // rate 1.0 keeps everything, rate 0.0 keeps nothing
    assert(got.where($"source" === "src0").count() === 100)
    assert(got.where($"source" === "src1").count() === 0)
    // unlisted source falls back to default and is reproducible
    val other = (0L until 1000L).map(i => (i, "srcX")).toDF("doc_id", "source")
    val a = Curate.mixtureSample(other, "doc_id", "source", Map.empty, 0.5)
    val n = a.count()
    assert(n > 400 && n < 600) // md5 is uniform
    assert(Curate.mixtureSample(other, "doc_id", "source", Map.empty, 0.5)
      .count() === n)
  }

  test("dupNgramShare: shingles shared across docs vs doc-local ones") {
    val docs = Seq(
      (1L, "a b c d e f"),   // shingles(5): "a b c d e", "b c d e f"
      (2L, "a b c d e zz"),  // shares "a b c d e" with doc 1
      (3L, "q r s t u v")    // all doc-local
    ).toDF("doc_id", "text")
    val got = Curate.dupNgramShare(docs, "doc_id", "text", w = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_dup", "dup_share")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 2L, 0L, 0.0)))
  }

  test("oovRate against the corpus' own top-v vocabulary") {
    val docs = Seq(
      (1L, "the the the cat"),   // vocab(1) = {the}; 1 OOV of 4
      (2L, "dog dog"),           // all OOV
      (3L, "the")                // none OOV
    ).toDF("doc_id", "text")
    val got = Curate.oovRate(docs, "doc_id", "text", v = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 4L, 1L, 0.25), (2L, 2L, 2L, 1.0),
      (3L, 1L, 0L, 0.0)))
  }

  test("medianByRank == percentile(0.5): bufferless rank selection " +
      "matches the buffered exact form") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ranked = graft.ops.Agg.medianByRank(li, "l_returnflag",
        "l_extendedprice")
      .orderBy("l_returnflag")
      .select($"l_returnflag", $"median", $"n")
      .as[(String, Double, Long)].collect().toSeq
    val buffered = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .select($"l_returnflag", $"p50", $"n")
      .as[(String, Double, Long)].collect().toSeq
    assert(ranked.map(_._1) === buffered.map(_._1))
    ranked.zip(buffered).foreach { case ((_, m, n1), (_, p, n2)) =>
      assert(n1 === n2)
      assert(math.abs(m - p) < 1e-9, s"rank $m vs percentile $p")
    }
    // odd and even group sizes both occur… if not, the interpolation
    // branch is untested — pin both explicitly
    val odd = Seq(("g", 1.0), ("g", 5.0), ("g", 2.0)).toDF("k", "x")
    assert(graft.ops.Agg.medianByRank(odd, "k", "x")
      .select($"median").as[Double].head() === 2.0)
    val even = Seq(("g", 1.0), ("g", 2.0), ("g", 5.0), ("g", 6.0))
      .toDF("k", "x")
    assert(graft.ops.Agg.medianByRank(even, "k", "x")
      .select($"median").as[Double].head() === 3.5)
  }

  test("chunkWindows: overlap, short-doc single chunk, no contained tail") {
    // letters only: cleanTokens strips digits, so "w1".."w10" would all
    // collapse to "w" and every chunk would hash identically
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "a b c"),                                   // shorter than chunk
      (3L, "")                                         // empty -> no chunks
    ).toDF("doc_id", "text")
    // chunk=4, stride=3 -> doc 1: ceil((10-4)/3)+1 = 3 chunks at 0,3,6
    val got = Curate.chunkWindows(docs, "doc_id", "text",
        chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got === Seq((1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (2L, 0, 3)))
    // consecutive chunks overlap by chunk - stride = 1 token
    val hashes = Curate.chunkWindows(docs.where($"doc_id" === 1),
        "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").select("chunk_md5").as[String].collect()
    assert(hashes.distinct.length === 3)
  }

  test("JDBC round-trip through embedded Derby preserves rows and types") {
    val df = Seq((1, "ares", 10L), (2, "boreas", 20L), (3, "cronus", 30L))
      .toDF("id", "name", "v")
    val url =
      s"jdbc:derby:memory:graftspec${ProcessHandle.current().pid};create=true"
    Sources.writeJdbc(df, url, "t_spec", Map("name" -> 32))
    val back = Sources.readJdbc(spark, url, "t_spec")
    assert(back.schema.fieldNames.sorted === Array("id", "name", "v"))
    assert(back.orderBy("id").as[(Int, String, Long)].collect().toSeq ===
      Seq((1, "ares", 10L), (2, "boreas", 20L), (3, "cronus", 30L)))
    // overwrite is idempotent (the Bench reps re-run the same write)
    Sources.writeJdbc(df, url, "t_spec", Map("name" -> 32))
    assert(Sources.readJdbc(spark, url, "t_spec").count() === 3)
  }
}
