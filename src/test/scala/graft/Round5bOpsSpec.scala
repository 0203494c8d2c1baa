package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Dedup, Layout, Prune, Sim, Skew}

/** Round-5 second wave: SemDeDup (cluster-blocked embedding dedup), exact
  * segment-level corpus dedup, the unigram-LM quality proxy, fixpoint
  * connected components, and the salt-replicated skew join.
  */
class Round5bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("semDedup: cells partition the corpus; kept+dropped = total; " +
      "deterministic across runs") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Sim.semDedup(emb, k = 8, iters = 2, threshold = 0.2)
      .orderBy("cell")
      .as[(Int, Long, Long, Long)].collect()
    val b = Sim.semDedup(emb, k = 8, iters = 2, threshold = 0.2)
      .orderBy("cell")
      .as[(Int, Long, Long, Long)].collect()
    assert(a === b)
    assert(a.map(_._2).sum === emb.count())
    a.foreach { case (cell, total, kept, dropped) =>
      assert(cell >= 0 && cell < 8)
      assert(kept + dropped === total)
      assert(kept >= 1) // min-id survivor: every cell keeps its smallest id
    }
  }

  test("dedupSegments: first occurrence survives, later copies are dropped") {
    val block = (1 to 16).map(i => s"tok$i").mkString(" ")
    val other = (1 to 16).map(i => s"alt$i").mkString(" ")
    val docs = Seq(
      (1L, block),                    // defines the segment
      (2L, block),                    // exact dup -> keeps nothing
      (3L, other),                    // distinct -> keeps its one segment
      (4L, block + " tail one two three") // dup block + unique 4-token tail
    ).toDF("doc_id", "text")
    val got = Curate.dedupSegments(docs, "doc_id", "text", segTokens = 16)
      .orderBy("doc_id")
      .select("doc_id", "n_segments", "n_kept")
      .as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 1L),
      (4L, 2L, 1L)))
  }

  test("unigramLogProb matches the hand-computed corpus MLE") {
    val docs = Seq((1L, "aa aa bb"), (2L, "aa")).toDF("doc_id", "text")
    // corpus: tf(aa)=3, tf(bb)=1, N=4
    val l34 = math.log(3.0 / 4) / math.log(2)
    val l14 = math.log(1.0 / 4) / math.log(2)
    def fl6(x: Double): Double = math.floor(x * 1e6) / 1e6
    val got = Curate.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "mean_log2p")
      .as[(Long, Long, Double)].collect()
    assert(got(0)._1 === 1L && got(0)._2 === 3L)
    assert(got(0)._3 === fl6((l34 + l34 + l14) / 3))
    assert(got(1) === ((2L, 1L, fl6(l34))))
  }

  test("componentsConverged reaches labels beyond bounded-round " +
      "propagation (chain of diameter 4) and keeps components separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.componentsConverged(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
    // the bounded 2-round pass provably has NOT converged on this chain —
    // that gap is what the fixpoint loop exists to close
    val bounded = Dedup.minLabelPropagate(pairs, rounds = 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(bounded(5L) !== 1L)
  }

  test("componentsBigStar == componentsConverged on chains, cliques, and " +
      "a seeded random graph") {
    // worst case for propagation (diameter = n), trivial for star rounds
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaStar = Dedup.componentsBigStar(chain)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(viaStar.forall(_._2 === 1L) && viaStar.length === 40)
    // seeded random graph: both engines must agree exactly
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(50).toLong,
        rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id_a", "id_b")
    val a = Dedup.componentsBigStar(pairs)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val b = Dedup.componentsConverged(pairs, maxRounds = 60)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(a === b)
  }

  test("bloom pre-filter: no false negatives, prunes most non-members, " +
      "bloomSemiJoin == exact semi join; empty build side yields empty") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
    val Some(bf) = Prune.bloomFilterOf(ord, "o_orderkey")
    // no false negatives: every true member passes the probe
    val members = ord.select(col("o_orderkey")).distinct()
    assert(members.where(!Prune.mightContain(bf, col("o_orderkey")))
      .count() === 0)
    // pre-filter keeps all matching lineitem rows and prunes most others
    val trueMatches = li.join(members,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val pruned = li.where(Prune.mightContain(bf, col("l_orderkey"))).count()
    assert(pruned >= trueMatches)
    assert(pruned < li.count()) // it actually prunes at default fpp
    // end-to-end identity with the exact semi join
    val got = Prune.bloomSemiJoin(li, ord, "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").as[(String, Long)].collect()
    val exp = li.join(members, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").as[(String, Long)].collect()
    assert(got === exp)
    assert(Prune.bloomSemiJoin(li, ord.where(lit(false)),
      "l_orderkey", "o_orderkey").count() === 0)
  }

  test("zValue interleaves bits exactly; zOrderWrite bounds BOTH dims " +
      "per file where a single-dim sort leaves one dim unbounded") {
    // hand-checked interleave: a=0b101 (bits 0,2), b=0b011 (bits 0,1)
    // -> a bits at 0,4; b bits at 1,3 -> 0b11011 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].head()
    assert(z === 27L)

    val ord = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .withColumn("day",
        floor(unix_timestamp(col("o_orderdate")) / 86400) - 7305)
    val zdir = "/tmp/graft_zorder_test"
    val cdir = "/tmp/graft_custsort_test"
    Layout.zOrderWrite(ord,
      Layout.zValue(col("o_custkey"), col("day"), 16), 16, zdir)
    ord.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(cdir)
    // per-file fraction of each dimension's total span (what parquet
    // min/max skipping sees): z-order must bound BOTH dims; the
    // single-dim sort leaves day unbounded (~every file spans all days)
    def spanFracs(path: String): (Double, Double) = {
      val df = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(max("o_custkey").minus(min("o_custkey")).as("ck"),
          max("day").minus(min("day")).as("dy"))
        .agg(avg("ck").as("ck"), avg("dy").as("dy"))
        .head()
      val (ckAll, dyAll) = (
        ord.agg(max("o_custkey").minus(min("o_custkey"))).head().getLong(0),
        ord.agg(max("day").minus(min("day"))).head().getLong(0))
      (df.getDouble(0) / ckAll, df.getDouble(1) / dyAll)
    }
    val (zCk, zDy) = spanFracs(zdir)
    val (cCk, cDy) = spanFracs(cdir)
    assert(zCk < 0.9 && zDy < 0.9,
      s"z-order should bound both dims: custkey=$zCk day=$zDy")
    assert(cDy > 0.9, s"single-dim sort should NOT bound day: $cDy")
    assert(cCk < zCk) // ...but beats z-order on its own sort dimension
  }

  test("z-order read-side payoff: a day-range predicate skips most " +
      "files/row-groups on the clustered layout and none on the " +
      "single-dim sort") {
    val ord = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      .withColumn("day",
        floor(unix_timestamp(col("o_orderdate")) / 86400) - 7305)
    val zdir = "/tmp/graft_zorder_read_test"
    val cdir = "/tmp/graft_custsort_read_test"
    Layout.zOrderWrite(ord,
      Layout.zValue(col("o_custkey"), col("day"), 16), 16, zdir)
    ord.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(cdir)
    // ~1/8 of the day span, in the middle
    val (dLo, dHi) = {
      val r = ord.agg(min("day"), max("day")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val w = (hi - lo) / 8
      (lo + 3 * w, lo + 4 * w)
    }
    // (1) what parquet min/max skipping sees: files whose day bounds
    // intersect the range. Z-order boxes both dims per file, so most
    // files miss the range; the custkey sort leaves day unbounded, so
    // EVERY file intersects.
    def filesIntersecting(path: String): (Long, Long) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("day").as("lo"), max("day").as("hi"))
      (perFile.where(col("lo") <= dHi && col("hi") >= dLo).count(),
        perFile.count())
    }
    val (zHit, zAll) = filesIntersecting(zdir)
    val (cHit, cAll) = filesIntersecting(cdir)
    assert(cHit === cAll, s"custkey sort should bound no file: $cHit/$cAll")
    assert(zHit.toDouble / zAll <= 0.5,
      s"z-order should skip at least half the files: $zHit/$zAll")
    // (2) the same skip through Spark's own reader: the scan's
    // numOutputRows (rows surviving pushed-down row-group/page skipping,
    // before Spark's Filter) must be far smaller on the z layout
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .where(col("day") >= dLo && col("day") <= dHi)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      scan.metrics("numOutputRows").value
    }
    val (zRows, cRows) = (scanRows(zdir), scanRows(cdir))
    val total = ord.count()
    assert(cRows === total,
      s"custkey layout should skip nothing: scan emitted $cRows of $total")
    assert(zRows.toDouble / cRows <= 0.6,
      s"z layout should skip row groups: z=$zRows vs c=$cRows")
    // both layouts agree on the answer, of course
    assert(spark.read.parquet(zdir)
      .where(col("day") >= dLo && col("day") <= dHi).count() ===
      spark.read.parquet(cdir)
        .where(col("day") >= dLo && col("day") <= dHi).count())
  }

  test("saltedJoin == plain join, salt never escapes, and the physical " +
      "plan is a shuffled hash join (not broadcast)") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      salts = 8)
    assert(!salted.columns.contains("__salt"))
    val gotRows = salted.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).orderBy("o_orderpriority")
      .as[(String, Long)].collect()
    val expRows = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).orderBy("o_orderpriority")
      .as[(String, Long)].collect()
    assert(gotRows === expRows)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"))
    assert(!plan.contains("BroadcastHashJoin"))
  }
}
