package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Round-12 additions: top-r PCA by Hotelling deflation over the single
  * covariance moment pass.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Cyclic Jacobi eigensolve of a symmetric matrix — the in-memory
    * reference the deflation engine is measured against. Returns
    * (eigenvalues desc, eigenvectors as columns in the same order).
    */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to 100) {
      var off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) off += a(p)(q) * a(p)(q)
      if (off > 1e-24) {
        for (p <- 0 until d; q <- p + 1 until d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            for (i <- 0 until d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
            }
            for (j <- 0 until d) {
              val apj = a(p)(j); val aqj = a(q)(j)
              a(p)(j) = c * apj - s * aqj
              a(q)(j) = s * apj + c * aqj
            }
            for (i <- 0 until d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
            }
          }
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(j => v(j)(i)).toArray).toArray)
  }

  test("pcaTopComponents recovers a PLANTED well-gapped spectrum: " +
      "loadings and eigenvalues match an in-memory Jacobi eigensolve " +
      "of the empirical covariance") {
    val d = 8
    val n = 400
    // planted spectrum with ratio->=2 gaps, rotated off the axes by a
    // Householder reflection so the eigenbasis is non-trivial
    val scales = Array(16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.125)
    val hv = {
      val raw = Array.tabulate(d)(i => 1.0 + 0.3 * i)
      val nm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nm)
    }
    def reflect(x: Array[Double]): Array[Double] = {
      var dot = 0.0
      for (i <- 0 until d) dot += hv(i) * x(i)
      Array.tabulate(d)(i => x(i) - 2.0 * dot * hv(i))
    }
    val rnd = new scala.util.Random(12)
    val rows = (0 until n).map { id =>
      val g = Array.tabulate(d)(k => math.sqrt(scales(k)) * rnd.nextGaussian())
      (id.toLong, reflect(g).map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")

    val r = 3
    val got = Sim.pcaTopComponents(df, r = r, iters = 40)
      .orderBy("comp", "dim_pos").collect()
      .groupBy(_.getInt(0)).view.mapValues { rs =>
        val sorted = rs.sortBy(_.getInt(1))
        (sorted.map(_.getDouble(2)), sorted.head.getDouble(3),
          sorted.head.getDouble(4))
      }.toMap

    // in-memory empirical covariance over the SAME float-truncated data
    val xs = rows.map(_._2.map(_.toDouble).toArray)
    val mu = Array.tabulate(d)(j => xs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      xs.map(x => x(i) * x(j)).sum / n - mu(i) * mu(j)
    }
    val (ev, evec) = jacobiEigen(cov)
    var trace = 0.0
    (0 until d).foreach(i => trace += cov(i)(i))

    (1 to r).foreach { k =>
      val (loadings, lambda, explained) = got(k)
      val rel = math.abs(lambda - ev(k - 1)) / ev(k - 1)
      assert(rel < 1e-6,
        s"comp $k lambda $lambda vs jacobi ${ev(k - 1)} (rel $rel)")
      var dot = 0.0
      (0 until d).foreach(i => dot += loadings(i) * evec(k - 1)(i))
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
        s"comp $k |cos| ${math.abs(dot)}")
      assert(math.abs(explained - lambda / trace) < 1e-8)
    }
    // with real convergence the estimates are ordered like the spectrum
    assert(got(1)._2 > got(2)._2 && got(2)._2 > got(3)._2)
  }

  test("pcaTopComponents component 1 is bit-identical to " +
      "pcaTopComponent on the fixture, every loading vector is " +
      "unit-norm, and one moment pass serves all r components") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val topr = Sim.pcaTopComponents(emb, r = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(topr.length === 4 * 64)
    val top1 = Sim.pcaTopComponent(emb).collect()
      .map(r => (1, r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(topr.filter(_._1 == 1).sortBy(_._2).toSeq ===
      top1.sortBy(_._2).toSeq)
    (1 to 4).foreach { k =>
      val norm2 = topr.filter(_._1 == k).map(t => t._3 * t._3).sum
      // loadings are floored at 9 dp AFTER normalization
      assert(math.abs(norm2 - 1.0) < 1e-6, s"comp $k norm^2 $norm2")
    }
  }

  test("decontaminateBloom is bit-identical to the exact broadcast " +
      "decontaminate (superset prefilter + exact join = exact result)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val isEval = col("doc_id") % 97 === 0
    val exact = ops.Curate.decontaminate(docs, "doc_id", "text", isEval)
    val bloomed = ops.Curate.decontaminateBloom(docs, "doc_id", "text",
      isEval)
    assert(exact.exceptAll(bloomed).count() === 0)
    assert(bloomed.exceptAll(exact).count() === 0)
    assert(bloomed.count() > 0)
  }

  test("the bloom plan probes scan-locally and shuffles the exact " +
      "join: bloom_might_contain_str below the exchange, no broadcast " +
      "of the eval shingle table") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val plan = ops.Curate.decontaminateBloom(docs, "doc_id", "text",
        col("doc_id") % 97 === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_str"),
      s"bloom probe missing from plan:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the exact verify join to shuffle, plan:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"eval shingles must not broadcast in the scale shape, plan:\n$plan")
  }

  test("BloomMightContainStr has no false negatives and is " +
      "null-intolerant (NULL shingle is never 'maybe present')") {
    import org.apache.spark.sql.graftbridge.Bridge
    val keys = (1 to 500).map(i => s"shingle $i of the probe set")
    val bf = org.apache.spark.util.sketch.BloomFilter.create(500, 0.01)
    keys.foreach(bf.putString)
    val probe = (keys ++ (1 to 500).map(i => s"absent $i") :+ null)
      .toDF("s")
      .select(col("s"), Bridge.column(graft.functions.BloomMightContainStr(
        Bridge.expression(col("s")), bf)).as("hit"))
      .collect()
    probe.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "NULL in must be NULL out")
      else if (r.getString(0).startsWith("shingle"))
        assert(r.getBoolean(1), s"false negative on '${r.getString(0)}'")
    }
    // at fpp=1% on 500 absent keys, >=490 rejections with overwhelming
    // probability — the filter must actually prune, not pass-all
    val absentHits = probe.filter(r => !r.isNullAt(0) &&
      r.getString(0).startsWith("absent") && r.getBoolean(1)).length
    assert(absentHits < 50, s"$absentHits/500 absent keys passed")
  }

  test("qualityProbe on the fixture: 33 features, the trained MSE " +
      "beats the zero-weight start (= label share), and the result is " +
      "layout-invariant (BIGINT Gram sums are exact in any order)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val label = col("source").isin(
      "src0", "src1", "src2", "src3", "src4").cast("int")
    val got = ops.Curate.qualityProbe(docs, "doc_id", "text", label)
      .orderBy("bucket").collect()
    assert(got.length === 33)
    val mse = got.head.getDouble(2)
    // w = 0 scores every doc 0, so the descent starts at
    // MSE = sum(y^2)/n = the positive share (5 of 20 sources = 0.25)
    assert(mse > 0.0 && mse < 0.25, s"mse $mse")
    val re = ops.Curate.qualityProbe(docs.repartition(7), "doc_id",
        "text", label)
      .orderBy("bucket").collect()
    assert(got.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .toSeq ===
      re.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq)
  }

  test("qualityProbe descends: on a planted exactly-linear corpus the " +
      "MSE is monotone nonincreasing in iters and the learnable " +
      "token's weight comes out positive") {
    // docs with the marker token are exactly the y=1 docs — a linear
    // model (w_marker=1, intercept=0) fits with zero error
    val docs = (0 until 200).map { i =>
      val marked = i % 3 == 0
      (i.toLong, if (marked) "quality filler words here"
      else "filler words here", if (marked) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val mses = Seq(1, 2, 4, 8, 16).map { it =>
      val rows = ops.Curate.qualityProbe(docs, "doc_id", "text",
        col("y"), iters = it).collect()
      it -> rows.head.getDouble(2)
    }
    mses.sliding(2).foreach { case Seq((i1, m1), (i2, m2)) =>
      assert(m2 <= m1 + 1e-12, s"mse rose from $m1 (iters=$i1) " +
        s"to $m2 (iters=$i2)")
    }
    assert(mses.last._2 < 0.05, s"final mse ${mses.last._2}")
    // the marker token's bucket must carry positive weight
    val bucket = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("quality".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) % 32).toInt
    }
    val w8 = ops.Curate.qualityProbe(docs, "doc_id", "text", col("y"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w8(bucket) > 0.0, s"marker bucket $bucket weight ${w8(bucket)}")
  }

  test("repeatedSubstringShare on a planted corpus: cross-doc and " +
      "within-doc repeats are position-exact, overlapping repeated " +
      "grams union (not sum), and sub-minLen docs report zero") {
    // globally-unique alphabetic fillers (digits would be stripped by
    // cleanText); the planted run R is 12 tokens, the phrase P is 8
    def tok(prefix: String, i: Int): String =
      s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    var n = 0
    def fill(k: Int): String = {
      val s = (n until n + k).map(tok("f", _)).mkString(" ")
      n += k; s
    }
    val run = (0 until 12).map(tok("r", _)).mkString(" ")
    val phrase = (0 until 8).map(tok("p", _)).mkString(" ")
    val docs = Seq(
      (0L, fill(20)),                            // nothing repeats
      (1L, s"${fill(4)} $run ${fill(4)}"),       // R at offset 4
      (2L, s"$run ${fill(8)}"),                  // R at offset 0
      (3L, s"$phrase ${fill(4)} $phrase"),       // internal repeat
      (4L, fill(5))                              // shorter than minLen
    ).toDF("doc_id", "text")
    val got = ops.Dedup.repeatedSubstringShare(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // R contributes 5 overlapping repeated 8-gram starts per side —
    // union 12 tokens, NOT 5*8; P repeats at two positions, 8 each
    assert(got.toSeq === Seq(
      (0L, 20L, 0L, 0.0),
      (1L, 20L, 12L, 0.6),
      (2L, 20L, 12L, 0.6),
      (3L, 20L, 16L, 0.8),
      (4L, 5L, 0L, 0.0)))
    // the q126 contrast: a one-token prefix shift does not lose the
    // repeat (fixed 16-token blocks would share nothing)
    val shifted = Seq(
      (0L, s"${fill(1)} $run"), (1L, s"${fill(3)} $run")
    ).toDF("doc_id", "text")
    val s2 = ops.Dedup.repeatedSubstringShare(shifted, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(s2.forall(_.getLong(2) == 12L),
      s"shifted repeats must still be found: ${s2.mkString(",")}")
  }

  test("hybridRrf equals a driver-side fusion of its two retrievers' " +
      "own outputs (ranks in, 1/(60+r) sums out, ties by id)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    val got = ops.Sim.hybridRrf(docs, emb).orderBy("q_id", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getInt(5)))
    // independent fusion: run the retrievers separately, fuse in Scala
    val lex = ops.Text.bm25RetrieveDf(docs, "doc_id", "text",
        docs.where(col("doc_id") < 10).select(
          col("doc_id").as("query_id"), col("text").as("query_text")),
        20, excludeSelf = true)
      .select("query_id", "id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val den = ops.Sim.topK(emb.where(col("vec_id") < 10), emb, 20)
      .select("q_id", "c_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expect = (lex.keySet ++ den.keySet).toSeq.map { key =>
      val l = lex.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      val d = den.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (key._1, key._2, l + d)
    }.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((_, c, s), i) => (q, c, s, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq === expect)
    assert(got.length === 50) // 10 queries x fused top-5
  }

  test("ivfFrozenAppend: base postings are bucketed exactly as a " +
      "base-only kmeans (the quantizer is frozen — delta presence " +
      "moves nothing), counts conserve, and sims stay in cosine range") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val isDelta = col("vec_id") % 5 === 0
    val got = ops.Sim.ivfFrozenAppend(emb, isDelta).orderBy("cell")
      .collect()
    assert(got.length === 8)
    val baseOnly = ops.Sim.kmeansCells(emb.where(!isDelta), 8)
      .groupBy("cell").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getLong(1) === baseOnly.getOrElse(r.getInt(0), 0L),
        s"cell ${r.getInt(0)} base count moved")
    }
    val nBase = emb.where(!isDelta).count()
    val nDelta = emb.where(isDelta).count()
    assert(got.map(_.getLong(1)).sum === nBase)
    assert(got.map(_.getLong(2)).sum === nDelta)
    got.foreach { r =>
      Seq((r.getLong(3), r.getLong(1)), (r.getLong(4), r.getLong(2)))
        .foreach { case (s, n) =>
          assert(math.abs(s) <= n * 1000000000L,
            s"cell ${r.getInt(0)} sim sum $s out of range for $n rows")
        }
    }
  }

  test("qualityGate separates the sources the probe was trained on " +
      "in aggregate: trusted docs score higher on average than " +
      "untrusted, counts conserve, and the integer scores are " +
      "layout-invariant") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val trusted = Set("src0", "src1", "src2", "src3", "src4")
    val label = col("source").isin(trusted.toSeq.map(x => x: Any): _*)
      .cast("int")
    val got = ops.Curate.qualityGate(docs, "doc_id", "text", label,
        "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length === 20)
    assert(got.map(_._2).sum === docs.count())
    // aggregate separation: an 8-step fit on 32 hashed buckets is a
    // weak learner (per-source orderings can overlap), but the
    // direction of the fit must show — the pooled trusted mean above
    // the pooled untrusted mean
    def pooled(keys: Set[String]): Double = {
      val rows = got.filter(t => keys.contains(t._1))
      rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    }
    val tMean = pooled(trusted)
    val uMean = pooled(got.map(_._1).toSet -- trusted)
    assert(tMean > uMean,
      s"fit does not separate in aggregate: trusted $tMean <= " +
        s"untrusted $uMean")
    val re = ops.Curate.qualityGate(docs.repartition(7), "doc_id",
        "text", label, "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === re.toSeq)
  }

  test("readEvolved merges parquet written across schema versions: " +
      "files predating a column surface it as NULL, nothing is lost, " +
      "and new-file values come through intact") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val path = java.nio.file.Files
      .createTempDirectory("graft-evolve-spec").toString
    orders.where(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(path)
    orders.where(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("append").parquet(path)
    val merged = sources.Sources.readEvolved(spark, path)
    assert(merged.columns.toSet ===
      Set("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(merged.count() === orders.count())
    assert(merged.where(col("o_orderstatus").isNull).count() ===
      orders.where(col("o_orderkey") % 2 === 0).count())
    assert(merged.where(col("o_orderstatus").isNotNull).count() ===
      orders.where(col("o_orderkey") % 2 === 1).count())
  }

  test("mixtureTemperatures flattens a skewed corpus as alpha drops: " +
      "head share strictly decreases, tail share strictly increases, " +
      "shares sum to ~1e6, and alpha=1 matches raw proportions") {
    val docs = (Seq.fill(100)("big") ++ Seq.fill(10)("mid") ++
      Seq.fill(1)("tiny")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "src")
    val got = ops.Curate.mixtureTemperatures(docs, "src")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (_, b1, b2, b4) = got("big")
    val (_, t1, t2, t4) = got("tiny")
    assert(b1 > b2 && b2 > b4, s"head share must flatten: $b1 $b2 $b4")
    assert(t1 < t2 && t2 < t4, s"tail share must rise: $t1 $t2 $t4")
    // alpha=1 is the raw proportion (floored to e6)
    assert(b1 === 1000000L * 100 / 111)
    Seq(1, 2, 3).foreach { i =>
      val tot = got.values.map(v => Seq(v._2, v._3, v._4)(i - 1)).sum
      assert(tot > 999900L && tot <= 1000000L, s"col $i sums to $tot")
    }
  }

  test("decontaminateAuto routes by the eval-shingle preflight — " +
      "broadcast-exact below the threshold, bloom past it — and both " +
      "routes emit the family's identical result") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val isEval = col("doc_id") % 97 === 0
    def planOf(threshold: Long): (String, Array[(Long, Long)]) = {
      val df = ops.Curate.decontaminateAuto(docs, "doc_id", "text",
        isEval, maxBroadcastKeys = threshold)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1))
    }
    val (bigPlan, bigRows) = planOf(Long.MaxValue) // exact route
    val (tinyPlan, tinyRows) = planOf(1L)          // bloom route
    assert(!bigPlan.contains("bloom_might_contain_str"),
      "small eval set must take the exact broadcast route")
    assert(tinyPlan.contains("bloom_might_contain_str"),
      "oversized eval set must take the bloom route")
    assert(bigRows.toSeq === tinyRows.toSeq,
      "the two routes must be one operator")
  }
}
