package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Dedup, Sim}

/** Property checks for the round-12 operators over GENERATED inputs
  * (scalacheck Gen sampled directly — the Round11PropSpec discipline).
  * The oracle gates prove one fixture; these prove the algebraic
  * claims on arbitrary shapes — in particular q278's suffix-array-free
  * reduction against a TRUE all-lengths brute reference, which the
  * reduction-shaped oracle cannot provide.
  *
  * Generated corpora are pre-cleaned ([a-z] words, single spaces) so
  * cleanTokens reduces to whitespace split; vocabularies are kept
  * tiny so repeats actually occur.
  */
class Round12PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // 6-word vocabulary → dense collisions and genuine long repeats
  private val smallVocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
  private val denseDoc: Gen[String] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(smallVocab)).map(_.mkString(" ")))

  test("repeatedSubstringShare matches a TRUE all-lengths brute " +
      "reference on generated dense corpora: coverage by ANY repeated " +
      "substring of length >= L equals the repeated-L-gram window " +
      "union (the suffix-array-free reduction, proven, not assumed)") {
    val L = 3
    val corpora = samples(Gen.listOfN(8, denseDoc), 8)
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val toks = docs.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      // brute: count EVERY substring occurrence of every length >= L,
      // then mark all positions of every substring seen >= 2 times
      val occ = scala.collection.mutable.Map
        .empty[Seq[String], List[(Int, Int, Int)]] // (doc, start, end)
      toks.zipWithIndex.foreach { case (t, d) =>
        for (i <- t.indices; j <- (i + L - 1) until t.length)
          occ.updateWith(t.slice(i, j + 1)) {
            prev => Some((d, i, j) :: prev.getOrElse(Nil))
          }
      }
      val covered = toks.map(t => Array.fill(t.length)(false))
      occ.values.filter(_.lengthCompare(2) >= 0).foreach(_.foreach {
        case (d, i, j) => (i to j).foreach(p => covered(d)(p) = true)
      })
      val expect = toks.zipWithIndex.map { case (t, d) =>
        (d.toLong, t.length.toLong, covered(d).count(identity).toLong)
      }
      val got = Dedup.repeatedSubstringShare(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), "doc_id", "text", minLen = L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === expect,
        s"corpus $ci: reduction diverges from the all-lengths brute")
    }
  }

  test("decontaminateBloom stays bit-identical to the exact " +
      "decontaminate on generated corpora (superset filter + exact " +
      "verify = exact, regardless of what the filter passes)") {
    val corpora = samples(Gen.listOfN(10, denseDoc), 6)
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val isEval = col("doc_id") % 3 === 0
      val exact = Curate.decontaminate(df, "doc_id", "text", isEval)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val bloomed = Curate
        .decontaminateBloom(df, "doc_id", "text", isEval)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(bloomed.toSeq === exact.toSeq, s"corpus $ci diverged")
    }
  }

  test("qualityProbe's fixed-step descent is monotone nonincreasing " +
      "on generated corpora with arbitrary 0/1 labels — the " +
      "eta = 1/trace(G/n) stability guarantee, not a fixture accident") {
    val labeled: Gen[List[(String, Int)]] =
      Gen.listOfN(24, Gen.zip(denseDoc, Gen.oneOf(0, 1)))
    samples(labeled, 5).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.zipWithIndex
        .map { case ((t, y), i) => (i.toLong, t, y) }
        .toDF("doc_id", "text", "y")
      val mses = Seq(1, 2, 4, 8).map { it =>
        Curate.qualityProbe(df, "doc_id", "text", col("y"), iters = it)
          .collect().head.getDouble(2)
      }
      val share = rows.count(_._2 == 1).toDouble / rows.length
      mses.zip(share +: mses).foreach { case (next, prev) =>
        assert(next <= prev + 1e-9,
          s"corpus $ci: loss rose $prev -> $next (share $share)")
      }
    }
  }

  test("hybridRrf equals the driver-side fusion of its two " +
      "retrievers on generated corpora with random aligned embeddings " +
      "— missing-from-one-list candidates, ties, and short lists " +
      "included") {
    val table: Gen[List[(String, Seq[Float])]] = Gen.listOfN(30,
      Gen.zip(denseDoc, Gen.listOfN(6, Gen.choose(-1.0f, 1.0f))
        .map(_.toSeq)))
    samples(table, 4).zipWithIndex.foreach { case (rows, ci) =>
      val docs = rows.zipWithIndex
        .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
      val emb = rows.zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
      val got = Sim.hybridRrf(docs, emb, nQueries = 5, listK = 8, k = 4)
        .orderBy("q_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4),
          r.getInt(5)))
      val lex = graft.ops.Text.bm25RetrieveDf(docs, "doc_id", "text",
          docs.where(col("doc_id") < 5).select(
            col("doc_id").as("query_id"), col("text").as("query_text")),
          8, excludeSelf = true)
        .select("query_id", "id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val den = Sim.topK(emb.where(col("vec_id") < 5), emb, 8)
        .select("q_id", "c_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val expect = (lex.keySet ++ den.keySet).toSeq.map { key =>
        val l = lex.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        val d = den.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (key._1, key._2, l + d)
      }.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
        cands.sortBy(t => (-t._3, t._2)).take(4).zipWithIndex
          .map { case ((_, c, s), i) => (q, c, s, i + 1) }
      }.sortBy(t => (t._1, t._4))
      assert(got.toSeq === expect, s"corpus $ci fusion diverged")
    }
  }

  test("ivfFrozenAppend never moves base postings on generated " +
      "embeddings: per-cell base counts equal a base-only kmeans for " +
      "random vectors and random delta subsets") {
    val vec: Gen[Seq[Float]] =
      Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
    val table: Gen[List[Seq[Float]]] = Gen.listOfN(60, vec)
    samples(table, 4).zipWithIndex.foreach { case (vs, ci) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
      val isDelta = col("vec_id") % 4 === 1
      val got = Sim.ivfFrozenAppend(df, isDelta, k = 4)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val baseOnly = Sim.kmeansCells(df.where(!isDelta), k = 4)
        .groupBy("cell").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      (0 until 4).foreach { cell =>
        assert(got.getOrElse(cell, 0L) === baseOnly.getOrElse(cell, 0L),
          s"table $ci: cell $cell base postings moved")
      }
    }
  }
}
