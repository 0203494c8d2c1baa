package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.Curate

/** Property checks for the late-round-11 operators over GENERATED
  * inputs (scalacheck Gen sampled directly — scalatestplus is not on
  * the offline classpath; the BpeMmrPropSpec discipline). The oracle
  * gates prove one fixture; these prove the algebraic claims on
  * arbitrary shapes.
  *
  * Generated corpora are pre-cleaned ([a-z] words, single spaces) so
  * cleanTokens reduces to whitespace split.
  */
class Round11PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n,
      Gen.choose('a', 'z')).map(_.mkString))

  private val doc: Gen[String] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("CDC chunks PARTITION every doc's token stream: per-doc chunk " +
      "lengths sum to the token count, on generated corpora") {
    val corpora = samples(Gen.listOfN(12, doc), 6)
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("grp", lit("g"))
      val got = Curate.cdcChunkStats(df, "doc_id", "text", "grp")
        .select("n_chunks", "n_distinct_chunks").collect()
      val nToks = docs.map(_.split("\\s+").count(_.nonEmpty).toLong).sum
      if (nToks == 0) assert(got.isEmpty, s"corpus $ci: chunks from nothing")
      else {
        // total token mass re-derived from the stats frame:
        // mean_chunk_tokens * n_chunks is floored, so recompute the
        // invariant from a chunk-level run instead
        val chunkToks = Curate.cdcChunkStats(df, "doc_id", "text", "grp")
          .select((col("mean_chunk_tokens") * col("n_chunks")))
          .collect().map(_.getDouble(0)).sum
        // 4dp floor on the mean bounds the reconstruction error by
        // n_chunks * 1e-4
        val n = got.map(_.getLong(0)).sum
        assert(math.abs(chunkToks - nToks) <= n * 1e-4 + 1e-9,
          s"corpus $ci: chunk lengths ($chunkToks) != token count $nToks")
      }
    }
  }

  test("CDC boundaries are stable outside an edit: a prefix insertion " +
      "preserves ALL chunk hashes after the first boundary, on " +
      "generated docs") {
    // single doc per run: compare the chunk multiset of doc vs
    // 'zzz '+doc — everything after the edit window must survive.
    val longDoc: Gen[String] = Gen.choose(20, 60)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = samples(longDoc, 8)
    docs.zipWithIndex.foreach { case (d, i) =>
      def chunks(text: String): Seq[String] = {
        // re-derive the chunk spans with an independent in-memory
        // implementation of the same md5/windowed-hash contract
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val tv = toks.map { t =>
          java.lang.Long.parseLong(
            org.apache.commons.codec.digest.DigestUtils.md5Hex(t)
              .take(8), 16)
        }
        val n = toks.length
        val bnd = (4 to n).filter { p =>
          (tv(p - 1) + tv(p - 2) * 64L + tv(p - 3) * 4096L +
            tv(p - 4) * 262144L) % 16 == 0
        }
        val edges = (0 +: bnd) :+ n
        val e2 = if (bnd.nonEmpty && bnd.last == n) (0 +: bnd) else edges
        e2.sliding(2).filter(w => w(1) > w(0))
          .map(w => toks.slice(w(0), w(1)).mkString(" ")).toSeq
      }
      val a = chunks(d)
      val b = chunks("zzz " + d)
      // every chunk of the original except possibly its FIRST must
      // appear verbatim in the edited doc's chunk list
      val missing = a.drop(1).diff(b)
      assert(missing.isEmpty,
        s"doc $i: ${missing.size} post-edit chunks lost: " +
          missing.take(2).mkString(" | "))
    }
  }

  test("A-Res selection is MONOTONE in weight: raising one selected " +
      "row's weight never evicts it, on generated weight tables") {
    val rows = samples(Gen.listOfN(40,
      Gen.choose(1L, 1000L)), 6)
    rows.zipWithIndex.foreach { case (ws, ci) =>
      val df = ws.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "wt")
        .withColumn("grp", lit("g"))
      val picked = Curate.weightedSample(df, "doc_id", "wt", 10)
        .select("doc_id").as[Long].collect().toSet
      // double every picked row's weight: ln(u)/w rises toward 0 with
      // w (ln(u) < 0), so each picked key only improves and the pick
      // set must be unchanged
      val boosted = df.withColumn("wt",
        when(col("doc_id").isin(picked.toSeq: _*), col("wt") * 2)
          .otherwise(col("wt")))
      val picked2 = Curate.weightedSample(boosted, "doc_id", "wt", 10)
        .select("doc_id").as[Long].collect().toSet
      assert(picked === picked2,
        s"table $ci: boosting selected weights changed the sample")
    }
  }
}
