package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Bpe, Sim}

/** Property parity for the round-10 iterative operators against naive
  * in-memory reference implementations over GENERATED inputs — the
  * oracle gate proves one fixture; this proves the algorithms on
  * arbitrary shapes (scalacheck Gen sampled directly — scalatestplus
  * is not on the offline classpath).
  *
  * Generated corpora are pre-cleaned ([a-z] words, single spaces) so
  * cleanTokens reduces to whitespace split and the references need no
  * regex re-implementation. Generated vectors have a strictly positive
  * first coordinate so no zero-norm NaN cosines arise.
  */
class BpeMmrPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- BPE reference -----------------------------------------------------

  private def refApplyMerge(s: Vector[String], a: String,
                            b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(words: Map[String, Long],
                     merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= merges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        out += ((i, a, b, c))
        vocab = vocab.map { case (s, f) => (refApplyMerge(s, a, b), f) }
        i += 1
      }
    }
    out.result()
  }

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString))

  private val corpusGen: Gen[List[String]] =
    Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, wordGen))

  test("Bpe.train == naive reference BPE on 8 generated corpora " +
      "(narrow alphabet forces merge ties and overlap runs)") {
    samples(corpusGen, 8).zipWithIndex.foreach { case (words, ci) =>
      val docs = words.grouped(5).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val freqs = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val want = refBpe(freqs, merges = 6)
      val got = Bpe.train(docs, "text", merges = 6)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(got === want, s"corpus #$ci: $words")
    }
  }

  // ---- MMR reference -----------------------------------------------------

  private def floor4(x: Double): Double = math.floor(x * 10000) / 10000

  private def refCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    floor4(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private def refMmr(vecs: Seq[(Long, Array[Float])], qIds: Seq[Long],
                     k: Int, lam: Double)
      : Seq[(Long, Int, Long, Double)] = {
    val byId = vecs.toMap
    val om = 1.0 - lam
    qIds.sorted.flatMap { q =>
      var picked = Vector.empty[Long]
      (1 to k).flatMap { rk =>
        val cands = vecs.map(_._1).filter(c => c != q && !picked.contains(c))
        if (cands.isEmpty) Nil
        else {
          def score(c: Long): Double = {
            val div =
              if (picked.isEmpty) 0.0
              else picked.map(s => refCos(byId(c), byId(s))).max
            lam * refCos(byId(q), byId(c)) - om * div
          }
          val w = cands.sortBy(c => (-score(c), c)).head
          val sw = score(w) // BEFORE adding w (its self-sim is not a penalty)
          picked = picked :+ w
          Seq((q, rk, w, floor4(sw)))
        }
      }
    }
  }

  private val vecGen: Gen[Array[Float]] = for {
    head <- Gen.oneOf(0.25f, 0.5f, 0.75f, 1.0f)
    rest <- Gen.listOfN(3, Gen.oneOf(-1.0f, -0.5f, -0.25f, 0.0f,
      0.25f, 0.5f, 1.0f))
  } yield (head :: rest).toArray

  private val setGen: Gen[List[Array[Float]]] =
    Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, vecGen))

  test("Sim.mmrTopK == naive greedy reference on 6 generated vector " +
      "sets x lambda in {0.3, 0.7} (grid values force score ties)") {
    samples(setGen, 6).zipWithIndex.foreach { case (vs, ci) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("vec_id", "embedding")
      val qIds = Seq(0L, 1L)
      for (lam <- Seq(0.3, 0.7)) {
        val want = refMmr(rows, qIds, k = 3, lam)
        val got = Sim.mmrTopK(df.where($"vec_id" < 2), df, k = 3,
            lambda = lam)
          .orderBy("q_id", "rk")
          .as[(Long, Int, Long, Double)].collect().toSeq
        assert(got === want, s"set #$ci lam=$lam: ${rows.map(_._2.toList)}")
      }
    }
  }
}
