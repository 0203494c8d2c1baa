package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.{Curate, Num, Sim}

/** Property checks for the round-13 operators over GENERATED inputs
  * (the Round11/12PropSpec discipline): the fixture oracles prove one
  * corpus; these prove the algebraic claims on arbitrary shapes —
  * semantic decontamination against a driver-side within-cell brute,
  * the IVF-ADC retriever's probe-policy boundary against the
  * independent flat-ADC engine, and fused recall against driver-set
  * arithmetic over the two fusion engines' own outputs.
  */
class Round13PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vec8: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)

  private def embDf(vs: Seq[Seq[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))

  // driver-side double dot in index order — DotProductF32's exact
  // summation sequence
  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("decontaminateSemantic equals the driver-side within-cell brute " +
      "on generated embeddings — every same-cell train x eval pair, " +
      "4dp-floored cosine, threshold, ranked cut with exact tie-breaks") {
    val table: Gen[List[Seq[Float]]] = Gen.listOfN(60, vec8)
    samples(table, 5).zipWithIndex.foreach { case (vs, ci) =>
      val df = embDf(vs)
      val cells = Sim.kmeansCells(df, k = 3, iters = 2).localCheckpoint()
      val assigned = cells.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq, r.getInt(2)))
      val threshold = 0.1 + 0.1 * (ci % 3)
      val topK = 12
      val expect = (for {
        (tid, tv, tc) <- assigned if tid % 7 != 0
        (eid, ev, ec) <- assigned if eid % 7 == 0 && ec == tc
      } yield {
        val sim = Num.floorDouble(
          dot(tv, ev) / (math.sqrt(dot(tv, tv)) * math.sqrt(dot(ev, ev))),
          4)
        (tid, eid, sim)
      }).filter(_._3 >= threshold)
        .sortBy(t => (-t._3, t._1, t._2)).take(topK)
      val got = Curate.decontaminateSemantic(cells,
          isEval = col("vec_id") % 7 === 0, threshold = threshold,
          topK = topK, probes = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === expect, s"corpus $ci diverged")
    }
  }

  test("topKIvfAdc probe-policy boundary on generated embeddings: " +
      "probing every cell reduces EXACTLY to the independent flat-ADC " +
      "engine (pqTopK), and probes=1 never leaves the query's own cell") {
    val table: Gen[List[Seq[Float]]] = Gen.listOfN(50, vec8)
    samples(table, 4).zipWithIndex.foreach { case (vs, ci) =>
      val df = embDf(vs)
      val cells = Sim.kmeansCells(df, k = 3, iters = 1).localCheckpoint()
      val books = Sim.pqCodebooks(df, m = 2, k = 4, iters = 1)
      val q = cells.where(col("vec_id") < 5)
      val all = Sim.topKIvfAdc(q, cells, books, k = 4,
          cellCol = "cell", probes = 3)
        .select("q_id", "c_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      val flat = Sim.pqTopK(q, cells, books, 4)
        .select("q_id", "c_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      assert(all.toSeq === flat.toSeq, s"corpus $ci: full-probe != flat")
      val cellOf = cells.collect()
        .map(r => r.getLong(0) -> r.getInt(2)).toMap
      Sim.topKIvfAdc(q, cells, books, k = 4, cellCol = "cell",
          probes = 1)
        .select("q_id", "c_id").collect().foreach { r =>
          assert(cellOf(r.getLong(0)) === cellOf(r.getLong(1)),
            s"corpus $ci: probes=1 left the own cell")
        }
    }
  }

  test("LexIndex.merge is exact index algebra on generated corpora: " +
      "merge(build(A), build(B)) equals build(A ∪ B) frame-for-frame " +
      "for every random disjoint split — the invariant that lets the " +
      "incremental refresh serve the whole-corpus oracle") {
    val smallVocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val doc: Gen[String] = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(smallVocab)).map(_.mkString(" ")))
    samples(Gen.listOfN(25, doc), 4).zipWithIndex.foreach {
      case (docs, ci) =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val split = col("doc_id") % (2 + ci) === 0
        val whole = graft.ops.LexIndex.buildFrames(df)
        val merged = graft.ops.LexIndex.merge(
          graft.ops.LexIndex.buildFrames(df.where(!split)),
          graft.ops.LexIndex.buildFrames(df.where(split)))
        def same(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame, what: String): Unit = {
          assert(a.exceptAll(b).count() === 0, s"corpus $ci $what a-b")
          assert(b.exceptAll(a).count() === 0, s"corpus $ci $what b-a")
        }
        same(whole._1, merged._1, "tf")
        same(whole._2, merged._2, "dl")
        same(whole._3, merged._3, "df")
        same(whole._4, merged._4, "stats")
    }
  }

  test("hybridFusedRecall equals driver-set arithmetic over the two " +
      "fusion engines' own outputs on generated corpora — the stats " +
      "row cannot drift from the lists it claims to compare") {
    val smallVocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val doc: Gen[String] = Gen.choose(3, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(smallVocab)).map(_.mkString(" ")))
    val table: Gen[List[(String, Seq[Float])]] =
      Gen.listOfN(30, Gen.zip(doc, vec8))
    samples(table, 3).zipWithIndex.foreach { case (rows, ci) =>
      val docs = rows.zipWithIndex
        .map { case ((t, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
      val emb = embDf(rows.map(_._2))
      val cells = Sim.kmeansCells(emb, k = 3, iters = 1).localCheckpoint()
      val books = Sim.pqCodebooks(emb, m = 2, k = 4, iters = 1)
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairs(Sim.hybridRrf(docs, emb, nQueries = 5,
        listK = 8, k = 4))
      val adc = pairs(Sim.hybridRrfIvfAdc(docs, cells, books,
        nQueries = 5, listK = 8, k = 4, probes = 2))
      val row = Sim.hybridFusedRecall(docs, cells, books, nQueries = 5,
          listK = 8, k = 4, probes = 2)
        .collect().head
      assert(row.getLong(0) === truth.size.toLong, s"corpus $ci n_truth")
      assert(row.getLong(1) === adc.size.toLong, s"corpus $ci n_approx")
      assert(row.getLong(2) === adc.intersect(truth).size.toLong,
        s"corpus $ci n_hits")
      val recall =
        if (truth.isEmpty) 1.0
        else Num.floorDouble(
          adc.intersect(truth).size.toDouble / truth.size, 4)
      assert(row.getDouble(3) === recall, s"corpus $ci recall")
    }
  }
}
