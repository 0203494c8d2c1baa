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
}
