package graft

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Dev utility: time the PQ family's stages separately to find where the
  * fixed cost lives (training / encode / ADC / SDC / truth / probe).
  *
  *   sbt "Test/runMain graft.PqProbe /root/testdata/sf0.1"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") < 10)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val books = time("pqCodebooks m4k8i2")(
      Sim.pqCodebooks(emb, 4, 8, 2))
    time("pqCodebooks again (no memo)")(Sim.pqCodebooks(emb, 4, 8, 2))
    time("pqEncode.count")(Sim.pqEncode(emb, books).count())
    time("pqEncode.count again")(Sim.pqEncode(emb, books).count())
    time("topKL2 truth.count")(Sim.topKL2(q, emb, 5).count())
    time("pqTopK ADC.count")(Sim.pqTopK(q, emb, books, 5).count())
    time("pqTopK ADC.count again")(Sim.pqTopK(q, emb, books, 5).count())
    time("pqTopK SDC.count")(
      Sim.pqTopK(q, emb, books, 5, symmetric = true).count())
    time("ivfAdc sweep.count")(
      Sim.ivfAdcRecallSweep(q, emb, books, 5, "label", 3).count())
    val b8 = time("pqCodebooks m8k16i2")(Sim.pqCodebooks(emb, 8, 16, 2))
    time("pqTopK ADC m8k16.count")(Sim.pqTopK(q, emb, b8, 5).count())
    spark.stop()
  }
}
