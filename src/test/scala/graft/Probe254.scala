package graft

import org.apache.spark.sql.functions._
import graft.ops.Sim

/** Dev probe: decompose q254's per-execution cost — brute L2 truth,
  * PQ encode scan, probe ranking, full sweep. */
object Probe254 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    println(s"embeddings rows: ${emb.count()}")
    val q = emb.where(col("vec_id") < 10)
    val books = Sim.pqCodebooksCached(emb, 4, 8, 2, dir)
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s ${ts.min}%6.2f s (min of 2)")
    }
    time("topKL2 truth") {
      Sim.topKL2(q, emb, 5).write.format("noop").mode("overwrite").save()
    }
    time("pqEncode scan") {
      Sim.pqEncode(emb, books, "vec_id", "embedding",
          keep = Seq("label"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pqTopK flat ADC") {
      Sim.pqTopK(q, emb, books, 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full ivfAdcRecallSweep") {
      Sim.ivfAdcRecallSweep(q, emb, books, 5, "label", maxProbes = 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
