package graft

import org.apache.spark.sql.functions._

/** Dev probe: q267 JL recall sweep phase costs at sf0.1. */
object Probe267 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (rep <- 0 to 1) {
      println(s"--- rep $rep")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val emb = Tables.load(spark, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      val dimRow = time("dim guard heads")(
        { emb.agg(max(size(col("embedding"))), min(size(col("embedding")))).head()
          queries.agg(max(size(col("embedding"))), min(size(col("embedding")))).head() })
      val signs = time("jlSigns build")(graft.ops.Sim.jlSigns(64, 64))
      val truth = time("truth topK ckpt")(
        graft.ops.Sim.topK(queries, emb, 5).select(col("q_id"), col("c_id"))
          .withColumn("__hit", lit(true)).localCheckpoint())
      val qp = time("qp ckpt")(queries.select(col("vec_id"),
        graft.ops.Sim.jlProject(col("embedding"), signs).as("__jl")).localCheckpoint())
      val cp = time("cp ckpt")(emb.select(col("vec_id"),
        graft.ops.Sim.jlProject(col("embedding"), signs).as("__jl")).localCheckpoint())
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val res = Seq(8,16,32,64).map { od =>
        val qd = qp.select(col("vec_id"), slice(col("__jl"), 1, od).as("__jl"))
        val cd = cp.select(col("vec_id"), slice(col("__jl"), 1, od).as("__jl"))
        graft.ops.Sim.topK(qd, cd, 5, "vec_id", "__jl")
          .select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L)).as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(od).as("out_dim"), col("n_truth"), col("n_approx"), col("n_hits"))
      }.reduce(_ unionByName _)
      time("sweep action (4 branches)")(
        res.write.format("noop").mode("overwrite").save())
      time("q267 as registered")(
        SparkEntry.queries("q267_jl_recall")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
