package graft

/** Dev utility: time the distributed per-merge-job trainer vs the
  * in-memory dictionary trainer at growing merge counts — the evidence
  * behind the 32k-merge ceiling claim in SCALE.md.
  *
  *   sbt "Test/runMain graft.BpeProbe /root/testdata/sf0.1"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (m <- Seq(12, 48)) {
      time(s"distributed train merges=$m")(
        graft.ops.Bpe.train(docs, "text", m).count())
    }
    for (m <- Seq(12, 48, 200, 1000, 5000)) {
      time(s"in-memory trainLocal merges=$m")(
        graft.ops.Bpe.trainLocal(docs, "text", m).count())
    }
    spark.stop()
  }
}
