package graft

/** Dev utility: run named queries (or all) against an sf dir, printing
  * rowcount or the full exception (Verify compresses errors to one line).
  *
  *   sbt "runMain graft.Scratch /root/testdata/sf0.001 q01_pricing_summary ..."
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, dir).count()
        println(f"== $n: $rows rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"== $n FAILED: $e")
        e.getStackTrace.take(5).foreach(f => println(s"     at $f"))
      }
    }
    spark.stop()
  }
}
