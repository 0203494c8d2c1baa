package graft

/** Dev utility (round 17): dump `explain("formatted")` for named
  * queries to files — the plans/r17 before/after evidence.
  *
  *   sbt "Test/runMain graft.PlanExplain <sfdir> <outdir> <suffix> qA,qB"
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, qcsv) = args.take(4)
    val names = qcsv.split(",").toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"== wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"== $n FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
