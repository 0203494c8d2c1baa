package graft

/** Dev utility (round 18): like [[PlanExplain]] but dumps the plan
  * AFTER executing the query, so AQE is finalized
  * (`isFinalPlan=true`) and runtime artifacts — ReusedQueryStage /
  * AQEShuffleRead / final join strategies — are visible. This is the
  * evidence format the q137 shuffle-sharing claim needs (r17 verdict
  * #2: the pre-execution dump cannot show stage reuse).
  *
  *   sbt "Test/runMain graft.PlanExplainExec <sfdir> <outdir> <suffix> qA,qB"
  */
object PlanExplainExec {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, qcsv) = args.take(4)
    val names = qcsv.split(",").toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        // collect() executes the df's OWN QueryExecution so AQE
        // finalizes in place (a noop write would wrap the plan into a
        // fresh write-command QueryExecution and leave this one
        // isFinalPlan=false). Dev tool at small SF only.
        df.collect()
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
