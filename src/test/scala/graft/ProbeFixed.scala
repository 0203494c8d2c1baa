package graft

import org.apache.spark.sql.grafttest.PlanRewrite

/** Dev probe (round 17): per-query fixed-cost decomposition at bench
  * methodology — for each named query, the bench-identical timed rep
  * (unpersist sweep + System.gc + noop write, 1 untimed warm-up,
  * median of 3) under three shapes:
  *   orig    — as registered;
  *   nosort  — root global Sort removed (same row multiset);
  *   local1  — root Sort → repartition(1) + local sort (same order,
  *             no range-sampling job).
  * Plus `plan` — the cost of just building + planning the query
  * (executedPlan forced, no action), to split Catalyst time from
  * execution time.
  *
  *   sbt "Test/runMain graft.ProbeFixed /root/testdata/sf0.1 qA,qB"
  */
object ProbeFixed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q16_label_distribution", "q50_text_stats")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // bench-equivalent session warm-up
    Tables.schemas.keys.foreach(t => Tables.load(spark, dir, t).count())

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def reps(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (0 to 3).map { rep =>
        spark.sparkContext.getPersistentRDDs
          .values.foreach(_.unpersist(blocking = false))
        System.gc()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      med(ts.drop(1))
    }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val tOrig = reps(() => fn(spark, dir))
      val tPlan = {
        val ts = (0 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.executedPlan
          (System.nanoTime() - t0) / 1e9
        }
        med(ts.drop(1))
      }
      val tNoSort = PlanRewrite.dropRootSort(fn(spark, dir))
        .map(_ => reps(() => PlanRewrite.dropRootSort(fn(spark, dir)).get))
      val tLocal = PlanRewrite.rootSortToLocal(fn(spark, dir))
        .map(_ => reps(() => PlanRewrite.rootSortToLocal(fn(spark, dir)).get))
      println(f"== $n%-36s orig $tOrig%6.3f  plan $tPlan%6.3f" +
        f"  nosort ${tNoSort.map(t => f"$t%6.3f").getOrElse("   n/a")}" +
        f"  local1 ${tLocal.map(t => f"$t%6.3f").getOrElse("   n/a")}")
    }
    spark.stop()
  }
}
