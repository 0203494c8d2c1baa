package graft

import org.apache.spark.sql.grafttest.PlanRewrite2

/** Dev probe (round 18): for queries whose presentation sort was
  * converted to `presentBy` (repartition(1) + local sort) in r17,
  * time three root shapes under the bench methodology (unpersist
  * sweep + System.gc + noop write, 1 untimed warm-up, median of 3):
  *
  *   orig  — as registered (repartition(1) + local sort);
  *   range — plain global orderBy (pre-r17: sampling pass recomputes
  *           the child);
  *   ckpt  — lazy localCheckpoint + global orderBy (child computed
  *           once and persisted; the range sampling reads persisted
  *           blocks — the scale-safe shape for corpus-sized results).
  *
  *   sbt "Test/runMain graft.ProbePresent /root/testdata/sf0.1 qA,qB"
  */
object ProbePresent {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q115_pii_redact", "q50_text_stats", "q216_ewma",
        "q08_clean_text", "q94_gap_fill", "q263_merge_scd1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Tables.schemas.keys.foreach(t => Tables.load(spark, dir, t).count())

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def reps(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val ts = (0 to 3).map { _ =>
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
      val tRange = PlanRewrite2.presentToRange(fn(spark, dir))
        .map(_ => reps(() => PlanRewrite2.presentToRange(fn(spark, dir)).get))
      val tCkpt = PlanRewrite2.presentToCkptRange(fn(spark, dir))
        .map(_ =>
          reps(() => PlanRewrite2.presentToCkptRange(fn(spark, dir)).get))
      println(f"== $n%-28s orig $tOrig%6.3f" +
        f"  range ${tRange.map(t => f"$t%6.3f").getOrElse("   n/a")}" +
        f"  ckpt ${tCkpt.map(t => f"$t%6.3f").getOrElse("   n/a")}")
    }
    spark.stop()
  }
}
