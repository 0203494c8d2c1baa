package graft

import org.apache.spark.sql.functions._

/** Dev utility: measure the [[graft.streaming.StreamOps
  * .upsertIgnoreSinkPartitioned]] crossover — drive BOTH upsert sinks
  * over the WIDE-SPAN staging (360-day respread, month-batched arrival,
  * each batch touching ~1/12 of the target's date partitions) and print
  * each sink's wall plus an output-equality check. On the fixture's own
  * 30-day span every batch touches every day and the pruned sink can
  * only lose; this is the arrival shape where it wins (SCALE.md
  * round-12 records the measured row).
  *
  *   sbt "Test/runMain graft.UpsertCrossoverProbe /root/testdata/sf0.1 4"
  */
object UpsertCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rep = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stage = graft.streaming.StreamOps
      .stageEventsWideSpan(spark, dir, 360, 30, rep)
    println(f"stage (rep=$rep): ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def tmp(p: String): String = graft.TempDirs.register(
      java.nio.file.Files.createTempDirectory(p).toString)

    def run(partitioned: Boolean): (Double, org.apache.spark.sql.DataFrame) = {
      val ns = spark.newSession()
      ns.conf.set("spark.sql.shuffle.partitions", "2")
      val target = tmp("graft-xover-target") + "/t"
      val in = graft.streaming.StreamOps.eventsStream(ns, stage)
      val t1 = System.nanoTime()
      val q =
        if (partitioned)
          graft.streaming.StreamOps.upsertIgnoreSinkPartitioned(
            in, Seq("event_id"), "ts", target, tmp("graft-xover-ck"))
        else
          graft.streaming.StreamOps.upsertIgnoreSink(
            in, Seq("event_id"), target, tmp("graft-xover-ck"))
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t1) / 1e9
      val out =
        if (partitioned) ns.read.parquet(target).drop("__pday")
        else ns.read.parquet(target)
      (dt, out)
    }

    val (tFlat, outFlat) = run(partitioned = false)
    println(f"unpartitioned sink: $tFlat%.2f s, rows=${outFlat.count()}")
    val (tPart, outPart) = run(partitioned = true)
    println(f"partitioned sink:   $tPart%.2f s, rows=${outPart.count()}")
    val diff = outFlat.exceptAll(outPart).count() +
      outPart.exceptAll(outFlat).count()
    println(s"output symmetric difference: $diff rows (must be 0)")
    spark.stop()
  }
}
