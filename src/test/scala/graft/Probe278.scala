package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Num, Text}

/** Dev probe: q278's shuffle-byte cut from hashing the L-gram key to
  * 16 bytes (md5/unhex) before the occurrence-count exchange. Runs the
  * SHIPPED hashed engine and the r12 string-keyed form side by side at
  * the given SF and prints total shuffle WRITE bytes + wall time for
  * each (bytes captured per task via a SparkListener, drained through
  * TestBridge so the read is deterministic).
  *
  * Usage: Test/runMain graft.Probe278 [sfDir]
  */
object Probe278 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    docs.count() // warm the scan

    // the r12 form, inlined: identical plan except the exchange key is
    // the raw L-gram string
    def stringKeyed(minLen: Int): DataFrame = {
      val toks = docs.select(col("doc_id").as("id"),
        Text.cleanTokens(col("text")).as("t"))
      val pg = toks.where(size(col("t")) >= minLen)
        .select(col("id"), size(col("t")).cast("long").as("n_toks"),
          posexplode(Dedup.shingles(col("t"), minLen)).as(Seq("p", "g")))
      val rep = pg.groupBy("g").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2).select("g")
      val w = Window.partitionBy("id").orderBy("p")
      val cov = pg.join(rep, Seq("g"))
        .withColumn("prev", lag(col("p"), 1).over(w))
        .withColumn("contrib",
          when(col("prev").isNull, lit(minLen.toLong))
            .otherwise(least(lit(minLen.toLong),
              (col("p") - col("prev")).cast("long"))))
        .groupBy("id")
        .agg(sum(col("contrib")).as("covered"))
      toks.select(col("id"), size(col("t")).cast("long").as("n_toks"))
        .join(cov, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("n_toks"),
          coalesce(col("covered"), lit(0L)).as("covered"),
          when(col("n_toks") === 0, lit(0.0))
            .otherwise(Num.floorAt(
              coalesce(col("covered"), lit(0L)).cast("double") /
                col("n_toks"), 6)).as("share"))
    }

    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          acc.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
        }
    }
    spark.sparkContext.addSparkListener(l)
    def measure(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 2).map { _ =>
        org.apache.spark.grafttest.TestBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
        acc.set(0L); recs.set(0L)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.grafttest.TestBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
        (dt, acc.get(), recs.get())
      }
      val best = ts.minBy(_._1)
      println(f"$name%-22s ${best._1}%6.2f s  " +
        f"shuffle ${best._2 / 1048576.0}%8.1f MiB  " +
        f"${best._3}%12d records")
    }
    measure("hashed-key (shipped)") {
      Dedup.repeatedSubstringShare(docs, "doc_id", "text", minLen = 8)
    }
    measure("string-key (r12)") { stringKeyed(8) }
    spark.stop()
  }
}
