package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Dev probe: bisect the q207 cost at sf0.1. */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: $n rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("count")(docs.count())
    val toks = docs.select(col("doc_id"),
      graft.ops.Text.cleanTokens(col("text")).as("t"))
    time("tokens")(toks.select(sum(size(col("t")))).count())
    val sh = docs.select(col("doc_id"),
      graft.ops.Dedup.shingles(graft.ops.Text.cleanTokens(col("text")), 3)
        .as("shs"))
    time("shingles")(sh.select(sum(size(col("shs")))).count())
    val h = docs.select(col("doc_id"),
      Bridge.column(graft.functions.Md5Hex8ArrExpr(Bridge.expression(
        graft.ops.Dedup.shingles(
          graft.ops.Text.cleanTokens(col("text")), 3)))).as("h"))
    time("hash")(h.select(sum(size(col("h")))).count())
    val sel = h.where(size(col("h")) >= 4)
      .withColumn("sp", Bridge.column(graft.functions.WinnowSelect(
        Bridge.expression(col("h")), 4)))
    time("select")(sel.select(sum(size(col("sp")))).count())
    sel.select(sum(size(col("sp")))).explain("formatted")
    val hck = h.localCheckpoint()
    val sel2 = hck.where(size(col("h")) >= 4)
      .withColumn("sp", Bridge.column(graft.functions.WinnowSelect(
        Bridge.expression(col("h")), 4)))
    time("select_ck")(sel2.select(sum(size(col("sp")))).count())
    time("fingerprints")(
      graft.ops.Dedup.winnowingFingerprints(docs, "doc_id", "text")
        .count())
    time("fingerprints2")(
      graft.ops.Dedup.winnowingFingerprints(docs, "doc_id", "text")
        .count())
    graft.ops.Dedup.winnowingFingerprints(docs, "doc_id", "text")
      .explain("formatted")
    spark.stop()
  }
}
