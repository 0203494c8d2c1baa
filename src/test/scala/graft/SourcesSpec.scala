package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Source/sink round trips (SURVEY.md §2.1): CSV (reference backup shape),
  * JSON lines, partitioned parquet with partition pruning.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft-src").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private val postsSchema = StructType(Seq(
    StructField("id", StringType), StructField("content", StringType),
    StructField("subreddit", StringType)))

  test("CSV sink+source round trip preserves rows; empty write skipped") {
    val dir = tmp() + "/posts_csv"
    val df = Seq(("a1", "hello, world", "srA"), ("b2", "héllo ünïcode", "srB"))
      .toDF("id", "content", "subreddit")
    assert(Sources.writeCsv(df, dir))
    val back = Sources.readCsv(spark, dir, postsSchema)
      .as[(String, String, String)].collect().toSet
    assert(back === Set(("a1", "hello, world", "srA"),
      ("b2", "héllo ünïcode", "srB")))
    // reference guard (etl_pipeline.py:67): empty frame writes nothing
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], postsSchema)
    assert(!Sources.writeCsv(empty, tmp() + "/empty_csv"))
  }

  test("JSON-lines source reads declared schema") {
    val dir = tmp()
    Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
      """{"id":"x","content":"c1","subreddit":"s1"}
        |{"id":"y","content":"c2","subreddit":"s2"}""".stripMargin)
    val got = Sources.readJsonLines(spark, dir, postsSchema)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(("x", "c1", "s1"), ("y", "c2", "s2")))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp() + "/part"
    val df = Seq((1L, "en", "a"), (2L, "es", "b"), (3L, "en", "c"))
      .toDF("id", "lang", "v")
    Sources.writePartitioned(df, dir, Seq("lang"))
    val back = spark.read.parquet(dir).where(col("lang") === "en")
    assert(back.select("id").as[Long].collect().toSet === Set(1L, 3L))
    // pruning is visible in the plan: only the lang=en directory is listed
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in scan: $scan")
  }
}
