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

  test("audited parquet write observes row and null counts in-pass") {
    val df = Seq((1L, "en"), (2L, null.asInstanceOf[String]),
      (3L, "fr"), (4L, null.asInstanceOf[String]))
      .toDF("id", "lang")
    val out = tmp() + "/audited"
    val m = Sources.writeParquetAudited(df, out, Seq("lang"))
    assert(m("rows_written") === 4L)
    assert(m("nulls_lang") === 2L)
    // the metrics describe exactly what was committed
    assert(spark.read.parquet(out).count() === 4L)
  }

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

  test("compact rewrites a many-file dir into few files, preserves rows, " +
    "and range-clusters the sort column") {
    val in = tmp() + "/many"
    val out = tmp() + "/compacted"
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("v", col("id") % 97)
    df.repartition(40).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val (before, after) = Sources.compact(spark, in, out, schema,
      targetFileBytes = 1L << 20, sortCols = Seq("id"))
    assert(before === 40)
    assert(after < before, s"expected fewer files, got $after")
    val back = spark.read.schema(schema).parquet(out)
    assert(back.count() === 2000)
    assert(back.select("id").distinct().count() === 2000)
    // range clustering: with one output file per range, per-file min/max
    // of id must not overlap — read each file separately and check
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val ranges = files.map { f =>
      val r = spark.read.schema(schema).parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2,
        s"file ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
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

  test("writeShards emits one file per shard whose row sequence is " +
      "identical across two independent writes (deterministic layout)") {
    import graft.ops.Curate
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val shards = 8
    // per-file row sequence, keyed by the shard directory name. Each
    // shard dir must hold exactly ONE parquet file; tiny fixture files
    // are single-split reads, so collect() preserves file row order —
    // which is the byte order a trainer would stream.
    def layout(path: String): Map[String, Seq[Long]] = {
      val root = new java.io.File(path)
      val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
      shardDirs.map { d =>
        val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(parts.length === 1,
          s"${d.getName}: expected 1 parquet file, got ${parts.length}")
        d.getName ->
          spark.read.parquet(parts.head.getAbsolutePath)
            .select("doc_id").as[Long].collect().toSeq
      }.toMap
    }
    val shuffled = Curate.deterministicShuffle(docs, "doc_id", shards)
    val d1 = tmp() + "/shards1"
    val d2 = tmp() + "/shards2"
    Sources.writeShards(shuffled, shards, d1)
    Sources.writeShards(shuffled, shards, d2)
    val (l1, l2) = (layout(d1), layout(d2))
    assert(l1.keySet === (0 until shards).map(i => s"shard=$i").toSet)
    assert(l1 === l2, "shard row sequences differ across writes")
    // and the in-file order IS the declared training order: pos-ascending
    // per shard, pos = rank by the md5 shuffle key
    val expected = shuffled.orderBy("shard", "pos")
      .select("shard", "doc_id").as[(Int, Long)].collect()
      .groupBy(_._1).map { case (s, a) => s"shard=$s" -> a.map(_._2).toSeq }
    assert(l1 === expected, "file order != pos order")
  }
}
