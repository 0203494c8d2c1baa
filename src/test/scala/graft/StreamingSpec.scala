package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.EventsOps
import graft.streaming.StreamOps

/** Structured Streaming path: the streaming windowed aggregation over the
  * staged events fixture must agree with the batch tumbling form on the
  * same data (same engine semantics, incremental execution).
  */
class StreamingSpec extends SparkSpec {

  /** Write one far-future two-event sentinel file (both event types —
    * the query watermark is the min across operators) FLAT into the
    * stream dir, matching the staged fixture's ts unit: the fixture
    * has shipped as both TIMESTAMP(NANOS) (read as nanos BIGINT) and
    * TIMESTAMP(MICROS) (read as a real timestamp) — FIXTURES.md
    * round-7 note — and a sentinel in the wrong unit either fails the
    * schema or silently pins the watermark.
    */
  private def writeSentinel(stage: java.io.File, baseId: Long, i: Int,
                            farSec: Long): Unit = {
    import spark.implicits._
    val isNanos = spark.read.parquet(stage.getAbsolutePath)
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val tmpOut = Files.createTempDirectory("graft-sent").toFile
    val base = Seq(
      (baseId + 2 * i, farSec + i, 999L, "purchase", 0.0, "{}"),
      (baseId + 2 * i + 1, farSec + i, 999L, "click", 0.0, "{}"))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
    (if (isNanos) base.withColumn("ts", col("sec") * 1000000000L)
     else base.withColumn("ts", timestamp_seconds(col("sec"))))
      .drop("sec")
      .coalesce(1).write.mode("overwrite").parquet(tmpOut.getAbsolutePath)
    // move the part file in FLAT — the file source lists the stage
    // dir's immediate files, and a nested sentinelN.parquet/ dir
    // would be invisible, silently pinning the watermark
    val part = tmpOut.listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.move(part.toPath,
      new java.io.File(stage, s"sentinel$i.parquet").toPath)
    def rmDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmDir)
      f.delete()
    }
    rmDir(tmpOut)
  }

  test("stateful sessionize across two micro-batches == batch sessions " +
      "(minus each user's still-open last session)") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val events = Tables.load(spark, src, "events")
      .withColumn("ts_num", unix_timestamp(col("ts")).cast("double"))
    val median = events.stat.approxQuantile("ts_num", Array(0.5), 0.0)(0)
    val stage = Files.createTempDirectory("graft-sess").toFile
    try {
      // batch 1: first half by time; batch 2: second half — the stream
      // must merge sessions that straddle the boundary via state
      events.where(col("ts_num") <= median).drop("ts_num")
        .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      val stream = StreamOps.statefulSessionize(
        spark.readStream.schema(events.drop("ts_num").schema)
          .parquet(stage.getAbsolutePath), 1800)
      val q = stream.writeStream.format("memory").queryName("sess")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        events.where(col("ts_num") > median).drop("ts_num")
          .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark.table("sess")
        .as[StreamOps.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
        .toSet

      val batch = graft.ops.EventsOps.sessionize(
        Tables.load(spark, src, "events"), 1800)
      val lastPerUser = batch.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("session_id")
          .as("session_id"))
      val closedBatch = batch.join(lastPerUser,
          Seq("user_id", "session_id"), "left_anti")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet

      assert(streamed === closedBatch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("streaming dedup drops cross-micro-batch duplicates == batch " +
      "distinct") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-dedup").toFile
    try {
      // the same fixture staged twice: every event_id arrives in two
      // different micro-batches (maxFilesPerTrigger=1)
      for (i <- 1 to 2)
        Files.copy(new java.io.File(s"$src/events.parquet").toPath,
          new java.io.File(stage, s"copy$i.parquet").toPath)
      val stream = StreamOps.streamingDedup(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        Seq("event_id"), watermark = "30 days")
      val q = stream.writeStream.format("memory").queryName("dedup")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("dedup").count()
      val exact = Tables.load(spark, src, "events")
        .select("event_id").distinct().count()
      assert(streamed === exact)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("sessionize and dedup state run identically on the RocksDB state " +
      "store provider (the at-scale backend: state off-heap on local " +
      "disk, not executor heap)") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-rocks").toFile
    try {
      // cross-micro-batch dedup state on RocksDB: fixture staged twice,
      // every event_id arrives in two different micro-batches
      for (i <- 1 to 2)
        Files.copy(new java.io.File(s"$src/events.parquet").toPath,
          new java.io.File(stage, s"copy$i.parquet").toPath)
      val dedup = StreamOps.streamingDedup(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        Seq("event_id"), watermark = "30 days")
      val q1 = dedup.writeStream.format("memory").queryName("rocks_dedup")
        .outputMode("append").start()
      try q1.processAllAvailable() finally q1.stop()
      assert(spark.table("rocks_dedup").count() ===
        Tables.load(spark, src, "events")
          .select("event_id").distinct().count())

      // flatMapGroupsWithState session state on RocksDB: single batch,
      // closed sessions must match the batch sessionizer minus each
      // user's still-open last session. Staged through a Spark rewrite
      // (not a file copy): the raw fixture's ts is TIMESTAMP(NANOS),
      // which only Tables.load's nanos handling can read
      val sessStage = Files.createTempDirectory("graft-rocks-sess").toFile
      val events = Tables.load(spark, src, "events")
      events.coalesce(1).write.mode("overwrite")
        .parquet(sessStage.getAbsolutePath)
      val sess = StreamOps.statefulSessionize(
        spark.readStream.schema(events.schema)
          .parquet(sessStage.getAbsolutePath), 1800)
      val q2 = sess.writeStream.format("memory").queryName("rocks_sess")
        .outputMode("append").start()
      try q2.processAllAvailable() finally q2.stop()
      val streamed = spark.table("rocks_sess")
        .as[StreamOps.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
        .toSet
      val batch = EventsOps.sessionize(events, 1800)
      val lastPerUser = batch.groupBy("user_id")
        .agg(max("session_id").as("session_id"))
      val closedBatch = batch
        .join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === closedBatch && streamed.nonEmpty)
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("stream-stream windowed join == the same join run in batch") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-ssj").toFile
    try {
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        new java.io.File(stage, "events.parquet").toPath)
      def purchases(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "purchase")
      def clicks(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "click")

      val in = StreamOps.eventsStream(spark, stage.getAbsolutePath)
      val q = StreamOps.streamStreamJoin(purchases(in), clicks(in), 3600)
        .writeStream.format("memory").queryName("ssj")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("ssj")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet

      val batchIn = Tables.load(spark, src, "events")
      val batch = StreamOps.streamStreamJoin(
          purchases(batchIn), clicks(batchIn), 3600)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("streaming incremental CC: standing labels after N micro-batches " +
      "== batch CC over the admitted union; survives a RESTART from the " +
      "same checkpoint + store; replayed batches are no-ops") {
    import graft.ops.Dedup
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-scc-in").toFile
    val store = Files.createTempDirectory("graft-scc-store").toFile
    val ckpt = Files.createTempDirectory("graft-scc-ck").toFile
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // 3-shingle near-dups across batches: 1~3 (one word differs),
    // 2~5; 4 unique; 6 = exact content twin of 1 (the admission filter
    // must drop it before it ever reaches the CC loop)
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", t0),
      (2L, "one two three four five six seven eight nine ten", t0))
    val b2 = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota mu", t0),
      (4L, "completely different words about spark and big data here", t0))
    val b3 = Seq(
      (5L, "one two three four five six seven eight nine eleven", t0),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", t0))
    def push(rows: Seq[(Long, String, java.sql.Timestamp)], i: Int): Unit =
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(stage.getAbsolutePath)
    val schema = b1.toDF("doc_id", "text", "ts").schema
    def run(): Unit = {
      val q = StreamOps.streamingIncrementalCC(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(stage.getAbsolutePath),
        store.getAbsolutePath, ckpt.getAbsolutePath)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      push(b1, 1); push(b2, 2)
      run() // batches 1-2
      push(b3, 3)
      run() // RESTART: a new query resumes from checkpoint + store
      // ground truth: from-scratch pair graph + CC over the ADMITTED
      // union (6 is a signature twin of 1 — filtered at admission)
      val admitted = (b1 ++ b2 ++ b3.take(1))
        .toDF("doc_id", "text", "ts").select("doc_id", "text")
      val truth = Dedup.componentsConverged(
        Dedup.lshVerifiedPairs(admitted, "doc_id", "text",
          k = 8, bands = 4, minJaccard = 0.2))
        .as[(Long, Long)].collect().toMap
      val got = StreamOps.standingCCLabels(spark, store.getAbsolutePath)
        .as[(Long, Long)].collect().toMap
      assert(got === truth)
      assert(got(1L) === 1L && got(3L) === 1L, "1~3 must share a component")
      assert(got(2L) === 2L && got(5L) === 2L, "2~5 must share a component")
      assert(!got.contains(6L), "content twin must be admission-filtered")
      // idempotence: replaying an already-committed batch is a no-op
      val versions = StreamOps.committedCCVersions(store.getAbsolutePath)
      assert(versions.nonEmpty)
      StreamOps.incrementalCCBatch(store.getAbsolutePath, "text",
        8, 4, 0.2)(admitted.withColumn("ts", lit(t0)), versions.last)
      assert(StreamOps.committedCCVersions(store.getAbsolutePath)
        === versions)
      assert(StreamOps.standingCCLabels(spark, store.getAbsolutePath)
        .as[(Long, Long)].collect().toMap === got)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(stage); rm(store); rm(ckpt)
    }
  }

  test("streaming near-dup filter suppresses signature twins across " +
      "micro-batches, keeps distinct content") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-ndup").toFile
    try {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val batch1 = Seq(
        (1L, "alpha beta gamma delta epsilon zeta", t0),
        (2L, "iota kappa lambda mu nu xi", t0))
        .toDF("doc_id", "text", "ts")
      val batch2 = Seq(
        (3L, "alpha beta gamma delta epsilon zeta", t0), // dup of 1
        (4L, "rho sigma tau upsilon phi chi", t0))       // fresh
        .toDF("doc_id", "text", "ts")
      batch1.coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      val in = spark.readStream.schema(schema)
        .parquet(stage.getAbsolutePath)
      val q = graft.streaming.StreamOps
        .streamingNearDupFilter(in, "text", "ts", k = 8)
        .writeStream.format("memory").queryName("ndup")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        batch2.coalesce(1).write.mode("append")
          .parquet(stage.getAbsolutePath)
        q.processAllAvailable()
      } finally q.stop()
      // doc 3 (content twin of doc 1, later micro-batch) must be dropped
      assert(spark.table("ndup").select("doc_id").as[Long].collect().toSet
        === Set(1L, 2L, 4L))
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("streaming PSI monitor: a baseline-shaped batch reads low PSI, " +
      "a collapsed-mix batch trips the drift alarm") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-psis").toFile
    val out = Files.createTempDirectory("graft-psio").toFile
    val ckpt = Files.createTempDirectory("graft-psic").toFile
    try {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      // baseline: 50/50 click/view
      val baseline = (1L to 20L)
        .map(i => (i, if (i % 2 == 0) "click" else "view"))
        .toDF("event_id", "event_type")
      // batch 1 mirrors the baseline mix; batch 2 is 100% "click"
      val b1 = (21L to 40L)
        .map(i => (i, if (i % 2 == 0) "click" else "view"))
        .toDF("event_id", "event_type")
      val b2 = (41L to 60L).map(i => (i, "click"))
        .toDF("event_id", "event_type")
      b1.coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      val in = spark.readStream.schema(schema)
        .parquet(stage.getAbsolutePath)
      val q = graft.streaming.StreamOps.streamingPsiMonitor(
        in, baseline, out.getAbsolutePath, ckpt.getAbsolutePath)
      try {
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append")
          .parquet(stage.getAbsolutePath)
        q.processAllAvailable()
      } finally q.stop()
      val log = spark.read.parquet(out.getAbsolutePath)
        .orderBy("batch_id").collect()
      assert(log.length === 2, log.mkString(";"))
      // identical mix: PSI ~ 0 (smoothing keeps it tiny, far below 0.2)
      assert(log(0).getAs[Double]("psi") < 0.05 &&
        !log(0).getAs[Boolean]("drifted"), log(0).toString)
      // collapsed mix: all mass moved to one type — well above 0.2
      assert(log(1).getAs[Double]("psi") >= 0.2 &&
        log(1).getAs[Boolean]("drifted"), log(1).toString)
    } finally {
      Seq(stage, out, ckpt).foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
    }
  }

  test("stream-static enrich == the batch join, with no streaming state") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-sse").toFile
    try {
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        new java.io.File(stage, "events.parquet").toPath)
      // static dim: one label row per event_type
      val dim = Tables.load(spark, src, "events")
        .select("event_type").distinct()
        .withColumn("type_label", upper(col("event_type")))

      val in = StreamOps.eventsStream(spark, stage.getAbsolutePath)
      val q = StreamOps.streamStaticEnrich(in, dim, "event_type")
        .writeStream.format("memory").queryName("sse")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("sse")
        .select("event_id", "type_label").as[(Long, String)].collect().toSet

      val batch = StreamOps.streamStaticEnrich(
          Tables.load(spark, src, "events"), dim, "event_type")
        .select("event_id", "type_label").as[(Long, String)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // enrichment must not register any stateful operator
      assert(spark.table("sse").count() ===
        Tables.load(spark, src, "events").count())
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("windowed agg RESTARTS from checkpoint: a new query over the same " +
      "checkpoint merges run-1 state with run-2 data (exactly-once state)") {
    val src = "/root/testdata/sf0.001"
    val events = Tables.load(spark, src, "events")
      .withColumn("ts_num", unix_timestamp(col("ts")).cast("double"))
    val median = events.stat.approxQuantile("ts_num", Array(0.5), 0.0)(0)
    val stage = Files.createTempDirectory("graft-restart-in").toFile
    val ckpt = Files.createTempDirectory("graft-restart-ck").toFile
    // complete-mode foreachBatch re-emits the FULL aggregation each batch;
    // the map holds the latest snapshot (driver-side: local mode)
    val out = new java.util.concurrent.ConcurrentHashMap[(Long, String), Long]
    def run(): Unit = {
      // staged files carry the CONVERTED ts (timestamp, not raw nanos),
      // so read with the staged schema — same pattern as the sessionize
      // restart staging above, not eventsStream's raw-fixture schema
      val q = StreamOps.windowedCounts(
          spark.readStream.schema(events.drop("ts_num").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage.getAbsolutePath),
          "1 hour", "1 hour")
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          df.collect().foreach(r =>
            out.put((r.getLong(0), r.getString(1)), r.getLong(2)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      events.where(col("ts_num") <= median).drop("ts_num")
        .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      run() // run 1: first half, then the query STOPS
      events.where(col("ts_num") > median).drop("ts_num")
        .coalesce(1).write.mode("append").parquet(stage.getAbsolutePath)
      run() // run 2: a NEW query recovers state + offsets from checkpoint
      val batch = EventsOps.tumblingCounts(
          Tables.load(spark, src, "events"), 3600)
        .select("window_start", "event_type", "n")
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .toMap
      import scala.jdk.CollectionConverters._
      // windows straddling the split are only correct if run 2 recovered
      // run 1's state — a fresh-state run 2 would undercount them
      assert(out.asScala.toMap === batch)
      assert(batch.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(ckpt)
    }
  }

  test("streaming windowedCounts == batch tumblingCounts on events sf0.001") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-stream").toFile
    try {
      // stage the fixture file as the stream input dir
      val target = new java.io.File(stage, "events.parquet")
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        target.toPath)

      val stream = StreamOps.windowedCounts(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        "1 hour", "1 hour")
      val q = stream.writeStream
        .format("memory").queryName("win_counts").outputMode("complete")
        .start()
      try q.processAllAvailable() finally q.stop()

      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = EventsOps.tumblingCounts(
          Tables.load(spark, src, "events"), 3600)
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("stream-stream LEFT OUTER join emits null-padded unmatched lefts " +
      "after the watermark passes, matching the batch left join") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-ssoj").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    try {
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        new java.io.File(stage, "a_events.parquet").toPath)
      def purchases(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "purchase")
      def clicks(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "click")

      val in = StreamOps.eventsStream(spark, stage.getAbsolutePath)
      val q = StreamOps.streamStreamLeftJoin(purchases(in), clicks(in),
          3600, watermark = "10 minutes")
        .writeStream.format("memory").queryName("ssoj")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // sentinel batches far in the future advance both watermarks so
        // every remaining unmatched left row gets its null verdict; three
        // batches because the watermark is computed at end-of-batch and
        // outer-join state eviction runs a batch after it crosses
        val far = Tables.load(spark, src, "events")
          .agg(org.apache.spark.sql.functions.max(
            unix_timestamp(col("ts")))).head().getLong(0) + 10 * 24 * 3600L
        for (i <- 1 to 3) {
          // BOTH event types per sentinel: each side's watermark
          // operator only sees rows passing its own filter, and the
          // query watermark is the min across operators — a
          // purchase-only sentinel would leave the click-side
          // watermark (and so the global one) behind.
          writeSentinel(stage, 900000L, i, far)
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("ssoj")
        .where(col("user_id") =!= 999)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet

      val batchIn = Tables.load(spark, src, "events")
      val batch = StreamOps.streamStreamLeftJoin(
          purchases(batchIn), clicks(batchIn), 3600)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(streamed === batch)
      assert(streamed.exists(_._2.isEmpty),
        "expected at least one null-padded unmatched left")
      assert(streamed.exists(_._2.nonEmpty))
    } finally rm(stage)
  }

  test("stream-stream FULL OUTER join null-pads BOTH sides after the " +
      "watermark passes, matching the batch full outer join") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-ssfoj").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    try {
      Files.copy(new java.io.File(s"$src/events.parquet").toPath,
        new java.io.File(stage, "a_events.parquet").toPath)
      def purchases(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "purchase")
      def clicks(df: org.apache.spark.sql.DataFrame) =
        df.where(col("event_type") === "click")

      val in = StreamOps.eventsStream(spark, stage.getAbsolutePath)
      val q = StreamOps.streamStreamFullOuterJoin(purchases(in), clicks(in),
          3600, watermark = "10 minutes")
        .writeStream.format("memory").queryName("ssfoj")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // same sentinel protocol as the left-outer test: both event types
        // per sentinel (min-across-operators watermark), flat files, three
        // batches so both sides' outer state fully evicts
        val far = Tables.load(spark, src, "events")
          .agg(org.apache.spark.sql.functions.max(
            unix_timestamp(col("ts")))).head().getLong(0) + 10 * 24 * 3600L
        for (i <- 1 to 3) {
          writeSentinel(stage, 910000L, i, far)
          q.processAllAvailable()
        }
      } finally q.stop()
      val streamed = spark.table("ssfoj")
        .where(col("user_id") =!= 999)
        .select("l_id", "r_id")
        .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet

      val batchIn = Tables.load(spark, src, "events")
      val batch = StreamOps.streamStreamFullOuterJoin(
          purchases(batchIn), clicks(batchIn), 3600)
        .select("l_id", "r_id")
        .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
      assert(streamed === batch)
      assert(streamed.exists(_._2.isEmpty),
        "expected at least one null-padded unmatched left")
      assert(streamed.exists(_._1.isEmpty),
        "expected at least one null-padded unmatched right")
      assert(streamed.exists(p => p._1.nonEmpty && p._2.nonEmpty))
    } finally rm(stage)
  }

  test("watermarked sessionize emits closed sessions via event-time " +
      "timeout once the watermark passes end+gap") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-wmsess").toFile
    def writeBatch(name: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "es")
        .select(col("user_id"), timestamp_seconds(col("es")).as("ts"))
        .coalesce(1).write.mode("append")
        .parquet(new java.io.File(stage, name).getAbsolutePath)
    // the stream reads the staged subdirs as one glob; each batch is
    // driven explicitly (write → processAllAvailable) so ordering is
    // deterministic regardless of file mtimes
    try {
      writeBatch("b1", Seq((1L, 1000L), (1L, 1100L),   // session A
        (1L, 10000L), (1L, 10050L)))                   // session B (open)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      val stream = StreamOps.statefulSessionizeWatermarked(
        spark.readStream.schema(schema)
          .parquet(stage.getAbsolutePath + "/*"), gapSeconds = 1800,
        watermark = "30 minutes")
      val q = stream.writeStream.format("memory").queryName("wmsess")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // advance the watermark far past session B's end + gap...
        writeBatch("b2", Seq((2L, 100000L)))
        q.processAllAvailable()
        // ...then one more batch so the timeout actually fires (timeouts
        // run on the batch AFTER the watermark advances)
        writeBatch("b3", Seq((2L, 100001L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("wmsess").as[StreamOps.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
        .toSet
      // session A closed in-batch by B's arrival; B closed by timeout;
      // user 2's session still open (no later batch) -> not emitted
      assert(got === Set((1L, 1000L, 1100L, 2L), (1L, 10000L, 10050L, 2L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(stage)
    }
  }

  test("upsertIgnoreSink is idempotent: duplicate micro-batches and full " +
      "replays add zero rows") {
    val src = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft-upsink").toFile
    val target = Files.createTempDirectory("graft-uptarget").toFile
    val chk1 = Files.createTempDirectory("graft-upchk1").toFile
    val chk2 = Files.createTempDirectory("graft-upchk2").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    try {
      // the same fixture staged twice: every event_id arrives in two
      // different micro-batches
      for (i <- 1 to 2)
        Files.copy(new java.io.File(s"$src/events.parquet").toPath,
          new java.io.File(stage, s"copy$i.parquet").toPath)
      val targetPath = target.getAbsolutePath + "/t"
      val q1 = StreamOps.upsertIgnoreSink(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        Seq("event_id"), targetPath, chk1.getAbsolutePath)
      try q1.processAllAvailable() finally q1.stop()
      val exact = Tables.load(spark, src, "events")
        .select("event_id").distinct().count()
      assert(spark.read.parquet(targetPath).count() === exact)
      // full replay from a fresh checkpoint: anti-join absorbs everything
      val q2 = StreamOps.upsertIgnoreSink(
        StreamOps.eventsStream(spark, stage.getAbsolutePath),
        Seq("event_id"), targetPath, chk2.getAbsolutePath)
      try q2.processAllAvailable() finally q2.stop()
      assert(spark.read.parquet(targetPath).count() === exact)
    } finally {
      rm(stage); rm(target); rm(chk1); rm(chk2)
    }
  }

  test("near-dup admission gate: the admitted state-key set across " +
      "micro-batches == the batch signature distinct, doc_id 0 included") {
    val src = "/root/testdata/sf0.001"
    val gate = StreamOps.runNearDupAdmissionGate(spark, src,
      nFiles = 3, statePartitions = 2)
      .select("sig_key").collect().map(_.getString(0)).toSet
    // batch twin: the SAME signature pipeline the q135 admission pass
    // runs, distinct over every doc — including doc_id 0, whose
    // synthetic event time must NOT land on the epoch (the initial
    // watermark) or the stateful op sheds it as late (the 480-vs-481
    // regression this gate's staging offset exists to prevent)
    import graft.ops.{Dedup, Text}
    val batch = Tables.load(spark, src, "documents")
      .select(Text.cleanTokens(col("text")).as("t"))
      .withColumn("shs", Dedup.shingles(col("t")))
      .select(md5(concat_ws("\u0000",
        Dedup.minhashSignature(col("shs"), 8))).as("sig_key"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(gate === batch)
    assert(gate.nonEmpty)
  }

  test("ccLabelsAsOf: every committed version equals batch CC over its " +
      "bucket prefix; head == standingCCLabels; uncommitted throws") {
    import graft.ops.Dedup
    val src = "/root/testdata/sf0.001"
    val buckets = 3
    // the gate memoizes the store per (fixture, params); a direct call
    // gives us its dir by replaying the same key through the gate once
    StreamOps.runCCAsOfGate(spark, src, buckets, asOf = 0)
    val storeField = StreamOps.stageMemo
      .get(s"$src#$buckets#8#4#0.2#ccasof")
    assert(storeField != null, "store memo missing")
    val docs = Tables.load(spark, src, "documents")
      .select(col("doc_id"), col("text"))
    for (v <- 0 until buckets) {
      val asOf = StreamOps.ccLabelsAsOf(spark, storeField, v.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val prefix = docs.where(pmod(col("doc_id"), lit(buckets.toLong))
        <= v)
      val batch = Dedup.componentsConverged(
          Dedup.lshVerifiedPairs(prefix, "doc_id", "text", 8, 4, 0.2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(asOf === batch, s"version $v != batch CC over its prefix")
    }
    val head = StreamOps.standingCCLabels(spark, storeField)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val last = StreamOps.ccLabelsAsOf(spark, storeField,
        (buckets - 1).toLong)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(head === last)
    intercept[IllegalArgumentException] {
      StreamOps.ccLabelsAsOf(spark, storeField, 99L)
    }
  }
}
