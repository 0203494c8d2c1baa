package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PHYSICAL ANN index artifact — the durable form of the per-JVM
  * quantizer/codebook memos (the r12 verdict's "frozen is not yet
  * durable" gap): the trained coarse-quantizer centroids, the PQ
  * codebooks, and the assigned postings layout persisted to parquet
  * ONCE per corpus snapshot, then READ by every consumer. A process
  * restart re-reads the store instead of retraining, which is what
  * "frozen quantizer" must mean in production — q280's append
  * semantics (postings never move) only hold across restarts if the
  * centroids are bytes on disk, not JVM state.
  *
  * Layout under one directory per (fixture, train-filter, params):
  *   - `centroids/`  (cell INT, cv ARRAY<FLOAT>)          — quantizer
  *   - `books/`      (sub INT, code INT, cv ARRAY<FLOAT>) — PQ codebooks
  *   - `cells/`      (vec_id, embedding, cell)            — IVFFlat postings
  *   - `codes/`      (vec_id, cell, code_0..m-1)          — IVFADC postings
  *   - `probecents/` (cell, cv ARRAY<FLOAT>, cn DOUBLE)   — probe geometry
  * Floats round-trip parquet bit-exactly, so a read-back quantizer
  * assigns IDENTICALLY to the in-memory one (Round13OpsSpec proves
  * retrain ≡ read-back, element-exact). `codes/` is the layout Jégou
  * §IV actually serves from — m one-byte codes per posting, never a
  * raw vector — so the ADC retriever reads m bytes/candidate from the
  * store instead of re-encoding the corpus per query; `probecents/`
  * (the per-cell member mean + norm multi-probe ranks against) makes
  * probe selection store-only too.
  *
  * Publish is write-once and atomic: build into a pid-suffixed staging
  * dir, `Files.move(ATOMIC_MOVE)` to the stable path; the loser of a
  * concurrent race deletes its staging and reads the winner's store.
  * The store is deliberately NOT registered for JVM-exit cleanup —
  * surviving the process is its purpose. Training (on a cold store)
  * goes through the same per-JVM memos the query surfaces use, so a
  * JVM that already trained pays nothing to publish. Driver-side reads
  * (centroids, books) are memoized per JVM; the postings frame is
  * returned as a plain parquet read so nothing is pinned in the block
  * manager (a localCheckpoint memo here would die to any unpersist
  * sweep — the production analogue is executors reading index shards
  * from object storage per task, which is exactly this shape).
  */
object AnnIndex {

  private def slug(dir: String): String = StoreCommit.slug(dir)

  /** Store-format version — bump when the TRAINING semantics change,
    * so a durable store written by older code can never be silently
    * read as current (the path is the cache key). */
  private val V = "v2"

  /** Stable store root for fixture `dir`; `tag` names the train
    * filter ("full" = whole-corpus quantizer, "base" = the q280/q282
    * frozen base slice). The root carries a CONTENT fingerprint of
    * the fixture ([[StoreCommit.fingerprint]]) as well as its path,
    * so regenerated test data at the same path rebuilds instead of
    * silently serving a stale index (r13 advice). */
  def root(dir: String, tag: String, k: Int, iters: Int, m: Int,
           codes: Int): String =
    sys.props("java.io.tmpdir") +
      s"/graft-annindex-$V-${slug(dir)}" +
      s"-f${StoreCommit.fingerprint(dir)}-$tag-c$k-i$iters-m$m-k$codes"

  private val readMemo = new java.util.concurrent.ConcurrentHashMap[
    String, AnyRef]

  /** The whole-corpus ("full") quantizer store for fixture `dir` —
    * trained exactly as kmeansCellsCached/pqCodebooksCached train for
    * the IVF/ADC query family (SAME memo keys, so one training serves
    * both the queries and the publish). */
  private def ensureFull(spark: SparkSession, dir: String, k: Int,
                         iters: Int, m: Int, codes: Int): String =
    ensure(spark, dir, "full", None, dir, k, iters, m, codes)

  /** The q280/q282 frozen-BASE quantizer store: trained on the
    * standing slice only ([[Sim.frozenDeltaSplit]]'s complement, the
    * [[Sim.frozenBaseKey]] memo), postings = the WHOLE corpus assigned
    * under those frozen centroids. */
  private def ensureBase(spark: SparkSession, dir: String, k: Int,
                         iters: Int, m: Int, codes: Int): String =
    ensure(spark, dir, "base", Some(!Sim.frozenDeltaSplit),
      Sim.frozenBaseKey(dir), k, iters, m, codes)

  private val ensureMemo = new java.util.concurrent.ConcurrentHashMap[
    String, String]

  private def ensure(spark: SparkSession, dir: String, tag: String,
                     trainFilter: Option[Column], memoKey: String,
                     k: Int, iters: Int, m: Int, codes: Int): String =
    // single-flight per target within the JVM: Verify runs queries
    // concurrently, and two threads building into the same pid-keyed
    // staging dir corrupt each other mid-write (cross-JVM races are
    // handled by the ATOMIC_MOVE publish below)
    ensureMemo.computeIfAbsent(root(dir, tag, k, iters, m, codes), _ =>
      build(spark, dir, tag, trainFilter, memoKey, k, iters, m, codes))

  private def build(spark: SparkSession, dir: String, tag: String,
                    trainFilter: Option[Column], memoKey: String,
                    k: Int, iters: Int, m: Int, codes: Int): String =
    StoreCommit.ensure(root(dir, tag, k, iters, m, codes)) { staging =>
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val trainSet = trainFilter.map(emb.where).getOrElse(emb)
      val cents = Sim.kmeansCentroidsCached(trainSet, k, iters, memoKey)
      val books = Sim.pqCodebooksCached(trainSet, m, codes, iters,
        memoKey)
      import spark.implicits._
      cents.zipWithIndex.map { case (cv, i) => (i, cv) }
        .toDF("cell", "cv")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/centroids")
      books.zipWithIndex.flatMap { case (bk, s) =>
        bk.zipWithIndex.map { case (cv, c) => (s, c, cv) }
      }.toDF("sub", "code", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/books")
      // postings: every corpus vector assigned under the frozen
      // centroids (a base-trained quantizer still indexes the WHOLE
      // corpus — the q280 semantics)
      val assigned = emb.select(col("vec_id"), col("embedding"),
        (-Sim.assignScored("embedding", cents).getField("negCell"))
          .as("cell"))
      assigned.write.mode("overwrite").parquet(s"$staging/cells")
      Sim.pqEncode(assigned, books, "vec_id", "embedding",
          keep = Seq("cell"))
        .write.mode("overwrite").parquet(s"$staging/codes")
      Sim.cellCentroids(assigned, "cell", "embedding")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/probecents")
    }

  private def path(spark: SparkSession, dir: String, tag: String,
                   k: Int, iters: Int, m: Int, codes: Int): String =
    tag match {
      case "full" => ensureFull(spark, dir, k, iters, m, codes)
      case "base" => ensureBase(spark, dir, k, iters, m, codes)
      case other => throw new IllegalArgumentException(
        s"unknown index tag '$other' (expected full|base)")
    }

  /** Read the stored coarse-quantizer centroids (cells ascending);
    * builds + publishes the store on first use per corpus snapshot. */
  def centroids(spark: SparkSession, dir: String, tag: String = "full",
                k: Int = 8, iters: Int = 2, m: Int = 4,
                codes: Int = 8): Seq[Seq[Float]] = {
    val p = path(spark, dir, tag, k, iters, m, codes)
    readMemo.computeIfAbsent(s"cent#$p", _ =>
      readCentroids(spark, p)).asInstanceOf[Seq[Seq[Float]]]
  }

  /** Pure store read (no training fallback) — the spec's restart
    * simulation and any cross-process consumer. */
  def readCentroids(spark: SparkSession, path: String): Seq[Seq[Float]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toSeq).toSeq

  /** Read the stored PQ codebooks (sub, code ascending). */
  def books(spark: SparkSession, dir: String, tag: String = "full",
            k: Int = 8, iters: Int = 2, m: Int = 4,
            codes: Int = 8): IndexedSeq[IndexedSeq[Seq[Float]]] = {
    val p = path(spark, dir, tag, k, iters, m, codes)
    readMemo.computeIfAbsent(s"books#$p", _ => readBooks(spark, p))
      .asInstanceOf[IndexedSeq[IndexedSeq[Seq[Float]]]]
  }

  def readBooks(spark: SparkSession,
                path: String): IndexedSeq[IndexedSeq[Seq[Float]]] =
    spark.read.parquet(s"$path/books")
      .orderBy("sub", "code").collect()
      .groupBy(_.getInt(0)).toIndexedSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Float](2).toSeq).toIndexedSeq)

  /** The stored IVFFlat postings: (vec_id, embedding, cell) — a plain
    * parquet read per consumer, nothing pinned in executor memory. */
  def cells(spark: SparkSession, dir: String, tag: String = "full",
            k: Int = 8, iters: Int = 2, m: Int = 4,
            codes: Int = 8): DataFrame = {
    val p = path(spark, dir, tag, k, iters, m, codes)
    spark.read.parquet(s"$p/cells")
  }

  /** The stored IVFADC postings: (vec_id, cell, code_0..m-1) — the
    * m-bytes-per-candidate layout the ADC retriever scans; raw vectors
    * never leave the store for the dense arm. */
  def codes(spark: SparkSession, dir: String, tag: String = "full",
            k: Int = 8, iters: Int = 2, m: Int = 4,
            nCodes: Int = 8): DataFrame = {
    val p = path(spark, dir, tag, k, iters, m, nCodes)
    spark.read.parquet(s"$p/codes")
  }

  /** The stored probe geometry: (cell, cv, cn) per-cell member means —
    * what multi-probe ranks candidate cells against. */
  def probeCentroids(spark: SparkSession, dir: String,
                     tag: String = "full", k: Int = 8, iters: Int = 2,
                     m: Int = 4, nCodes: Int = 8): DataFrame = {
    val p = path(spark, dir, tag, k, iters, m, nCodes)
    spark.read.parquet(s"$p/probecents")
  }
}
