package graft.ops

import java.nio.file.{Files, Path}
import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The materialized dedup-artifact layer — the production shape for the
  * near-dup report family.
  *
  * A real 100 TB curation pipeline does not re-derive the verified pair
  * graph for every report: it materializes (pairs, component labels)
  * ONCE per corpus snapshot as a TABLE, and the cluster-size histogram,
  * survivor selection, dedup-impact, triangle-census, … reports all
  * read that table. Before round 7 each of q140/q142/q155/q157/q159/
  * q166 rebuilt `Dedup.lshVerifiedPairs` (and most re-ran connected
  * components) from scratch — correct, but it modeled the reports as
  * independent pipelines, which is neither the production shape nor
  * free (~10 s of the round-6 bench was pair-graph recompute).
  *
  * Implementation: write-once parquet under a per-JVM temp directory,
  * read-back for every consumer — exactly the cluster contract (a
  * parquet table written once per corpus snapshot; q167 exercises the
  * user-visible version of the same store). The round-7 version
  * memoized `localCheckpoint`ed frames instead; that pinned the
  * artifact blocks in the block manager for the whole session (driver
  * heap at local[*]), and the round-7 bench measured the result — a
  * uniform ~2× GC drag on every unrelated query. Parquet-backing keeps
  * artifacts off the heap entirely: consumers pay a columnar scan of a
  * pair-graph-sized file (ms), the block manager stays empty between
  * queries, and the artifact's plan is a FileScan that Catalyst can
  * prune and push filters into — none of which a checkpoint RDD offers.
  *
  * Concurrency: one `CompletableFuture` per key (Verify runs queries
  * 4-at-a-time — two reports racing on a cold cache must not both pay
  * the pair-graph build). The build runs OUTSIDE any map computation,
  * so dependent artifacts (components → nearDupPairs) can nest without
  * violating `ConcurrentHashMap`'s no-recursive-update contract; the
  * dependency graph is acyclic, so cross-key future waits cannot cycle.
  *
  * Consumers that deliberately run an ALTERNATIVE engine over the same
  * pairs (q130's big-star CC, q140's incremental CC) share the pair
  * artifact but not the label artifact — the point of those queries is
  * the other engine, pinned to the same oracle.
  *
  * Reference contrast: the reference re-reads its whole MySQL fact
  * table for each analytics block (reddit_etl_proj/etl_pipeline.py:
  * 144-150) — same rebuild-per-report shape this layer removes.
  */
object Artifacts {

  private val cache = new ConcurrentHashMap[String, CompletableFuture[DataFrame]]()

  /** Per-JVM store root; deleted on exit. Parquet under a temp dir is
    * the single-process stand-in for the warehouse path a cluster
    * deployment would configure.
    */
  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-artifacts-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p
  }

  /** Build-once / read-everywhere. First caller installs a future and
    * pays the build + parquet write; concurrent and later callers join
    * the future and share the ONE read-back frame. A failed build
    * removes its future so a later call can retry (and rethrows).
    */
  private def memo(key: String)(build: => DataFrame): DataFrame = {
    val fresh = new CompletableFuture[DataFrame]()
    val prior = cache.putIfAbsent(key, fresh)
    // same unwrap as StoreCommit.singleFlight (r16 advice): losers see
    // the winner's original exception, not a CompletionException shell
    if (prior != null)
      try prior.join()
      catch {
        case e: java.util.concurrent.CompletionException
            if e.getCause != null => throw e.getCause
      }
    else {
      try {
        val df0 = build
        val path = root.resolve(
          java.security.MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString).toString
        df0.write.mode("overwrite").parquet(path)
        val df = StoreRead.parquet(df0.sparkSession, path)
        fresh.complete(df)
        df
      } catch {
        case e: Throwable =>
          cache.remove(key, fresh)
          fresh.completeExceptionally(e)
          throw e
      }
    }
  }

  private def keyOf(spark: SparkSession, sfDir: String, what: String,
                    params: String): String =
    s"${spark.sparkContext.applicationId}|$sfDir|$what|$params"

  /** The verified near-dup pair artifact over `documents(doc_id, text)`
    * at `sfDir`: [[Dedup.lshVerifiedPairs]] (LSH candidates, exact
    * Jaccard verify), built once per (session, dir, k, bands,
    * threshold) and parquet-backed for every later consumer.
    * Columns: (id_a, id_b, jaccard), id_a < id_b.
    */
  def nearDupPairs(spark: SparkSession, sfDir: String, k: Int = 8,
                   bands: Int = 4, minJaccard: Double = 0.2): DataFrame =
    memo(keyOf(spark, sfDir, "pairs", s"$k|$bands|$minJaccard")) {
      Dedup.lshVerifiedPairs(
        graft.Tables.load(spark, sfDir, "documents"),
        "doc_id", "text", k, bands, minJaccard)
    }

  /** The EXACT pair artifact: [[Dedup.prefixFilterPairs]] (PPJoin-style
    * prefix filtering, exact recall at the threshold) — q121's engine
    * and q155's ground truth, built once. Columns: (id_a, id_b,
    * jaccard), id_a < id_b.
    */
  def exactPairs(spark: SparkSession, sfDir: String, w: Int = 3,
                 minJaccard: Double = 0.8): DataFrame =
    memo(keyOf(spark, sfDir, "exact", s"$w|$minJaccard")) {
      Dedup.prefixFilterPairs(
        graft.Tables.load(spark, sfDir, "documents"),
        "doc_id", "text", w, minJaccard)
    }

  /** The canonical component-label artifact: converged min-label CC
    * over [[nearDupPairs]]. Columns: (doc_id, component) — component
    * is the min doc_id of the cluster, docs outside any pair absent
    * (the caller decides the singleton policy, matching
    * componentsConverged's contract).
    */
  def components(spark: SparkSession, sfDir: String, k: Int = 8,
                 bands: Int = 4, minJaccard: Double = 0.2): DataFrame =
    memo(keyOf(spark, sfDir, "cc", s"$k|$bands|$minJaccard")) {
      Dedup.componentsConverged(
        nearDupPairs(spark, sfDir, k, bands, minJaccard))
    }

  /** The STANDING component-label artifact for the ingest cycle
    * (q297): converged min-label CC over the standing (doc_id%5≠0)
    * slice's verified pairs — the labels table a production refresh
    * READS rather than recomputes; maintaining it incrementally is
    * the point of the cycle, so its build cost is a once-per-snapshot
    * cost, not a per-ingest one. Standing pairs are the full pair
    * artifact filtered to standing endpoints (signatures are per-doc,
    * the q270 subset property). Columns: (doc_id, component).
    */
  def standingLabels(spark: SparkSession, sfDir: String, k: Int = 8,
                     bands: Int = 4, minJaccard: Double = 0.2)
      : DataFrame =
    memo(keyOf(spark, sfDir, "standingLabels",
        s"$k|$bands|$minJaccard|mod5")) {
      Dedup.componentsConverged(
        nearDupPairs(spark, sfDir, k, bands, minJaccard)
          .where(col("id_a") % 5 =!= 0 && col("id_b") % 5 =!= 0))
    }

  /** The POST-TAKEDOWN component-label artifact (q319): the standing
    * [[components]] artifact refreshed INCREMENTALLY for the takedown
    * (doc_id % 7 === 3 — [[graft.ops.LexIndex.deleteSplit]]) via
    * [[Dedup.componentsAfterDelete]] (r17, clearing the r16 weak):
    * removing a doc can SPLIT its cluster, but only clusters that
    * CONTAINED a deleted doc — so the re-label runs exact CC over the
    * touched components' surviving pairs ONLY and serves every other
    * label unchanged from the standing artifact, instead of re-running
    * the full fixpoint over all surviving pairs. Output is IDENTICAL
    * to the from-scratch fold (q319's oracle string is unchanged). A
    * production refresh runs it ONCE per takedown and publishes the
    * table — every later consumer (the mixture re-planner, dedup
    * reports) reads it, exactly as [[standingLabels]] serves the
    * ingest cycle. Columns: (doc_id, component).
    */
  def survivorLabels(spark: SparkSession, sfDir: String, k: Int = 8,
                     bands: Int = 4, minJaccard: Double = 0.2)
      : DataFrame =
    memo(keyOf(spark, sfDir, "survivorLabels",
        s"$k|$bands|$minJaccard|mod7")) {
      val pairs = nearDupPairs(spark, sfDir, k, bands, minJaccard)
      Dedup.componentsAfterDelete(
        components(spark, sfDir, k, bands, minJaccard),
        pairs,
        graft.Tables.load(spark, sfDir, "documents")
          .where(col("doc_id") % 7 === 3).select("doc_id"))
    }

  /** The language-prediction artifact: [[Text.langIdNgram]] over
    * `documents`, built once — q170 is the builder, q173's mixture
    * weights read it (a real pipeline stores the classifier output
    * once and every per-language report joins it). Columns:
    * (doc_id, lang, pred_lang, dist).
    */
  def ctPredictions(spark: SparkSession, sfDir: String, k: Int = 40)
      : DataFrame =
    memo(keyOf(spark, sfDir, "ctpred", s"$k")) {
      Text.langIdNgram(graft.Tables.load(spark, sfDir, "documents"),
        "doc_id", "lang", "text", k)
    }

  /** The STANDING banded-signature artifact for the ingest loop
    * (q135/q179): `documents` minus the current batch slice, run
    * through [[Dedup.bandedSignatures]] ONCE and stored. Per-ingest
    * delta-pair generation then signs only the batch — at 100 TB,
    * re-signing the standing corpus per ingest would dominate the
    * whole refresh (SCALE.md's q179 caveat; this artifact removes it).
    * Columns: (id, band, bkey).
    */
  def standingBands(spark: SparkSession, sfDir: String, k: Int = 8,
                    bands: Int = 4): DataFrame =
    memo(keyOf(spark, sfDir, "standingBands", s"$k|$bands|mod5")) {
      Dedup.bandedSignatures(
        graft.Tables.load(spark, sfDir, "documents")
          .where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", k, bands)
    }

  /** The STANDING signature-key artifact for admission (q135): distinct
    * full-signature md5 keys of the standing corpus — the batch
    * anti-joins this instead of re-keying the base per ingest.
    * Columns: (sig_key).
    */
  def standingSigKeys(spark: SparkSession, sfDir: String, k: Int = 8)
      : DataFrame =
    memo(keyOf(spark, sfDir, "standingSigKeys", s"$k|mod5")) {
      Dedup.signatureKeys(
        graft.Tables.load(spark, sfDir, "documents")
          .where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", k)
        .select("sig_key").distinct()
    }

  /** The bigram-LM score artifact: [[Curate.bigramLogProb]] over
    * `documents`, built once — q200 is the builder-report, q204's
    * perplexity buckets read it (a real pipeline scores the corpus
    * once and every quality consumer joins the score table).
    * Columns: (doc_id, n_bigrams, mean_log2p).
    */
  def bigramScores(spark: SparkSession, sfDir: String): DataFrame =
    memo(keyOf(spark, sfDir, "bigramlp", "0.5")) {
      Curate.bigramLogProb(
        graft.Tables.load(spark, sfDir, "documents"), "doc_id", "text")
    }

  /** Test hook: drop all memoized artifacts so a spec can measure cold
    * vs warm builds. (Files stay on disk; a rebuild overwrites them.)
    */
  private[graft] def clear(): Unit = cache.clear()
}
