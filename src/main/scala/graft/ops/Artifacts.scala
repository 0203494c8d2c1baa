package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The materialized dedup-artifact layer — the production shape for the
  * near-dup report family.
  *
  * A real 100 TB curation pipeline does not re-derive the verified pair
  * graph for every report: it materializes (pairs, component labels)
  * ONCE per corpus snapshot, and the cluster-size histogram, survivor
  * selection, dedup-impact, triangle-census, … reports all read that
  * artifact. Before round 7 each of q140/q142/q155/q157/q159/q166
  * rebuilt `Dedup.lshVerifiedPairs` (and most re-ran connected
  * components) from scratch — correct, but it modeled the reports as
  * independent pipelines, which is neither the production shape nor
  * free (~10 s of the round-6 bench was pair-graph recompute).
  *
  * This object is the single-process stand-in for that artifact store:
  * a memo table keyed by (Spark application, corpus dir, parameters)
  * holding `localCheckpoint`ed frames. First consumer pays the build
  * and materializes the artifact; every later consumer reads
  * checkpoint blocks. On a cluster the same contract is a parquet
  * table written once per snapshot (q167 exercises exactly that:
  * write-to-parquet, read-back, report) — the memo here and the
  * parquet artifact there have the same role: pay the pair graph once.
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

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** RDD ids of the FINAL checkpoint blocks backing live artifacts.
    * localCheckpoint truncates lineage, so evicting these blocks makes
    * every later consumer fail (not recompute) — session-hygiene
    * sweeps that unpersist "everything" (graft.Bench's between-query
    * cleanup) must exempt exactly this set. Intermediate checkpoints
    * created INSIDE a build (lshVerifiedPairs' candidate frame, CC
    * round frames) are deliberately not protected: the final artifact
    * does not depend on them, and they are the GC debt the sweep
    * exists to drop.
    */
  private val finalIds = ConcurrentHashMap.newKeySet[Int]()

  /** Memoize an eagerly-materialized frame. `computeIfAbsent` also
    * serializes concurrent first-builds of the same artifact (Verify
    * runs queries 4-at-a-time — without this, two reports racing on a
    * cold cache would both pay the pair-graph build). The outer
    * synchronized makes the before/after persistent-RDD diff that
    * identifies the final checkpoint's ids race-free.
    */
  private def memo(key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(key, _ => this.synchronized {
      val df0 = build // intermediate checkpoints materialize here
      val sc = df0.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val df = df0.localCheckpoint()
      (sc.getPersistentRDDs.keySet -- before).foreach(finalIds.add(_))
      df
    })

  /** Is `rddId` a live artifact's final checkpoint? (For hygiene sweeps
    * that unpersist session-wide state — see [[finalIds]].)
    */
  private[graft] def isProtected(rddId: Int): Boolean =
    finalIds.contains(rddId)

  private def keyOf(spark: SparkSession, sfDir: String, what: String,
                    params: String): String =
    s"${spark.sparkContext.applicationId}|$sfDir|$what|$params"

  /** The verified near-dup pair artifact over `documents(doc_id, text)`
    * at `sfDir`: [[Dedup.lshVerifiedPairs]] (LSH candidates, exact
    * Jaccard verify), built once per (session, dir, k, bands,
    * threshold) and checkpoint-backed for every later consumer.
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

  /** Test hook: drop all memoized artifacts (unpersisting their
    * checkpoint blocks) so a spec can measure cold vs warm builds.
    */
  private[graft] def clear(): Unit = {
    cache.forEach((_, df) => df.unpersist())
    cache.clear()
    finalIds.clear()
  }
}
