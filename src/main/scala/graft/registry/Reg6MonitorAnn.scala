package graft.registry

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Agg, Artifacts, Audio, Curate, Dedup, EventsOps, Graph, Layout, Multimodal, Num, Prune, Sentiment, Sim, Sketch, Skew, Star, Text}
import graft.sources.Sources

import Shared._
import Fragments._
import graft.ops.Present._

/** Monitoring + the measured-ANN matrix: drift/robust stats, Spearman
  * engine family, winnowing, phrase postings, recall sweeps
  * (q228-q233).
  *
  * Mechanically split out of SparkEntry.scala (round 10) — every entry
  * is verbatim; SparkEntry composes the parts back into the one map.
  */
private[graft] object Reg6MonitorAnn {

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(


    // events — exponentially time-decayed event mass
    // (EventsOps.timeDecayedStats scaladoc): recency-weighted source
    // mass anchored at the corpus max timestamp, never wall-clock.
    "q205_time_decay" -> ((s, dir) =>
      EventsOps.timeDecayedStats(t(s, dir, "events"), halfLifeDays = 30.0)
        .orderBy("event_type")),


    // events — Theil-Sen robust volume trend (EventsOps.theilSenTrend
    // scaladoc): the median pairwise slope one anomalous day cannot
    // bend; day-pair join bounded by |days|² per type.
    "q206_theil_sen" -> ((s, dir) =>
      EventsOps.theilSenTrend(t(s, dir, "events"))
        .orderBy("event_type")),


    // dedup — winnowing fingerprints (Dedup.winnowingFingerprints
    // scaladoc): MOSS's local-guarantee selection — every >= w+window-1
    // token verbatim run shares a fingerprint; scan-local array ops.
    "q207_winnowing" -> ((s, dir) =>
      Dedup.winnowingFingerprints(t(s, dir, "documents"), "doc_id",
          "text", w = 3, window = 4)
        .presentLargeBy("doc_id")),


    // dedup — candidate pairs from shared winnowing fingerprints
    // (Dedup.winnowingCandidatePairs scaladoc): the join the selection
    // feeds; fan-in bounded per fingerprint bucket.
    "q208_winnow_candidates" -> ((s, dir) =>
      Dedup.winnowingCandidatePairs(t(s, dir, "documents"), "doc_id",
          "text", w = 3, window = 4, minShared = 2)
        .presentLargeBy("id_a", "id_b")),


    // monitoring — per-group Spearman rank correlation
    // (Agg.spearmanCorr scaladoc): Pearson on average ranks with exact
    // doubled-integer rank sums; outlier-proof monotone association.
    "q209_spearman" -> ((s, dir) =>
      Agg.spearmanCorr(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),


    // layout — zone-map effectiveness audit (Layout.zoneMapAudit
    // scaladoc): measured skip ratios for natural vs single-sort vs
    // z-order layouts under date and partkey range predicates — the
    // numbers a 100 TB clustering decision is made from.
    "q210_zonemap_audit" -> ((s, dir) =>
      Layout.zoneMapAudit(t(s, dir, "lineitem"))
        .presentBy("layout", "predicate")),


    // entity resolution — multi-pass blocking union + one bounded
    // Levenshtein verify (Dedup.multiBlockFuzzyPairs scaladoc): closes
    // q97's documented single-pass recall limit; `passes` records which
    // block keys co-keyed each surviving pair.
    "q211_multiblock_pairs" -> ((s, dir) =>
      Dedup.multiBlockFuzzyPairs(
          t(s, dir, "part").select(col("p_name").as("name")).distinct(),
          "name", "name", maxDist = 3)
        .orderBy("id_a", "id_b")),


    // warehouse refresh — incremental aggregate maintenance
    // (Agg.incrementalMoments scaladoc): standing + delta moment STATES
    // merged by exact decimal addition == full recompute, never
    // rescanning the standing corpus (q135/q179's refresh contract for
    // plain aggregates).
    "q212_incr_agg_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Agg.incrementalMoments(
          li.where(col("l_orderkey") % 5 =!= 0),
          li.where(col("l_orderkey") % 5 === 0),
          "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    }),


    // graph — bounded k-core peel (Graph.kCorePeel scaladoc) over the
    // shared verified-pair artifact: the clique-like template clusters
    // minus the star tendrils, 3 peel rounds at k=2.
    "q213_kcore" -> ((s, dir) =>
      Graph.kCorePeel(
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2), k = 2, rounds = 3)
        .orderBy("doc_id")),


    // skew — exact join-size preflight from per-side key histograms
    // (Skew.joinSizePreflight scaladoc): the funnel join's output
    // cardinality and hottest users, costed before any join runs.
    "q214_join_preflight" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Skew.joinSizePreflight(
          ev.where(col("event_type") === "click"),
          ev.where(col("event_type") === "view"),
          "user_id", topK = 10)
    }),


    // profiling — functional-dependency audit (Agg.fdViolations
    // scaladoc): five candidate FDs across four tables, one verdict row
    // each — the key-trust check before any dimension join.
    "q215_fd_audit" -> ((s, dir) =>
      Agg.fdViolations(t(s, dir, "nation"),
          "nation.n_nationkey->n_regionkey", "n_nationkey", "n_regionkey")
        .unionAll(Agg.fdViolations(t(s, dir, "part"),
          "part.p_partkey->p_brand", "p_partkey", "p_brand"))
        .unionAll(Agg.fdViolations(t(s, dir, "part"),
          "part.p_type->p_size", "p_type", "p_size"))
        .unionAll(Agg.fdViolations(t(s, dir, "documents"),
          "documents.source->lang", "source", "lang"))
        .unionAll(Agg.fdViolations(t(s, dir, "orders"),
          "orders.o_custkey->o_orderpriority", "o_custkey",
          "o_orderpriority"))
        .orderBy("fd")),


    // feature engineering — bounded EWMA per user
    // (EventsOps.ewmaBounded scaladoc): alpha = 1/2 over the last 16
    // events; exact binary weights make the smoother engine-portable.
    "q216_ewma" -> ((s, dir) =>
      EventsOps.ewmaBounded(t(s, dir, "events"), depth = 16)
        .presentLargeBy("user_id", "event_id")),


    // curation — within-source quantile normalization
    // (Curate.quantileNormalize scaladoc): per-doc score -> empirical
    // percentile, the calibration before any cross-source threshold.
    "q217_quantile_norm" -> ((s, dir) =>
      Curate.quantileNormalize(t(s, dir, "documents"), "doc_id",
          "source", "n_chars")
        .presentLargeBy("doc_id")),


    // curation — largest-remainder mixture allocation
    // (Curate.mixtureAllocation scaladoc): a 1000-sample budget split
    // across sources by sqrt weighting, integer allocations summing to
    // the budget exactly.
    "q218_mixture_alloc" -> ((s, dir) =>
      Curate.mixtureAllocation(t(s, dir, "documents"), "source",
          target = 1000L)
        .orderBy("source")),


    // dedup policy — threshold tuning sweep (Dedup.thresholdSweep
    // scaladoc) over the shared verified-pair artifact: surviving pairs
    // and touched docs per candidate threshold, zero corpus scans.
    "q219_threshold_sweep" -> ((s, dir) =>
      Dedup.thresholdSweep(
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
        .orderBy("threshold")),


    // text analysis — per-term burstiness (Text.termBurstiness
    // scaladoc): variance-to-mean of within-doc tf from exact integer
    // power sums; content vs glue vocabulary without a stopword list.
    "q220_term_burstiness" -> ((s, dir) =>
      Text.termBurstiness(t(s, dir, "documents"), "doc_id", "text",
          minDf = 20, topK = 20)),


    // profiling — mutual information source×lang
    // (Agg.mutualInformation scaladoc): bits of dependence between the
    // two categoricals, the magnitude companion to q180's chi-square.
    "q221_mutual_info" -> ((s, dir) =>
      Agg.mutualInformation(t(s, dir, "documents"), "source", "lang")),


    // §2.1 source — raw text-log roundtrip (Sources.writeText/readText):
    // schema-on-read ingestion of newline-delimited log lines, parsed
    // with codegen'd regexp_extract at scan time — the format raw
    // 100 TB crawls arrive in, completing the CSV/JSONL/ORC/JDBC/text
    // source matrix. Lossless by construction: the aggregate over the
    // parsed read-back must hash-match the direct oracle.
    "q222_logparse_roundtrip" -> ((s, dir) => {
      val path = stagePath("q222", dir)
      Sources.writeText(
        t(s, dir, "documents").select(
          format_string("doc=%d src=%s lang=%s chars=%d",
            col("doc_id"), col("source"), col("lang"), col("n_chars"))
            .as("value")),
        path)
      val re = "doc=(\\d+) src=(\\S+) lang=(\\S+) chars=(\\d+)"
      Sources.readText(s, path)
        .select(
          regexp_extract(col("value"), re, 1).cast("long").as("doc_id"),
          regexp_extract(col("value"), re, 2).as("source"),
          regexp_extract(col("value"), re, 3).as("lang"),
          regexp_extract(col("value"), re, 4).cast("long").as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    }),


    // curation — quality-vs-duplication calibration curve: the q134
    // scorer's value-binned reliability diagram against pair-graph
    // membership — does low model-scored quality actually co-occur with
    // near-duplication? Buckets are score-value bins (scan-local, no
    // global window); dup flag is one broadcast-ish join against the
    // pair artifact's endpoints; mean score via exact decimal sums.
    "q223_quality_dup_calibration" -> ((s, dir) => {
      val q = Curate.ngramQualityScore(t(s, dir, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), col("quality_score"))
      val pairs = Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
        minJaccard = 0.2)
      val dup = pairs.select(col("id_a").as("doc_id"))
        .unionAll(pairs.select(col("id_b").as("doc_id")))
        .distinct().withColumn("is_dup", lit(true))
      q.join(dup, Seq("doc_id"), "left")
        .select(
          least(floor(col("quality_score") * 10), lit(9.0)).cast("int")
            .as("bucket"),
          col("quality_score").cast("decimal(18,6)").as("qd"),
          coalesce(col("is_dup"), lit(false)).as("is_dup"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
          sum(col("qd")).as("sq"))
        .select(col("bucket"), col("n_docs"), col("n_dup"),
          Num.floorAt(
            col("n_dup").cast("double") / col("n_docs"), 6)
            .as("dup_rate"),
          Num.floorAt(
            col("sq").cast("double") / col("n_docs"), 6)
            .as("mean_score"))
        .orderBy("bucket")
    }),


    // retrieval — frequent-phrase mining + exact posting lookup
    // (Text.phrasePostings scaladoc): top phrases by corpus count,
    // each with its top documents by within-doc occurrences — phrase
    // search as ONE posting key instead of a corpus regex scan.
    "q224_phrase_postings" -> ((s, dir) =>
      Text.phrasePostings(t(s, dir, "documents"), "doc_id", "text",
          w = 3, topK = 3, docsPerPhrase = 10)
        .orderBy("phrase", "rk")),


    // ML ops — temporal split + leakage audit (EventsOps.temporalSplit
    // scaladoc): hold out the last 20% of the event-time range, count
    // the users whose history straddles the cutoff.
    "q225_temporal_split" -> ((s, dir) =>
      EventsOps.temporalSplit(t(s, dir, "events"), testPct = 20)),


    // dedup methodology — MinHash estimator calibration
    // (Dedup.minhashCalibration scaladoc): estimate level vs exact
    // Jaccard over the verified pair artifact; validates the S-curve
    // assumption planBands plans from, via exact integer error sums.
    "q226_minhash_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "text", k = 8)
        .orderBy("est_matches")),


    // entity resolution — transitive entity clusters over the q211
    // multi-pass pair graph (componentsConverged on string ids: min
    // label is lexicographic): the canonical-entity assignment record
    // linkage ends with, plus cluster sizes from a component-keyed
    // window.
    "q227_entity_clusters" -> ((s, dir) => {
      val names = t(s, dir, "part")
        .select(col("p_name").as("name")).distinct()
      val comp = Dedup.componentsConverged(
        Dedup.multiBlockFuzzyPairs(names, "name", "name", maxDist = 3))
      comp.select(col("doc_id").as("name"),
          col("component").as("entity"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("entity")))
        .presentLargeBy("name")
    }),


    // north star — MEASURED ANN recall (the q155 contract applied to
    // the ANN family): IVF (q41's own-cell probe) and sign-LSH (q43's
    // buckets) top-5 against q40's brute-force ground truth — exact
    // integer hit counts, realized recall per method instead of the
    // expected-recall formula Sim.scala cites.
    "q228_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      // tiny (50-row) truth frame, three consumers: materialize once
      val truth = Sim.topK(q, emb, 5).select(col("q_id"), col("c_id"))
        .withColumn("__hit", lit(true)).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      def eval(method: String,
               approx: org.apache.spark.sql.DataFrame) =
        approx.select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          // coalesce: sum over ZERO approx rows is NULL, the oracle's
          // COUNT(b.q_id) is 0 — e.g. every query alone in its bucket
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
              .as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(method).as("method"), col("n_truth"),
            col("n_approx"), col("n_hits"),
            when(col("n_truth") === 0, lit(1.0)).otherwise(
              Num.floorAt(col("n_hits").cast("double") /
                col("n_truth"), 4)).as("recall"))
      // the real coarse quantizer next to the label stand-in: q125's
      // deterministic kmeans (k=8, 2 iters) assigns the cells, own-cell
      // probe — the oracle replays the identical quantizer (kmeansAfCte)
      val km = Sim.kmeansCellsCached(emb, 8, 2, dir).localCheckpoint()
      eval("ivf", Sim.topKIvf(q, emb, 5, "label"))
        .unionByName(eval("ivf_kmeans",
          Sim.topKIvf(km.where(col("vec_id") < 10), km, 5, "cell")))
        .unionByName(eval("lsh", Sim.topKLsh(q, emb, 5, bits = 4)))
        .orderBy("method")
    }),


    // north star — multi-probe IVF recall sweep (Sim.ivfRecallSweep
    // scaladoc): realized recall@5 vs brute truth for probes = 1..3
    // over centroid-ranked label cells — q228 names the single-probe
    // recall loss; this measures the knob that buys it back.
    "q229_ivf_multiprobe" -> ((s, dir) =>
      Sim.ivfRecallSweep(
          t(s, dir, "embeddings").where(col("vec_id") < 10),
          t(s, dir, "embeddings"), 5, "label", maxProbes = 3)
        .orderBy("probes")),


    // north star — sign-LSH bits sweep (the bits knob next to q229's
    // probes knob): realized recall@5 vs brute truth for 2/4/6
    // hyperplanes — more bits = smaller buckets = cheaper probes AND
    // lower same-bucket recall; this query puts measured numbers on
    // that trade so a user sizes `bits` from data, not intuition.
    "q231_lsh_bits_sweep" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      val truth = Sim.topK(q, emb, 5).select(col("q_id"), col("c_id"))
        .withColumn("__hit", lit(true)).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      Seq(2, 4, 6).map { bits =>
        Sim.topKLsh(q, emb, 5, bits = bits)
          .select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
              .as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(bits).as("bits"), col("n_truth"),
            col("n_approx"), col("n_hits"),
            when(col("n_truth") === 0, lit(1.0)).otherwise(
              Num.floorAt(col("n_hits").cast("double") /
                col("n_truth"), 4)).as("recall"))
      }.reduce(_ unionByName _).orderBy("bits")
    }),


    // monitoring — the DISTRIBUTED-exact Spearman engine
    // (Agg.spearmanCorrDomain scaladoc), pinned to q209's oracle: same
    // doubled-average-rank arithmetic from domain windows + two
    // joint-domain hash joins, for the few-giant-groups inputs where
    // q209's per-key window serializes (the CC-family pattern: one
    // oracle, engine per scale regime).
    "q230_spearman_domain" -> ((s, dir) =>
      Agg.spearmanCorrDomain(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),


    // north star — OR-amplified sign-LSH recall sweep (Sim.topKLsh
    // scaladoc; Gionis/Indyk/Motwani 1999): realized recall@5 vs brute
    // truth for L = 1/2/4 independent hyperplane tables at bits = 4 —
    // q231 measured the bits knob only trading recall DOWN (0.18 best
    // at 4 bits); this measures the knob that buys it back at ~L×
    // candidate cost. The L = 1 row IS q231's bits = 4 row (same
    // planes), pinning the two sweeps together.
    "q232_lsh_tables_sweep" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      val truth = Sim.topK(q, emb, 5).select(col("q_id"), col("c_id"))
        .withColumn("__hit", lit(true)).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      Seq(1, 2, 4).map { tbls =>
        Sim.topKLsh(q, emb, 5, bits = 4, tables = tbls)
          .select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
              .as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(tbls).as("tables"), col("n_truth"),
            col("n_approx"), col("n_hits"),
            when(col("n_truth") === 0, lit(1.0)).otherwise(
              Num.floorAt(col("n_hits").cast("double") /
                col("n_truth"), 4)).as("recall"))
      }.reduce(_ unionByName _).orderBy("tables")
    }),


    // monitoring — AUTO-dispatched Spearman (Agg.spearmanEngine
    // scaladoc), pinned to q209/q230's oracle: the preflight is
    // TWO-dimensional (r14, shipping the round-10 ScaleProbe
    // finding) — group cardinality AND tie density. lineitem's
    // 3-value l_returnflag is few-giant-groups, but its near-unique
    // l_extendedprice puts the tie ratio at 0.54, so the router picks
    // the WINDOWED engine (measured 1.48 s vs the domain engine's
    // 3.23 s at sf0.1); the domain engine is reserved for the
    // tie-heavy regime where it measured 13.7x better. Output is
    // bit-identical to both siblings by construction — THREE queries,
    // ONE oracle string.
    "q233_spearman_auto" -> ((s, dir) =>
      Agg.spearmanAuto(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // streaming — the tumbling-counts STREAMING engine, oracle-gated
    // (StreamOps.runToCompleteTable scaladoc): the events fixture is
    // staged as 3 files and replayed as 3 micro-batches
    // (maxFilesPerTrigger = 1), the windowed aggregation accumulates
    // across the batch boundaries in complete mode, and the FINAL
    // streaming state — not a batch recomputation — is compared to
    // q60's oracle string. Upgrades the streaming family from
    // "spec'd, no oracle by nature" to oracle-checked: stream ≡ batch
    // is now a driver-gated hash equality.
    // (Round 12: every streaming gate executes inside ONE combined
    // family run — concurrent queries on one session, memoized per
    // fixture per JVM; StreamOps "gate-FAMILY consolidation" scaladoc.
    // Per-gate engine parameters live in StreamOps.eventGates /
    // docsGates; each entry here reads its own engine's output, so
    // every oracle binding below is unchanged.)
    "q235_stream_tumbling" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q235_stream_tumbling")
        .orderBy("window_start", "event_type")),

    // streaming — SLIDING windows complete the gated window matrix
    // (q235 gates tumbling): size 7200 / slide 3600, so every event
    // lands in TWO windows and adjacent windows overlap across
    // micro-batch boundaries; the streaming engine's complete-mode
    // final state is bound to q61's batch oracle string — one oracle,
    // two sliding engines (batch window-set explode + streaming
    // window()).
    "q259_stream_sliding" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q259_stream_sliding")
        .where(col("window_start") >= 0)
        .orderBy("window_start", "event_type")),

    // streaming — gap sessions via the streaming session_window engine,
    // complete mode, same 3-micro-batch arrival; sessions that SPAN a
    // micro-batch boundary must merge in state to match q67's batch
    // oracle — the exact semantics a one-batch run would not exercise.
    // The lateness tolerance is effectively unbounded here ON PURPOSE:
    // session aggregation drops watermark-late input rows even in
    // complete mode (unlike plain windowed aggs, q235), and the staged
    // files arrive in arbitrary ts order — a real watermark would
    // silently shed ~half the fixture and the gate would compare
    // different inputs, not different engines. Production deployments
    // bound lateness; a bounded REPLAY that must equal batch cannot.
    "q236_stream_sessions" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q236_stream_sessions")
        .orderBy("user_id", "session_start")),

    // text — BPE merge trainer (Bpe.scala scaladoc): 12 greedy merge
    // iterations over the word-frequency dictionary; the corpus is
    // scanned ONCE, every iteration is vocabulary-sized, one argmax row
    // per iteration reaches the driver. The oracle unrolls the same 12
    // iterations as materialized CTE stages (q137's pagerank pattern).
    "q237_bpe_train" -> ((s, dir) =>
      graft.ops.Bpe.train(t(s, dir, "documents"), "text", merges = 12,
        cacheKey = Some(dir))),

    // text — the IN-MEMORY dictionary BPE trainer (Bpe.trainLocal
    // scaladoc): the 32k-merge path — one distributed dictionary
    // aggregation, then every merge an in-memory pair-stats update
    // instead of a Spark job. Bound to the SAME oracle string as q237:
    // one oracle, two trainers, divergence impossible.
    "q257_bpe_train_local" -> ((s, dir) =>
      graft.ops.Bpe.trainLocal(t(s, dir, "documents"), "text",
        merges = 12)),

    // text — BPE encoder: per-document subword token accounting under
    // the 12-merge vocabulary; the corpus joins the merged dictionary
    // by BROADCAST (vocab MBs vs corpus TBs), no merge re-runs per
    // occurrence.
    "q238_bpe_encode" -> ((s, dir) =>
      graft.ops.Bpe.encodeStats(t(s, dir, "documents"), "doc_id", "text",
        merges = 12, cacheKey = Some(dir))),

    // streaming — the dedup engine oracle-gated: exact distinct over a
    // key projection via dropDuplicatesWithinWatermark, append mode,
    // same 3-micro-batch arrival. Projecting to the key columns BEFORE
    // dedup makes the winner row == the key itself, so arrival order
    // (nondeterministic within a batch) cannot leak into the output;
    // the unbounded lateness declaration makes the bounded replay an
    // exact distinct (state never evicts), which is what the batch
    // oracle computes. Cross-batch duplicates are the point: a key seen
    // in batch 1 must suppress its batch-3 twin from STATE.
    "q239_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q239_stream_dedup")
        .orderBy("user_id", "event_type")),

    // streaming — the CUSTOM-STATE engine (flatMapGroupsWithState +
    // event-time timeout) on the SAME session oracle as q67/q236:
    // one oracle string, THREE engines (batch gaps-and-islands window,
    // streaming session_window, hand-rolled GroupState). Time-ordered
    // staging keeps every row inside the 30-minute watermark; two
    // flush sentinels make the bounded replay emit the per-user tail
    // sessions through the REAL timeout path (StreamOps
    // .stageEventsOrdered scaladoc). session_end aligns to the
    // oracle's MAX(es)+gap form here, not in the engine — the engine
    // emits last-event time, the production-truthful shape.
    "q240_stream_stateful_sessions" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q240_stream_stateful_sessions")
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"),
          (col("session_end") + 1800L).as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")),

    // streaming — the stream-stream INNER join engine oracle-gated:
    // two INDEPENDENT streams over the same staged files (separate
    // file-source progress — micro-batches pair arbitrarily between
    // sides), unbounded lateness so state never evicts; every
    // cross-batch pair must match from RETAINED state to reproduce the
    // batch self-join bit-for-bit.
    // 2 replay files per side: the r10-advice minimum that still
    // forces cross-batch pairs from retained state (one real batch
    // boundary; q245/q266 keep 3+ for the multi-boundary claim)
    "q241_stream_join" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q241_stream_join")
        .orderBy("user_id", "l_id", "r_id")),

    // streaming — the stream-stream LEFT OUTER join engine, as the
    // attribution shape from its scaladoc: purchases left-joined to the
    // user's clicks in the preceding 900 s (15 of 1981 purchases match
    // at sf0.01 — the NULL-padded rows dominate and are the tested
    // behavior). Nulls may only emit once the watermark PROVES no
    // partner can arrive, so this gate runs under a REAL 30-minute
    // watermark with time-ordered staging (no row ever late) and two
    // flush sentinels. The side filters sit UPSTREAM of the watermark
    // operators, which is why staging writes one sentinel row per
    // event_type (stageEventsOrdered scaladoc): a wrong-type sentinel
    // would be filtered out before the watermark node and strand the
    // tail nulls forever — measured as exactly the last-2700s
    // purchases missing.
    "q242_stream_left_join" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q242_stream_left_join")
        .where(col("user_id") >= 0)
        .orderBy("user_id", "l_id", "r_id")),

    // ANN — MMR diversified re-ranking (Sim.mmrTopK scaladoc): greedy
    // top-5 at λ=0.7 over the q40 query set; each pick penalized by its
    // max cosine to what is already picked. One lazy DAG, zero driver
    // actions; the oracle unrolls the same 5 greedy rounds.
    "q244_mmr_rerank" -> ((s, dir) =>
      Sim.mmrTopK(
        t(s, dir, "embeddings").where(col("vec_id") < 10),
        t(s, dir, "embeddings"), k = 5, lambda = 0.7)
        .orderBy("q_id", "rk")),

    // streaming — the idempotent SINK oracle-gated: the fixture is
    // staged twice (every row arrives in two different micro-batches)
    // and replayed through the foreachBatch upsert-ignore parquet sink;
    // the target must hold every row exactly ONCE — the effectively-
    // once append contract of the reference's INSERT IGNORE fact load,
    // driven through the real streaming write path.
    "q243_stream_upsert_sink" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q243_stream_upsert_sink")
        .select(col("event_id"), unix_timestamp(col("ts")).as("es"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id")),

    // streaming — the PARTITION-PRUNED upsert sink (StreamOps
    // .upsertIgnoreSinkPartitioned scaladoc): the scale path q243's
    // demo sink documents — target partitioned by event date, each
    // micro-batch anti-joins only the date slices its own rows touch.
    // Same duplicated staging, same exactly-once target contract,
    // bound to q243's IDENTICAL oracle string — one oracle, two sinks.
    "q261_stream_upsert_partitioned" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q261_stream_upsert_partitioned")
        .select(col("event_id"), unix_timestamp(col("ts")).as("es"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id")),

    // streaming — the incremental-CC STORE oracle-gated: the documents
    // fixture replayed as 3 micro-batches straight through the
    // versioned fold (delta pairs + contracted CC per batch, no
    // admission filter), final committed labels bound to the SAME
    // oracle string as q128/q130/q140 — one oracle, FOUR connected-
    // components engines (fixpoint, big-star, incremental batch,
    // streaming store).
    "q245_stream_cc_store" -> ((s, dir) =>
      graft.streaming.StreamOps.docsGateResult(s, dir,
          "q245_stream_cc_store")
        .orderBy("doc_id")),

    // streaming — TAKEDOWN on the versioned CC store (r17, closing the
    // q245 lifecycle: the store had appends only;
    // StreamOps.ccTakedownGate scaladoc): the takedown slice
    // (doc_id%7=3) replays as 3 REAL micro-batches, each committing a
    // store version whose labels re-fold ONLY the components a
    // deleted doc touched (q319's incremental contraction inside the
    // commit protocol — touched survivors re-pair through the banded
    // chain, untouched labels byte-identical from the previous
    // version). Head labels bound to the CC oracle string over the
    // SURVIVING corpus — streaming takedown ≡ batch rebuild for the
    // label store, the q320 discipline on the artifact side.
    "q325_stream_cc_takedown" -> ((s, dir) =>
      graft.streaming.StreamOps.docsGateResult(s, dir,
          "q325_stream_cc_takedown")
        .orderBy("doc_id")),

    // text — tokenizer fertility by language (Bpe.fertilityByGroup
    // scaladoc): chars-per-token and tokens-per-word under the 12-merge
    // vocabulary, per lang — which languages the mixed-corpus tokenizer
    // serves badly.
    "q249_bpe_fertility" -> ((s, dir) =>
      graft.ops.Bpe.fertilityByGroup(t(s, dir, "documents"), "lang",
        "text", merges = 12, cacheKey = Some(dir))),

    // streaming — FULL OUTER completes the gated join matrix: purchases
    // ⟗ clicks, so unmatched rows on BOTH sides must release null-
    // padded (each side's state against the OTHER side's watermark).
    // Same ordered staging + per-type sentinels as q242.
    "q248_stream_full_join" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q248_stream_full_join")
        .where(col("user_id") >= 0)
        .orderBy("user_id", "l_id", "r_id")),

    // streaming — the stream-STATIC enrich engine under the same
    // 3-micro-batch replay: each arriving batch broadcast-joins the
    // surrogate-key dimension (Star.dim over the static fixture —
    // re-resolved per batch, the engine's refresh contract), then a
    // complete-mode aggregation accumulates per dim key. Gating the
    // aggregate OVER the join proves enriched-stream ≡ enriched-batch
    // across batch boundaries (q13/q14's star shape, streaming side).
    "q251_stream_static_enrich" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q251_stream_static_enrich")
        .orderBy("type_id")),

    // ANN — product quantization with measured recall (Sim.pqCodebooks /
    // pqTopK scaladoc; Jégou et al. 2011): 64 dims × 4 B compress to 4
    // one-byte codes (the raw_bytes/code_bytes columns carry the 64×
    // headline), and the ADC and SDC retrievers are scored against exact
    // L2 brute truth — the storage-side cell of the measured-ANN matrix
    // q228 (quantizer), q229 (probes), q231/q232 (LSH knobs) built.
    "q252_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      val books = Sim.pqCodebooksCached(emb, m = 4, k = 8, iters = 2, dir)
      val truth = Sim.topKL2(q, emb, 5).select(col("q_id"), col("c_id"))
        .withColumn("__hit", lit(true)).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      def eval(method: String, approx: DataFrame) =
        approx.select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
              .as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(method).as("method"), col("n_truth"),
            col("n_approx"), col("n_hits"),
            when(col("n_truth") === 0, lit(1.0)).otherwise(
              Num.floorAt(col("n_hits").cast("double") /
                col("n_truth"), 4)).as("recall"),
            lit(4).as("code_bytes"), lit(256).as("raw_bytes"))
      eval("pq_adc", Sim.pqTopK(q, emb, books, 5))
        .unionByName(
          eval("pq_sdc", Sim.pqTopK(q, emb, books, 5, symmetric = true)))
        .orderBy("method")
    }),

    // ANN — IVF-ADC composition (Sim.ivfAdcRecallSweep scaladoc; Jégou
    // et al. 2011 §IV "IVFADC"): the PQ-code scan runs WITHIN the
    // multi-probe cell candidate set — candidates bounded per cell by
    // the probes knob (q229's axis), bytes-per-candidate bounded at m
    // codes (q252's axis). The only ANN layout where neither raw
    // vectors nor a flat code scan must fit the scan budget at 100 TB.
    // Recall@5 vs exact-L2 brute truth for p = 1..3.
    "q254_ivf_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.ivfAdcRecallSweep(emb.where(col("vec_id") < 10), emb,
          Sim.pqCodebooksCached(emb, m = 4, k = 8, iters = 2, dir),
          5, "label",
          maxProbes = 3)
        .orderBy("probes")
    }),

    // ANN — IVF-ADC over the REAL coarse quantizer (the q228
    // label-vs-kmeans pairing applied to the composed shape): q125's
    // deterministic k-means assigns the cells, the PQ codes scan within
    // the multi-probe kmeans cells — the full Jégou §IV stack with no
    // label stand-in anywhere. Oracle replays quantizer + chains +
    // probe policy end-to-end.
    "q260_ivf_adc_kmeans" -> ((s, dir) => {
      // the PHYSICAL index (AnnIndex scaladoc): postings + codebooks
      // read from the parquet store — one training publishes it, every
      // consumer (and every restart) reads bytes
      val km = graft.ops.AnnIndex.cells(s, dir)
      Sim.ivfAdcRecallSweep(km.where(col("vec_id") < 10), km,
          graft.ops.AnnIndex.books(s, dir),
          5, "cell", maxProbes = 3)
        .presentBy("probes")
    }),

    // ANN — IVF-ADC with EXACT re-ranking (Sim.ivfAdcRerankSweep
    // scaladoc; Jégou et al. 2011 §V "IVFADC-R"): the ADC scan keeps a
    // per-query R-candidate shortlist, only those R raw vectors are
    // fetched (id-keyed join, never a scan) and re-scored with exact
    // L2. One measured row per R at fixed probes=2 — composes with
    // q254's probes axis; recall climbs toward the cell-bounded exact
    // scan at R distances/query of exact cost.
    "q258_ivf_adc_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.ivfAdcRerankSweep(emb.where(col("vec_id") < 10), emb,
          Sim.pqCodebooksCached(emb, m = 4, k = 8, iters = 2, dir),
          5, "label", probes = 2, rs = Seq(5, 10, 20))
        .presentBy("rerank_r")
    }),

    // ANN — PQ knob sweep (the q229/q232 extension discipline applied
    // to q252's 64×-compression headline): the m/k axis (m=8, k=16 —
    // 8 code bytes, 32× compression) and the training axis (iters=0 —
    // raw seed codebooks, zero Lloyd rounds) next to q252's m=4/k=8/
    // iters=2 rows, each ADC recall@5 against the same exact-L2 truth —
    // the compression headline carries its measured recall cost curve.
    "q255_pq_knobs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      val truth = Sim.topKL2(q, emb, 5).select(col("q_id"), col("c_id"))
        .withColumn("__hit", lit(true)).localCheckpoint()
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      def eval(method: String, approx: DataFrame, codeBytes: Int) =
        approx.select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left")
          .agg(count(lit(1)).as("n_approx"),
            coalesce(sum(when(col("__hit"), 1L).otherwise(0L)), lit(0L))
              .as("n_hits"))
          .crossJoin(broadcast(nT))
          .select(lit(method).as("method"), col("n_truth"),
            col("n_approx"), col("n_hits"),
            when(col("n_truth") === 0, lit(1.0)).otherwise(
              Num.floorAt(col("n_hits").cast("double") /
                col("n_truth"), 4)).as("recall"),
            lit(codeBytes).as("code_bytes"), lit(256).as("raw_bytes"))
      eval("adc_m4k8_i0",
          Sim.pqTopK(q, emb,
            Sim.pqCodebooksCached(emb, m = 4, k = 8, iters = 0, dir),
            5), 4)
        .unionByName(eval("adc_m8k16_i2",
          Sim.pqTopK(q, emb,
            Sim.pqCodebooksCached(emb, m = 8, k = 16, iters = 2, dir),
            5), 8))
        .orderBy("method")
    }),

    // ANN — position-weighted retrieval quality (Sim.retrievalMetrics
    // scaladoc): MRR@5 and nDCG@5 as exact 1e6-scaled integers for the
    // brute anchor (must score exactly 1e6/1e6), the real-kmeans IVF,
    // and the OR-amplified 4-table sign-LSH — q228 measures IF the
    // retrievers find the truth; this measures WHERE they put it.
    "q247_retrieval_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
      // checkpointed: truth is consumed twice (relevance labels AND
      // the calibration-anchor run) — without this the brute cross
      // join runs twice per execution
      val truth = Sim.topK(q, emb, 5).localCheckpoint()
      val km = graft.ops.AnnIndex.cells(s, dir)
      Sim.retrievalMetrics(truth, 5,
        "brute" -> truth,
        "ivf_kmeans" -> Sim.topKIvf(km.where(col("vec_id") < 10), km, 5,
          "cell"),
        "lsh4" -> Sim.topKLsh(q, emb, 5, bits = 4, tables = 4))
    }),

    // layout — small-files compaction (Layout.compactPartitioned
    // scaladoc): fragment documents into 8 files per lang partition,
    // compact to 1, and aggregate the COMPACTED dataset against the
    // source-table oracle — the rewrite must be content-preserving.
    // LayoutSpec asserts the file-count contract the oracle can't see.
    "q246_compaction" -> ((s, dir) => {
      val base = graft.TempDirs.register(stagePath("q246", dir))
      Tables.load(s, dir, "documents")
        .repartition(8)
        .write.mode("overwrite").partitionBy("lang")
        .parquet(base + "/frag")
      graft.ops.Layout.compactPartitioned(s, base + "/frag",
        base + "/compact", Seq("lang"), maxRecordsPerFile = 1000000L)
      graft.ops.StoreRead.parquet(s, base + "/compact")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    // streaming — the PSI drift monitor DRIVER-GATED (StreamOps
    // .runPsiMonitorGate scaladoc): previously spec-only because
    // per-batch rows depended on the physical file split; day-bucket
    // staging makes batch b's membership a deterministic function of
    // the data (day index mod buckets), so every per-batch PSI row is
    // oracle-replayable. Closes the last non-gated deterministic
    // streaming engine (near-dup admission stays spec-gated: its winner
    // identity is arrival-order-dependent by design).
    "q264_stream_psi" -> ((s, dir) =>
      graft.streaming.StreamOps.eventGateResult(s, dir,
          "q264_stream_psi")
        .select(col("batch_id"), col("n_events"), col("psi"),
          col("drifted"))
        .orderBy("batch_id")),

    // load — full MERGE / SCD1 upsert-update (Star.merge scaladoc): the
    // third load primitive next to insert-only (q23) and surrogate-dim
    // upsert (q24): matched keys take the incoming row's values
    // (UPDATE *), unmatched incoming rows insert, unmatched existing
    // rows survive — one full-outer join + presence-gated per-column
    // selection (NOT coalesce: incoming NULLs must overwrite).
    "q263_merge_scd1" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      Star.merge(
          ev.where(col("event_id") % 3 =!= 0),
          ev.where(col("event_id") % 2 === 0)
            .withColumn("event_type", lit("merged"))
            .withColumn("value", col("value") * 2),
          Seq("event_id"))
        .presentLargeBy("event_id")
    }),

    // statistics — deterministic Poisson-bootstrap CI for the group
    // mean (Agg.bootstrapMeanCi scaladoc; Efron 1979 / Chamandy 2012):
    // 40 resamples ride ONE scan via md5-derived pseudo-Poisson(1)
    // weights, CI = rank-2 order statistics of the replicate means —
    // fully deterministic, so the uncertainty estimate itself is
    // oracle-checked, not just the point estimate.
    "q265_bootstrap_ci" -> ((s, dir) =>
      Agg.bootstrapMeanCi(t(s, dir, "events"), "event_type", "event_id",
          "value")
        .orderBy("event_type")),

    // streaming — the ADMISSION engine oracle-gated at last (the one
    // streaming engine that stayed spec-gated through round 10): the
    // documents fixture replayed as 3 micro-batches through
    // streamingNearDupFilter; the emitted sig_key set must equal the
    // batch signature-distinct (the q135 `sig` CTE — one fragment, two
    // engines). Key-projected emission (the q239 discipline) so
    // within-batch winner choice cannot leak; cross-batch twins must
    // suppress from STATE.
    "q266_stream_neardup_admission" -> ((s, dir) =>
      graft.streaming.StreamOps.docsGateResult(s, dir,
          "q266_stream_neardup_admission")
        .orderBy("sig_key")),

    // ANN — Johnson-Lindenstrauss dimensionality reduction with
    // measured recall (Sim.jlRecallSweep scaladoc; Achlioptas 2003):
    // the data-INDEPENDENT axis of the compression/recall trade next
    // to PQ's trained codes (q252/q255) — brute top-5 in the ±1-sign
    // projected space at out_dim 8/16/32/64 vs q40's exact truth, the
    // sign matrix md5-derived so the oracle regenerates it verbatim.
    // Measured on this corpus: 0.04/0.08/0.12/0.24 — the fixture's
    // neighbor margins (~0.01-0.04 cosine) sit far below the ±1 map's
    // distortion, so the UNTRAINED projection loses the ranking that
    // PQ's trained 16-byte codes keep (q252) — which is the point: the
    // sweep is the evidence for choosing trained compression here.
    "q267_jl_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.jlRecallSweep(emb.where(col("vec_id") < 10), emb, 5,
          Seq(8, 16, 32, 64))
        .orderBy("out_dim")
    }),

    // artifact store — TIME-TRAVEL read (StreamOps.ccLabelsAsOf): the
    // incremental-CC store's labels AS OF version 1 of a 3-bucket
    // deterministic fold must equal batch CC over buckets 0-1 — the
    // version's admitted prefix, replayed by the SAME q128/q130/q140/
    // q245 oracle chain restricted to doc_id % 3 <= 1. History is
    // auditable lineage, not a cache: the store's past is the fold's
    // prefix bit-for-bit.
    "q270_cc_asof" -> ((s, dir) =>
      graft.streaming.StreamOps.runCCAsOfGate(s, dir, buckets = 3,
          asOf = 1)
        .orderBy("doc_id")),

    // embeddings — top principal component (Sim.pcaTopComponent
    // scaladoc): one decimal-exact moment pass, driver-sized power
    // iteration (8 iterations from v0 = ones), the oracle replaying
    // BOTH — the covariance as the same DECIMAL(27,10) aggregation and
    // the eigensolve as 8 unrolled materialized SQL stages with
    // identical FP sequencing. The trained linear map the JL sweep
    // (q267) measures the absence of.
    "q268_pca_power" -> ((s, dir) =>
      Sim.pcaTopComponent(t(s, dir, "embeddings"))
        .orderBy("dim_pos")),

    // embeddings — top-r components by Hotelling deflation over the
    // SAME single moment pass (Sim.pcaTopComponents scaladoc): the
    // SemDeDup-style r-component basis. The oracle unrolls r×iters
    // power-iteration stages PLUS the deflation updates
    // C_{k+1} = C_k − (v·vᵀ)·λ with the engine's exact FP sequencing
    // (the outer product commutes, then one shared ·λ, keeping the
    // replayed matrix bit-symmetric); component 1 is bit-identical to
    // q268's output by construction.
    "q275_pca_topr" -> ((s, dir) =>
      Sim.pcaTopComponents(t(s, dir, "embeddings"), r = 4)
        .orderBy("comp", "dim_pos")),


    // ANN/retrieval — hybrid lexical+dense fusion (Sim.hybridRrf
    // scaladoc): documents < 10 run as their own queries through BOTH
    // retrievers (BM25 postings, brute cosine on the aligned
    // embeddings) and Reciprocal Rank Fusion merges the two top-20
    // lists — 1/(60+rank) summed, no score calibration — into a fused
    // top-5. The production lexical+vector search pattern over the
    // repo's existing retriever pair.
    "q279_hybrid_rrf" -> ((s, dir) =>
      Sim.hybridRrf(t(s, dir, "documents"), t(s, dir, "embeddings"),
          cacheKey = Some(dir),
          lexStore = Some(graft.ops.LexIndex.frames(s, dir)))
        .orderBy("q_id", "rk")),


    // ANN — frozen-quantizer index append (Sim.ivfFrozenAppend
    // scaladoc): the IVF maintenance path — quantizer trained ONCE on
    // the standing 80% (vec_id % 5 != 0, the same deterministic Lloyd's
    // the IVF/SemDeDup family shares), the 20% delta assigned under
    // FROZEN centroids so standing postings never move; per-cell
    // base/delta posting counts + integer-exact floored-cosine sums,
    // the retrain-decision monitor.
    "q280_ivf_frozen_append" -> ((s, dir) =>
      // the frozen quantizer comes from the PHYSICAL store (AnnIndex
      // "base" tag — trained once on the standing slice, published to
      // parquet, durable across restarts), not a per-JVM memo
      Sim.ivfFrozenAppendStored(t(s, dir, "embeddings"),
          isDelta = Sim.frozenDeltaSplit,
          cents = graft.ops.AnnIndex.centroids(s, dir, "base"), k = 8)
        .orderBy("cell")),


    // streaming — the q280 maintenance path as a REAL ingest: the
    // delta slice replayed as 3 micro-batches through a frozen-
    // quantizer foreachBatch append sink (StreamOps.ivfAppendGate
    // scaladoc); committed postings + the frozen base assignment
    // summarize to the SAME oracle string as q280 — batch and
    // streaming append are one operator.
    "q282_stream_ivf_append" -> ((s, dir) =>
      graft.streaming.StreamOps.docsGateResult(s, dir,
          "q282_stream_ivf_append")
        .orderBy("cell")),


    // ANN — STREAMING auto-compaction (r17; q332's dense twin,
    // StreamOps.ivfAutoCompactGate scaladoc): the streamed frozen-
    // quantizer ingest with the q324 segment-count rule inside every
    // commit — crossing 4 segments makes that commit union the
    // streamed tail into one merged segment and retire the
    // micro-segments. Serves q299's exact top-5 contract from
    // [standing, merged]; the layout label derives from the store's
    // physical end state, so the oracle's pinned 'tiered' gates the
    // in-commit compaction, and the rows stay bound to the q299
    // serving string.
    "q333_stream_ann_auto_compact" -> ((s, dir) =>
      graft.streaming.StreamOps.docsGateResult(s, dir,
          "q333_stream_ann_auto_compact")
        .orderBy("q_id", "rk")),


    // ANN/retrieval — the PRODUCTION-armed hybrid (Sim.hybridRrfIvfAdc
    // scaladoc): q279's exact lexical arm + RRF fusion with the dense
    // arm swapped from the brute scan to the real index — BM25 ⊕
    // IVF-ADC over the deterministic kmeans cells and the m=4/k=8 PQ
    // codebooks (the full Jégou §IV stack INSIDE the fusion). The
    // oracle replays quantizer + PQ chains + probe policy + ADC
    // ranking + BM25 + fusion end-to-end (the q260 discipline).
    "q287_hybrid_rrf_ivfadc" -> ((s, dir) => {
      // the dense arm serves from the STORED index end-to-end: corpus
      // side = the (vec_id, cell, codes) postings (m bytes/candidate,
      // raw vectors never leave the store), probe geometry = the
      // stored per-cell means; only the query batch carries vectors
      val km = graft.ops.AnnIndex.cells(s, dir)
      Sim.hybridRrfIvfAdc(t(s, dir, "documents"), km,
          graft.ops.AnnIndex.books(s, dir), cacheKey = Some(dir),
          coded = Some((graft.ops.AnnIndex.codes(s, dir),
            graft.ops.AnnIndex.probeCentroids(s, dir))),
          lexStore = Some(graft.ops.LexIndex.frames(s, dir)))
        .orderBy("q_id", "rk")
    }),


    // ANN/retrieval — fused recall (Sim.hybridFusedRecall scaladoc):
    // the q247/q254 measured-recall contract applied to FUSION — the
    // IVF-ADC-armed hybrid's fused top-5 (q287's engine) hit-counted
    // against the brute-armed fused truth (q279's engine), both
    // fusions over ONE materialized BM25 arm, exact integer counting,
    // recall floored 4 dp. The number a search team reads before
    // shipping the indexed arm: what the index costs IN THE FUSION,
    // not in isolation (q254/q260 measure the dense arm alone).
    "q288_fused_recall" -> ((s, dir) => {
      val km = graft.ops.AnnIndex.cells(s, dir)
      Sim.hybridFusedRecall(t(s, dir, "documents"), km,
        graft.ops.AnnIndex.books(s, dir), cacheKey = Some(dir),
        coded = Some((graft.ops.AnnIndex.codes(s, dir),
          graft.ops.AnnIndex.probeCentroids(s, dir))),
        lexStore = Some(graft.ops.LexIndex.frames(s, dir)))
    }),


    // ANN — the index-maintenance lifecycle CLOSED (AnnIndex append
    // history scaladoc, the q292 story for the ANN side): the delta
    // slice is assigned + PQ-encoded under the frozen STORED
    // quantizer and FOLDED into the standing postings as a new
    // atomically-published version — v1 = v0's published bytes
    // (standing postings never move) ∪ the encoded delta; v0 stays
    // readable (time-travel). Summarizing the merged head binds
    // q280's oracle string: one contract, THREE engines — in-memory
    // monitor (q280), streaming gate (q282), stored merge (this).
    "q293_ann_index_append" -> ((s, dir) =>
      Sim.ivfSummarize(
        graft.ops.AnnIndex.postingsAsOf(s, dir, version = 1L)
          .select(col("is_delta"), col("cell"), col("sim_e9")), k = 8)
        .orderBy("cell")),


    // ANN/retrieval — the fusion knobs swept the way q229/q231/q232
    // swept the dense ones (Sim.hybridFusedRecallSweep scaladoc):
    // fused recall@5 of the IVF-ADC-armed hybrid vs the brute-armed
    // fused truth over probes ∈ 1..4 × listK ∈ {10,20,40} — q288
    // reads one point (0.54–0.56 at p=2/listK=20); this is the
    // surface a search team reads to buy the rest back. One pass per
    // retriever: arms run once at listK=40 (smaller lists are
    // prefixes), the ADC arm pmin-slices ONE code-store scan.
    "q294_fused_recall_sweep" -> ((s, dir) => {
      val km = graft.ops.AnnIndex.cells(s, dir)
      Sim.hybridFusedRecallSweep(t(s, dir, "documents"), km,
          graft.ops.AnnIndex.books(s, dir), cacheKey = Some(dir),
          coded = Some((graft.ops.AnnIndex.codes(s, dir),
            graft.ops.AnnIndex.probeCentroids(s, dir))),
          lexStore = Some(graft.ops.LexIndex.frames(s, dir)))
        .presentBy("probes", "list_k")
    }),


    // ANN — the MAINTAINED index SERVES (q293's lifecycle made
    // user-visible): top-5 IVF-ADC retrieval whose corpus side is the
    // append history's merged head (v1 = the standing postings'
    // published bytes ∪ the delta encoded under the frozen stored
    // quantizer) with codebooks and probe geometry read from the
    // frozen base store — nothing retrained, re-encoded, or
    // re-assigned at query time. SIZED by the measured policy
    // (AnnIndex.sizedParams — k = ⌈√n⌉, probes = max(2, ⌈k/4⌉) from a
    // one-count preflight; r14 verdict: serving must not run the
    // fixed k=8 its own q290/q295/q296 measurements refute). The
    // oracle retrains the whole frozen chain from scratch in SQL
    // (base-slice training at a DERIVED ceil-sqrt-count seed budget,
    // whole-corpus assignment and codes, probes derived from the
    // trained cell count), so the driver gate proves both the
    // maintained-history serving AND the sizing arithmetic.
    "q299_ann_index_serve" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val head = graft.ops.AnnIndex.postingsAsOf(s, dir, version = 1L,
        k = k)
      val codes = head.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(head.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentroids(s, dir, tag = "base",
            k = k),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    }),


    // ANN/retrieval — the FULLY-MAINTAINED hybrid: q287's RRF fusion
    // with BOTH arms served from maintained index heads — the lexical
    // arm from the standing inverted index MERGED with a delta index
    // (q292's lifecycle; merge ≡ build(all) exactly), the dense arm
    // from the ANN append history's merged head under the frozen base
    // store (q293/q299's lifecycle). Nothing is retrained, re-signed,
    // or re-encoded at query time on either arm. The oracle retrains
    // both arms from scratch (full-corpus BM25 chain; frozen-base
    // kmeans + PQ chains), so the driver gate proves the whole
    // retrieval stack survives incremental maintenance end to end.
    "q300_hybrid_maintained" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // the lexical arm reads the STORED segment history's merged
      // head (r15 — closing the r14 verdict gap: the arm previously
      // re-indexed both corpus slices from `documents` at query time;
      // now both arms serve from maintained physical stores)
      val mergedLex = graft.ops.LexIndex.framesAsOf(s, dir, 1L)
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val head = graft.ops.AnnIndex.postingsAsOf(s, dir, version = 1L,
        k = k)
      val codes = head.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val embCells = t(s, dir, "embeddings")
        .join(head.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.hybridRrfIvfAdc(docs, embCells,
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          cacheKey = Some(dir + "#mergedlex"),
          coded = Some((codes,
            graft.ops.AnnIndex.probeCentroids(s, dir, tag = "base",
              k = k))),
          lexStore = Some(mergedLex), probes = probes)
        .orderBy("q_id", "rk")
    }),


    // ANN — index COMPACTION, the lifecycle's last step
    // (AnnIndex.compactedPostings scaladoc): the merged head rewritten
    // into one fresh single-file snapshot store (appends accrue
    // per-version file fragmentation; compaction folds the chain),
    // then the SAME top-5 serving as q299 runs against the compacted
    // store — bound to q299's oracle string, so the driver gate
    // proves compaction is serving-invariant. One contract, two
    // physical layouts (versioned history / compacted snapshot), and
    // with q280/q282/q293 the frozen-append family now closes
    // build → append → serve → compact under oracle gates throughout.
    // ANN — TIME-TRAVEL serving (q310's story for the dense side):
    // top-5 IVF-ADC retrieval from the append history AS OF version
    // 0 — the standing index exactly as it stood before the append.
    // Candidates, own-cells, and the probe geometry are all scoped to
    // v0's postings (each version now stores its OWN probecents —
    // ranking a pre-append read against whole-corpus geometry would
    // leak the append into the past); codebooks stay the frozen base
    // chain. The oracle restricts the retrained frozen chain's
    // corpus side to the standing slice, so "as of v0" is an
    // oracle-gated serving contract at the sized k/probes.
    "q311_ann_asof_serve" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val v0 = graft.ops.AnnIndex.postingsAsOf(s, dir, version = 0L,
        k = k)
      val codes = v0.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(v0.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentsAsOf(s, dir, version = 0L,
            k = k),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    }),


    // ANN — MID-CHAIN time-travel serving (r15 verdict ask #6, the
    // dense twin of q312): the "c3" history splits the delta into TWO
    // ingest batches (vec_id%10 = 0, then = 5); this serves top-5
    // IVF-ADC AS OF version 1 — standing ∪ first batch — with
    // candidates, own-cells, AND probe geometry folded from exactly
    // the segments ≤ 1 (the second batch's postings and geometry
    // partials are never read: geometry-as-of must not rank probes
    // against members the version doesn't hold). This is also the
    // delta-segment layout's pressure test: a mid-chain read is only
    // expressible because versions publish delta-only segments the
    // read folds — the old rewrite-the-union layout had no "between
    // appends" bytes to read. The oracle scopes the retrained frozen
    // chain's corpus side to the same doc set, sized k/probes derived
    // in SQL.
    "q313_ann_midchain_serve" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val v1 = graft.ops.AnnIndex.postingsAsOf(s, dir, version = 1L,
        k = k, chain = "c3")
      val codes = v1.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(v1.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentsAsOf(s, dir, version = 1L,
            k = k, chain = "c3"),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    }),


    // ANN — tombstone DELETES (r16, the q315 lex shape on the dense
    // side; AnnIndex delete scaladoc): a takedown pass (vec_id%7=3,
    // the same entity split as the text arm) publishes ONE tombstone
    // segment — the deleted ids + their geometry partials NEGATED
    // (cost ∝ batch: one id-filtered assignment under the frozen
    // stored quantizer; nothing standing is read). Serving masks the
    // head's postings with a broadcast anti-join and ranks probes
    // against the SUBTRACTED geometry (head partials + negated
    // partials fold to exactly the survivors' one-pass means; a cell
    // the delete empties disappears, never a 0/0 row). Quantizer and
    // codebooks are NOT retrained — deletes mask, compaction
    // reclaims, resizing stays q314's measured decision. The oracle
    // restricts the frozen chain's corpus side (candidates,
    // own-cells, probe geometry) to the survivors.
    "q316_ann_delete_serve" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val surv = graft.ops.AnnIndex.postingsAfterDelete(s, dir, k = k)
      val codes = surv.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(surv.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentsAfterDelete(s, dir, k = k),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    }),


    // ANN — delete COMPACTION (the reclaim step): the surviving
    // postings physically rewritten into one fresh snapshot, then the
    // SAME serving as q316 — bound to q316's oracle string (one
    // contract, two layouts). With q293/q299/q302/q311/q313 the ANN
    // index now closes build → append → serve → delete → compact
    // under oracle gates, matching the text side's lifecycle.
    "q318_ann_delete_compact" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val compacted = graft.ops.AnnIndex
        .compactedPostingsAfterDelete(s, dir, k = k)
      val codes = compacted.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(compacted.select(col("vec_id"), col("cell")),
          Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentsAfterDelete(s, dir, k = k),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    }),


    // ANN+lex — the COMPACTION-POLICY decision (r17; r16 verdict ask
    // #4: q317/q318 compact on demand, nothing decides WHEN — the
    // q314 decision-as-measurement pattern applied to compaction).
    // One row per (side, chain state), every input a STORE read
    // (LexIndex.chainStats / AnnIndex.chainStats: segment count from
    // the published roots, live entities from the masked head /
    // statscum pre-fold, tombstones from the published delete ids),
    // and the emitted decision IS the rule: compact iff the tombstone
    // mass share ≥ 1/8 (masked reads scan ≥ 12.5% dead rows — the
    // reclaim arm) OR the chain holds ≥ 4 segments (per-read fold
    // fan-in — the fragmentation arm). The fixture fires BOTH arms
    // independently at every scale factor: "md" compacts on share
    // alone (3 segments, ~1/7 deleted), "c4" on segment count alone
    // (4 appends, zero tombstones), default/"c3"/"m3" keep (m3's
    // captured share ~4/35 sits under the threshold — deliberately
    // close, so the gate pins the arithmetic, not just the branch).
    // The oracle replays the counts from the corpus predicates, the
    // chain topologies as contract constants, and the rule.
    "q324_compaction_policy" -> ((s, dir) => {
      val (k, _) = graft.ops.AnnIndex.sizedParams(s, dir)
      val chains = Seq("", "c3", "c4", "m3", "md")
      graft.ops.AnnIndex.chainStatsFrame(s, dir, chains, k = k)
        .select(lit("ann").as("side"), col("*"))
        .unionByName(
          graft.ops.LexIndex.chainStatsFrame(s, dir, chains)
            .select(lit("lex").as("side"), col("*")))
        .withColumn("tomb_share_e6",
          expr("(n_tomb * 1000000) div (n_live + n_tomb)"))
        .withColumn("compact",
          col("tomb_share_e6") >= 125000 || col("n_segments") >= 4)
        .orderBy("side", "chain")
    }),


    // ANN — the MIXED chain served at EVERY version (r17, q322's
    // dense twin): the "m3" chain is append(standing) →
    // delete(vec_id%7=3, captured against the then-live corpus) →
    // append(delta); top-5 IVF-ADC serving AS OF each version in one
    // output, with candidates, own-cells, AND probe geometry folded
    // from exactly the segments ≤ v (the delete's NEGATED geometry
    // partials subtract its members from v1 on; the post-delete
    // batch's %7=3 vectors stay live at v2 — captured tombstones, not
    // a filter). The oracle replays the frozen chain with the corpus
    // side scoped per version, union'd with the version column.
    "q323_ann_mixed_asof" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      (0L to 2L).map { v =>
        val pv = graft.ops.AnnIndex.postingsAsOf(s, dir, v, k = k,
          chain = "m3")
        val codes = pv.select(
          (Seq(col("vec_id"), col("cell")) ++
            graft.ops.AnnIndex.codeCols(4)): _*)
        val queries = t(s, dir, "embeddings")
          .where(col("vec_id") < 10)
          .join(pv.select(col("vec_id"), col("cell")), Seq("vec_id"))
        Sim.topKIvfAdcCoded(queries, codes,
            graft.ops.AnnIndex.probeCentsAsOf(s, dir, v, k = k,
              chain = "m3"),
            graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
            k = 5, probes = probes)
          .select(lit(v).as("version"), col("q_id"), col("c_id"),
            col("rk"))
      }.reduce(_.unionByName(_))
        .orderBy("version", "q_id", "rk")
    }),


    // ANN — EXECUTING the compaction q324 decides (r17, q326's dense
    // twin): the measured policy row routes each tombstoned chain's
    // head to the layout it chose — "md" compacts (share ≥ 1/8, the
    // reclaim executed), "m3" keeps serving through the mask. Rows
    // are layout-invariant (q318's contract); the oracle pins WHICH
    // layout served via the replayed policy flag.
    "q327_ann_compaction_execute" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val decisions = graft.ops.AnnIndex
        .chainStatsFrame(s, dir, Seq("md", "m3"), k = k)
        .withColumn("share",
          expr("(n_tomb * 1000000) div (n_live + n_tomb)"))
        .withColumn("compact",
          col("share") >= 125000 || col("n_segments") >= 4)
        .select("chain", "compact").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      Seq("md", "m3").map { ch =>
        val hv = graft.ops.AnnIndex.headVersion(ch)
        val posts =
          if (decisions(ch))
            graft.ops.AnnIndex.compactedHeadPostings(s, dir, k = k,
              chain = ch)
          else graft.ops.AnnIndex.postingsAsOf(s, dir, hv, k = k,
            chain = ch)
        val codes = posts.select(
          (Seq(col("vec_id"), col("cell")) ++
            graft.ops.AnnIndex.codeCols(4)): _*)
        val queries = t(s, dir, "embeddings")
          .where(col("vec_id") < 10)
          .join(posts.select(col("vec_id"), col("cell")),
            Seq("vec_id"))
        Sim.topKIvfAdcCoded(queries, codes,
            graft.ops.AnnIndex.probeCentsAsOf(s, dir, hv, k = k,
              chain = ch),
            graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
            k = 5, probes = probes)
          .select(lit(ch).as("chain"),
            lit(if (decisions(ch)) "compacted" else "masked")
              .as("layout"),
            col("q_id"), col("c_id"), col("rk"))
      }.reduce(_.unionByName(_))
        .orderBy("chain", "q_id", "rk")
    }),


    // ANN — TIERED compaction EXECUTED (r17; q328's dense twin, the
    // policy's segment-COUNT arm): an all-append chain has nothing to
    // reclaim, so the measured decision routes "c4" (4 segments) to
    // the LSM cure — tail segments merged into one, base bytes
    // untouched ([[graft.ops.AnnIndex.tieredHeadPostings]]), probe
    // geometry folded from base + merged partials (exact DECIMAL
    // algebra) — while "c3" (3 segments, under threshold) keeps the
    // plain fold. Rows are layout-invariant; the oracle pins WHICH
    // layout served via the replayed rule.
    "q329_ann_tiered_execute" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val decisions = graft.ops.AnnIndex
        .chainStatsFrame(s, dir, Seq("c4", "c3"), k = k)
        .withColumn("share",
          expr("(n_tomb * 1000000) div (n_live + n_tomb)"))
        .withColumn("compact",
          col("share") >= 125000 || col("n_segments") >= 4)
        .select("chain", "compact").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      Seq("c4", "c3").map { ch =>
        val hv = graft.ops.AnnIndex.headVersion(ch)
        val (posts, cents) =
          if (decisions(ch))
            (graft.ops.AnnIndex.tieredHeadPostings(s, dir, k = k,
              chain = ch),
              graft.ops.AnnIndex.tieredProbeCents(s, dir, k = k,
                chain = ch))
          else
            (graft.ops.AnnIndex.postingsAsOf(s, dir, hv, k = k,
              chain = ch),
              graft.ops.AnnIndex.probeCentsAsOf(s, dir, hv, k = k,
                chain = ch))
        val codes = posts.select(
          (Seq(col("vec_id"), col("cell")) ++
            graft.ops.AnnIndex.codeCols(4)): _*)
        val queries = t(s, dir, "embeddings")
          .where(col("vec_id") < 10)
          .join(posts.select(col("vec_id"), col("cell")),
            Seq("vec_id"))
        Sim.topKIvfAdcCoded(queries, codes, cents,
            graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
            k = 5, probes = probes)
          .select(lit(ch).as("chain"),
            lit(if (decisions(ch)) "tiered" else "fold")
              .as("layout"),
            col("q_id"), col("c_id"), col("rk"))
      }.reduce(_.unionByName(_))
        .orderBy("chain", "q_id", "rk")
    }),


    // ANN/retrieval — the TAKEDOWN-maintained hybrid (r17; q300's
    // post-delete form, closing the delete lifecycle across the FUSED
    // retrieval surface): one takedown pass (doc_id/vec_id % 7 = 3 —
    // the same entity split on both arms by design) and the RRF
    // fusion serves with BOTH arms at their tombstoned "md" heads —
    // the lexical arm masked by the broadcast tombstones with the
    // delete segment's pre-folded df/stats, the dense arm's
    // candidates, own-cells, AND probe geometry scoped to the
    // survivors (the negated-partials fold). Victim docs vanish as
    // queries AND candidates from both lists; the oracle re-runs the
    // whole fusion over the surviving corpus from scratch.
    "q330_hybrid_takedown_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(!graft.ops.LexIndex.deleteSplit)
      val mdLex = graft.ops.LexIndex.framesAsOf(s, dir, 2L,
        chain = "md")
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val head = graft.ops.AnnIndex.postingsAsOf(s, dir, version = 2L,
        k = k, chain = "md")
      val codes = head.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val embCells = t(s, dir, "embeddings")
        .join(head.select(col("vec_id"), col("cell")), Seq("vec_id"))
      Sim.hybridRrfIvfAdc(docs, embCells,
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          cacheKey = Some(dir + "#mdlex"),
          coded = Some((codes,
            graft.ops.AnnIndex.probeCentsAsOf(s, dir, version = 2L,
              k = k, chain = "md"))),
          lexStore = Some(mdLex), probes = probes)
        .orderBy("q_id", "rk")
    }),


    "q302_ann_index_compact" -> ((s, dir) => {
      val (k, probes) = graft.ops.AnnIndex.sizedParams(s, dir)
      val compacted = graft.ops.AnnIndex.compactedPostings(s, dir,
        k = k)
      val codes = compacted.select(
        (Seq(col("vec_id"), col("cell")) ++
          graft.ops.AnnIndex.codeCols(4)): _*)
      val queries = t(s, dir, "embeddings")
        .where(col("vec_id") < 10)
        .join(compacted.select(col("vec_id"), col("cell")),
          Seq("vec_id"))
      Sim.topKIvfAdcCoded(queries, codes,
          graft.ops.AnnIndex.probeCentroids(s, dir, tag = "base",
            k = k),
          graft.ops.AnnIndex.books(s, dir, tag = "base", k = k),
          k = 5, probes = probes)
        .select(col("q_id"), col("c_id"), col("rk"))
        .orderBy("q_id", "rk")
    })
  )

  private val upsertSinkOracleSql: String =
    s"""SELECT event_id, ${epochSql("ts")} AS es, user_id, event_type,
       |  value, props
       |FROM events ORDER BY event_id""".stripMargin

  private val bpeTrainOracleSql: String =
    s"""WITH ${bpeChainSql(12)}
       |SELECT merge_rank, left_sym, right_sym, pair_count FROM (
       |  ${(1 to 12).map(i => s"SELECT * FROM m$i")
            .mkString(" UNION ALL ")})
       |ORDER BY merge_rank""".stripMargin

  def oracles: ListMap[String, String] = ListMap(


      // decay anchored at the corpus max ts; per-row weights floored
      // 9 dp into decimal sums (order-free), pow(2, .) as in q173
      "q205_time_decay" -> {
        val w = "pow(2.0, -((CAST(tmax - es AS DOUBLE) / 86400.0)" +
          " / 30.0))"
        def dec(e: String) =
          s"CAST(SUM(CAST(${Num.floorAtSql(e, 9)} AS DECIMAL(28,9)))" +
            " AS DOUBLE)"
        s"""WITH a AS (SELECT MAX(${epochSql("ts")}) AS tmax
           |  FROM events),
           |r AS (SELECT event_type, value, ${epochSql("ts")} AS es
           |  FROM events)
           |SELECT event_type, COUNT(*) AS n_events,
           |  ${Num.floorAtSql(dec(w), 6)} AS decayed_count,
           |  ${Num.floorAtSql(dec(s"$w * value"), 6)} AS decayed_value
           |FROM r CROSS JOIN a GROUP BY 1 ORDER BY 1""".stripMargin
      },


      // pairwise slopes over the daily-count frame, median by the
      // q120/q174 double-middle rank rule
      "q206_theil_sen" ->
        s"""WITH daily AS (SELECT event_type,
           |    CAST(${epochSql("ts")} // 86400 AS BIGINT) AS day,
           |    COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |sl AS (SELECT a.event_type,
           |    CAST(b.n - a.n AS DOUBLE) / (b.day - a.day) AS slope
           |  FROM daily a JOIN daily b
           |    ON a.event_type = b.event_type AND b.day > a.day),
           |r AS (SELECT event_type, slope,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY slope) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM sl)
           |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
           |  ${Num.floorAtSql("AVG(slope)", 6)} AS slope
           |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
           |GROUP BY 1 ORDER BY 1""".stripMargin,


      // windowed-min selection replayed with the same rightmost-tie
      // reverse trick; fp key = md5 of the sorted distinct hashes
      // (wn_sel CTE shared with the q208 candidate join)
      "q207_winnowing" ->
        s"""WITH $winnowCte
           |SELECT doc_id, CAST(len(h) AS INTEGER) AS n_shingles,
           |  CAST(len(sp) AS INTEGER) AS n_selected,
           |  md5(array_to_string(list_transform(
           |    list_sort(list_distinct(list_transform(sp,
           |      j -> h[CAST(j + 1 AS INTEGER)]))),
           |    x -> CAST(x AS VARCHAR)), ' ')) AS fp_key
           |FROM wn_sel ORDER BY doc_id""".stripMargin,


      // average ranks from per-group value-domain cumsums, carried as
      // exact doubled integers; Pearson closed form on decimal sums.
      // ONE string for BOTH Spearman engines (q209 windowed, q230
      // domain-reduced) — divergence impossible, the CC-family pattern
      "q209_spearman" -> spearmanSql,


      "q230_spearman_domain" -> spearmanSql,


      "q233_spearman_auto" -> spearmanSql,

      // the streaming twins bind the BATCH oracles verbatim — one
      // string per semantics, engine per deployment mode
      "q235_stream_tumbling" -> tumblingCountsSql,

      // the streaming sliding engine answers to q61's IDENTICAL string
      "q259_stream_sliding" -> slidingCountsSql,

      "q236_stream_sessions" -> sessionWindowSql,

      "q239_stream_dedup" ->
        """SELECT DISTINCT user_id, event_type FROM events
          |ORDER BY user_id, event_type""".stripMargin,

      // the SAME string as q128/q130/q140 — one oracle, four CC engines
      "q245_stream_cc_store" -> ccOracleSql,
      // the takedown store head: the SAME CC contract scoped to the
      // surviving corpus (per-doc signatures make subset pairs exact)
      "q325_stream_cc_takedown" ->
        ccOracleSqlFor("NOT (doc_id % 7 = 3)"),

      "q249_bpe_fertility" ->
        s"""WITH ${bpeChainSql(12)},
           |vs AS (SELECT word,
           |    CAST(len(string_split(s[2:-2], chr(2)||chr(1))) AS BIGINT)
           |      AS n_syms
           |  FROM w12),
           |lw AS (SELECT lang, UNNEST(t) AS word FROM (
           |  SELECT lang, $cleanToks AS t FROM (
           |    SELECT lang, $clean AS c FROM documents))),
           |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
           |    CAST(SUM(length(word)) AS BIGINT) AS n_chars,
           |    CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens
           |  FROM lw JOIN vs USING (word) GROUP BY lang)
           |SELECT lang, n_words, n_chars, n_bpe_tokens,
           |  ${Num.floorAtSql(
             "CAST(n_chars AS DOUBLE) / n_bpe_tokens", 6)}
           |    AS chars_per_token,
           |  ${Num.floorAtSql(
             "CAST(n_bpe_tokens AS DOUBLE) / n_words", 6)}
           |    AS tokens_per_word
           |FROM g ORDER BY lang""".stripMargin,

      // FULL OUTER with the q242 condition: COALESCE'd user key, both
      // null-padded sides present
      "q248_stream_full_join" ->
        s"""SELECT COALESCE(l.user_id, r.user_id) AS user_id,
           |  l.event_id AS l_id, r.event_id AS r_id,
           |  ${epochSql("l.ts")} AS l_es, ${epochSql("r.ts")} AS r_es
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
           |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') r
           |  ON l.user_id = r.user_id
           |  AND r.ts >= l.ts - INTERVAL 900 SECOND AND r.ts <= l.ts
           |ORDER BY user_id, l_id, r_id""".stripMargin,

      // PQ: four independent per-subspace k-means chains
      // (Fragments.pqChainsSql — the kmeansAfCte discipline transplanted
      // to squared L2 over 16-dim slices); ADC ranks by summed
      // query→codeword distances (Fragments.pqAdcTopkCtes), SDC by
      // summed codeword-pair distances; both scored against exact L2
      // brute truth.
      "q252_pq_recall" -> {
        val nSub = 4
        val sdcJoins = (0 until nSub).map(s =>
          s"JOIN pcc_$s cc$s ON cc$s.ka = qk.k$s AND cc$s.kb = kc.k$s")
          .mkString("\n  ")
        val sdcSum = (0 until nSub).map(s => s"cc$s.d").mkString(" + ")
        s"""WITH $pqEmbCte,
           |${pqChainsSql(4, 8, 16, 2, sdc = true)},
           |${pqAdcTopkCtes(4)},
           |qcodes AS (SELECT * FROM pcodes WHERE vec_id < 10),
           |sdc AS (
           |  SELECT qk.vec_id AS q_id, kc.vec_id AS c_id,
           |    floor(($sdcSum) * 1000000000) AS dk
           |  FROM qcodes qk
           |  JOIN pcodes kc ON qk.vec_id <> kc.vec_id
           |  $sdcJoins),
           |sdck AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY dk ASC, c_id ASC) AS rk FROM sdc) WHERE rk <= 5),
           |${pqL2TruthCte(64)},
           |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
           |stats AS (
           |  SELECT 'pq_adc' AS method, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM adck a LEFT JOIN tr b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 'pq_sdc', COUNT(*), COUNT(b.q_id)
           |  FROM sdck a LEFT JOIN tr b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT method, n_truth, n_approx, n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
                "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall,
           |  4 AS code_bytes, 256 AS raw_bytes
           |FROM stats CROSS JOIN nt ORDER BY method""".stripMargin
      },

      // IVF-ADC: the q252 PQ chains composed with the q229 multi-probe
      // policy (own label cell at pmin=1, centroid-cosine-ranked cells
      // at pmin=max(rank,2), min-wins dedup) — ADC distance summed from
      // the per-subspace query→codeword tables, ranked per probe count,
      // hits vs exact-L2 brute truth, every p zero-filled
      "q254_ivf_adc" -> {
        val adcJoins = (0 until 4).map(s =>
          s"JOIN pqd_$s qd$s ON qd$s.q_id = p.q_id" +
            s" AND qd$s.code = kc.k$s").mkString("\n  ")
        val adcSum = (0 until 4).map(s => s"qd$s.d").mkString(" + ")
        s"""WITH $pqEmbCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |cl AS (SELECT e.vec_id AS c_id, em.label AS cell
           |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id),
           |cv AS (SELECT cl.cell, e.v
           |  FROM cl JOIN e ON e.vec_id = cl.c_id),
           |cm AS (SELECT cell, d.pos AS pos,
           |    CAST(SUM(CAST(v[d.pos] AS DECIMAL(27,10))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM cv CROSS JOIN range(1, 65) AS d(pos)
           |  GROUP BY cell, d.pos),
           |cent AS (SELECT cell,
           |    list(CAST(CAST(m AS REAL) AS DOUBLE) ORDER BY pos) AS ce
           |  FROM cm GROUP BY cell),
           |centn AS (SELECT cell, ce,
           |    sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn
           |  FROM cent),
           |qn AS (SELECT e.vec_id AS q_id, em.label AS owncell, e.v AS qv,
           |    sqrt(list_sum(list_transform(e.v, x -> x * x))) AS qnorm
           |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id
           |  WHERE e.vec_id < 10),
           |centp AS (SELECT q_id, cell, GREATEST(pr, 2) AS pmin FROM (
           |  SELECT n.q_id, t.cell,
           |    row_number() OVER (PARTITION BY n.q_id ORDER BY
           |      ${Num.floorAtSql(
             "list_sum(list_transform(range(1, 65)," +
               " i -> n.qv[i] * t.ce[i])) / (n.qnorm * t.cn)", 9)} DESC,
           |      t.cell ASC) AS pr
           |  FROM qn n CROSS JOIN centn t) WHERE pr <= 3),
           |ownp AS (SELECT q_id, owncell AS cell, 1 AS pmin FROM qn),
           |probe AS (SELECT q_id, cell, MIN(pmin) AS pmin
           |  FROM (SELECT * FROM ownp UNION ALL SELECT * FROM centp)
           |  GROUP BY q_id, cell),
           |adcp AS (SELECT p.q_id, kc.vec_id AS c_id, p.pmin,
           |    floor(($adcSum) * 1000000000) AS dk
           |  FROM pcodes kc
           |  JOIN cl ON cl.c_id = kc.vec_id
           |  JOIN probe p ON p.cell = cl.cell
           |  $adcJoins
           |  WHERE p.q_id <> kc.vec_id),
           |perp AS (SELECT pp.p, s.q_id, s.c_id,
           |    row_number() OVER (PARTITION BY pp.p, s.q_id
           |      ORDER BY s.dk ASC, s.c_id ASC) AS rk
           |  FROM (VALUES (1), (2), (3)) pp(p)
           |  JOIN adcp s ON s.pmin <= pp.p),
           |tk AS (SELECT p, q_id, c_id FROM perp WHERE rk <= 5),
           |${pqL2TruthCte(64)},
           |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
           |stats AS (SELECT t.p, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM tk t LEFT JOIN tr b
           |    ON b.q_id = t.q_id AND b.c_id = t.c_id
           |  GROUP BY t.p)
           |SELECT CAST(pp.p AS INTEGER) AS probes, n_truth,
           |  COALESCE(n_approx, 0) AS n_approx,
           |  COALESCE(n_hits, 0) AS n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_truth", 4)}
           |  END AS recall
           |FROM (VALUES (1), (2), (3)) pp(p)
           |LEFT JOIN stats ON stats.p = pp.p
           |CROSS JOIN nt ORDER BY probes""".stripMargin
      },

      // IVF-ADC over kmeans cells: the q254 skeleton with the label
      // stand-in replaced by the kmeansAfCte quantizer (which also
      // provides the `e` base the PQ chains slice)
      "q260_ivf_adc_kmeans" -> {
        val adcJoins = (0 until 4).map(s =>
          s"JOIN pqd_$s qd$s ON qd$s.q_id = p.q_id" +
            s" AND qd$s.code = kc.k$s").mkString("\n  ")
        val adcSum = (0 until 4).map(s => s"qd$s.d").mkString(" + ")
        s"""WITH $kmeansAfCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |cm AS (SELECT cell, d.pos AS pos,
           |    CAST(SUM(CAST(v[d.pos] AS DECIMAL(27,10))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM af CROSS JOIN range(1, 65) AS d(pos)
           |  GROUP BY cell, d.pos),
           |cent AS (SELECT cell,
           |    list(CAST(CAST(m AS REAL) AS DOUBLE) ORDER BY pos) AS ce
           |  FROM cm GROUP BY cell),
           |centn AS (SELECT cell, ce,
           |    sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn
           |  FROM cent),
           |qn AS (SELECT vec_id AS q_id, cell AS owncell, v AS qv,
           |    sqrt(list_sum(list_transform(v, x -> x * x))) AS qnorm
           |  FROM af WHERE vec_id < 10),
           |centp AS (SELECT q_id, cell, GREATEST(pr, 2) AS pmin FROM (
           |  SELECT n.q_id, t.cell,
           |    row_number() OVER (PARTITION BY n.q_id ORDER BY
           |      ${Num.floorAtSql(
             "list_sum(list_transform(range(1, 65)," +
               " i -> n.qv[i] * t.ce[i])) / (n.qnorm * t.cn)", 9)} DESC,
           |      t.cell ASC) AS pr
           |  FROM qn n CROSS JOIN centn t) WHERE pr <= 3),
           |ownp AS (SELECT q_id, owncell AS cell, 1 AS pmin FROM qn),
           |probe AS (SELECT q_id, cell, MIN(pmin) AS pmin
           |  FROM (SELECT * FROM ownp UNION ALL SELECT * FROM centp)
           |  GROUP BY q_id, cell),
           |adcp AS (SELECT p.q_id, kc.vec_id AS c_id, p.pmin,
           |    floor(($adcSum) * 1000000000) AS dk
           |  FROM pcodes kc
           |  JOIN af cl ON cl.vec_id = kc.vec_id
           |  JOIN probe p ON p.cell = cl.cell
           |  $adcJoins
           |  WHERE p.q_id <> kc.vec_id),
           |perp AS (SELECT pp.p, s.q_id, s.c_id,
           |    row_number() OVER (PARTITION BY pp.p, s.q_id
           |      ORDER BY s.dk ASC, s.c_id ASC) AS rk
           |  FROM (VALUES (1), (2), (3)) pp(p)
           |  JOIN adcp s ON s.pmin <= pp.p),
           |tk AS (SELECT p, q_id, c_id FROM perp WHERE rk <= 5),
           |${pqL2TruthCte(64)},
           |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
           |stats AS (SELECT t.p, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM tk t LEFT JOIN tr b
           |    ON b.q_id = t.q_id AND b.c_id = t.c_id
           |  GROUP BY t.p)
           |SELECT CAST(pp.p AS INTEGER) AS probes, n_truth,
           |  COALESCE(n_approx, 0) AS n_approx,
           |  COALESCE(n_hits, 0) AS n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_truth", 4)}
           |  END AS recall
           |FROM (VALUES (1), (2), (3)) pp(p)
           |LEFT JOIN stats ON stats.p = pp.p
           |CROSS JOIN nt ORDER BY probes""".stripMargin
      },

      // IVFADC-R: the q254 probe + ADC machinery at fixed p=2, then a
      // per-query R-candidate shortlist re-scored with exact L2 — the
      // engine's id-keyed re-rank join replayed as two e-joins on the
      // shortlist rows only
      "q258_ivf_adc_rerank" -> {
        val adcJoins = (0 until 4).map(s =>
          s"JOIN pqd_$s qd$s ON qd$s.q_id = p.q_id" +
            s" AND qd$s.code = kc.k$s").mkString("\n  ")
        val adcSum = (0 until 4).map(s => s"qd$s.d").mkString(" + ")
        s"""WITH $pqEmbCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |cl AS (SELECT e.vec_id AS c_id, em.label AS cell
           |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id),
           |cv AS (SELECT cl.cell, e.v
           |  FROM cl JOIN e ON e.vec_id = cl.c_id),
           |cm AS (SELECT cell, d.pos AS pos,
           |    CAST(SUM(CAST(v[d.pos] AS DECIMAL(27,10))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM cv CROSS JOIN range(1, 65) AS d(pos)
           |  GROUP BY cell, d.pos),
           |cent AS (SELECT cell,
           |    list(CAST(CAST(m AS REAL) AS DOUBLE) ORDER BY pos) AS ce
           |  FROM cm GROUP BY cell),
           |centn AS (SELECT cell, ce,
           |    sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn
           |  FROM cent),
           |qn AS (SELECT e.vec_id AS q_id, em.label AS owncell, e.v AS qv,
           |    sqrt(list_sum(list_transform(e.v, x -> x * x))) AS qnorm
           |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id
           |  WHERE e.vec_id < 10),
           |centp AS (SELECT q_id, cell FROM (
           |  SELECT n.q_id, t.cell,
           |    row_number() OVER (PARTITION BY n.q_id ORDER BY
           |      ${Num.floorAtSql(
             "list_sum(list_transform(range(1, 65)," +
               " i -> n.qv[i] * t.ce[i])) / (n.qnorm * t.cn)", 9)} DESC,
           |      t.cell ASC) AS pr
           |  FROM qn n CROSS JOIN centn t) WHERE pr <= 2),
           |probe AS (SELECT DISTINCT q_id, cell FROM (
           |  SELECT q_id, owncell AS cell FROM qn
           |  UNION ALL SELECT q_id, cell FROM centp)),
           |adcp AS (SELECT p.q_id, kc.vec_id AS c_id,
           |    floor(($adcSum) * 1000000000) AS dk
           |  FROM pcodes kc
           |  JOIN cl ON cl.c_id = kc.vec_id
           |  JOIN probe p ON p.cell = cl.cell
           |  $adcJoins
           |  WHERE p.q_id <> kc.vec_id),
           |adcr AS MATERIALIZED (SELECT q_id, c_id, adcrk FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY dk ASC, c_id ASC) AS adcrk FROM adcp)
           |  WHERE adcrk <= 20),
           |rr AS MATERIALIZED (SELECT a.q_id, a.c_id, a.adcrk,
           |    row_number() OVER (PARTITION BY a.q_id ORDER BY
           |      floor(list_sum(list_transform(range(1, 65),
           |        i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])))
           |        * 1000000000) ASC, a.c_id ASC) AS xrk
           |  FROM adcr a
           |  JOIN e q ON q.vec_id = a.q_id
           |  JOIN e c ON c.vec_id = a.c_id),
           |perr AS (SELECT rv.r, t.q_id, t.c_id,
           |    row_number() OVER (PARTITION BY rv.r, t.q_id
           |      ORDER BY t.xrk ASC) AS rk
           |  FROM (VALUES (5), (10), (20)) rv(r)
           |  JOIN rr t ON t.adcrk <= rv.r),
           |tk AS (SELECT r, q_id, c_id FROM perr WHERE rk <= 5),
           |${pqL2TruthCte(64)},
           |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
           |stats AS (SELECT t.r, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM tk t LEFT JOIN tr b
           |    ON b.q_id = t.q_id AND b.c_id = t.c_id
           |  GROUP BY t.r)
           |SELECT CAST(rv.r AS INTEGER) AS rerank_r, n_truth,
           |  COALESCE(n_approx, 0) AS n_approx,
           |  COALESCE(n_hits, 0) AS n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_truth", 4)}
           |  END AS recall
           |FROM (VALUES (5), (10), (20)) rv(r)
           |LEFT JOIN stats ON stats.r = rv.r
           |CROSS JOIN nt ORDER BY rerank_r""".stripMargin
      },

      // PQ knob sweep: two independent chain parameterizations share
      // one WITH clause via tags — m=4/k=8/iters=0 (tag b) and
      // m=8/k=16/iters=2 (tag a) — each ADC-ranked and scored against
      // the one exact-L2 truth
      "q255_pq_knobs" ->
        s"""WITH $pqEmbCte,
           |${pqChainsSql(4, 8, 16, 0, tag = "b")},
           |${pqChainsSql(8, 16, 8, 2, tag = "a")},
           |${pqAdcTopkCtes(4, tag = "b")},
           |${pqAdcTopkCtes(8, tag = "a")},
           |${pqL2TruthCte(64)},
           |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
           |stats AS (
           |  SELECT 'adc_m4k8_i0' AS method, 4 AS code_bytes,
           |    COUNT(*) AS n_approx, COUNT(b.q_id) AS n_hits
           |  FROM adckb a LEFT JOIN tr b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 'adc_m8k16_i2', 8, COUNT(*), COUNT(b.q_id)
           |  FROM adcka a LEFT JOIN tr b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT method, n_truth, n_approx, n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall,
           |  code_bytes, 256 AS raw_bytes
           |FROM stats CROSS JOIN nt ORDER BY method""".stripMargin,

      // the q15 surrogate-dim chain + the batch twin of the enriched
      // complete-mode aggregate the stream accumulates
      "q251_stream_static_enrich" ->
        """WITH dim AS (
          |  SELECT event_type,
          |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT)
          |      AS type_id
          |  FROM (SELECT DISTINCT event_type FROM events
          |        WHERE event_type IS NOT NULL))
          |SELECT type_id, event_type, COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total_value
          |FROM events JOIN dim USING (event_type)
          |GROUP BY 1, 2
          |ORDER BY type_id""".stripMargin,

      // weight arrays interpolated from Sim.dcgWeights/mrrWeights —
      // ONE source of the scaled-integer discounts for both engines
      "q247_retrieval_metrics" -> {
        val w = Sim.dcgWeights(5)
        val wL = w.mkString("[", ",", "]")
        val pL = w.scanLeft(0L)(_ + _).tail.mkString("[", ",", "]")
        val rL = Sim.mrrWeights(5).mkString("[", ",", "]")
        def scoreCte(name: String, tbl: String): String =
          s"""pq_$name AS (SELECT r.q_id,
             |    SUM(CASE WHEN b.q_id IS NOT NULL
             |      THEN (SELECT w FROM ws)[r.rk] ELSE 0 END) AS dcg,
             |    MIN(CASE WHEN b.q_id IS NOT NULL THEN r.rk END) AS fh
             |  FROM $tbl r LEFT JOIN brute b
             |    ON b.q_id = r.q_id AND b.c_id = r.c_id
             |  GROUP BY 1),
             |m_$name AS (SELECT '$name' AS method,
             |    CAST(CAST(SUM(mrr_q) AS BIGINT)
             |      // COUNT(*) AS BIGINT) AS mrr_e6,
             |    CAST(CAST(SUM(ndcg_q) AS BIGINT)
             |      // COUNT(*) AS BIGINT) AS ndcg_e6,
             |    COUNT(*) AS n_queries
             |  FROM (SELECT
             |      CAST(COALESCE(dcg, 0) * 1000000 AS BIGINT)
             |        // (SELECT p FROM ws)[n_t] AS ndcg_q,
             |      COALESCE((SELECT r FROM ws)[fh], 0) AS mrr_q
             |    FROM qt LEFT JOIN pq_$name USING (q_id)))""".stripMargin
        s"""WITH ws AS (SELECT $wL AS w, $pL AS p, $rL AS r),
           |brute AS (SELECT q_id, c_id, rk FROM ($topkCosineSql)),
           |ivfkm AS (SELECT q_id, c_id, rk FROM ($kmIvfTopkSql)),
           |lsh4t AS (SELECT q_id, c_id, rk FROM (${lshTablesTkSqlFor(4)})),
           |qt AS (SELECT q_id, COUNT(*) AS n_t FROM brute GROUP BY 1),
           |${scoreCte("brute", "brute")},
           |${scoreCte("ivf_kmeans", "ivfkm")},
           |${scoreCte("lsh4", "lsh4t")}
           |SELECT method, mrr_e6, ndcg_e6, n_queries FROM (
           |  SELECT * FROM m_brute UNION ALL
           |  SELECT * FROM m_ivf_kmeans UNION ALL
           |  SELECT * FROM m_lsh4)
           |ORDER BY method""".stripMargin
      },

      // content preservation through the fragment -> compact rewrite:
      // the aggregate of the COMPACTED files must equal the source table
      "q246_compaction" ->
        """SELECT lang, CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q244_mmr_rerank" ->
        s"""WITH ${mmrChainSql(5, 0.7)}
           |SELECT q_id, CAST(rk AS INTEGER) AS rk, c_id,
           |  ${Num.floorAtSql("mmr", 4)} AS mmr
           |FROM s5 ORDER BY q_id, rk""".stripMargin,

      "q243_stream_upsert_sink" -> upsertSinkOracleSql,

      // the partition-pruned sink answers to q243's IDENTICAL string
      "q261_stream_upsert_partitioned" -> upsertSinkOracleSql,

      "q241_stream_join" ->
        s"""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           |  ${epochSql("l.ts")} AS l_es, ${epochSql("r.ts")} AS r_es
           |FROM events l JOIN events r ON l.user_id = r.user_id
           |  AND r.ts >= l.ts - INTERVAL 900 SECOND AND r.ts <= l.ts
           |ORDER BY l.user_id, l_id, r_id""".stripMargin,

      // the attribution LEFT OUTER — the null-padded rows are what
      // the streaming twin must release via its watermark
      "q242_stream_left_join" ->
        s"""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           |  ${epochSql("l.ts")} AS l_es, ${epochSql("r.ts")} AS r_es
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
           |  ON l.user_id = r.user_id
           |  AND r.ts >= l.ts - INTERVAL 900 SECOND AND r.ts <= l.ts
           |ORDER BY l.user_id, l_id, r_id""".stripMargin,

      // the SAME string as q67/q236 — one oracle, three engines
      "q240_stream_stateful_sessions" -> sessionWindowSql,

      "q237_bpe_train" -> bpeTrainOracleSql,

      // the in-memory trainer answers to q237's IDENTICAL string
      "q257_bpe_train_local" -> bpeTrainOracleSql,

      "q238_bpe_encode" ->
        s"""WITH ${bpeChainSql(12)},
           |vs AS (SELECT word,
           |    CAST(len(string_split(s[2:-2], chr(2)||chr(1))) AS BIGINT)
           |      AS n_syms
           |  FROM w12),
           |dw AS (SELECT doc_id, UNNEST(t) AS word FROM (
           |  SELECT doc_id, $cleanToks AS t FROM (
           |    SELECT doc_id, $clean AS c FROM documents)))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(SUM(length(word)) AS BIGINT) AS n_chars,
           |  CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens
           |FROM dw JOIN vs USING (word)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


      // docs sharing >= 2 selected hashes, fingerprint-keyed self-join
      "q208_winnow_candidates" ->
        s"""WITH $winnowCte,
           |fp AS (SELECT DISTINCT doc_id, fp FROM
           |  (SELECT doc_id, UNNEST(list_transform(sp,
           |      j -> h[CAST(j + 1 AS INTEGER)])) AS fp
           |    FROM wn_sel))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  COUNT(*) AS n_shared_fp
           |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING COUNT(*) >= 2
           |ORDER BY id_a, id_b""".stripMargin,


      // exact-integer replay of the three bucket assignments (// is
      // DuckDB's integral div, matching the engine's `div`); zorder
      // bucket = top 6 bits of the 8+8-bit Morton interleave
      // (Layout.zSqlExpr — the q132 oracle shape)
      "q210_zonemap_audit" ->
        s"""WITH base AS (SELECT CAST(l_orderkey AS BIGINT) AS okey,
           |    CAST(l_partkey AS BIGINT) AS pk,
           |    (${epochSql("l_shipdate")}) // 86400 AS day
           |  FROM lineitem),
           |b AS (SELECT MIN(okey) AS mino, MAX(okey) AS maxo,
           |    MIN(pk) AS minpk, MAX(pk) AS maxpk,
           |    MIN(day) AS mind, MAX(day) AS maxd FROM base),
           |wb AS (SELECT okey, pk, day,
           |    ((okey - mino) * 64) // (maxo - mino + 1) AS nat_b,
           |    ((day - mind) * 64) // (maxd - mind + 1) AS date_b,
           |    ((pk - minpk) * 256) // (maxpk - minpk + 1) AS pkq,
           |    ((day - mind) * 256) // (maxd - mind + 1) AS dayq
           |  FROM base CROSS JOIN b),
           |wz AS (SELECT *,
           |    (${graft.ops.Layout.zSqlExpr("pkq", "dayq", 8)}) // 1024
           |      AS z_b FROM wb),
           |lb AS (
           |  SELECT 'natural' AS layout, nat_b AS bucket, pk, day FROM wz
           |  UNION ALL SELECT 'bydate', date_b, pk, day FROM wz
           |  UNION ALL SELECT 'zorder', z_b, pk, day FROM wz),
           |zones AS (SELECT layout, bucket,
           |    MIN(pk) AS min_pk, MAX(pk) AS max_pk,
           |    MIN(day) AS min_day, MAX(day) AS max_day,
           |    COUNT(*) AS cnt
           |  FROM lb GROUP BY 1, 2),
           |preds AS (
           |  SELECT 'ship_month' AS predicate, 'day' AS dim,
           |      mind + (maxd - mind) // 2 AS lo,
           |      mind + (maxd - mind) // 2 + 30 AS hi FROM b
           |  UNION ALL SELECT 'part_range', 'pk',
           |      minpk + (maxpk - minpk) // 2,
           |      minpk + (maxpk - minpk) // 2 + (maxpk - minpk) // 64
           |    FROM b),
           |m AS (SELECT predicate, COUNT(*) AS n_match
           |  FROM base CROSS JOIN preds
           |  WHERE (dim = 'day' AND day BETWEEN lo AND hi)
           |     OR (dim = 'pk' AND pk BETWEEN lo AND hi)
           |  GROUP BY 1),
           |a AS (SELECT layout, predicate, COUNT(*) AS n_buckets,
           |    CAST(SUM(CASE WHEN (dim = 'day' AND min_day <= hi
           |          AND max_day >= lo)
           |        OR (dim = 'pk' AND min_pk <= hi AND max_pk >= lo)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_read,
           |    CAST(SUM(cnt) AS BIGINT) AS rows_total,
           |    CAST(SUM(CASE WHEN (dim = 'day' AND min_day <= hi
           |          AND max_day >= lo)
           |        OR (dim = 'pk' AND min_pk <= hi AND max_pk >= lo)
           |      THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned
           |  FROM zones CROSS JOIN preds GROUP BY 1, 2)
           |SELECT layout, predicate, n_buckets, n_read, rows_total,
           |  rows_scanned, CAST(COALESCE(n_match, 0) AS BIGINT) AS n_match,
           |  ${Num.floorAtSql(
             "CAST(n_read AS DOUBLE) / CAST(n_buckets AS DOUBLE)", 6)}
           |    AS read_frac,
           |  ${Num.floorAtSql(
             "CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE)",
             6)} AS scan_frac
           |FROM a LEFT JOIN m USING (predicate)
           |ORDER BY layout, predicate""".stripMargin,


      // three blocked joins UNION'd, pair-deduped with the sorted
      // distinct pass list, then ONE levenshtein verify (the length
      // prefilter is engine-only: lev >= |len diff| makes it redundant
      // under the final <= 3 bound)
      "q211_multiblock_pairs" ->
        s"""WITH $multiBlockCte
           |SELECT id_a, id_b,
           |  CAST(levenshtein(id_a, id_b) AS INTEGER) AS dist, passes
           |FROM g WHERE levenshtein(id_a, id_b) <= 3
           |ORDER BY id_a, id_b""".stripMargin,


      // full recompute with the q98 decimal power sums — the merge's
      // correctness claim IS equality with this (decimal adds are
      // exact, so state merge == full, bit for bit)
      "q212_incr_agg_merge" ->
        """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
          |    CAST(SUM(CASE WHEN l_orderkey % 5 != 0 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_standing,
          |    CAST(SUM(CASE WHEN l_orderkey % 5 = 0 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_delta,
          |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
          |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n_standing, n_delta, n,
          |  floor((CAST(sx AS DOUBLE) / n) * 1000000) / 1000000 AS mean,
          |  floor(((CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
          |    * 10000) / 10000 AS var_samp
          |FROM g ORDER BY l_returnflag""".stripMargin,


      // three unrolled peel rounds over the shared verified-pair CTE
      // (degree agg -> keep -> endpoint filters), then the surviving
      // subgraph's degrees
      "q213_kcore" -> {
        def peel(i: Int): String =
          s"""d$i AS (SELECT id, COUNT(*) AS deg FROM (
             |    SELECT id_a AS id FROM e${i - 1}
             |    UNION ALL SELECT id_b FROM e${i - 1}) GROUP BY 1),
             |k$i AS (SELECT id FROM d$i WHERE deg >= 2),
             |e$i AS (SELECT e.id_a, e.id_b FROM e${i - 1} e
             |  JOIN k$i ka ON e.id_a = ka.id
             |  JOIN k$i kb ON e.id_b = kb.id)""".stripMargin
        s"""WITH $verifiedPairsCte,
           |e0 AS (SELECT id_a, id_b FROM pairs),
           |${peel(1)},
           |${peel(2)},
           |${peel(3)}
           |SELECT id AS doc_id, COUNT(*) AS deg FROM (
           |  SELECT id_a AS id FROM e3 UNION ALL SELECT id_b FROM e3)
           |GROUP BY 1 ORDER BY doc_id""".stripMargin
      },


      // per-side key histograms joined, exact pair products, totals
      // from one scalar agg — never the join itself
      "q214_join_preflight" ->
        s"""WITH l AS (SELECT user_id, COUNT(*) AS n_left FROM events
           |    WHERE event_type = 'click' GROUP BY 1),
           |r AS (SELECT user_id, COUNT(*) AS n_right FROM events
           |    WHERE event_type = 'view' GROUP BY 1),
           |j AS (SELECT l.user_id, n_left, n_right,
           |    CAST(n_left AS DECIMAL(19,0)) * CAST(n_right AS DECIMAL(19,0))
           |      AS n_pairs FROM l JOIN r USING (user_id)),
           |tt AS (SELECT CAST(SUM(n_pairs) AS DECIMAL(38,0)) AS total_pairs,
           |    COUNT(*) AS n_keys FROM j)
           |SELECT user_id, n_left, n_right,
           |  CAST(CAST(n_pairs AS DECIMAL(38,0)) AS VARCHAR) AS n_pairs,
           |  CAST(total_pairs AS VARCHAR) AS total_pairs, n_keys,
           |  ${Num.floorAtSql(
             "CAST(n_pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE)", 6)}
           |    AS share
           |FROM j CROSS JOIN tt
           |ORDER BY j.n_pairs DESC, user_id LIMIT 10""".stripMargin,


      // one grouped distinct-count per candidate FD, unioned
      "q215_fd_audit" -> {
        def fd(tbl: String, l: String, r: String): String =
          s"""SELECT '$tbl.$l->$r' AS fd, COUNT(*) AS n_lhs,
             |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_violating,
             |  CAST(MAX(n_rhs) AS BIGINT) AS max_rhs,
             |  SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
             |FROM (SELECT $l, COUNT(DISTINCT $r) AS n_rhs
             |      FROM $tbl GROUP BY 1)""".stripMargin
        Seq(("nation", "n_nationkey", "n_regionkey"),
            ("part", "p_partkey", "p_brand"),
            ("part", "p_type", "p_size"),
            ("documents", "source", "lang"),
            ("orders", "o_custkey", "o_orderpriority"))
          .map { case (t0, l, r) => fd(t0, l, r) }
          .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
      },


      // the window list replayed with an indexed transform: weight
      // 2^-(L-i) for 1-based i, normalizer 2 - 2^-(L-1) — exact binary
      // scales, so the doubles match the engine bit-for-bit
      "q216_ewma" ->
        s"""WITH w AS (SELECT user_id, event_id, value,
           |    list(value) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id
           |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
           |  FROM events)
           |SELECT user_id, event_id, value,
           |  ${Num.floorAtSql(
             "list_sum(list_transform(range(1, len(arr) + 1), " +
               "i -> arr[i] * pow(0.5, len(arr) - i))) " +
               "/ (2 - pow(0.5, len(arr) - 1))", 6)} AS ewma
           |FROM w ORDER BY user_id, event_id""".stripMargin,


      // unique rank key (score, id) then (rank-1)/(n-1)
      "q217_quantile_norm" ->
        s"""WITH w AS (SELECT doc_id, source, n_chars,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars, doc_id) AS rn,
           |    COUNT(*) OVER (PARTITION BY source) AS n
           |  FROM documents)
           |SELECT doc_id, source, n_chars,
           |  ${Num.floorAtSql(
             "CAST(rn - 1 AS DOUBLE) / CAST(greatest(n - 1, 1) AS DOUBLE)",
             6)} AS pct
           |FROM w ORDER BY doc_id""".stripMargin,


      // Hamilton's method in exact integers: floor shares by integral
      // div, leftovers to the largest remainders (ties by source)
      "q218_mixture_alloc" ->
        """WITH c AS (SELECT source, COUNT(*) AS n_docs,
          |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000)
          |      AS BIGINT) AS weight
          |  FROM documents GROUP BY 1),
          |t AS (SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM c),
          |b AS (SELECT source, n_docs, weight,
          |    (1000 * weight) // wsum AS base,
          |    (1000 * weight) % wsum AS rem
          |  FROM c CROSS JOIN t),
          |lo AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS r FROM b),
          |rk AS (SELECT *, row_number() OVER
          |    (ORDER BY rem DESC, source) AS rk FROM b)
          |SELECT source, n_docs, weight,
          |  CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
          |    AS alloc
          |FROM rk CROSS JOIN lo ORDER BY source""".stripMargin,


      // the sweep replayed over the shared verified-pair CTE (jacc is
      // the same 4dp-floored jaccard the artifact stores)
      "q219_threshold_sweep" ->
        s"""WITH $verifiedPairsCte,
           |th AS (SELECT CAST(UNNEST(
           |    [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)
           |  AS threshold),
           |kept AS (SELECT threshold, id_a, id_b
           |  FROM pairs CROSS JOIN th WHERE jacc >= threshold),
           |np AS (SELECT threshold, COUNT(*) AS n_pairs
           |  FROM kept GROUP BY 1),
           |nd AS (SELECT threshold, COUNT(DISTINCT id) AS n_docs FROM (
           |    SELECT threshold, id_a AS id FROM kept
           |    UNION ALL SELECT threshold, id_b FROM kept) GROUP BY 1)
           |SELECT threshold, COALESCE(n_pairs, 0) AS n_pairs,
           |  COALESCE(n_docs, 0) AS n_docs
           |FROM th LEFT JOIN np USING (threshold)
           |  LEFT JOIN nd USING (threshold)
           |ORDER BY threshold""".stripMargin,


      // exact integer (tf, tf^2) power sums per term; VMR in double
      // only at the end — the q98 discipline on text counts
      "q220_term_burstiness" ->
        s"""WITH toks AS (SELECT doc_id, UNNEST($cleanToks) AS term
           |    FROM (SELECT doc_id, $clean AS c FROM documents)),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf
           |  FROM toks GROUP BY 1, 2),
           |pt AS (SELECT term, COUNT(*) AS df,
           |    CAST(SUM(tf) AS BIGINT) AS sum_tf,
           |    CAST(SUM(tf * tf) AS BIGINT) AS sum_tf2
           |  FROM tf GROUP BY 1 HAVING COUNT(*) >= 20)
           |SELECT term, df, sum_tf,
           |  ${Num.floorAtSql("CAST(sum_tf AS DOUBLE) / df", 6)}
           |    AS mean_tf,
           |  ${Num.floorAtSql(
             "((CAST(sum_tf2 AS DOUBLE) - CAST(sum_tf AS DOUBLE)" +
               " * CAST(sum_tf AS DOUBLE) / df) / (df - 1))" +
               " / (CAST(sum_tf AS DOUBLE) / df)", 6)} AS vmr
           |FROM pt ORDER BY vmr DESC, term LIMIT 20""".stripMargin,


      // H = log2(n) - sum(c*log2 c)/n per count frame (the q151
      // identity); marginals re-aggregate the joint cells
      "q221_mutual_info" -> {
        val n = "CAST(n AS DOUBLE)"
        def h(s: String) = s"(log2($n) - $s / $n)"
        s"""WITH cells AS (SELECT source, lang, COUNT(*) AS c
           |    FROM documents GROUP BY 1, 2),
           |j AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
           |    SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
           |      AS s_joint FROM cells),
           |ma AS (SELECT SUM(CAST(c AS DOUBLE)
           |      * log2(CAST(c AS DOUBLE))) AS s_a
           |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS c FROM cells
           |        GROUP BY source)),
           |mb AS (SELECT SUM(CAST(c AS DOUBLE)
           |      * log2(CAST(c AS DOUBLE))) AS s_b
           |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS c FROM cells
           |        GROUP BY lang))
           |SELECT n,
           |  ${Num.floorAtSql(h("s_a"), 6)} AS h_a,
           |  ${Num.floorAtSql(h("s_b"), 6)} AS h_b,
           |  ${Num.floorAtSql(h("s_joint"), 6)} AS h_joint,
           |  ${Num.floorAtSql(
             s"${h("s_a")} + ${h("s_b")} - ${h("s_joint")}", 6)} AS mi,
           |  ${Num.floorAtSql(s"${h("s_joint")} - ${h("s_a")}", 6)}
           |    AS h_b_given_a
           |FROM j CROSS JOIN ma CROSS JOIN mb""".stripMargin
      },


      // the roundtrip is lossless by construction, so the oracle is the
      // direct aggregate over the source table
      "q222_logparse_roundtrip" ->
        """SELECT lang, COUNT(*) AS n, MIN(n_chars) AS min_chars,
          |  MAX(n_chars) AS max_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,


      // the q134 quality chain (q157's CTE names) + the pair CTE's
      // endpoints; buckets are score-VALUE bins, mean via decimal sums
      "q223_quality_dup_calibration" ->
        s"""WITH $verifiedPairsCte,
           |qtok AS (SELECT id AS doc_id, $cleanToks AS t FROM cleaned),
           |qg AS (SELECT doc_id,
           |    UNNEST(list_concat(t, ${shinglesSql("t", 2)})) AS g
           |  FROM qtok),
           |qwt AS (SELECT doc_id,
           |    CAST((${Curate.QualityWeights.mkString("[", ", ", "]")})[
           |      CAST(${md5HexNSql("g", 8)} % ${Curate.QualityBuckets}
           |        AS INTEGER) + 1] AS DECIMAL(18,6)) AS wt
           |  FROM qg),
           |qs AS (SELECT doc_id,
           |    ${Num.floorAtSql(
               s"1.0 / (1.0 + exp(-((${Curate.QualityBias}) " +
                 "+ CAST(SUM(wt) AS DOUBLE) / COUNT(*))))", 6)}
           |      AS quality_score
           |  FROM qwt GROUP BY doc_id),
           |dup AS (SELECT DISTINCT id FROM (
           |    SELECT id_a AS id FROM pairs
           |    UNION ALL SELECT id_b FROM pairs)),
           |b AS (SELECT
           |    CAST(least(floor(quality_score * 10), 9) AS INTEGER)
           |      AS bucket,
           |    CAST(quality_score AS DECIMAL(18,6)) AS qd,
           |    (dup.id IS NOT NULL) AS is_dup
           |  FROM qs LEFT JOIN dup ON dup.id = qs.doc_id)
           |SELECT bucket, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup,
           |  ${Num.floorAtSql(
             "CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)" +
               " / COUNT(*)", 6)} AS dup_rate,
           |  ${Num.floorAtSql(
             "CAST(SUM(qd) AS DOUBLE) / COUNT(*)", 6)} AS mean_score
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,


      // the shingle stream as an inverted phrase index: (phrase, doc)
      // counts, phrase totals, per-phrase doc ranking
      "q224_phrase_postings" ->
        s"""WITH tokd AS (SELECT doc_id, $cleanToks AS t
           |    FROM (SELECT doc_id, $clean AS c FROM documents)),
           |sh AS (SELECT doc_id, UNNEST(${shinglesSql("t", 3)})
           |    AS phrase FROM tokd),
           |occ AS (SELECT phrase, doc_id, COUNT(*) AS n_occ
           |  FROM sh GROUP BY 1, 2),
           |top AS (SELECT phrase, CAST(SUM(n_occ) AS BIGINT) AS total
           |  FROM occ GROUP BY 1 ORDER BY total DESC, phrase LIMIT 3),
           |rkd AS (SELECT o.phrase, t.total, o.doc_id, o.n_occ,
           |    row_number() OVER (PARTITION BY o.phrase
           |      ORDER BY o.n_occ DESC, o.doc_id) AS rk
           |  FROM occ o JOIN top t USING (phrase))
           |SELECT phrase, total, doc_id, n_occ,
           |  CAST(rk AS INTEGER) AS rk
           |FROM rkd WHERE rk <= 10 ORDER BY phrase, rk""".stripMargin,


      // integer time-range cutoff from the bounds row; leaky = users
      // with events on both sides
      "q225_temporal_split" ->
        s"""WITH base AS (SELECT user_id, ${epochSql("ts")} AS es
           |    FROM events),
           |b AS (SELECT MIN(es) AS mn, MAX(es) AS mx FROM base),
           |f AS (SELECT user_id, es,
           |    mn + ((mx - mn) * 80) // 100 AS cutoff,
           |    es >= mn + ((mx - mn) * 80) // 100 AS is_test
           |  FROM base CROSS JOIN b),
           |s AS (SELECT CAST(MAX(cutoff) AS BIGINT) AS cutoff_es,
           |    CAST(SUM(CASE WHEN NOT is_test THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_train,
           |    CAST(SUM(CASE WHEN is_test THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_test,
           |    COUNT(DISTINCT CASE WHEN NOT is_test THEN user_id END)
           |      AS n_users_train,
           |    COUNT(DISTINCT CASE WHEN is_test THEN user_id END)
           |      AS n_users_test
           |  FROM f),
           |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_users
           |  FROM (SELECT user_id FROM f GROUP BY 1
           |    HAVING MAX(CASE WHEN is_test THEN 1 ELSE 0 END) = 1
           |       AND MAX(CASE WHEN is_test THEN 0 ELSE 1 END) = 1))
           |SELECT cutoff_es, n_train, n_test, n_users_train,
           |  n_users_test, n_leaky_users,
           |  ${Num.floorAtSql(
             "CAST(n_leaky_users AS DOUBLE) / n_users_test", 6)}
           |    AS leak_rate
           |FROM s CROSS JOIN l""".stripMargin,


      // the sig CTE's 8-slot signatures joined onto the verified
      // pairs; error sums are exact integers (jacc is 4dp-floored,
      // round(j*1e4) exact; estimate level = matches*1250)
      "q226_minhash_calibration" ->
        s"""WITH $verifiedPairsCte,
           |est AS (SELECT
           |    len(list_filter(range(1, 9),
           |      i -> sa.sig[CAST(i AS INTEGER)]
           |         = sb.sig[CAST(i AS INTEGER)])) AS est_matches,
           |    CAST(floor(p.jacc * 10000 + 0.5) AS BIGINT) AS jq
           |  FROM pairs p
           |  JOIN sig sa ON sa.id = p.id_a
           |  JOIN sig sb ON sb.id = p.id_b),
           |g AS (SELECT est_matches, COUNT(*) AS n_pairs,
           |    CAST(SUM(jq) AS BIGINT) AS sjq,
           |    CAST(SUM(abs(est_matches * 1250 - jq)) AS BIGINT)
           |      AS serr
           |  FROM est GROUP BY 1)
           |SELECT CAST(est_matches AS INTEGER) AS est_matches,
           |  CAST(est_matches AS DOUBLE) / 8 AS est_jaccard, n_pairs,
           |  ${Num.floorAtSql(
             "CAST(sjq AS DOUBLE) / n_pairs / 10000", 6)}
           |    AS mean_jaccard,
           |  ${Num.floorAtSql(
             "CAST(serr AS DOUBLE) / n_pairs / 10000", 6)}
           |    AS mean_abs_err
           |FROM g ORDER BY est_matches""".stripMargin,


      // recursive reachability over the shared multi-block pair CTE;
      // entity = min reachable name (lexicographic — the engine's
      // min-label CC on string ids computes the same fixpoint)
      "q227_entity_clusters" ->
        s"""WITH RECURSIVE
           |$multiBlockCte,
           |eedges AS (SELECT id_a AS src, id_b AS dst FROM mp
           |           UNION SELECT id_b, id_a FROM mp),
           |enodes AS (SELECT DISTINCT src AS id FROM eedges),
           |ereach(id, lbl) AS (
           |  SELECT id, id FROM enodes
           |  UNION
           |  SELECT e.dst, r.lbl FROM ereach r
           |  JOIN eedges e ON e.src = r.id),
           |ecomp AS (SELECT id AS name, MIN(lbl) AS entity
           |          FROM ereach GROUP BY id)
           |SELECT name, entity,
           |  COUNT(*) OVER (PARTITION BY entity) AS n_members
           |FROM ecomp ORDER BY name""".stripMargin,


      // realized recall of the q41/q43 oracles (verbatim, as vals)
      // against the q40 brute oracle — exact integer hit counts
      "q228_ann_recall" ->
        s"""WITH brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |ivf AS (SELECT q_id, c_id FROM ($topkIvfSql)),
           |lshk AS (SELECT q_id, c_id FROM ($topkLshSql)),
           |ivfkm AS (SELECT q_id, c_id FROM ($kmIvfTopkSql)),
           |nt AS (SELECT COUNT(*) AS n_truth FROM brute),
           |stats AS (
           |  SELECT 'ivf' AS method, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM ivf a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 'ivf_kmeans', COUNT(*), COUNT(b.q_id)
           |  FROM ivfkm a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 'lsh', COUNT(*), COUNT(b.q_id)
           |  FROM lshk a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT method, n_truth, n_approx, n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall
           |FROM stats CROSS JOIN nt ORDER BY method""".stripMargin,


      // multi-probe IVF: exact decimal-mean cell centroids (the q125
      // discipline), probe set per p = own cell (p = 1) union the p
      // nearest centroid-ranked cells (p >= 2) — pmin is the first p a
      // cell enters at, exactly Sim.topKIvf's probe policy — per-p
      // top-5 re-rank, hits vs the q40 brute oracle; every p emits a
      // row (zero-filled when nothing survives)
      "q229_ivf_multiprobe" ->
        s"""WITH q AS (SELECT vec_id AS q_id, label AS owncell,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id AS c_id, label AS cell,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           |  FROM embeddings),
           |cm AS (SELECT cell, d.pos AS pos,
           |    CAST(SUM(CAST(cv[d.pos] AS DECIMAL(27,10))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM c CROSS JOIN range(1, 65) AS d(pos)
           |  GROUP BY cell, d.pos),
           |cent AS (SELECT cell,
           |    list(CAST(CAST(m AS REAL) AS DOUBLE) ORDER BY pos) AS ce
           |  FROM cm GROUP BY cell),
           |centn AS (SELECT cell, ce,
           |    sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn
           |  FROM cent),
           |qn AS (SELECT q_id, owncell, qv,
           |    sqrt(list_sum(list_transform(qv, x -> x * x))) AS qnorm
           |  FROM q),
           |centp AS (SELECT q_id, qv, qnorm, cell,
           |    GREATEST(pr, 2) AS pmin FROM (
           |  SELECT n.q_id, n.qv, n.qnorm, t.cell,
           |    row_number() OVER (PARTITION BY n.q_id ORDER BY
           |      ${Num.floorAtSql(
             "list_sum(list_transform(range(1, 65)," +
               " i -> n.qv[i] * t.ce[i])) / (n.qnorm * t.cn)", 9)} DESC,
           |      t.cell ASC) AS pr
           |  FROM qn n CROSS JOIN centn t) WHERE pr <= 3),
           |ownp AS (SELECT q_id, qv, qnorm, owncell AS cell,
           |    1 AS pmin FROM qn),
           |probe AS (SELECT q_id, cell, MIN(pmin) AS pmin,
           |    any_value(qv) AS qv, any_value(qnorm) AS qnorm
           |  FROM (SELECT * FROM ownp UNION ALL SELECT * FROM centp)
           |  GROUP BY q_id, cell),
           |scored AS (SELECT p.q_id, c.c_id, p.pmin,
           |    ${Num.floorAtSql(
             "list_sum(list_transform(range(1, 65)," +
               " i -> p.qv[i] * c.cv[i])) / (p.qnorm *" +
               " sqrt(list_sum(list_transform(c.cv, x -> x * x))))", 4)}
           |      AS sim
           |  FROM c JOIN probe p USING (cell) WHERE p.q_id <> c.c_id),
           |perp AS (SELECT pp.p, s.q_id, s.c_id,
           |    row_number() OVER (PARTITION BY pp.p, s.q_id
           |      ORDER BY s.sim DESC, s.c_id ASC) AS rk
           |  FROM (VALUES (1), (2), (3)) pp(p)
           |  JOIN scored s ON s.pmin <= pp.p),
           |tk AS (SELECT p, q_id, c_id FROM perp WHERE rk <= 5),
           |brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |nt AS (SELECT COUNT(*) AS n_truth FROM brute),
           |stats AS (SELECT t.p, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM tk t LEFT JOIN brute b
           |    ON b.q_id = t.q_id AND b.c_id = t.c_id
           |  GROUP BY t.p)
           |SELECT CAST(pp.p AS INTEGER) AS probes, n_truth,
           |  COALESCE(n_approx, 0) AS n_approx,
           |  COALESCE(n_hits, 0) AS n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_truth", 4)}
           |  END AS recall
           |FROM (VALUES (1), (2), (3)) pp(p)
           |LEFT JOIN stats ON stats.p = pp.p
           |CROSS JOIN nt ORDER BY probes""".stripMargin,


      // the q43 oracle body replayed per bits value (2/4/6 hyperplanes),
      // hits vs the q40 brute oracle — the bits/recall trade measured
      "q231_lsh_bits_sweep" ->
        s"""WITH brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |l2 AS (SELECT q_id, c_id FROM (${topkLshSqlFor(2)})),
           |l4 AS (SELECT q_id, c_id FROM (${topkLshSqlFor(4)})),
           |l6 AS (SELECT q_id, c_id FROM (${topkLshSqlFor(6)})),
           |nt AS (SELECT COUNT(*) AS n_truth FROM brute),
           |stats AS (
           |  SELECT 2 AS bits, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM l2 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 4, COUNT(*), COUNT(b.q_id)
           |  FROM l4 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 6, COUNT(*), COUNT(b.q_id)
           |  FROM l6 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT CAST(bits AS INTEGER) AS bits, n_truth, n_approx,
           |  n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall
           |FROM stats CROSS JOIN nt ORDER BY bits""".stripMargin,


      // the OR-amplified LSH engine replayed per table count (1/2/4
      // independent plane sets at bits = 4), hits vs the q40 brute
      // oracle — the amplification/recall trade measured; the L = 1
      // row is pinned to q231's bits = 4 row (identical planes)
      "q232_lsh_tables_sweep" ->
        s"""WITH brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |t1 AS (SELECT q_id, c_id FROM (${lshTablesTkSqlFor(1)})),
           |t2 AS (SELECT q_id, c_id FROM (${lshTablesTkSqlFor(2)})),
           |t4 AS (SELECT q_id, c_id FROM (${lshTablesTkSqlFor(4)})),
           |nt AS (SELECT COUNT(*) AS n_truth FROM brute),
           |stats AS (
           |  SELECT 1 AS tables, COUNT(*) AS n_approx,
           |    COUNT(b.q_id) AS n_hits
           |  FROM t1 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 2, COUNT(*), COUNT(b.q_id)
           |  FROM t2 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  UNION ALL
           |  SELECT 4, COUNT(*), COUNT(b.q_id)
           |  FROM t4 a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT CAST(tables AS INTEGER) AS tables, n_truth, n_approx,
           |  n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall
           |FROM stats CROSS JOIN nt ORDER BY tables""".stripMargin,

      // per-bucket PSI replay: bucket b = day-index mod 3 (the staging
      // rule), Laplace +1 smoothing on both sides over the union key
      // set, natural log, 6dp floor — exactly psiBatch's arithmetic
      "q264_stream_psi" -> {
        def bucket(b: Int) =
          s"""bk$b AS (SELECT event_type, COUNT(*) AS ca
             |  FROM evb WHERE b = $b GROUP BY 1),
             |j$b AS (SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
             |  FROM bs FULL JOIN bk$b USING (event_type)),
             |n$b AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
             |    CAST(SUM(cb) AS BIGINT) AS nb, COUNT(*) AS k FROM j$b),
             |r$b AS (SELECT CAST($b AS BIGINT) AS batch_id,
             |    (SELECT na FROM n$b) AS n_events,
             |    ${Num.floorAtSql(
               "SUM((CAST(ca + 1 AS DOUBLE) / (na + k)" +
                 " - CAST(cb + 1 AS DOUBLE) / (nb + k))" +
                 " * ln((CAST(ca + 1 AS DOUBLE) / (na + k))" +
                 " / (CAST(cb + 1 AS DOUBLE) / (nb + k))))", 6)} AS psi
             |  FROM j$b CROSS JOIN n$b)""".stripMargin
        s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d
           |  FROM events),
           |md AS (SELECT MIN(d) AS m FROM ev),
           |evb AS (SELECT event_type,
           |    (d - (SELECT m FROM md)) % 3 AS b FROM ev),
           |bs AS (SELECT event_type, COUNT(*) AS cb FROM events
           |  GROUP BY 1),
           |${bucket(0)},
           |${bucket(1)},
           |${bucket(2)}
           |SELECT batch_id, n_events, psi, psi >= 0.2 AS drifted
           |FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1
           |      UNION ALL SELECT * FROM r2)
           |ORDER BY batch_id""".stripMargin
      },

      // bootstrap replay: identical md5 uniforms, identical Poisson(1)
      // CDF thresholds (interpolated from Agg.poisson1Cdf — ONE source
      // of the doubles), decimal-exact weighted sums, rank-2 order
      // statistics
      "q265_bootstrap_ci" -> {
        val cdf = Agg.poisson1Cdf
        val wCase = "CASE " + cdf.zipWithIndex.map { case (c, k) =>
          s"WHEN u < $c THEN $k"
        }.mkString(" ") + s" ELSE ${cdf.size} END"
        s"""WITH reps AS (SELECT event_type, value, r.r AS rep,
           |    CAST(${md5Hex4Sql(
             "CAST(event_id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)")}
           |      AS DOUBLE) / 65536.0 AS u
           |  FROM events CROSS JOIN range(0, 40) r(r)),
           |wt AS (SELECT event_type, rep, value, $wCase AS w FROM reps),
           |m AS (SELECT event_type, rep,
           |    ${Num.floorAtSql(
             "CAST(SUM(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE)" +
               " / SUM(w)", 6)} AS m
           |  FROM wt GROUP BY 1, 2 HAVING SUM(w) > 0),
           |rk AS (SELECT event_type, m,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY m ASC) AS ra,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY m DESC) AS rd
           |  FROM m),
           |ci AS (SELECT event_type,
           |    MIN(CASE WHEN ra = 2 THEN m END) AS ci_lo,
           |    MIN(CASE WHEN rd = 2 THEN m END) AS ci_hi
           |  FROM rk GROUP BY 1),
           |pt AS (SELECT event_type, COUNT(*) AS n,
           |    ${Num.floorAtSql(
             "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)" +
               " / COUNT(*)", 6)} AS point_mean
           |  FROM events GROUP BY 1)
           |SELECT p.event_type, n, point_mean, ci_lo, ci_hi
           |FROM pt p JOIN ci USING (event_type)
           |ORDER BY event_type""".stripMargin
      },

      // textbook MERGE semantics: full outer on the key, matched/insert
      // rows take the incoming side verbatim (CASE on presence, not
      // COALESCE), existing-only rows survive
      "q263_merge_scd1" ->
        """WITH ev AS (SELECT event_id, user_id, event_type, value
          |  FROM events),
          |ex AS (SELECT * FROM ev WHERE event_id % 3 <> 0),
          |inc AS (SELECT event_id, user_id,
          |    'merged' AS event_type, value * 2 AS value
          |  FROM ev WHERE event_id % 2 = 0)
          |SELECT COALESCE(i.event_id, e.event_id) AS event_id,
          |  CASE WHEN i.event_id IS NOT NULL THEN i.user_id
          |       ELSE e.user_id END AS user_id,
          |  CASE WHEN i.event_id IS NOT NULL THEN i.event_type
          |       ELSE e.event_type END AS event_type,
          |  CASE WHEN i.event_id IS NOT NULL THEN i.value
          |       ELSE e.value END AS value
          |FROM ex e FULL JOIN inc i ON e.event_id = i.event_id
          |ORDER BY event_id""".stripMargin,

      // the streaming admission engine answers to the batch signature
      // distinct — the q135 sig CTE verbatim (one fragment, two engines)
      "q266_stream_neardup_admission" ->
        s"""WITH ${minhashSigCte(8)}
           |SELECT DISTINCT sig_key FROM sig
           |ORDER BY sig_key""".stripMargin,

      // JL sign matrix regenerated from md5 parity (low bit of the
      // digest's first byte = low bit of its second hex digit);
      // projection summed in DOUBLE in coordinate order then rounded
      // to REAL (the engine's float32 storage), brute top-5 per
      // out_dim with the q40 cosine/floor/tie-break, hits vs the q40
      // brute truth
      "q267_jl_recall" ->
        s"""WITH signs AS (
           |  SELECT i.i AS i,
           |    list(CASE WHEN strpos('13579bdf', substr(md5(
           |        'jl:' || CAST(i.i AS VARCHAR) || ':' ||
           |        CAST(j.j AS VARCHAR)), 2, 1)) > 0
           |      THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE)
           |      END ORDER BY j.j) AS srow
           |  FROM range(0, 64) i(i) CROSS JOIN range(0, 64) j(j)
           |  GROUP BY i.i),
           |proj AS (
           |  SELECT e.vec_id, s.i,
           |    CAST(CAST(list_sum(list_transform(range(1, 65),
           |      p -> CAST(e.embedding[p] AS DOUBLE) * s.srow[p]))
           |      AS REAL) AS DOUBLE) AS y
           |  FROM embeddings e CROSS JOIN signs s),
           |ods AS (SELECT UNNEST([8, 16, 32, 64]) AS od),
           |pv AS (
           |  SELECT d.od, p.vec_id, list(p.y ORDER BY p.i) AS v
           |  FROM proj p CROSS JOIN ods d WHERE p.i < d.od
           |  GROUP BY d.od, p.vec_id),
           |brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |nt AS (SELECT COUNT(*) AS n_truth FROM brute),
           |scored AS (
           |  SELECT q.od, q.vec_id AS q_id, c.vec_id AS c_id,
           |    floor((
           |      list_sum(list_transform(range(1, q.od + 1),
           |        i -> q.v[i] * c.v[i]))
           |      / (sqrt(list_sum(list_transform(range(1, q.od + 1),
           |           i -> q.v[i] * q.v[i])))
           |       * sqrt(list_sum(list_transform(range(1, q.od + 1),
           |           i -> c.v[i] * c.v[i]))))) * 10000) / 10000 AS sim
           |  FROM pv q JOIN pv c ON q.od = c.od
           |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |topk AS (
           |  SELECT od, q_id, c_id FROM (
           |    SELECT od, q_id, c_id, row_number() OVER (
           |      PARTITION BY od, q_id ORDER BY sim DESC, c_id ASC) AS rk
           |    FROM scored) WHERE rk <= 5),
           |stats AS (
           |  SELECT a.od, COUNT(*) AS n_approx, COUNT(b.q_id) AS n_hits
           |  FROM topk a LEFT JOIN brute b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id
           |  GROUP BY a.od)
           |SELECT od AS out_dim, n_truth, n_approx, n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
               "CAST(n_hits AS DOUBLE) / n_truth", 4)} END AS recall
           |FROM stats CROSS JOIN nt ORDER BY out_dim""".stripMargin,

      // the q128/q130/q140/q245 CC chain over version 1's admitted
      // prefix — deterministic bucket membership is what makes the
      // version's doc set nameable in SQL
      "q270_cc_asof" -> ccOracleSqlFor("doc_id % 3 <= 1"),

      // covariance via the q125 DECIMAL discipline, then the 8 power
      // iterations unrolled as MATERIALIZED stages (each w-stage is
      // referenced twice — by its norm and its normalize — and each
      // v-stage by the next w-stage: inlining would replay the chain
      // 2^8 times, the bpeChainSql lesson). Every list_sum runs in
      // ascending index order, mirroring the driver's loops.
      "q268_pca_power" -> {
        val iterStages = (1 to 8).map { t =>
          s"""w$t AS MATERIALIZED (
             |  SELECT c.i AS i, list_sum(list_transform(range(1, 65),
             |    j -> c.cl[j] * p.vv[j])) AS w
             |  FROM cm c CROSS JOIN v${t - 1} p),
             |n$t AS MATERIALIZED (
             |  SELECT sqrt(list_sum(list(w * w ORDER BY i))) AS nm
             |  FROM w$t),
             |v$t AS MATERIALIZED (
             |  SELECT list(w / (SELECT nm FROM n$t) ORDER BY i) AS vv
             |  FROM w$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |st AS (SELECT COUNT(*) AS n FROM e),
           |mu AS MATERIALIZED (
           |  SELECT i.i AS i,
           |    CAST(SUM(CAST(v[i.i] AS DECIMAL(27,10))) AS DOUBLE)
           |      / (SELECT n FROM st) AS m
           |  FROM e CROSS JOIN range(1, 65) i(i) GROUP BY i.i),
           |sxx AS (
           |  SELECT i.i AS i, j.j AS j,
           |    CAST(SUM(CAST(v[i.i] * v[j.j] AS DECIMAL(27,10)))
           |      AS DOUBLE) AS s
           |  FROM e CROSS JOIN range(1, 65) i(i)
           |    CROSS JOIN range(1, 65) j(j)
           |  GROUP BY i.i, j.j),
           |cm AS MATERIALIZED (
           |  SELECT s.i AS i,
           |    list(s.s / (SELECT n FROM st) - mi.m * mj.m
           |      ORDER BY s.j) AS cl
           |  FROM sxx s JOIN mu mi ON mi.i = s.i JOIN mu mj ON mj.i = s.j
           |  GROUP BY s.i),
           |v0 AS (SELECT list_transform(range(1, 65),
           |  x -> CAST(1.0 AS DOUBLE)) AS vv),
           |$iterStages,
           |tr AS (SELECT list_sum(list(cl[i] ORDER BY i)) AS trace
           |  FROM cm)
           |SELECT CAST(i.i AS INTEGER) AS dim_pos,
           |  ${Num.floorAtSql("(SELECT vv FROM v8)[i.i]", 9)} AS loading,
           |  ${Num.floorAtSql("(SELECT nm FROM n8)", 9)} AS lambda,
           |  ${Num.floorAtSql(
             "(SELECT nm FROM n8) / (SELECT trace FROM tr)", 9)}
           |    AS explained
           |FROM range(1, 65) i(i) ORDER BY dim_pos""".stripMargin
      },

      // q268's replay extended with Hotelling deflation: per component
      // k, 8 iteration stages over cm{k}, then cm{k+1} subtracts the
      // outer product with the engine's sequencing — (vv[i]*vv[j])*nm,
      // product-first so the matrix stays bit-symmetric. nm rides the
      // deflation lambda via a CROSS JOIN (subqueries are not allowed
      // inside DuckDB lambdas). Every multiply-referenced stage is
      // MATERIALIZED (the bpeChainSql 2^k-inlining lesson).
      "q275_pca_topr" -> {
        val r = 4
        val compStages = (1 to r).map { k =>
          val iters = (1 to 8).map { t =>
            s"""w${k}x$t AS MATERIALIZED (
               |  SELECT c.i AS i, list_sum(list_transform(range(1, 65),
               |    j -> c.cl[j] * p.vv[j])) AS w
               |  FROM cm$k c CROSS JOIN v${k}x${t - 1} p),
               |n${k}x$t AS MATERIALIZED (
               |  SELECT sqrt(list_sum(list(w * w ORDER BY i))) AS nm
               |  FROM w${k}x$t),
               |v${k}x$t AS MATERIALIZED (
               |  SELECT list(w / (SELECT nm FROM n${k}x$t) ORDER BY i)
               |    AS vv
               |  FROM w${k}x$t)""".stripMargin
          }.mkString(",\n")
          val defl =
            if (k < r)
              s""",
                 |cm${k + 1} AS MATERIALIZED (
                 |  SELECT c.i AS i, list_transform(range(1, 65),
                 |    j -> c.cl[j] - (p.vv[c.i] * p.vv[j]) * q.nm) AS cl
                 |  FROM cm$k c CROSS JOIN v${k}x8 p
                 |    CROSS JOIN n${k}x8 q)""".stripMargin
            else ""
          s"v${k}x0 AS (SELECT vv FROM v0),\n" + iters + defl
        }.mkString(",\n")
        val finals = (1 to r).map { k =>
          s"""SELECT CAST($k AS INTEGER) AS comp,
             |  CAST(i.i AS INTEGER) AS dim_pos,
             |  ${Num.floorAtSql(s"(SELECT vv FROM v${k}x8)[i.i]", 9)}
             |    AS loading,
             |  ${Num.floorAtSql(s"(SELECT nm FROM n${k}x8)", 9)}
             |    AS lambda,
             |  ${Num.floorAtSql(
               s"(SELECT nm FROM n${k}x8) / (SELECT trace FROM tr)", 9)}
             |    AS explained
             |FROM range(1, 65) i(i)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (
           |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |st AS (SELECT COUNT(*) AS n FROM e),
           |mu AS MATERIALIZED (
           |  SELECT i.i AS i,
           |    CAST(SUM(CAST(v[i.i] AS DECIMAL(27,10))) AS DOUBLE)
           |      / (SELECT n FROM st) AS m
           |  FROM e CROSS JOIN range(1, 65) i(i) GROUP BY i.i),
           |sxx AS (
           |  SELECT i.i AS i, j.j AS j,
           |    CAST(SUM(CAST(v[i.i] * v[j.j] AS DECIMAL(27,10)))
           |      AS DOUBLE) AS s
           |  FROM e CROSS JOIN range(1, 65) i(i)
           |    CROSS JOIN range(1, 65) j(j)
           |  GROUP BY i.i, j.j),
           |cm1 AS MATERIALIZED (
           |  SELECT s.i AS i,
           |    list(s.s / (SELECT n FROM st) - mi.m * mj.m
           |      ORDER BY s.j) AS cl
           |  FROM sxx s JOIN mu mi ON mi.i = s.i JOIN mu mj ON mj.i = s.j
           |  GROUP BY s.i),
           |v0 AS (SELECT list_transform(range(1, 65),
           |  x -> CAST(1.0 AS DOUBLE)) AS vv),
           |$compStages,
           |tr AS (SELECT list_sum(list(cl[i] ORDER BY i)) AS trace
           |  FROM cm1)
           |SELECT * FROM (
           |$finals
           |) ORDER BY comp, dim_pos""".stripMargin
      },

      // the q176 BM25 replay with documents<10 as queries (self
      // excluded before ranking) fused with the q40 cosine replay at
      // top-20 each; rrf = two IEEE divisions added lex-then-dense,
      // exactly the engine's coalesce order
      "q279_hybrid_rrf" ->
        s"""WITH $hybridLexCte,
           |$hybridDenseBruteCte,
           |${rrfFusedCte("denb", "rb")}
           |SELECT q_id, c_id, rk_lex, rk_emb, rrf, rk
           |FROM rb ORDER BY q_id, rk""".stripMargin,

      // the same lexical arm and fusion tail with the dense arm
      // replayed as the FULL index chain: kmeans quantizer (kmeansAfCte)
      // + per-subspace PQ k-means (pqChainsSql) + the own-cell union
      // 2-nearest-centroid probe policy + ADC ranking (hybridDenseAdcCte)
      "q287_hybrid_rrf_ivfadc" ->
        s"""WITH $kmeansAfCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |$hybridDenseAdcCte,
           |$hybridLexCte,
           |${rrfFusedCte("dena", "ra")}
           |SELECT q_id, c_id, rk_lex, rk_emb, rrf, rk
           |FROM ra ORDER BY q_id, rk""".stripMargin,

      // both fusions replayed side by side (ONE lex CTE feeds both),
      // then exact hit counting of the indexed fusion against the
      // brute-armed fused truth — recall floored 4 dp, q254's stats
      // shape on fusion output
      "q288_fused_recall" ->
        s"""WITH $kmeansAfCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |$hybridDenseAdcCte,
           |$hybridLexCte,
           |$hybridDenseBruteCte,
           |${rrfFusedCte("dena", "ra")},
           |${rrfFusedCte("denb", "rb")},
           |nt AS (SELECT COUNT(*) AS n_truth FROM rb),
           |st AS (SELECT COUNT(*) AS n_approx, COUNT(b.q_id) AS n_hits
           |  FROM ra a LEFT JOIN rb b
           |    ON b.q_id = a.q_id AND b.c_id = a.c_id)
           |SELECT CAST(n_truth AS BIGINT) AS n_truth,
           |  CAST(n_approx AS BIGINT) AS n_approx,
           |  CAST(n_hits AS BIGINT) AS n_hits,
           |  CASE WHEN n_truth = 0 THEN 1.0
           |       ELSE ${Num.floorAtSql(
             "CAST(n_hits AS DOUBLE) / n_truth", 4)}
           |  END AS recall
           |FROM st CROSS JOIN nt""".stripMargin,

      // the kmeans chain trained on the base slice only, frozen
      // assignment with integer floored sims over everything, per-cell
      // integer sums on the 0..7 grid — ONE string for the batch (q280)
      // and streaming-append (q282) engines
      "q280_ivf_frozen_append" -> ivfFrozenOracleSql,
      "q282_stream_ivf_append" -> ivfFrozenOracleSql,

      // the streaming auto-compaction contract (q332's dense twin):
      // rows are q299's serving string; the layout label replays the
      // in-commit rule (1 standing + 3 streamed segments crosses the
      // threshold) against the engine's physically-derived label
      "q333_stream_ann_auto_compact" ->
        s"""SELECT CASE WHEN 4 >= 4 THEN 'tiered' ELSE 'fold' END
           |    AS layout, * FROM (
           |$annServeOracleSql)
           |ORDER BY q_id, rk""".stripMargin,
      // the stored-merge engine summarizes to the SAME contract as
      // the in-memory and streaming frozen-append engines
      "q293_ann_index_append" -> ivfFrozenOracleSql,

      // the full sweep replay: kmeans + PQ chains once, the per-p ADC
      // rank lists from ONE pmin-annotated candidate set, lex + brute
      // arms at listK=40 (smaller listKs are prefix filters), then
      // 12 fusion/stat tails — the q288 oracle generalized to the grid
      "q294_fused_recall_sweep" ->
        s"""WITH $kmeansAfCte,
           |${pqChainsSql(4, 8, 16, 2)},
           |${hybridDenseAdcSweepCte(4, 40)},
           |${hybridLexCteK(40)},
           |${hybridDenseBruteCteK(40)},
           |${fusedSweepTailSql(4, Seq(10, 20, 40))}""".stripMargin,

      // the whole frozen index retrained from scratch in SQL — the
      // base-slice kmeans chain (whole-corpus assignment), base-slice
      // PQ training (whole-corpus codes via pqChainsSql's trainWhere),
      // the stored probe geometry recomputed as per-cell member
      // means, then the q254-shape ADC ranking at probes = 2, top 5
      "q299_ann_index_serve" -> annServeOracleSql,

      // the SAME string: serving from the compacted snapshot must
      // equal serving from the version history — one contract, two
      // physical layouts
      "q302_ann_index_compact" -> annServeOracleSql,

      // the as-of-v0 contract: the identical frozen serving chain
      // with the corpus side (candidates, own-cells, probe geometry)
      // restricted to the standing slice — what version 0 physically
      // stores
      "q311_ann_asof_serve" ->
        s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
             annSizedKSql)},
           |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
           |  FROM af a JOIN e ON e.vec_id = a.vec_id
           |  WHERE NOT (a.vec_id % 5 = 0)),
           |${pqChainsSql(4, 8, 16, 2,
             trainWhere = "NOT (vec_id % 5 = 0)")},
           |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
           |SELECT q_id, c_id, rk_emb AS rk FROM dena
           |ORDER BY q_id, rk""".stripMargin,

      // the MID-CHAIN contract: the identical frozen serving chain
      // with the corpus side (candidates, own-cells, probe geometry)
      // restricted to standing ∪ the first ingest batch — exactly
      // what segments 0..1 of the c3 history hold between its two
      // appends
      "q313_ann_midchain_serve" ->
        s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
             annSizedKSql)},
           |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
           |  FROM af a JOIN e ON e.vec_id = a.vec_id
           |  WHERE NOT (a.vec_id % 5 = 0) OR a.vec_id % 10 = 0),
           |${pqChainsSql(4, 8, 16, 2,
             trainWhere = "NOT (vec_id % 5 = 0)")},
           |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
           |SELECT q_id, c_id, rk_emb AS rk FROM dena
           |ORDER BY q_id, rk""".stripMargin,

      // the post-delete contract: the identical frozen chain (the
      // quantizer/codebooks train on the PRE-delete standing slice —
      // frozen means frozen; a delete masks, it never retrains) with
      // the corpus side restricted to the survivors. ONE string for
      // the masked fold (q316) and the compacted survivors (q318).
      "q316_ann_delete_serve" -> annDeleteOracleSql,
      "q318_ann_delete_compact" -> annDeleteOracleSql,

      // the compaction-policy replay: live/tombstone counts from the
      // corpus predicates, chain topologies as contract constants,
      // integer share arithmetic, and the two-arm rule
      "q324_compaction_policy" -> compactionPolicyOracleSql,

      // the compaction-EXECUTE contract (q326's dense twin): the
      // policy rule replayed per chain picks the layout label; the
      // serve rows are the frozen chain scoped to each tombstoned
      // head's survivors (layout-invariant by q318's contract)
      "q327_ann_compaction_execute" -> {
        val mdRule = "((SELECT COUNT(*) FROM embeddings WHERE " +
          "vec_id % 7 = 3) * 1000000) // " +
          "(SELECT COUNT(*) FROM embeddings) >= 125000 OR 3 >= 4"
        val m3Rule = "((SELECT COUNT(*) FROM embeddings WHERE " +
          "vec_id % 5 <> 0 AND vec_id % 7 = 3) * 1000000) // " +
          "(SELECT COUNT(*) FROM embeddings) >= 125000 OR 3 >= 4"
        def serve(scope: String): String =
          s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
               annSizedKSql)},
             |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
             |  FROM af a JOIN e ON e.vec_id = a.vec_id
             |  WHERE $scope),
             |${pqChainsSql(4, 8, 16, 2,
               trainWhere = "NOT (vec_id % 5 = 0)")},
             |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
             |SELECT q_id, c_id, rk_emb AS rk FROM dena""".stripMargin
        s"""SELECT 'md' AS chain,
           |  CASE WHEN $mdRule THEN 'compacted' ELSE 'masked' END
           |    AS layout, * FROM (
           |${serve("NOT (a.vec_id % 7 = 3)")})
           |UNION ALL
           |SELECT 'm3',
           |  CASE WHEN $m3Rule THEN 'compacted' ELSE 'masked' END,
           |  * FROM (
           |${serve("(a.vec_id % 5 <> 0 AND NOT (a.vec_id % 7 = 3))" +
              " OR a.vec_id % 5 = 0")})
           |ORDER BY chain, q_id, rk""".stripMargin
      },

      // the tiered-EXECUTE contract (q328's dense twin): both
      // all-append chains' heads are the full corpus — the q299
      // serving chain with full-corpus membership and member-mean
      // probe geometry — and the layout label replays the policy rule
      // with each chain's structural facts (share is literally 0: an
      // all-append chain publishes no delete segment)
      "q329_ann_tiered_execute" -> {
        val serve: String =
          s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
               annSizedKSql)},
             |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
             |  FROM af a JOIN e ON e.vec_id = a.vec_id),
             |${pqChainsSql(4, 8, 16, 2,
               trainWhere = "NOT (vec_id % 5 = 0)")},
             |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
             |SELECT q_id, c_id, rk_emb AS rk FROM dena""".stripMargin
        s"""SELECT 'c4' AS chain,
           |  CASE WHEN (0 >= 125000 OR 4 >= 4) THEN 'tiered'
           |    ELSE 'fold' END AS layout, * FROM (
           |$serve)
           |UNION ALL
           |SELECT 'c3',
           |  CASE WHEN (0 >= 125000 OR 3 >= 4) THEN 'tiered'
           |    ELSE 'fold' END, * FROM (
           |$serve)
           |ORDER BY chain, q_id, rk""".stripMargin
      },

      // the takedown-maintained hybrid: q300's fusion re-run from
      // scratch over the SURVIVING corpus on both arms — victims
      // drop as queries and candidates, the dense arm's probe
      // geometry is the survivors' member means, the lexical arm's
      // df/dl/stats are survivor-scoped
      "q330_hybrid_takedown_serve" ->
        s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
             annSizedKSql)},
           |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
           |  FROM af a JOIN e ON e.vec_id = a.vec_id
           |  WHERE NOT (a.vec_id % 7 = 3)),
           |${pqChainsSql(4, 8, 16, 2,
             trainWhere = "NOT (vec_id % 5 = 0)")},
           |${hybridDenseAdcCteOver("afv", 20, annSizedProbesSql)},
           |${hybridLexCteOver("NOT (doc_id % 7 = 3)", 20)},
           |${rrfFusedCte("dena", "ra")}
           |SELECT q_id, c_id, rk_lex, rk_emb, rrf, rk
           |FROM ra ORDER BY q_id, rk""".stripMargin,

      // the MIXED-chain contract: the frozen serving chain with the
      // corpus side (candidates, own-cells, probe geometry) scoped to
      // each version's surviving vector set, union'd with the version
      // column — v1 masks the captured takedown, v2 adds the
      // post-delete batch whose %7=3 vectors stay live
      "q323_ann_mixed_asof" ->
        Seq("NOT (a.vec_id % 5 = 0)",
          "NOT (a.vec_id % 5 = 0) AND NOT (a.vec_id % 7 = 3)",
          "(NOT (a.vec_id % 5 = 0) AND NOT (a.vec_id % 7 = 3))" +
            " OR a.vec_id % 5 = 0")
          .zipWithIndex.map { case (scope, v) =>
            s"""SELECT CAST($v AS BIGINT) AS version, * FROM (
               |WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)",
                   annSizedKSql)},
               |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
               |  FROM af a JOIN e ON e.vec_id = a.vec_id
               |  WHERE $scope),
               |${pqChainsSql(4, 8, 16, 2,
                   trainWhere = "NOT (vec_id % 5 = 0)")},
               |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
               |SELECT q_id, c_id, rk_emb AS rk FROM dena)"""
              .stripMargin
          }.mkString("", "\nUNION ALL\n",
            "\nORDER BY version, q_id, rk"),

      // q287's fusion tail over the FROZEN-trained arms: the lexical
      // CTE is the full-corpus BM25 chain (merge ≡ build(all) is
      // q292's property-tested contract, so the merged frames replay
      // as one chain), the dense arm retrains the frozen base
      // quantizer + codebooks from scratch — one fusion, maintained
      // engines vs from-scratch oracle
      "q300_hybrid_maintained" ->
        s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)", annSizedKSql)},
           |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
           |  FROM af a JOIN e ON e.vec_id = a.vec_id),
           |${pqChainsSql(4, 8, 16, 2,
             trainWhere = "NOT (vec_id % 5 = 0)")},
           |${hybridDenseAdcCteOver("afv", 20, annSizedProbesSql)},
           |$hybridLexCte,
           |${rrfFusedCte("dena", "ra")}
           |SELECT q_id, c_id, rk_lex, rk_emb, rrf, rk
           |FROM ra ORDER BY q_id, rk""".stripMargin
  )

  /** The sized-serving derivations (q299/q300/q302): the seed budget
    * is ⌈√n⌉ over the WHOLE indexed corpus (the per-cell candidate
    * bound n/k is about what the index serves, not what it trained
    * on), and the probe budget is max(2, ⌈k/4⌉) derived from the
    * TRAINED cell count (`c2` — kmeansFrozenCte's final centroids),
    * exactly [[graft.ops.AnnIndex.sizing]]'s arithmetic — the q298
    * oracle discipline applied to the index store, so the driver gate
    * proves the sizing policy on every serving query. */
  private val annSizedKSql: String =
    "(SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) FROM e)"
  private val annSizedProbesSql: String =
    "GREATEST(2, CAST(ceil(CAST((SELECT COUNT(*) FROM c2) AS DOUBLE)" +
      " * 0.25) AS INTEGER))"

  /** The q324 replay: per (side, chain) live/tombstone counts from
    * the corpus predicates (md deletes %7=3 at the head; m3 captures
    * it against the then-live standing slice only), segment counts as
    * chain-topology constants, integer share, two-arm rule. */
  private val compactionPolicyOracleSql: String = {
    def side(s: String, tbl: String, id: String): String = {
      def cnt(w: String) = s"(SELECT COUNT(*) FROM $tbl WHERE $w)"
      Seq(
        s"SELECT '$s' AS side, 'c3' AS chain, 3 AS n_segments, " +
          s"${cnt("TRUE")} AS n_live, 0 AS n_tomb",
        s"SELECT '$s', 'c4', 4, ${cnt("TRUE")}, 0",
        s"SELECT '$s', 'default', 2, ${cnt("TRUE")}, 0",
        s"SELECT '$s', 'm3', 3, " +
          s"${cnt(s"NOT ($id % 5 <> 0 AND $id % 7 = 3)")}, " +
          s"${cnt(s"$id % 5 <> 0 AND $id % 7 = 3")}",
        s"SELECT '$s', 'md', 3, ${cnt(s"NOT ($id % 7 = 3)")}, " +
          s"${cnt(s"$id % 7 = 3")}"
      ).mkString("\nUNION ALL ")
    }
    s"""WITH c AS (
       |${side("ann", "embeddings", "vec_id")}
       |UNION ALL ${side("lex", "documents", "doc_id")})
       |SELECT side, chain, CAST(n_segments AS INTEGER) AS n_segments,
       |  CAST(n_live AS BIGINT) AS n_live,
       |  CAST(n_tomb AS BIGINT) AS n_tomb,
       |  CAST((n_tomb * 1000000) // (n_live + n_tomb) AS BIGINT)
       |    AS tomb_share_e6,
       |  ((n_tomb * 1000000) // (n_live + n_tomb) >= 125000
       |    OR n_segments >= 4) AS compact
       |FROM c ORDER BY side, chain""".stripMargin
  }

  // private[registry]: q331's epoch-takedown oracle (Reg3) embeds
  // this as its KEEP branch — the standing epoch's takedown IS the
  // md chain's head serve; one contract, shared string
  private[registry] val annDeleteOracleSql: String =
    s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)", annSizedKSql)},
       |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
       |  FROM af a JOIN e ON e.vec_id = a.vec_id
       |  WHERE NOT (a.vec_id % 7 = 3)),
       |${pqChainsSql(4, 8, 16, 2,
         trainWhere = "NOT (vec_id % 5 = 0)")},
       |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
       |SELECT q_id, c_id, rk_emb AS rk FROM dena
       |ORDER BY q_id, rk""".stripMargin

  // private[registry]: q321's retrain-execute oracle (Reg3) embeds
  // this as its KEEP branch — one serving contract, shared string
  private[registry] val annServeOracleSql: String =
    s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)", annSizedKSql)},
       |afv AS MATERIALIZED (SELECT a.vec_id, e.v, a.cell
       |  FROM af a JOIN e ON e.vec_id = a.vec_id),
       |${pqChainsSql(4, 8, 16, 2,
         trainWhere = "NOT (vec_id % 5 = 0)")},
       |${hybridDenseAdcCteOver("afv", 5, annSizedProbesSql)}
       |SELECT q_id, c_id, rk_emb AS rk FROM dena
       |ORDER BY q_id, rk""".stripMargin

  private val ivfFrozenOracleSql: String =
        s"""WITH ${kmeansFrozenCte("NOT (vec_id % 5 = 0)")},
           |d AS (SELECT (vec_id % 5 = 0) AS is_delta, cell, sim_e9
           |  FROM af),
           |g AS (SELECT cell,
           |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_base,
           |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_delta,
           |    CAST(SUM(CASE WHEN NOT is_delta THEN sim_e9 ELSE 0 END)
           |      AS BIGINT) AS sim_e9_base,
           |    CAST(SUM(CASE WHEN is_delta THEN sim_e9 ELSE 0 END)
           |      AS BIGINT) AS sim_e9_delta
           |  FROM d GROUP BY cell)
           |SELECT CAST(r.i AS INTEGER) AS cell,
           |  COALESCE(n_base, 0) AS n_base,
           |  COALESCE(n_delta, 0) AS n_delta,
           |  COALESCE(sim_e9_base, 0) AS sim_e9_base,
           |  COALESCE(sim_e9_delta, 0) AS sim_e9_delta
           |FROM range(0, 8) r(i) LEFT JOIN g ON g.cell = r.i
           |ORDER BY cell""".stripMargin
}
