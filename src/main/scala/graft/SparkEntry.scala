package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Agg, Artifacts, Audio, Curate, Dedup, EventsOps, Graph, Layout, Multimodal, Num, Prune, Sentiment, Sim, Sketch, Skew, Star, Text}
import graft.sources.Sources

/** Driver contract — one named query per operator from SURVEY.md §2 plus the
  * north-star extensions (dedup family, similarity search, text analysis,
  * event windows, multimodal plumbing), each with DuckDB-runnable oracle SQL
  * over the same parquet tables.
  *
  * Cross-engine determinism rules (SURVEY.md §7.4) used throughout:
  *   - money sums go through DECIMAL(18,2) (exact, order-insensitive) and
  *     are surfaced as DOUBLE, matching `CAST(SUM(CAST(x AS DECIMAL(18,2)))
  *     AS DOUBLE)` bit-for-bit;
  *   - every hash is md5 (identical in Spark and DuckDB);
  *   - every query ends in a total ORDER BY with explicit tie-breaks;
  *   - window keys are epoch seconds (BIGINT), never engine timestamps.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact order-insensitive sum of a 2-dp double column, as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole analytics spine (SURVEY.md §7.3 M1): clean →
    * sentiment → label → dims → fact → star-join-back → distribution.
    */
  def entry(spark: SparkSession): DataFrame =
    labelDistribution(spark, "/root/testdata/sf0.001")

  /** M1 spine (ops 8,10,11,13,14,15,16). */
  private def labelDistribution(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val enriched = docs
      .withColumn("clean_text", Text.cleanText(col("text")))
      .withColumn("sentiment", Sentiment.score(col("clean_text")))
      .withColumn("label", Text.sentimentLabel(col("sentiment")))
    val dimSrc = Star.dim(enriched, "source", "source_id")
    val fact = Star.lookup(enriched, dimSrc, "source")
      .select(col("doc_id"), col("sentiment"), col("label"), col("source_id"))
    Star.starJoin(fact, Seq((dimSrc, "source_id")))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label")
  }

  // ---- oracle SQL fragments shared by several queries -------------------

  /** DuckDB expression for Text.cleanText over a raw text expr. */
  private def cleanSql(c: String): String =
    s"lower(trim(regexp_replace($c, 'http\\S+|www\\S+|[^a-zA-Z\\s]', '', 'g')))"

  /** DuckDB expression for Text.tokens over a text expr. */
  private def toksSql(c: String): String =
    s"list_filter(string_split($c, ' '), t -> t <> '')"

  private val labelCase =
    "CASE WHEN sentiment > 0.1 THEN 'positive' " +
      "WHEN sentiment < -0.1 THEN 'negative' ELSE 'neutral' END"

  /** DuckDB: epoch seconds (floor) of a timestamp, BIGINT — matches Spark's
    * unix_timestamp (floorDiv of microseconds).
    */
  private def epochSql(c: String): String = s"(epoch_us($c) // 1000000)"

  /** DuckDB: first 4 md5 hex nibbles of `arg` as an INTEGER in [0, 65535]
    * (no hex→int builtin; decode via character position — same trick as the
    * q34 oracle). Shared by the SimHash and sign-LSH oracles.
    */
  private def md5Hex4Sql(arg: String): String = md5HexNSql(arg, 4)

  /** DuckDB: first `n` md5 hex nibbles of `arg` as a BIGINT (n <= 15 so
    * the value stays positive in a signed 64-bit int).
    */
  private def md5HexNSql(arg: String, n: Int): String = {
    require(n >= 1 && n <= 15, s"need 1 <= n <= 15 nibbles, got $n")
    (0 until n).map { i =>
      s"(strpos('0123456789abcdef', substring(md5($arg), ${i + 1}, 1)) - 1) * ${1L << (4 * (n - 1 - i))}"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB expression mirroring Dedup.shingles(clean, w) over a token-list
    * expr.
    */
  private def shinglesSql(toks: String, w: Int = 3): String = {
    val parts = (0 until w).map(k => s"t[i+${k + 1}]")
      .mkString(" || ' ' || ")
    s"CASE WHEN len($toks) < $w THEN [] ELSE " +
      s"list_transform(range(0, len($toks) - $w + 1), i -> $parts) END"
  }

  // ---- the inventory ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // op 16+ flagship: TPC-H-Q1-shaped pricing summary over lineitem.
    "q01_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dec = (c: String) => col(c).cast("decimal(18,2)")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec("l_extendedprice") *
            (lit(1.0).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ops 1-2: multi-pattern keyword search + top-N (extract shape).
    "q02_keyword_topn" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(Text.regexFlag(col("text"), "(?i)stream|window|merge"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .limit(50)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))),

    // op 3: CSV sink + source round-trip (the reference's backup file,
    // etl_pipeline.py:66-70) — write, re-read with the declared schema,
    // aggregate the re-read copy. documents.text is ASCII word-soup, so
    // the trip is lossless.
    "q03_csv_roundtrip" -> ((s, dir) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q03-${ProcessHandle.current().pid}"
      Sources.writeCsv(t(s, dir, "documents"), path)
      Sources.readCsv(s, path, Tables.documents)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("source")
    }),

    // scale path — directory-partitioned sink + partition-pruned read:
    // the lang predicate prunes whole directories at file listing
    // (PartitionFilters, not data filters).
    "q04_partitioned_prune" -> ((s, dir) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q04-${ProcessHandle.current().pid}"
      Sources.writePartitioned(t(s, dir, "documents"), path, Seq("lang"))
      s.read.schema(Tables.documents).parquet(path)
        .where(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("source")
    }),

    // scale path — co-located bucketed join: both sides bucketed+sorted on
    // the join key, so the SortMergeJoin runs with NO exchange (the 100 TB
    // fact⋈fact shape; see SCALE.md and SkewBucketSpec's plan assertion).
    "q05_bucketed_join" -> ((s, dir) => {
      val pid = ProcessHandle.current().pid
      val ot = s"graft_q05_orders_$pid"
      val ct = s"graft_q05_customer_$pid"
      // bucket only the columns the downstream join/agg needs — a real
      // bucketed-load would too (the write cost scales with bytes, and
      // bucketing pays off per retained column read back)
      Sources.writeBucketed(
        t(s, dir, "orders").select("o_custkey", "o_totalprice"),
        ot, "o_custkey", 8)
      Sources.writeBucketed(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        ct, "c_custkey", 8)
      // merge hint: at harness scale Catalyst would broadcast the small
      // side, which hides the point — at 100 TB neither side broadcasts,
      // and the bucketed SMJ runs with NO exchange (PlanSpec asserts it)
      s.table(ot).hint("merge")
        .join(s.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")
    }),

    // API surface — the same engine drives ANSI SQL over registered views
    // (spark.sql entry point; the DataFrame queries and this compile to
    // identical plans through Catalyst).
    "q06_sql_api" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderstatus
        ORDER BY c_mktsegment, o_orderstatus""")
    }),

    // op 1 variant — JSON-lines source with declared schema (splittable
    // layout; no inference scan).
    "q44_jsonl_roundtrip" -> ((s, dir) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q44-${ProcessHandle.current().pid}"
      t(s, dir, "documents").write.mode("overwrite").json(path)
      Sources.readJsonLines(s, path, Tables.documents)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    // op 3 variant — ORC sink + source round-trip (columnar alternative;
    // same declared-schema discipline as parquet/CSV/JSON).
    "q45_orc_roundtrip" -> ((s, dir) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q45-${ProcessHandle.current().pid}"
      t(s, dir, "documents").write.mode("overwrite").orc(path)
      s.read.schema(Tables.documents).orc(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          (sum(col("n_chars")) / count(lit(1))).as("avg_chars"))
        .orderBy("lang")
    }),

    // op 7: deterministic keep-first dedup.
    "q07_dedup_keepfirst" -> ((s, dir) =>
      Dedup.keepFirst(t(s, dir, "documents"), Seq("source"),
          Seq(col("doc_id").asc))
        .select(col("doc_id"), col("source"))
        .orderBy("source")),

    // op 8: clean_text normalization.
    "q08_clean_text" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.cleanText(col("text")).as("clean_text"))
        .orderBy("doc_id")),

    // op 9: regex boolean predicates (na=false semantics).
    "q09_regex_flag" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.regexFlag(col("text")).as("dropout_mentioned"),
        Text.regexFlag(col("text"), "(?i)spark|stream").as("mentions_spark"))
        .orderBy("doc_id")),

    // op 10: lexicon-average sentiment.
    "q10_sentiment" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          Sentiment.score(Text.cleanText(col("text"))).as("sentiment"))
        .orderBy("doc_id")),

    // op 11: CASE bucketing into sentiment labels.
    "q11_sentiment_label" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("sentiment",
          Sentiment.score(Text.cleanText(col("text"))))
        .select(col("doc_id"), col("sentiment"),
          Text.sentimentLabel(col("sentiment")).as("label"))
        .orderBy("doc_id")),

    // op 12: date-part extraction.
    "q12_year_extract" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("year"))
        .agg(count(lit(1)).as("n"))
        .orderBy("year")),

    // op 13: fact ⋈ dims star join with broadcast dims.
    "q13_star_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      Star.starJoin(orders, Seq((cust, "o_custkey"), (nat, "c_nationkey")))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy("n_name")
    }),

    // op 14: dim-key lookup join (broadcast map side).
    "q14_dim_lookup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dim = Star.dim(docs, "source", "source_id")
      Star.lookup(docs, dim, "source")
        .select(col("doc_id"), col("source"), col("source_id"))
        .orderBy("doc_id")
    }),

    // op 15: deterministic surrogate-key dimension build.
    "q15_surrogate_dim" -> ((s, dir) =>
      Star.dim(t(s, dir, "documents"), "source", "source_id")
        .orderBy("source_id")),

    // op 16 + M1 spine: sentiment label distribution.
    "q16_label_distribution" -> ((s, dir) => labelDistribution(s, dir)),

    // op 17: two-key group-by count.
    "q17_count_2keys" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("year", "o_orderstatus")),

    // op 18: group-by + pivot + null-fill (explicit pivot values).
    "q18_pivot_counts" -> ((s, dir) =>
      Agg.pivotCounts(t(s, dir, "documents"), "source", "lang",
          Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source")),

    // op 19: whole-table scalar insights.
    "q19_scalar_insights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("sentiment", Sentiment.score(Text.cleanText(col("text"))))
        .withColumn("label", Text.sentimentLabel(col("sentiment")))
        .withColumn("flagged", Text.regexFlag(col("text"), "(?i)spark|stream"))
      // pct as floor((10000 * k) / n) / 100 over exact integer counts:
      // avg() of 0/1 doubles is summed in engine-specific order/precision
      // (DuckDB AVG != Spark sum/count in the last ulp), which flipped the
      // floor at a 2dp boundary in round 1 — k and n are exact, so the
      // single double division is bit-identical in both engines.
      docs.agg(
        count(lit(1)).as("n_docs"),
        sum(col("flagged").cast("long")).as("n_flagged"),
        (floor(lit(10000.0) *
            sum((col("label") === "neutral").cast("long")) / count(lit(1)))
          / 100).as("pct_neutral"))
    }),

    // op 20: argmax by frequency with deterministic tie-break.
    "q20_argmax" -> ((s, dir) =>
      Agg.argmaxByCount(t(s, dir, "documents"), "source")),

    // op 21: sorted DISTINCT.
    "q21_distinct_sorted" -> ((s, dir) =>
      t(s, dir, "documents").select(col("lang")).distinct().orderBy("lang")),

    // op 22 + window ext: top-N per group.
    "q22_topn_per_group" -> ((s, dir) =>
      Agg.topNPerGroup(t(s, dir, "orders"), Seq("o_orderstatus"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice"), col("rk"))
        .orderBy("o_orderstatus", "rk")),

    // op 4/15: INSERT IGNORE as left-anti join.
    "q23_upsert_ignore" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val existing = docs.where(col("doc_id") % 3 === 0)
      Star.upsertIgnore(existing, docs, Seq("doc_id"))
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // op 15 incremental: dim upsert assigns new ids after current max.
    "q24_dim_upsert" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val existing = Star.dim(
        docs.where(col("source").isin("src0", "src1", "src2")),
        "source", "source_id")
      Star.dimUpsert(existing, docs, "source", "source_id")
        .orderBy("source_id")
    }),

    // §2.5 gap — set operations (union / intersect / except): symmetric
    // difference of two keyed subsets.
    "q25_set_ops" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.where(col("doc_id") % 2 === 0).select("doc_id")
      val b = docs.where(col("doc_id") % 3 === 0).select("doc_id")
      a.union(b).distinct().except(a.intersect(b)).orderBy("doc_id")
    }),

    // §2.5 gap — bag-semantics set ops (EXCEPT ALL keeps multiplicity).
    "q68_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"))
      val a = li.where(col("l_orderkey") % 2 === 0)
      val b = li.where(col("l_orderkey") % 3 === 0)
      a.exceptAll(b)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }),

    // §2.5 gap — deterministic array aggregation (sorted collect_set).
    // Surfaced as a joined string: the driver's comparator is pandas-based
    // and cannot sort/hash raw array cells (round-2 q69 comparator crash).
    "q69_collect_agg" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("source")
        .agg(array_join(sort_array(collect_set(col("lang"))), ",").as("langs"),
          count(lit(1)).as("n"))
        .orderBy("source")),

    // §2.5 gap — rollup with subtotal rows (null grouping keys).
    "q26_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("total"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // §2.5 gap — cube over (year, status).
    "q27_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(year(col("o_orderdate")).as("year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("year").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    // §2.5 gap — non-equi range join against a broadcast band table.
    "q28_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq((0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
        (150000.0, 1.0e9, "high")).toDF("lo", "hi", "band")
      t(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("band")
    }),

    // §2.5 gap — exact interpolated percentiles per group. SCALE CEILING
    // (documented in SCALE.md): exact percentile() keeps a per-group value
    // buffer, so memory is O(largest group) per task — groups must fit
    // executor memory. This is the exact variant of the q90 sketch path
    // (percentile_approx = fixed-size KLL-style state); at 100 TB run q90,
    // or pre-aggregate values to a bounded grid before q29.
    // Stabilized with
    // floor(x*100)/100, NOT round(): Spark rounds the shortest decimal
    // repr (BigDecimal HALF_UP) while DuckDB rounds the binary value
    // (std::round(x*100)/100), and interpolating 2dp money at f=0.5
    // produces .xx5 ties where they disagree. floor over identical doubles
    // is bit-deterministic in both engines.
    "q29_quantiles" -> ((s, dir) => {
      val f2 = (c: Column) => floor(c * 100) / 100
      // one percentile buffer for both percentages (array form) — two
      // separate percentile() aggs each keep their own per-group value
      // buffer and double the aggregation cost
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          f2(col("ps")(0)).as("p50"), f2(col("ps")(1)).as("p90"), col("n"))
        .orderBy("l_returnflag")
    }),

    // north star — document fingerprinting (rolling/content hash).
    "q30_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // north star — exact near-dup dedup via content fingerprint.
    "q31_fingerprint_dedup" -> ((s, dir) =>
      Dedup.keepFirst(
          t(s, dir, "documents")
            .withColumn("fp", Text.fingerprint(col("text"))),
          Seq("fp"), Seq(col("doc_id").asc))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")),

    // north star — MinHash+LSH near-dup candidate pairs.
    "q32_minhash_pairs" -> ((s, dir) => {
      val bp = Dedup.planBands(threshold = 0.8, targetRecall = 0.98)
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          k = bp.k, bands = bp.bands)
        .orderBy("id_a", "id_b")
    }),

    // north star — exact n-gram Jaccard (bounded subset; at scale this runs
    // after LSH bucketing, see Dedup scaladoc).
    "q33_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
          t(s, dir, "documents").where(col("doc_id") < 200),
          "doc_id", "text", w = 3, minJaccard = 0.1)
        .orderBy("id_a", "id_b")),

    // north star — SimHash signatures (native single-pass expression).
    "q34_simhash" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("t", Text.cleanTokens(col("text")))
        .select(col("doc_id"), Dedup.simhash16Native(col("t")).as("simhash"))
        .orderBy("doc_id")),

    // north star — SimHash near-dup pairs via nibble banding + exact
    // hamming filter (no all-pairs materialization).
    "q35_simhash_dups" -> ((s, dir) =>
      Dedup.simhashDupPairs(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // north star — 60-bit SimHash near-dup pairs: the corpus-scale variant
    // of q35 (32768 LSH buckets per band instead of 16 — sub-quadratic
    // pair fan-in on large corpora, same exact hamming<=3 recall).
    "q55_simhash60_dups" -> ((s, dir) =>
      Dedup.simhashDupPairs60(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // scale path — salted two-phase aggregation for hot keys: partial sums
    // in DECIMAL(18,2) so the re-reduce over salt sub-keys is exact and
    // bit-identical to the unsalted oracle.
    "q36_skew_salted_agg" -> ((s, dir) =>
      Skew.saltedMoneySum(t(s, dir, "events"), Seq("event_type"), "value")
        .orderBy("event_type")),

    // §2.5 gap — left-semi join (existence filter without row duplication).
    "q37_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 200000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // §2.5 gap — full outer join of two aggregates (null-preserving).
    "q38_outer_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("year"))
        .agg(count(lit(1)).as("n_orders"))
      val l = t(s, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).as("year"))
        .agg(count(lit(1)).as("n_ship"))
      o.join(l, Seq("year"), "full_outer")
        .orderBy(col("year").asc_nulls_first)
    }),

    // §2.5 gap — distinct aggregate (expands to a two-phase de-dup agg).
    "q39_count_distinct" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count_distinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")),

    // north star — brute-force top-k cosine (broadcast query set).
    "q40_topk_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.topK(emb.where(col("vec_id") < 10), emb, 5)
        .orderBy("q_id", "rk")
    }),

    // north star — IVF-bucketed top-k cosine (scale path).
    "q41_topk_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.topKIvf(emb.where(col("vec_id") < 10), emb, 5, "label")
        .orderBy("q_id", "rk")
    }),

    // north star — sign-LSH bucketed top-k cosine (data-independent scale
    // path). The hyperplanes are md5-derived (Sim.hyperplanes), so the
    // oracle rebuilds the exact buckets in SQL — approximate recall, but a
    // deterministic, fully hash-checkable result.
    "q43_topk_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.topKLsh(emb.where(col("vec_id") < 10), emb, 5, bits = 4)
        .orderBy("q_id", "rk")
    }),

    // north star — embedding-cosine near-dup pairs within cells.
    "q42_near_dup_cosine" -> ((s, dir) =>
      Sim.nearDupPairs(t(s, dir, "embeddings"), 0.2, "label")
        .orderBy("id_a", "id_b")),

    // north star — text statistics (token counts, quality, lang-id).
    // the token array is materialized once; every stat scans the attribute
    "q50_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("t", Text.tokens(col("text")))
        .select(
          col("doc_id"),
          Text.tokenCount(col("t")).as("n_tokens"),
          Text.tokenEstimate(col("t")).as("n_tokens_est"),
          Text.stopwordCount(col("t")).as("n_stopwords"),
          Text.qualityScore(col("text"), col("t")).as("quality"),
          Text.langIdHeuristic(col("text"), col("t")).as("lang_id"))
        .orderBy("doc_id")),

    // north star — language-ID breakdown.
    "q51_lang_breakdown" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("t", Text.tokens(col("text")))
        .groupBy(Text.langIdHeuristic(col("text"), col("t")).as("lang_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang_id")),

    // north star — corpus-level top-k n-grams (bigram frequency).
    "q52_ngram_topk" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(Text.cleanTokens(col("text")).as("t"))
        .select(explode(Dedup.shingles(col("t"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)),

    // north star — TF-IDF top terms per document (smoothed idf).
    "q53_tfidf" -> ((s, dir) =>
      Text.tfIdfTopK(t(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          col("tfidf"), col("rk"))
        .orderBy("doc_id", "rk")),

    // north star — tumbling-window counts (batch form of streaming agg).
    "q60_tumbling_counts" -> ((s, dir) =>
      EventsOps.tumblingCounts(t(s, dir, "events"), 3600)
        .orderBy("window_start", "event_type")),

    // north star — sliding-window counts.
    "q61_sliding_counts" -> ((s, dir) =>
      EventsOps.slidingCounts(t(s, dir, "events"), 7200, 3600)
        .orderBy("window_start", "event_type")),

    // north star — gap-based sessionization.
    "q62_sessionize" -> ((s, dir) =>
      EventsOps.sessionize(t(s, dir, "events"), 1800)
        .orderBy("user_id", "session_id")),

    // north star — as-of join (purchase ← most recent click per user).
    "q63_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EventsOps.asOfJoin(
          ev.where(col("event_type") === "purchase"),
          ev.where(col("event_type") === "click"))
        .orderBy("user_id", "event_id")
    }),

    // north star — as-of join with staleness tolerance (feature join with
    // a max-lookback bound: stale features become NULL, never silently
    // used).
    "q79_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EventsOps.asOfJoinTolerance(
          ev.where(col("event_type") === "purchase"),
          ev.where(col("event_type") === "click"), tolSeconds = 900)
        .orderBy("user_id", "event_id")
    }),

    // north star — JSON property extraction.
    "q64_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          EventsOps.jsonProp(col("props"), "k").as("k"))
        .orderBy("event_id")),

    // §2.5 gap — explicit GROUPING SETS (rollup/cube generalization).
    "q65_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // §2.5 gap — lag + moving-frame aggregates per user (ordered stream).
    "q66_moving_stats" -> ((s, dir) =>
      EventsOps.movingStats(t(s, dir, "events"))
        .orderBy("user_id", "rn")),

    // north star — built-in session_window sessionization (the operator
    // Structured Streaming shares; q62 is the window-function formulation).
    "q67_session_window" -> ((s, dir) =>
      EventsOps.sessionWindows(t(s, dir, "events"), 1800)
        .orderBy("user_id", "session_start")),

    // §2.5 gap — ranking-function family beyond row_number: dense_rank,
    // percent_rank, ntile, cume_dist over one shared window sort.
    "q73_rank_family" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("drk"),
          Num.floorAt(percent_rank().over(w), 6).as("prk"),
          ntile(4).over(w).as("quartile"),
          Num.floorAt(cume_dist().over(w), 6).as("cd"),
          row_number().over(w).as("rn"))
        .orderBy("o_orderstatus", "rn")
    }),

    // north star — reproducible train/eval split: the split is a pure
    // function of the row key (md5), so it's stable across runs, engines,
    // repartitioning, and incremental loads — never rand()-based.
    "q74_hash_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("split",
          when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % 10 < 8, "train").otherwise("eval"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))
        .orderBy("split", "lang")),

    // north star — token-length histogram (corpus profiling).
    "q75_token_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("t", Text.tokens(col("text")))
        .groupBy((floor(size(col("t")) / 10) * 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // north star — deterministic uniform sample (hash-ordered top-N): same
    // rows every run on every engine, unlike sample()/rand().
    "q76_det_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // north star — one-pass column profile (completeness/cardinality/range)
    // — the data-quality gate a pipeline runs before training ingestion.
    "q77_profile" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        count_distinct(col("o_orderstatus")).as("n_statuses"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"))),

    // north star FLAGSHIP composite — the full training-data prep pipeline
    // in one query: quality gate → repetition gate (Gopher top-bigram
    // share, see q109) → model-based gate (q134's hashed-n-gram
    // classifier, the DCLM ordering) → exact (fingerprint) dedup →
    // MinHash near-dup removal → reproducible hash split → corpus summary.
    // Near-dup rule: drop every doc that has a SMALLER near-dup neighbor
    // (est_jaccard >= 0.5) — deterministic and join-expressible, no
    // connected-components pass (the standard large-corpus approximation).
    "q78_prep_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val quality = docs.withColumn("t", Text.tokens(col("text")))
        .where(Text.qualityScore(col("text"), col("t")) >= 0.1)
        .select("doc_id", "text", "n_chars")
      // repetition losers computed from the RAW scan, not from `quality`:
      // the metric is per-doc (quality-independent), and referencing the
      // quality subtree here would re-run its tokenize+filter once per
      // branch (Catalyst re-executes shared subtrees). A loser that
      // already failed the quality gate anti-joins to nothing — harmless.
      val repetitive = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          explode(Dedup.shingles(col("t"), 2)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
        .where(Num.floorAt(col("mx").cast("double") / col("tot"), 4) > 0.2)
        .select("doc_id")
      // model-based gate (q134's hashed-n-gram classifier) after the rule
      // gates — the DCLM ordering. Same raw-scan-not-quality-subtree
      // reasoning as `repetitive` above; 0.484 ≈ the corpus' lower decile.
      val lowScore = Curate.ngramQualityScore(docs, "doc_id", "text")
        .where(col("quality_score") < 0.484).select("doc_id")
      val gated = quality.join(repetitive, Seq("doc_id"), "left_anti")
        .join(lowScore, Seq("doc_id"), "left_anti")
      // the survivor set feeds THREE consumers (minhash signatures, the
      // anti-join left side, and transitively the split/summary);
      // localCheckpoint materializes the gate+dedup work once instead of
      // re-running the scan+tokenize+window per consumer (q92/q111
      // precedent — the checkpoint is corpus-survivors-sized, not raw)
      val exact = Dedup.keepFirst(
          gated.withColumn("fp", Text.fingerprint(col("text"))),
          Seq("fp"), Seq(col("doc_id").asc))
        .select("doc_id", "text", "n_chars")
        .localCheckpoint()
      val nearDupLosers = Dedup
        .minhashPairs(exact, "doc_id", "text", k = 8, bands = 4)
        .where(col("est_jaccard") >= 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      exact.join(nearDupLosers, Seq("doc_id"), "left_anti")
        .withColumn("split",
          when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % 10 < 8, "train").otherwise("eval"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    }),

    // north star — multimodal decode with a REAL pure-JVM codec: every
    // payload is a spec-valid P6 PPM built deterministically from doc_id
    // (the corpus ships no image files), parsed by the real header+raster
    // decoder, and measured per pixel; the oracle replays the closed-form
    // pixel rule. JPEG/PNG stay behind the labeled stub (q71/q72) — the
    // container has no codec libs.
    "q70_media_features" -> ((s, dir) => {
      val media = Multimodal.ppmMediaFromDocuments(t(s, dir, "documents"))
      Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_pixels"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("media_id")
    }),

    // north star — multimodal frame sampling (1 row → n frames flatMap;
    // payload is ASCII text bytes, so frame fingerprints are
    // oracle-expressible as substring+md5).
    "q71_media_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      Multimodal.frameSample(media, frameBytes = 256, everyNth = 2).toDF()
        .orderBy("media_id", "frame_idx")
    }),

    // north star — multimodal resize plumbing (payload re-encoded at the
    // target geometry; fingerprint compared, not the raw bytes).
    "q72_media_resize" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(
        t(s, dir, "documents").where(length(col("text")) > 0))
      Multimodal.resize(media, 64, 64).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("media_id")
    }),

    // §2.5 gap — lateral explode with position (LATERAL VIEW / UNNEST WITH
    // ORDINALITY shape): first 3 tokens of each document, flattened.
    "q80_posexplode_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("t", Text.tokens(col("text")))
        .select(col("doc_id"), posexplode(slice(col("t"), 1, 3)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("tok"))
        .orderBy("doc_id", "pos")),

    // §2.5 gap — correlated EXISTS / NOT EXISTS subqueries (Catalyst
    // decorrelates both into one semi and one anti hash join).
    "q81_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v81_customer")
      t(s, dir, "orders").createOrReplaceTempView("v81_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM v81_customer c
        WHERE EXISTS (SELECT 1 FROM v81_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM v81_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
        ORDER BY c_custkey""")
    }),

    // §2.5 gap — uncorrelated scalar subquery (planned as a one-row
    // subquery broadcast into the filter; threshold is 0.5 * MAX, which is
    // exact in binary floating point, so the comparison is stable
    // cross-engine).
    "q82_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v82_orders")
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM v82_orders
        WHERE o_totalprice > 0.5 * (SELECT MAX(o_totalprice) FROM v82_orders)
        ORDER BY o_orderkey""")
    }),

    // §2.5 gap — time-RANGE window frame (value-bounded, not row-bounded):
    // trailing 10-minute per-user moving sum.
    "q83_range_frame" -> ((s, dir) =>
      EventsOps.rangeMovingSum(t(s, dir, "events"), 600)
        .orderBy("user_id", "event_id")),

    // §2.5 gap — lead/lag inter-event features (dwell time, previous
    // action) over one per-user window sort.
    "q84_lead_lag_gaps" -> ((s, dir) =>
      EventsOps.eventGaps(t(s, dir, "events"))
        .orderBy("user_id", "event_id")),

    // §2.5 gap — first_value/last_value over an unbounded frame, collapsed
    // to a per-user journey summary.
    "q85_first_last" -> ((s, dir) =>
      EventsOps.firstLast(t(s, dir, "events")).orderBy("user_id")),

    // §2.5 gap — union-by-name with missing columns (schema-evolution
    // append: the open-orders branch lacks o_totalprice → null-filled).
    "q86_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val fin = o.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"),
          lit("fin").as("src"))
      val open = o.where(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("open").as("src"))
      fin.unionByName(open, allowMissingColumns = true)
        .orderBy("o_orderkey", "src")
    }),

    // §2.5 gap — MapType aggregate: per-user event_type→count map,
    // surfaced as canonical JSON for the comparator.
    "q87_map_counts" -> ((s, dir) =>
      Agg.mapCounts(t(s, dir, "events"), "user_id", "event_type")
        .orderBy("user_id")),

    // data management — SCD type-2 dimension history: versioned
    // [valid_from, valid_to) rows per run of equal user state.
    "q88_scd2_intervals" -> ((s, dir) =>
      EventsOps.scd2Intervals(t(s, dir, "events"))
        .orderBy("user_id", "run_id")),

    // data management — referential-integrity audit via broadcast anti
    // joins reduced to orphan counts (the pre-load FK gate).
    "q89_integrity_orphans" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      Star.orphanCount(orders, "o_custkey",
          t(s, dir, "customer"), "c_custkey", "orphan_orders")
        .crossJoin(Star.orphanCount(t(s, dir, "lineitem"), "l_orderkey",
          orders, "o_orderkey", "orphan_lineitems"))
    }),

    // sketch surface — HLL++ distinct + KLL-style quantile per group. No
    // oracleSql on purpose: approx answers are estimator-specific, so the
    // driver records the weaker rows-only check (SketchSpec pins the
    // estimates against exact values within rsd bounds, and
    // q108_exact_profile is the oracle-checked exact twin of this exact
    // grouping — see README "Driver contract" for the rows-only set).
    "q90_approx_profile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(1000))
            .as("p50_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // data management — deterministic stratified sample (20 docs per lang
    // by md5 rank; reproducible, unlike seed-dependent sampleBy).
    "q91_stratified_sample" -> ((s, dir) =>
      Agg.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", 20)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // north star — near-dup CLUSTER assignment: MinHash pair graph →
    // bounded-round min-id label propagation (the corpus dup-clustering
    // step that follows pair generation; 2 rounds = ids within 2 hops).
    "q92_dup_clusters" -> ((s, dir) =>
      Dedup.minLabelPropagate(
          Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
              k = 8, bands = 4)
            .where(col("est_jaccard") >= 0.5),
          rounds = 2)
        .orderBy("doc_id")),

    // north star — BM25 top-k terms per doc (the retrieval-grade scoring
    // TF-IDF approximates; exact-binary-fraction constants, see
    // Text.bm25TopK).
    "q93_bm25" -> ((s, dir) =>
      Text.bm25TopK(t(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("df"),
          col("dl"), col("score"), col("rk"))
        .orderBy("doc_id", "rk")),

    // north star — time-series gap fill + forward fill (dense hourly
    // per-user series generated from sparse events).
    "q94_gap_fill" -> ((s, dir) =>
      EventsOps.gapFillForwardFill(t(s, dir, "events"), 3600)
        .orderBy("user_id", "bucket")),

    // §2.5 gap — share-of-total window ratios (per-source language mix).
    "q95_share_of_total" -> ((s, dir) =>
      Agg.shareOfTotal(t(s, dir, "documents"), "source", "lang")
        .orderBy("source", "rk")),

    // §2.5 gap — multi-match regex extraction (regexp_extract_all).
    "q96_extract_all" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("[a-z]+er\\b"), lit(0))
            .as("m"))
        .select(col("doc_id"), size(col("m")).as("n_matches"),
          array_join(col("m"), ",").as("matches"))
        .orderBy("doc_id")),

    // north star — blocked fuzzy matching over the distinct name
    // vocabulary (entity-resolution shape: block on first token, exact
    // levenshtein within blocks only).
    "q97_fuzzy_pairs" -> ((s, dir) =>
      Dedup.fuzzyPairs(
          t(s, dir, "part").select(col("p_name").as("name")).distinct(),
          "name", "name", maxDist = 3)
        .orderBy("id_a", "id_b")),

    // §2.5 gap — exact-decimal variance/stddev (order-insensitive power
    // sums; builtin var_samp is accumulation-order-dependent and
    // cross-engine-divergent, see Agg.exactMoments).
    "q98_exact_variance" -> ((s, dir) =>
      Agg.exactMoments(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice")
        .orderBy("l_returnflag")),

    // §2.5 gap — exact-decimal Pearson correlation per group.
    "q99_exact_corr" -> ((s, dir) =>
      Agg.exactCorr(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // §2.5 gap — calendar bucketing (date_trunc + day-of-week): the
    // date-function family beyond q12's year extract. Buckets surface as
    // epoch seconds / 0-based dow ints for cross-engine parity.
    "q100_date_buckets" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          unix_timestamp(date_trunc("month", col("o_orderdate")))
            .as("month_start"),
          (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow"),
          col("o_totalprice"))
        .groupBy("month_start", "dow")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("month_start", "dow")),

    // data management — CDC snapshot diff (added/deleted/changed/
    // unchanged) between two derived snapshots of orders. Fingerprints
    // use DECIMAL-exact money (cents as BIGINT) — double→string rendering
    // is engine-specific.
    "q101_snapshot_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cents = (p: Column) =>
        (p.cast("decimal(18,2)") * 100).cast("bigint").cast("string")
      val oldSnap = orders.where(col("o_orderkey") % 11 =!= 0)
      val newSnap = orders.where(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      Star.snapshotDiff(oldSnap, newSnap, "o_orderkey",
          Seq(col("o_orderstatus"), cents(col("o_totalprice"))))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // north star — top-k cosine via the typed TopKAgg Aggregator:
    // result-identical to q40 (shared tie-break and floor), but partitions
    // reduce to k-buffers BEFORE the shuffle (map-side combine) instead of
    // window-sorting every scored pair.
    "q102_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.topKAgg(emb.where(col("vec_id") < 10), emb, 5)
        .orderBy("q_id", "rk")
    }),

    // data management — deterministic weighted sample (A-Res by
    // ln(u)/weight with a 48-bit md5 uniform; P(include) ∝ n_chars).
    "q103_weighted_sample" -> ((s, dir) =>
      Agg.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars", 100)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),

    // north star — funnel conversion (first signup → first purchase
    // within 24h, per user, as a one-row summary).
    "q104_funnel" -> ((s, dir) =>
      EventsOps.funnelConversion(t(s, dir, "events"),
        "signup", "purchase", 86400)),

    // north star — first-order event-transition counts (behavioral
    // Markov baseline).
    "q105_transitions" -> ((s, dir) =>
      EventsOps.transitionCounts(t(s, dir, "events"))
        .orderBy("prev_type", "event_type")),

    // north star — weekly cohort retention matrix.
    "q106_retention" -> ((s, dir) =>
      EventsOps.cohortRetention(t(s, dir, "events"))
        .orderBy("cohort_week", "week_offset")),

    // north star — embedding DEDUP (not just pair detection): drop every
    // vector with a SMALLER near-dup neighbor (same min-id survivor rule
    // as q78's text near-dup removal), summarized per label. Completes
    // the dedup story for the embedding modality.
    "q107_embedding_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val losers = Sim.nearDupPairs(emb, 0.2, "label")
        .select(col("id_b").as("vec_id")).distinct()
      emb.join(losers, Seq("vec_id"), "left_anti")
        .groupBy("label").agg(count(lit(1)).as("n_kept"))
        .orderBy("label")
    }),

    // sketch surface companion — the EXACT twin of q90's approx profile:
    // same grouping, exact count_distinct + interpolated median, fully
    // DuckDB-checkable. Pairs q90 (scales: fixed-size sketch state) with
    // a verifiable baseline (exact: count_distinct shuffles the key set,
    // percentile buffers per-group values — fine at gate SF, see SCALE.md).
    "q108_exact_profile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count_distinct(col("user_id")).as("n_users"),
          (floor(expr("percentile(value, 0.5D)") * 100) / 100)
            .as("p50_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // north star — Gopher-style repetition/quality flags (Rae et al. 2021,
    // arXiv:2112.11446): per-doc mean word length, symbol-to-word ratio,
    // top-bigram share, and the combined keep gate.
    "q109_quality_flags" -> ((s, dir) => {
      val st = Text.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
      st.select(col("id").as("doc_id"), col("n_tokens"),
          col("mean_word_len"), col("symbol_ratio"), col("top_bigram_frac"),
          Text.gopherKeep(col("n_tokens"), col("mean_word_len"),
            col("symbol_ratio"), col("top_bigram_frac")).as("keep"))
        .orderBy("doc_id")
    }),

    // north star — URL/domain curation: domain extraction (regexp over a
    // synthetic per-doc URL — documents carry no raw URLs, so the URL is
    // derived from source deterministically), per-domain counts, and a
    // deterministic per-domain quota sample (the standard pretraining
    // domain-balancing pass; same md5-rank sampler as q91).
    "q110_domain_quota" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/doc/"), col("doc_id").cast("string")))
        .withColumn("domain",
          regexp_extract(col("url"), "^https?://([^/]+)/", 1))
      val counts = docs.groupBy("domain")
        .agg(count(lit(1)).as("n_domain"))
      Agg.stratifiedSample(docs, "domain", "doc_id", 50)
        .join(broadcast(counts), Seq("domain"))
        .select(col("doc_id"), col("domain"), col("n_domain"))
        .orderBy("doc_id")
    }),

    // north star — the PRODUCTION near-dup composition (SCALE.md's
    // documented shape, previously prose-only): LSH band collisions
    // generate candidates, exact n-gram Jaccard verifies ONLY those
    // candidates — never the all-pairs space. Served from the
    // Artifacts layer: this query IS the pair-artifact build; every
    // later report in the family reads its checkpoint (Artifacts
    // scaladoc — the materialize-once production shape).
    "q111_lsh_verified_pairs" -> ((s, dir) => {
      // (k, bands) chosen FROM the S-curve, not hand-picked: recall
      // >= .98 at j = 0.8 with candidate rate <= .2 at j = 0.2
      // resolves to k=8, bands=4 (Dedup.planBands scaladoc table)
      val bp = Dedup.planBands(threshold = 0.8, targetRecall = 0.98)
      Artifacts.nearDupPairs(s, dir, k = bp.k, bands = bp.bands,
          minJaccard = 0.2)
        .orderBy("id_a", "id_b")
    }),

    // ops 4-5 PHYSICAL twin — a real df.write.jdbc / spark.read.jdbc
    // round-trip against embedded Derby (in-memory; the sandbox ships no
    // server DB, but Derby is on Spark's own classpath). The reference's
    // MySQL load (etl_pipeline.py:84-129) is this path; its upsert-ignore
    // LOGIC is oracle-checked separately as q23/q24. INT/VARCHAR survive
    // the dialect mapping losslessly, so the re-read copy aggregates to
    // the same answer as the parquet table.
    "q112_jdbc_roundtrip" -> ((s, dir) => {
      val url =
        s"jdbc:derby:memory:graft${ProcessHandle.current().pid};create=true"
      Sources.writeJdbc(t(s, dir, "nation"), url, "nation_jdbc",
        Map("n_name" -> 64))
      Sources.readJdbc(s, url, "nation_jdbc")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("sum_key"))
        .orderBy("n_regionkey")
    }),

    // north star — GPT-style sequence packing: per-shard concat-and-chunk
    // of the token stream into 4096-token packs (docs may straddle pack
    // boundaries; shard = md5 of id so the layout reproduces anywhere).
    "q113_sequence_packing" -> ((s, dir) =>
      Curate.packSequences(t(s, dir, "documents"), "doc_id", "text",
          ctxTokens = 4096, shards = 32)
        .orderBy("doc_id")),

    // north star — eval-set decontamination: train docs sharing >= 1
    // distinct 3-shingle with the (deterministic) eval split, with the
    // shared-shingle count — the n-gram-overlap contamination check.
    "q114_decontamination" -> ((s, dir) =>
      Curate.decontaminate(t(s, dir, "documents"), "doc_id", "text",
          isEval = col("doc_id") % 97 === 0, w = 3)
        .orderBy("doc_id")),

    // north star — PII redaction (emails + phone runs): the corpus text
    // carries no PII, so a synthetic contact tail derived from doc_id is
    // appended first — the redaction pass itself is the operator under
    // test, surfaced as match counts + md5 of the redacted text.
    "q115_pii_redact" -> ((s, dir) =>
      Curate.redactPii(
          t(s, dir, "documents").select(col("doc_id"),
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"),
              lit("@example.com or +1-555-0100")).as("raw")),
          "raw")
        .select(col("doc_id"), col("n_pii"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")),

    // north star — incremental aggregate maintenance (materialized-view
    // pattern): standing per-type state over the base events merged with
    // a new batch's state via Agg.mergeAggStates; DECIMAL components make
    // merge-of-parts bit-identical to the full recompute the oracle runs.
    // Merge cost ∝ state rows (|keys|), not the 100 TB that produced them.
    "q116_incremental_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.where(col("event_id") % 10 =!= 0)
      val delta = ev.where(col("event_id") % 10 === 0)
      Agg.mergeAggStates(Seq(
          Agg.aggState(base, "event_type", "value"),
          Agg.aggState(delta, "event_type", "value")), "event_type")
        .select(col("event_type"), col("n"),
          col("sx").cast("double").as("sum_value"),
          col("mn").cast("double").as("min_value"),
          col("mx").cast("double").as("max_value"))
        .orderBy("event_type")
    }),

    // north star — source-mixture sampling: per-source keep RATES via a
    // scan-local md5 threshold (zero shuffles — cheaper than the q110
    // quota form, which pays a per-domain window). The corpus-assembly
    // reweighting step: up/down-weight sources by sampling rate.
    "q117_mixture_sample" -> ((s, dir) => {
      val rates = (0 until 20).map(i => s"src$i" ->
        (i % 3 match { case 0 => 1.0; case 1 => 0.5; case _ => 0.25 }))
        .toMap
      Curate.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
          rates, default = 0.1)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    }),

    // north star — per-doc OOV rate vs the corpus' own top-10 vocabulary
    // (broadcast): the cheap gibberish/wrong-language quality signal.
    "q118_vocab_oov" -> ((s, dir) =>
      Curate.oovRate(t(s, dir, "documents"), "doc_id", "text", v = 10)
        .orderBy("doc_id")),

    // north star — per-doc duplicated-n-gram share (distinct 5-shingles
    // present in >= 2 docs): the boilerplate/duplication signal, TF-IDF's
    // df-pass shuffle skeleton, never all-pairs.
    "q119_dup_ngram_share" -> ((s, dir) =>
      Curate.dupNgramShare(t(s, dir, "documents"), "doc_id", "text", w = 5)
        .orderBy("doc_id")),

    // exact median via RANK SELECTION — the 100 TB-safe exact path for
    // the q29/q108 percentile family: one spillable sort instead of a
    // per-group value buffer in the agg (SCALE.md "exact quantiles" row).
    // Identical result to percentile(0.5) by construction (middle order
    // statistics averaged = linear interpolation at p=0.5).
    "q120_median_rank" -> ((s, dir) =>
      Agg.medianByRank(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice")
        .select(col("l_returnflag"),
          (floor(col("median") * 100) / 100).as("p50"), col("n"))
        .orderBy("l_returnflag")),

    // north star — EXACT-recall threshold similarity join via prefix
    // filtering (SSJoin/PPJoin): all pairs with jaccard >= 0.8 over the
    // FULL corpus, candidates bounded by rare-shingle df (vs q33's
    // doc_id<200 cap, which the quadratic brute join needs — this corpus
    // has 1.1M shingle-sharing pairs at sf0.1 that prefix filtering never
    // materializes). 0.8 is the near-dup regime the op exists for; prefix
    // length scales as m·(1-t), so the threshold is also the cost knob.
    // The deterministic complement to the LSH path (q32/q111).
    "q121_prefix_filter_pairs" -> ((s, dir) =>
      // the exact-pair artifact build (q155 reads the same artifact as
      // its ground truth — Artifacts scaladoc)
      Artifacts.exactPairs(s, dir, w = 3, minJaccard = 0.8)
        .orderBy("id_a", "id_b")),

    // north star — incremental DISTINCT maintenance via mergeable HLL
    // sketches (DataSketches hll_sketch_agg/hll_union_agg): the standing
    // per-type sketch unions with each batch's sketch (the 100 TB
    // property: distinct-count state is KB-sized and mergeable, vs
    // q108's exact 2-phase dedup re-scan). The exact count rides along
    // so the oracle pins real values, not just the accuracy bit.
    // Contract note: HLL sketch MERGE is not bit-equal to a single
    // full-scan sketch (datasketches unions can promote the internal
    // representation, shifting the estimate — observed at sf0.1 where
    // the two estimates diverge while both stay well inside the
    // published error). The honest mergeability claim — and what an
    // incremental pipeline actually relies on — is that the MERGED
    // estimate tracks the EXACT count within the sketch's error bound:
    // default lgK=12 gives σ ≈ 1.6%, so 5% is a >3σ gate, stable at
    // every fixture SF (checked at sf0.001/0.01/0.1).
    "q122_incremental_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.where(col("event_id") % 10 =!= 0)
      val delta = ev.where(col("event_id") % 10 === 0)
      val merged = base.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .unionByName(delta.groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk")))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("merged_est"))
      val full = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_users"))
      merged.join(full, Seq("event_type"))
        .select(col("event_type"),
          (abs(col("merged_est") - col("n_users")).cast("double") /
            col("n_users") <= 0.05).as("merged_within_5pct"),
          col("n_users"))
        .orderBy("event_type")
    }),

    // north star — overlapping token-window chunking (the RAG /
    // context-window splitter): 64-token chunks, stride 48 (16-token
    // overlap), scan-local slice per chunk — zero shuffles before the
    // final ORDER BY.
    "q123_chunk_windows" -> ((s, dir) =>
      Curate.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")),

    // north star — deterministic contrastive negative sampling: per
    // anchor, k md5-ranked different-label candidates (reproducible
    // negatives for embedding training; broadcast anchors + per-anchor
    // WindowGroupLimit, the q40 skeleton).
    "q124_negative_sample" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.negativeSample(emb.where(col("vec_id") < 10), emb,
          "vec_id", "label", k = 5)
        .orderBy("q_id", "rk")
    }),

    // north star — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    // deterministic k-means clusters as the blocking step, cosine min-id
    // dedup WITHIN each cluster. First oracle coverage of the Lloyd's
    // quantizer itself — the DuckDB oracle replays both unrolled
    // iterations (decimal-exact centroid means, 9dp-floored assignment
    // argmax) and must land every vector in the same cell.
    "q125_semdedup" -> ((s, dir) =>
      Sim.semDedup(t(s, dir, "embeddings"), k = 8, iters = 2,
          threshold = 0.2)
        .orderBy("cell")),

    // north star — corpus-wide exact segment dedup (CCNet/RefinedWeb line
    // dedup over fixed 16-token blocks): keep-first on the segment hash,
    // per-doc survival share.
    "q126_segment_dedup" -> ((s, dir) =>
      Curate.dedupSegments(t(s, dir, "documents"), "doc_id", "text",
          segTokens = 16)
        .orderBy("doc_id")),

    // north star — unigram-LM mean log2 prob per doc (the KenLM-style
    // perplexity proxy quality filter, model-free).
    "q127_unigram_logprob" -> ((s, dir) =>
      Curate.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // north star — EXACT connected components (fixpoint label propagation)
    // over the production near-dup pair graph (q111's LSH-then-verify
    // edges): the full-graph upgrade of q92's bounded-round clusters,
    // checked against a recursive-CTE oracle. survivor = the component's
    // min id, i.e. the doc kept by every min-id dedup rule upstream.
    "q128_cc_converged" -> ((s, dir) => {
      // member counts via groupBy+join-back, not a count window over the
      // component: a viral boilerplate cluster is exactly the hot key the
      // CC pass exists to find, and a count window would buffer its whole
      // membership on one reducer (q121/q119/q127 shape). The label frame
      // is the Artifacts-layer component artifact (checkpoint-backed),
      // so the two consumers here — and every other report in the
      // family — never re-run the loop.
      val comp = Artifacts.components(s, dir,
        k = 8, bands = 4, minJaccard = 0.2)
      val sizes = comp.groupBy("component")
        .agg(count(lit(1)).as("n_members"))
      comp.join(sizes, Seq("component"))
        .select(col("doc_id"), col("component"),
          col("n_members"), (col("doc_id") === col("component"))
            .as("is_survivor"))
        .orderBy("doc_id")
    }),

    // north star — the SAME components via alternating large-star /
    // small-star (Kiveris et al. 2014): O(log n) rounds on any graph
    // shape vs q128's O(diameter) propagation. Shares q128's oracle —
    // two CC engines, one contract.
    "q130_cc_bigstar" -> ((s, dir) => {
      // same groupBy+join-back member count as q128 (see comment there);
      // checkpointed so the star-round output is computed once for its
      // two consumers. Pairs come from the shared artifact — the point
      // of this query is the ALTERNATIVE label engine over them, so it
      // does not reuse the component artifact.
      val comp = Dedup.componentsBigStar(
        Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
          minJaccard = 0.2))
        .localCheckpoint()
      val sizes = comp.groupBy("component")
        .agg(count(lit(1)).as("n_members"))
      comp.join(sizes, Seq("component"))
        .select(col("doc_id"), col("component"),
          col("n_members"), (col("doc_id") === col("component"))
            .as("is_survivor"))
        .orderBy("doc_id")
    }),

    // north star — salt-replicated skew join (manual AQE-skew-split for
    // known-hot keys): lineitem ⋈ orders on the salted key, then the
    // priority rollup. The salt never reaches the output, so the oracle is
    // the PLAIN join — result-identity with the unsalted plan is the
    // entire correctness claim.
    "q129_skew_salted_join" -> ((s, dir) =>
      Skew.saltedJoin(t(s, dir, "lineitem"), t(s, dir, "orders"),
          "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // north star — Bloom-filter semi-join reduction (the explicit form of
    // Spark's AQE runtime filter): prune lineitem at the scan with a
    // might_contain probe over the urgent orders' key Bloom, then close
    // with the exact semi join. False positives are removed by the join;
    // false negatives are impossible — so the oracle is the plain
    // IN-subquery and result identity is the claim.
    "q131_bloom_prune" -> ((s, dir) =>
      Prune.bloomSemiJoin(t(s, dir, "lineitem"),
          t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT"),
          "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")),

    // north star — Z-order (Morton) clustering key over (customer, order
    // day): the multi-dimensional layout key every lakehouse format uses
    // for scan pruning on EITHER dimension. Pure integer bit-interleave —
    // the oracle replays it bit for bit; the layout property itself (per
    // file bounding boxes tight on BOTH dims after Layout.zOrderWrite) is
    // asserted in Round5bOpsSpec against real parquet files. Day base
    // 7305 = 1990-01-01. 16 bits bound both dims at the TEST SFs only:
    // o_custkey reaches 150000*SF, exceeding 65535 at SF >= ~0.44 —
    // beyond that zValue's per-row assert_true guard fails LOUDLY
    // (never a silent high-bit fold) and the caller must raise `bits`.
    "q132_zorder_key" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          Layout.zValue(col("o_custkey"),
            Layout.normalize(
              floor(unix_timestamp(col("o_orderdate")) / 86400), 7305L),
            bits = 16).as("zval"))
        .orderBy("o_orderkey")),

    // north star — deterministic corpus shuffle (the step between q78's
    // dedup and q113's packing): training order as a pure function of doc
    // ids. Shard = scan-local fixed md5 hash-range bucket (NOT ntile —
    // exactly-equal shard sizes would cost a global single-reducer rank;
    // md5 uniformity makes fixed buckets near-equal at any scale); pos =
    // per-shard rank by the md5 shuffle key. The physical shard files
    // (Sources.writeShards) are byte-determinism-asserted in SourcesSpec.
    "q133_det_shuffle" -> ((s, dir) =>
      Curate.deterministicShuffle(t(s, dir, "documents"), "doc_id",
          shards = 32)
        .select(col("doc_id"), col("shuffle_key"), col("shard"), col("pos"))
        .orderBy("shard", "pos")),

    // north star — hashed-n-gram linear quality classifier (fastText
    // shape, Joulin et al. 2016; DCLM 2024's model-based filter): the
    // learned scorer real pipelines run after the q109 rule gates. Weight
    // lookup is a scan-local array-literal index (no join); one explode +
    // one doc-keyed agg. Also wired into q78 as its final gate.
    "q134_quality_score" -> ((s, dir) =>
      Curate.ngramQualityScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // north star — batch near-dup ADMISSION against a standing corpus
    // (the daily-ingest materialized-view twin of the streaming
    // near-dup filter, and the oracle check its signature logic never
    // had): base = 80% of docs, batch = the doc_id%5==0 slice; admit
    // batch docs whose MinHash signature is unseen in the base and
    // first among in-batch twins.
    "q135_dedup_admission" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // standing sig-keys come from the artifact store: only the batch
      // is keyed per ingest (admission cost ∝ batch, not corpus)
      Dedup.admitBySignature(
          docs.where(col("doc_id") % 5 =!= 0),
          docs.where(col("doc_id") % 5 === 0),
          "doc_id", "text", k = 8,
          baseKeysPre = Some(Artifacts.standingSigKeys(s, dir, k = 8)))
        .orderBy("doc_id")
    }),

    // north star — count-min frequency sketch AS A KEYED AGGREGATION
    // (Sketch.scala scaladoc): the counter matrix is a d*w-row frame, so
    // CMS union is a cell-sum groupBy — asserted in-query against the
    // one-shot matrix (merge_equals_full, the q122 pattern) — and the
    // oracle replays the exact md5 cells a binary sketch blob would hide.
    // Heavy hitters >= 80 events carry exact count, sketch estimate, and
    // the one-sided CMS guarantee bit (estimates only ever overcount).
    "q136_cms_heavy_hitters" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val (d, w) = (CmsD, CmsW)
      val merged = Sketch.mergeCounters(Seq(
        Sketch.cmsCounters(ev.where(col("event_id") % 10 =!= 0),
          "user_id", d, w),
        Sketch.cmsCounters(ev.where(col("event_id") % 10 === 0),
          "user_id", d, w)))
      val full = Sketch.cmsCounters(ev, "user_id", d, w)
      val nDiff = merged.join(full.withColumnRenamed("cnt", "cnt_full"),
          Seq("r", "b"), "full")
        .where(coalesce(col("cnt"), lit(-1L)) =!=
          coalesce(col("cnt_full"), lit(-1L)))
        .agg(count(lit(1)).as("n_cell_diff"))
      val hh = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        .where(col("exact_cnt") >= 80)
      Sketch.cmsEstimate(merged, hh.select("user_id"), "user_id", d, w)
        .join(hh, "user_id")
        .crossJoin(broadcast(nDiff))
        .select(col("user_id"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") >= col("exact_cnt")).as("never_under"),
          (col("n_cell_diff") === 0).as("merge_equals_full"))
        .orderBy("user_id")
    }),

    // north star — link-graph importance (fixed-point integer PageRank,
    // Graph.scala scaladoc): the symmetrized customer—supplier fact graph
    // (edge weight = lineitem count), 3 damped rounds, every share an
    // exact 64-bit integer op, so the ranking is bit-identical on any
    // partitioning AND in the oracle's unrolled-CTE replay. Top 25 hubs.
    // Nodes iterate as LONGS (custkey*2 / suppkey*2+1) — integer keys
    // shuffle and aggregate far cheaper than 'c:…' strings at corpus
    // scale; the display label is re-derived only for the final 25 rows.
    // Raw w=1 edge rows go straight in: pageRankFixed's own groupBy is
    // the single aggregation pass (a caller-side pre-agg would just add
    // a second full shuffle of the same rows).
    "q137_pagerank" -> ((s, dir) => {
      val e0 = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"),
          lit(1L).as("w"))
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      Graph.pageRankFixed(edges, iters = 3,
          scale = PrScale, dampPct = PrDampPct)
        .select(concat(
            when(col("node") % 2 === 0, lit("c:")).otherwise(lit("s:")),
            expr("node div 2")).as("node"), col("r"))
        .orderBy(col("r").desc, col("node").asc).limit(25)
    }),

    // north star — collocation mining: corpus-level top-30 bigrams by
    // PMI (Church & Hanks 1990), count >= 5 — the phrase/tokenizer-merge
    // signal. Exact integer counts; one checkpointed token scan feeds
    // both n-gram orders (Text.pmiTopK scaladoc for the shuffle shape).
    "q138_pmi_collocations" -> ((s, dir) =>
      Text.pmiTopK(t(s, dir, "documents"), "doc_id", "text",
        minCount = 5, k = 30)),

    // north star — mergeable-sketch percentiles with the error bound
    // VERIFIED IN-QUERY (Agg.approxMedianVerified scaladoc): GK-summary
    // approx median per event type, its rank error integer-checked
    // against the n/accuracy guarantee, exact median riding along so the
    // oracle pins values. The bounded-state percentile path SCALE.md's
    // exact-quantile row points to at 100 TB.
    "q139_approx_median_bound" -> ((s, dir) =>
      Agg.approxMedianVerified(t(s, dir, "events"), "event_type", "value",
          accuracy = 100)
        .orderBy("event_type")),

    // north star — INCREMENTAL connected components
    // (Dedup.componentsIncremental scaladoc): 1/5 of the near-dup pairs
    // (deterministic md5 split) arrive as the ingest batch; standing
    // labels are exact CC over the rest, and the batch folds in through
    // label contraction WITHOUT re-reading the standing edge set. Shares
    // q128/q130's oracle — THREE CC engines now pinned to one answer.
    "q140_cc_incremental" -> ((s, dir) => {
      // shared pair artifact (already checkpoint-backed); the point of
      // this query is the incremental label engine, not the pair build
      val pairs = Artifacts.nearDupPairs(s, dir,
        k = 8, bands = 4, minJaccard = 0.2)
      val pairHash = conv(substring(md5(concat(col("id_a"), lit(":"),
        col("id_b"))), 1, 8), 16, 10).cast("long")
      val base = pairs.where(pairHash % 5 =!= 0)
      val delta = pairs.where(pairHash % 5 === 0)
      val comp = Dedup.componentsIncremental(
          Dedup.componentsConverged(base), delta)
        .localCheckpoint()
      // same groupBy+join-back member count as q128 (see comment there)
      val sizes = comp.groupBy("component")
        .agg(count(lit(1)).as("n_members"))
      comp.join(sizes, Seq("component"))
        .select(col("doc_id"), col("component"),
          col("n_members"), (col("doc_id") === col("component"))
            .as("is_survivor"))
        .orderBy("doc_id")
    }),

    // north star — HARD-negative mining (Sim.hardNegatives scaladoc):
    // per anchor, the 5 most-similar DIFFERENT-label embeddings — the
    // high-loss negatives contrastive training mixes with q124's random
    // ones. q40's brute top-k skeleton with the label inequality on the
    // broadcast join.
    "q141_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Sim.hardNegatives(emb.where(col("vec_id") < 10), emb, k = 5)
        .orderBy("q_id", "rk")
    }),

    // north star — triangle census of the near-dup graph
    // (Graph.triangleStats scaladoc): degree-ordered orientation, so no
    // hub ever drives the wedge self-join. The clustering coefficient is
    // the cluster-coherence health metric for the q111 pair generator —
    // dup clusters should be near-cliques, not chains.
    "q142_triangle_census" -> ((s, dir) =>
      Graph.triangleStats(
        Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
          minJaccard = 0.2))),

    // north star — int8 embedding storage (Sim.quantizeInt8 scaladoc):
    // symmetric round-half-up quantization with per-vector quality
    // metrics (max elementwise error, l2 error, cosine to the dequant)
    // so the 4x memory cut is measured, not assumed. Scan-local.
    "q143_int8_quant" -> ((s, dir) =>
      Sim.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id")),

    // north star — per-source token-budget admission
    // (Curate.tokenBudgetSample scaladoc): the mixture recipe's quota is
    // in TOKENS, not documents — greedy md5-ordered prefix per source,
    // so the admitted set is a pure function of doc ids.
    "q144_token_budget" -> ((s, dir) =>
      Curate.tokenBudgetSample(t(s, dir, "documents"), "doc_id",
          "source", "text", budget = 800L)
        .orderBy("doc_id")),

    // §2.5 gap — per-group OLS regression (slope/intercept/r2) from the
    // q99 exact decimal power sums (Agg.exactOls scaladoc): the regr_*
    // SQL family, decimal-exact and mergeable across shards.
    "q145_group_ols" -> ((s, dir) =>
      Agg.exactOls(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // north star — cross-source contamination matrix
    // (Curate.crossSourceOverlap scaladoc): q114's decontamination
    // lifted to the corpus grain — which training sources share shingle
    // mass (mirror/scrape pairs that would double-count in the mixture).
    "q146_source_overlap" -> ((s, dir) =>
      Curate.crossSourceOverlap(t(s, dir, "documents"), "source", "text")
        .orderBy("source_a", "source_b")),

    // north star — ingest drift monitoring (EventsOps.dailyAnomalies
    // scaladoc): per-type daily counts z-scored from exact decimal
    // moments; the broken-producer / traffic-spike alarm a pipeline
    // runs over its own telemetry.
    "q147_daily_anomalies" -> ((s, dir) =>
      EventsOps.dailyAnomalies(t(s, dir, "events"))
        .orderBy("event_type", "day")),

    // north star — join-key skew profiler (Skew.keyProfile scaladoc):
    // the decision input for q129/q36 — measure a key's distribution
    // (hot key, skew factor, top-1 share analog) BEFORE salting it.
    "q148_key_profile" -> ((s, dir) =>
      Skew.keyProfile(t(s, dir, "lineitem"), "l_suppkey")
        .unionByName(Skew.keyProfile(t(s, dir, "documents"), "lang"))
        .orderBy("key_col")),

    // §2.5 gap — interval-OVERLAP join via range binning
    // (EventsOps.overlapJoinBinned scaladoc): q28's band join needs a
    // broadcastable side; this is the neither-side-small shape. Transit
    // intervals [ship, ship + 1..45 days) (deterministic per-line span —
    // the fixture carries only l_shipdate) × order months; binning
    // manufactures the equi-key, the plain overlap predicate is the
    // oracle.
    "q149_interval_overlap" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        unix_date(col("l_shipdate").cast("date")).cast("long").as("s"))
        .withColumn("e", col("s") + lit(1L) +
          expr("(l_orderkey * 7 + l_linenumber) % 45"))
      val months = t(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).cast("date")
          .as("m")).distinct()
        .select(unix_date(col("m")).cast("long").as("bs"),
          unix_date(add_months(col("m"), 1)).cast("long").as("be"))
      EventsOps.overlapJoinBinned(li, months, cell = 32L)
        .select(col("l_orderkey"), col("l_linenumber"), col("bs"))
        .distinct() // a pair sharing k cells appears k times
        .groupBy(col("bs").as("month_start_day"))
        .agg(count(lit(1)).as("n_shipments"))
        .orderBy("month_start_day")
    }),

    // north star — right-to-be-forgotten sweep (Curate.tombstoneSweep
    // scaladoc): anti-join a tombstone list across every table carrying
    // the entity, emit the audit summary a governance run has to file.
    // Tombstones here = doc_id % 101 == 0, the deterministic stand-in
    // for a removal-request list.
    "q150_tombstone_sweep" -> ((s, dir) => {
      val tomb = t(s, dir, "documents")
        .where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("tomb_id"))
      Curate.tombstoneSweep(Seq(
          ("documents", t(s, dir, "documents"), "doc_id"),
          ("embeddings", t(s, dir, "embeddings"), "vec_id"),
          ("events", t(s, dir, "events"), "user_id")),
        tomb).orderBy("table_name")
    }),

    // north star — vocabulary-diversity entropy per source
    // (Text.vocabEntropy scaladoc): template/generated text scores low;
    // the integer-count identity keeps floats to one log per term.
    "q151_vocab_entropy" -> ((s, dir) =>
      Text.vocabEntropy(t(s, dir, "documents"), "source", "text")
        .withColumnRenamed("grp", "source")
        .orderBy("source")),

    // north star — alpha-temperature mixture weights
    // (Curate.mixtureWeights scaladoc): the rebalancing math between
    // proportional (α=1) and uniform (α=0) that feeds q117's rates and
    // q144's budgets; α=0.5, 1M-token budget.
    "q152_mixture_weights" -> ((s, dir) =>
      Curate.mixtureWeights(t(s, dir, "documents"), "source", "text",
          alpha = 0.5, budget = 1000000L)
        .withColumnRenamed("grp", "source")
        .orderBy("source")),

    // north star — multi-touch funnel (EventsOps.multiTouchFunnel
    // scaladoc): every view→purchase conversion within 2h, daily rates;
    // q104's first-touch form generalized to every occurrence via one
    // ordered following-window, never a stream self-join.
    "q153_multitouch_funnel" -> ((s, dir) =>
      EventsOps.multiTouchFunnel(t(s, dir, "events"),
          "view", "purchase", 7200)
        .orderBy("day")),

    // north star — Neyman budget allocation (Agg.neymanAllocation
    // scaladoc): spend a 10k-row labeling/eval budget across event
    // types ∝ N_h·σ_h — the variance-minimizing stratification that
    // q91's stratified sampler then executes.
    "q154_neyman_alloc" -> ((s, dir) =>
      Agg.neymanAllocation(t(s, dir, "events"), "event_type", "value",
          budget = 10000L)
        .orderBy("stratum")),

    // north star — dedup-pipeline EVALUATION: the LSH path's recall
    // MEASURED against exact ground truth at the same threshold. Truth
    // = q121's exact-recall prefix-filter pairs (Jaccard >= 0.8); LSH =
    // q111's band-then-verify at 0.8. Verified admission has no false
    // positives by construction (measured precision must come out 1.0);
    // what banding can lose is recall — this query puts a number on it
    // instead of trusting the (k, bands) collision analysis.
    "q155_dedup_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val truth = Artifacts.exactPairs(s, dir, w = 3, minJaccard = 0.8)
        .select(col("id_a"), col("id_b"))
      // 0.8-threshold pair artifact (distinct from the 0.2 report
      // artifact — the memo key carries the threshold); both sides are
      // already checkpoint-backed, so no re-checkpoint here
      val lsh = Artifacts.nearDupPairs(docs.sparkSession, dir,
          k = 8, bands = 4, minJaccard = 0.8)
        .select(col("id_a"), col("id_b"))
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nL = lsh.agg(count(lit(1)).as("n_lsh"))
      val nC = truth.join(lsh, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_common"))
      nT.crossJoin(broadcast(nL)).crossJoin(broadcast(nC))
        .select(col("n_truth"), col("n_lsh"), col("n_common"),
          when(col("n_truth") === 0, lit(1.0)).otherwise(
            Num.floorAt(col("n_common").cast("double") /
              col("n_truth"), 4)).as("recall"),
          when(col("n_lsh") === 0, lit(1.0)).otherwise(
            Num.floorAt(col("n_common").cast("double") /
              col("n_lsh"), 4)).as("precision"))
    }),

    // north star — mix-shift drift (EventsOps.psiDrift scaladoc): PSI
    // between the first and second half of the stream's day range.
    // q147 alarms on per-type volume; this alarms on the MIX — a
    // producer swapping click for error traffic at constant volume
    // only shows up here.
    "q156_psi_drift" -> ((s, dir) =>
      EventsOps.psiDrift(t(s, dir, "events"))
        .orderBy("event_type")),

    // north star — KEEP-THE-BEST canonical selection: within each
    // near-dup component the survivor is the highest q134 quality
    // score (min doc_id only breaks score ties) — the policy real
    // curation wants instead of q128's keep-lowest-id. One rank window
    // over component-sized groups on top of the CC labels; quality
    // joins in doc-keyed.
    "q157_survivor_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val comp = Artifacts.components(s, dir,
        k = 8, bands = 4, minJaccard = 0.2)
      val q = Curate.ngramQualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_score"))
      val w = Window.partitionBy("component")
        .orderBy(col("quality_score").desc, col("doc_id").asc)
      comp.join(q, Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .select(col("doc_id"), col("component"), col("quality_score"),
          (col("rk") === 1).as("is_survivor"))
        .orderBy("doc_id")
    }),

    // §2.5 gap — per-group winsorization at exact rank-selected
    // percentiles (Agg.winsorize scaladoc): clamp into [p05, p95] and
    // report clip counts + the winsorized mean — outlier treatment
    // before the statistics outliers wreck (q145's OLS, q147's
    // z-scores).
    "q158_winsorize" -> ((s, dir) =>
      Agg.winsorize(t(s, dir, "events"), "event_type", "value",
          pLo = 0.05, pHi = 0.95)
        .orderBy("event_type")),

    // north star — dup-cluster size histogram: the corpus-health
    // read-off over the CC labels (how much mass sits in how-big
    // clusters — a fat tail means boilerplate/mirrors, not true dups).
    // Log2 buckets; counts partial-aggregate at both grains.
    "q159_cluster_sizes" -> ((s, dir) => {
      val comp = Artifacts.components(s, dir,
        k = 8, bands = 4, minJaccard = 0.2)
      comp.groupBy("component").agg(count(lit(1)).as("sz"))
        .groupBy(floor(log2(col("sz"))).cast("int").as("log2_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"))
        .orderBy("log2_size")
    }),

    // north star — per-source quality profile: mean and exact median
    // q134 score per source — the which-sources-are-junk read-off that
    // sets q152's mixture weights. Median via the q120 rank-selection
    // shape; mean from a DECIMAL sum of the already-floored scores.
    "q160_source_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = Curate.ngramQualityScore(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      val med = Agg.medianByRank(scored, "source", "quality_score")
        .select(col("source"), Num.floorAt(col("median"), 6).as("p50"))
      scored.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          Num.floorAt(sum(col("quality_score").cast("decimal(18,6)"))
            .cast("double") / count(lit(1)), 6).as("mean_quality"))
        .join(med, Seq("source"))
        .orderBy("source")
    }),

    // north star — bot/automation profile (EventsOps.botProfile
    // scaladoc): burstiness + sustained rate + type entropy per user;
    // the automated-traffic filter that runs BEFORE text quality gates
    // (bot content poisons dedup stats and mixture weights).
    "q161_bot_profile" -> ((s, dir) =>
      EventsOps.botProfile(t(s, dir, "events"))
        .orderBy("user_id")),

    // north star — Benford forensics (Agg.benfordProfile scaladoc):
    // first-digit distribution of order totals vs log10(1+1/d) with
    // chi2 — the cheap synthetic/fabricated-data tell. TPC-H prices
    // are range-uniform, so this corpus correctly FAILS the law (the
    // flag is the fingerprint either way).
    "q162_benford" -> ((s, dir) =>
      Agg.benfordProfile(t(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")),

    // north star — k-anonymity audit (Agg.kAnonymity scaladoc): class
    // sizes of the (source, lang) quasi-identifier tuple with the
    // below-k flag — the governance gate before a corpus release;
    // q150's sweep and q115's redaction are the fixes it triggers.
    "q163_k_anonymity" -> ((s, dir) =>
      Agg.kAnonymity(t(s, dir, "documents"), Seq("source", "lang"),
          k = 10)
        .orderBy("source", "lang")),

    // north star — Zipf exponent (Text.zipfFit scaladoc): ln(tf) on
    // ln(rank) over the top-100 vocabulary — natural language sits
    // near alpha = 1; the one-number linguistic health check next to
    // q151's entropy.
    "q164_zipf_fit" -> ((s, dir) =>
      Text.zipfFit(t(s, dir, "documents"), "text", k = 100)),

    // north star — declared-key uniqueness audit
    // (Dedup.keyUniquenessProfile scaladoc): n_rows vs distinct keys
    // per table — the FIRST intake statistic and the integrity check
    // q89/upsert-ignore assume (this fixture's lineitem really does
    // carry ~24% duplicate (orderkey, linenumber) keys).
    "q165_key_uniqueness" -> ((s, dir) =>
      Dedup.keyUniquenessProfile(Seq(
          ("documents", t(s, dir, "documents"), Seq("doc_id")),
          ("events", t(s, dir, "events"), Seq("event_id")),
          ("lineitem", t(s, dir, "lineitem"),
            Seq("l_orderkey", "l_linenumber")),
          ("orders", t(s, dir, "orders"), Seq("o_orderkey"))))
        .orderBy("table_name")),

    // north star — per-source dedup IMPACT: docs and tokens each source
    // loses to near-dup removal (min-id survivor rule over the CC
    // labels; docs outside the pair graph all survive). The
    // which-source-is-redundant report that closes the loop between
    // q146's overlap matrix and q152's mixture weights.
    "q166_dedup_impact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val losers = Artifacts.components(s, dir,
          k = 8, bands = 4, minJaccard = 0.2)
        .where(col("doc_id") =!= col("component"))
        .select(col("doc_id"), lit(1L).as("removed"))
      docs.select(col("doc_id"), col("source"),
          size(Text.cleanTokens(col("text"))).cast("long").as("nt"))
        .join(losers, Seq("doc_id"), "left")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("removed"), lit(0L))).as("n_removed"),
          sum(col("nt")).as("tokens_total"),
          sum(when(col("removed").isNotNull, col("nt")).otherwise(0L))
            .as("tokens_removed"))
        .withColumn("token_retention", Num.floorAt(
          (col("tokens_total") - col("tokens_removed")).cast("double") /
            col("tokens_total"), 6))
        .orderBy("source")
    }),

    // north star — the ARTIFACT STORE made physical (Artifacts
    // scaladoc): the (pairs, components) dedup artifact written to
    // parquet once and the summary report read back ENTIRELY from the
    // store — the cluster shape where every dedup report is a cheap
    // scan of a materialized snapshot, not a pipeline re-run. This
    // query is the WRITER: it runs the pair+CC pipeline directly (not
    // via the memo), so the bench keeps charging the full build cost
    // somewhere visible even though every report query reads the
    // memoized artifact for free.
    "q167_artifact_store" -> ((s, dir) => {
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q167-${ProcessHandle.current().pid}"
      val pairsBuilt = Dedup.lshVerifiedPairs(t(s, dir, "documents"),
          "doc_id", "text", k = 8, bands = 4, minJaccard = 0.2)
        .localCheckpoint() // feeds the write AND the CC build
      pairsBuilt.write.mode("overwrite").parquet(s"$path/pairs")
      Dedup.componentsConverged(pairsBuilt)
        .write.mode("overwrite").parquet(s"$path/components")
      val pairs = s.read.parquet(s"$path/pairs")
      val comp = s.read.parquet(s"$path/components")
      // jaccard is floored at 4 dp upstream, so the decimal(18,4) sum
      // is exact and order-insensitive (the q01 money-sum contract)
      val pStats = pairs.agg(count(lit(1)).as("n_pairs"),
        Num.floorAt(sum(col("jaccard").cast("decimal(18,4)"))
          .cast("double") / count(lit(1)), 4).as("mean_jaccard"))
      val cStats = comp.groupBy("component")
        .agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_labeled_docs"),
          max(col("sz")).as("max_cluster"))
      pStats.crossJoin(broadcast(cStats))
    }),

    // north star — REAL PNG decode (Multimodal.decodePng scaladoc):
    // q70's closed-form pixel rule encoded as real PNG files through
    // the JDK's own javax.imageio writer, decoded back
    // partition-parallel, per-channel means exact. PNG is LOSSLESS, so
    // the oracle replays the pixel rule — encoder byte streams differ,
    // decoded pixels cannot (n_bytes is encoder-dependent and
    // deliberately not in the output).
    "q168_png_decode" -> ((s, dir) => {
      val media = Multimodal.pngMediaFromDocuments(t(s, dir, "documents"))
      Multimodal.decodeImages(media).toDF()
        .select(col("media_id"), col("kind"),
          col("width"), col("height"), col("n_pixels"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("media_id")
    }),

    // north star — REAL WAV/PCM16 audio decode (Audio scaladoc): the
    // audio twin of q70/q168 — real RIFF files built from a closed-form
    // sample rule, chunk-walked and measured partition-parallel;
    // integer-exact features (peak, zero crossings, integer-division
    // duration) plus one floored mean and one floored IEEE-sqrt rms,
    // all replayed by the oracle from the rule.
    "q169_wav_decode" -> ((s, dir) => {
      val media = Audio.wavMediaFromDocuments(t(s, dir, "documents"))
      Audio.decodeAudio(media).toDF()
        .select(col("media_id"), col("kind"), col("sample_rate"),
          col("n_samples"), col("duration_ms"), col("peak_abs"),
          col("n_zero_cross"), col("mean_sample"), col("rms"))
        .orderBy("media_id")
    }),

    // north star — Cavnar–Trenkle n-gram language ID (Text.langIdNgram
    // scaladoc): trigram rank profiles per declared lang, out-of-place
    // distance per (doc, lang), argmin prediction — the real public
    // lang-ID method replacing q38's stopword heuristic; profiles are
    // |langs|*k rows, broadcast.
    "q170_langid_ct" -> ((s, dir) =>
      // the prediction-artifact build; q173 reads the same artifact
      Artifacts.ctPredictions(s, dir, k = 40)
        .orderBy("doc_id")),

    // north star — image perceptual hash (Multimodal.aHash36 scaladoc):
    // real decode → 6x6 nearest-neighbor aHash per image, then the
    // exact-duplicate bucket size via groupBy+join-back (the q128
    // member-count shape — a viral logo/thumbnail is exactly the hot
    // bucket). The image-side dedup fingerprint next to the text-side
    // SimHash family; hamming-banded pair joins ride the q34 machinery.
    "q171_image_phash" -> ((s, dir) => {
      val hashed = Multimodal.perceptualHash(
        Multimodal.ppmMediaFromDocuments(t(s, dir, "documents"))).toDF()
        .localCheckpoint() // feeds the bucket agg AND the join-back
      val sizes = hashed.groupBy("phash")
        .agg(count(lit(1)).as("n_bucket"))
      hashed.join(sizes, Seq("phash"))
        .select(col("media_id"), col("kind"), col("phash"),
          col("n_bucket"))
        .orderBy("media_id")
    }),

    // north star — LEAKAGE-SAFE k-fold split: fold assignment is a pure
    // md5 function of the near-dup COMPONENT (docs outside the pair
    // graph are their own group), so near-duplicates can never straddle
    // a train/eval boundary — the q74 random split leaks: a doc and its
    // near-copy land in different folds and the eval is contaminated.
    // Composes the Artifacts component labels with q74's deterministic
    // hash-split; one left join, scan-local fold math.
    "q172_leakage_safe_split" -> ((s, dir) => {
      val comp = Artifacts.components(s, dir,
        k = 8, bands = 4, minJaccard = 0.2)
      t(s, dir, "documents").select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("split_group",
          coalesce(col("component"), col("doc_id")))
        .withColumn("fold",
          (conv(substring(md5(col("split_group").cast("string")), 1, 4),
            16, 10).cast("int") % 5).cast("int"))
        .select(col("doc_id"), col("split_group"), col("fold"))
        .orderBy("doc_id")
    }),

    // north star — mixture weights over the PREDICTED language: q170's
    // CT classifier feeding q152's α-temperature recipe — the trained
    // per-language rebalance (declared labels are scraped metadata;
    // mixture recipes in production weigh what the classifier says the
    // text IS). Profile scoring rides the broadcast shape; weights are
    // |langs| rows.
    "q173_pred_lang_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pred = Artifacts.ctPredictions(s, dir, k = 40)
        .select(col("doc_id"), col("pred_lang"))
      Curate.mixtureWeights(docs.join(pred, Seq("doc_id")),
          "pred_lang", "text", alpha = 0.5, budget = 1000000L)
        .withColumnRenamed("grp", "pred_lang")
        .orderBy("pred_lang")
    }),

    // §2.5 gap — per-group MAD (Agg.madByRank scaladoc): the robust
    // scale estimate next to q158's winsorization — both medians exact
    // rank selections, no per-group buffer anywhere.
    "q174_mad" -> ((s, dir) =>
      Agg.madByRank(t(s, dir, "events"), "event_type", "value")
        .orderBy("event_type")),

    // north star — audio fingerprint (Audio.energyFingerprint
    // scaladoc): real WAV decode → energy-delta sign bits — the audio
    // twin of q171's image aHash; exact-dup buckets via the same
    // groupBy+join-back, oracle replays energies from the sample rule.
    "q175_audio_fingerprint" -> ((s, dir) => {
      val fp = Audio.fingerprintAudio(
          Audio.wavMediaFromDocuments(t(s, dir, "documents")), win = 2)
        .toDF()
        .localCheckpoint() // feeds the bucket agg AND the join-back
      val sizes = fp.groupBy("fingerprint")
        .agg(count(lit(1)).as("n_bucket"))
      fp.join(sizes, Seq("fingerprint"))
        .select(col("media_id"), col("kind"), col("n_windows"),
          col("fingerprint"), col("n_bucket"))
        .orderBy("media_id")
    }),

    // op-1 RANKED twin — BM25 retrieval (Text.bm25Retrieve scaladoc):
    // the reference's keyword search (etl_pipeline.py:44-51) as ranked
    // retrieval over an inverted index instead of substring match;
    // broadcast query terms reduce the corpus to matching postings
    // before any other join.
    "q176_bm25_retrieval" -> ((s, dir) =>
      Text.bm25Retrieve(t(s, dir, "documents"), "doc_id", "text",
          Seq(("kw_cust", "customer order value"),
            ("kw_join", "join merge hash"),
            ("kw_scan", "spark scan filter"),
            ("kw_win", "window batch sort")), k = 5)
        .select(col("query_id"), col("id").as("doc_id"),
          col("n_matched"), col("score"), col("rk"))
        .orderBy("query_id", "rk")),

    // §2.5 gap — pairwise correlation MATRIX (Agg.exactCorrMatrix
    // scaladoc): all power sums for all pairs in ONE scan, closed
    // forms off the 1-row state — the feature-redundancy profile, and
    // mergeable across shards like q116's states.
    "q177_corr_matrix" -> ((s, dir) =>
      Agg.exactCorrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")),

    // §2.5 gap — equi-depth histogram (Agg.equiDepthHistogram
    // scaladoc): exact k-quantile bin edges by rank selection over the
    // pre-aggregated VALUE DOMAIN (not the row stream), k-1 edges
    // broadcast back for one binning scan — the feature-binning /
    // range-partition-planning profile.
    "q178_equidepth_hist" -> ((s, dir) =>
      Agg.equiDepthHistogram(t(s, dir, "events"), "value", k = 8)
        .orderBy("bin")),

    // north star — ingest DELTA pair generation (Dedup.lshDeltaPairs
    // scaladoc): the pair step of an incremental artifact refresh —
    // candidates from batch-banded × union-banded (cost ∝ batch), the
    // oracle checks the invariant delta ≡ full-corpus pairs filtered
    // to those touching the batch. Composes q135 (admission) upstream
    // and q140 (incremental CC) downstream into the complete
    // per-ingest artifact maintenance loop.
    "q179_ingest_delta_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // the standing band frame is a store read (Artifacts.
      // standingBands): only the batch is signed per ingest
      Dedup.lshDeltaPairs(
          docs.where(col("doc_id") % 5 =!= 0),
          docs.where(col("doc_id") % 5 === 0),
          "doc_id", "text", k = 8, bands = 4, minJaccard = 0.2,
          standingBanded = Some(Artifacts.standingBands(s, dir,
            k = 8, bands = 4)))
        .orderBy("id_a", "id_b")
    }),

    // north star — chi² independence audit (Agg.chi2Independence
    // scaladoc): is `lang` independent of `source`, or does a scraper
    // mislabel languages? Zero-observed cells contribute in closed
    // form (Σ_all E = n); per-cell terms sum order-free through
    // decimal.
    "q180_chi2_independence" -> ((s, dir) =>
      Agg.chi2Independence(t(s, dir, "documents"), "source", "lang")),

    // north star — distributional source similarity (Curate.jsDivergence
    // scaladoc): Jensen-Shannon divergence between per-source unigram
    // distributions — q146 catches literal mirrors, this catches
    // same-register sources with zero literal overlap; exclusive mass
    // in closed form, shared-term join bounded by S per term.
    "q181_js_divergence" -> ((s, dir) =>
      Curate.jsDivergence(t(s, dir, "documents"), "source", "text")
        .orderBy("g_a", "g_b")),

    // north star — robust anomaly profile (Agg.robustAnomalies
    // scaladoc): modified z-scores from median/MAD (50% breakdown —
    // an extreme value cannot inflate the scale estimate and mask
    // itself, the q147 mean/sigma failure mode), flagged at the
    // standard 3.5 on the FLOORED score.
    "q182_robust_anomalies" -> ((s, dir) =>
      Agg.robustAnomalies(t(s, dir, "events"), "event_type", "value")
        .orderBy("event_type")),

    // north star — ingest novelty (Curate.batchNovelty scaladoc): the
    // content-level admission signal next to q135's signature identity
    // — share of each batch doc's shingles the standing corpus has
    // never seen; anti-join on the shingle key, cost ∝ batch.
    "q183_batch_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curate.batchNovelty(
          docs.where(col("doc_id") % 5 =!= 0),
          docs.where(col("doc_id") % 5 === 0),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // §2.5 gap — WEIGHTED median (Agg.weightedMedian scaladoc): the
    // quantity-weighted median price per return flag — tie-invariant
    // rank selection over exact integer cumulative weights, the value
    // itself is data (no float arithmetic anywhere).
    "q184_weighted_median" -> ((s, dir) =>
      Agg.weightedMedian(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")),

    // north star — mixture concentration (Agg.hhiConcentration
    // scaladoc): HHI of token mass over sources + the effective-source
    // count — the is-one-source-dominating monitor that triggers
    // q152's re-weigh.
    "q185_source_hhi" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Agg.hhiConcentration(
        docs.select(col("source"),
          Text.cleanTokens(col("text")).as("t"))
          .select(col("source"), size(col("t")).as("nt")),
        "source", col("nt"))
    }),

    // north star — embedding-store quality gate (Sim.embeddingAudit
    // scaladoc): zero vectors, non-finite vectors, mixed dims, norm
    // profile per label — one scan-local pass, no vector shuffle.
    "q186_embedding_audit" -> ((s, dir) =>
      Sim.embeddingAudit(t(s, dir, "embeddings")).orderBy("label")),

    // north star — lexical-richness profile (Text.vocabGrowth
    // scaladoc): hapax/dis-legomena counts, TTR and hapax share per
    // source — the Heaps-law health check that flags template or
    // generated sources next to q151's entropy.
    "q187_vocab_growth" -> ((s, dir) =>
      Text.vocabGrowth(t(s, dir, "documents"), "source", "text")
        .withColumnRenamed("grp", "source")
        .orderBy("source")),

    // north star — containment on the verified pair graph
    // (Dedup.containmentPairs scaladoc): the quote/subset signature
    // Jaccard under-reports — |A∩B|/|A| vs |A∩B|/|B| per pair, cost
    // bounded by the pair artifact, not the corpus.
    "q188_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "text", w = 3)
        .orderBy("id_a", "id_b")),

    // north star — cluster cap (Dedup.clusterCap scaladoc): keep the 2
    // smallest doc_ids per near-dup component — the keep-n-exemplars
    // policy between q157's single survivor and no dedup; the window
    // is WindowGroupLimit-pruned (PlanSpec), input is the label
    // artifact.
    "q189_cluster_cap" -> ((s, dir) =>
      Dedup.clusterCap(
          Artifacts.components(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          n = 2)
        .orderBy("doc_id")),

    // north star — HyperLogLog distinct sketch AS A KEYED AGGREGATION
    // (Sketch.hllRegisters scaladoc): registers are (key, reg, mx)
    // rows, union = cell-max groupBy — asserted in-query against the
    // one-shot frame (merge_equals_full, the q136/q122 pattern) — and
    // the oracle replays every register exactly; the only float in
    // the whole pipeline is the final floored estimate.
    "q190_hll_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val merged = Sketch.hllMerge(Seq(
        Sketch.hllRegisters(ev.where(col("event_id") % 10 =!= 0),
          "event_type", "user_id"),
        Sketch.hllRegisters(ev.where(col("event_id") % 10 === 0),
          "event_type", "user_id")))
      val full = Sketch.hllRegisters(ev, "event_type", "user_id")
      val nDiff = merged
        .join(full.withColumnRenamed("mx", "mx_full"),
          Seq("key", "reg"), "full")
        .where(coalesce(col("mx"), lit(-1)) =!=
          coalesce(col("mx_full"), lit(-1)))
        .agg(count(lit(1)).as("n_cell_diff"))
      val exact = ev.groupBy(col("event_type").as("key"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      Sketch.hllEstimate(merged)
        .join(exact, "key")
        .crossJoin(broadcast(nDiff))
        .select(col("key").as("event_type"), col("exact_distinct"),
          col("hll_estimate"), col("nz_registers"), col("v_zero"),
          col("n_cell_diff"))
        .orderBy("event_type")
    }),

    // north star — source×source dup matrix (Dedup.pairSourceMatrix
    // scaladoc): heavy off-diagonal cells are mirrors/scrapes caught
    // at the VERIFIED-pair level (q146 sees shared vocabulary; this
    // sees confirmed pairs); pair-artifact-bounded.
    "q191_pair_source_matrix" -> ((s, dir) =>
      Dedup.pairSourceMatrix(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "source")
        .orderBy("src_a", "src_b")),

    // monitoring — two-sample KS between the two largest sources' doc
    // lengths (Agg.ksTwoSample scaladoc): binning-free distribution
    // gate; the ordered pass runs over the VALUE DOMAIN, not rows.
    "q192_ks_two_sample" -> ((s, dir) =>
      Agg.ksTwoSample(t(s, dir, "documents"), "source", "n_chars",
        "src0", "src1")),

    // monitoring — per-source Gini of doc-length inequality
    // (Agg.giniByGroup scaladoc): HHI asks which group dominates,
    // Gini asks how unequal the mass is INSIDE a group.
    "q193_gini_lengths" -> ((s, dir) =>
      Agg.giniByGroup(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("source")),

    // dedup — order-insensitive exact dedup on the sorted distinct
    // token set (Dedup.bagOfWordsDupGroups scaladoc): catches
    // reshuffled boilerplate at exact-dedup (one-shuffle) cost.
    "q194_bow_dedup" -> ((s, dir) =>
      Dedup.bagOfWordsDupGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // similarity — label-centroid cosine matrix
    // (Sim.labelCentroidCosine scaladoc): the label-confusion monitor;
    // one hash agg reduces the corpus to |labels|·dim rows.
    "q195_centroid_cosine" -> ((s, dir) =>
      Sim.labelCentroidCosine(t(s, dir, "embeddings"), "label",
          "embedding")
        .orderBy("label_a", "label_b")),

    // monitoring — single-changepoint scan over daily event-value means
    // (EventsOps.changepointScan scaladoc): the level-shift detector
    // dailyAnomalies is blind to; |days|-sized after one scan.
    "q196_changepoint" -> ((s, dir) =>
      EventsOps.changepointScan(t(s, dir, "events"), "value")),

    // dedup — longest common verbatim token run per verified pair
    // (Dedup.commonRunPairs scaladoc): the substring-level signal set
    // similarity dilutes; gaps-and-islands on shingle-position
    // diagonals, cost ∝ the pair list.
    "q197_common_run" -> ((s, dir) =>
      Dedup.commonRunPairs(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "text", w = 3)
        .orderBy("id_a", "id_b")),

    // dedup — duplication rate by equi-depth length decile
    // (Curate.dupRateByBucket scaladoc): is duplication length-biased?
    // Rank-selected edges over the value domain + pair-membership probe.
    "q198_dup_rate_by_length" -> ((s, dir) =>
      Curate.dupRateByBucket(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "n_chars", k = 10)
        .orderBy("bin")),

    // dedup — IDF-weighted Jaccard per verified pair
    // (Dedup.idfWeightedJaccard scaladoc): shared rare terms count for
    // more than shared stopwords; corpus-df pass + pair-bounded joins.
    "q199_idf_jaccard" -> ((s, dir) =>
      Dedup.idfWeightedJaccard(t(s, dir, "documents"),
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2),
          "doc_id", "text")
        .orderBy("id_a", "id_b")),

    // text quality — interpolated-bigram mean log2 prob
    // (Curate.bigramLogProb scaladoc): the word-order-aware rung above
    // q127's unigram proxy; twice the q127 df-pass skeleton.
    "q200_bigram_logprob" -> ((s, dir) =>
      Artifacts.bigramScores(s, dir)
        .orderBy("doc_id")),

    // dedup — degree profile of the verified pair graph
    // (Dedup.pairDegreeProfile scaladoc): the hub/template alarm; two
    // keyed aggs over the pair artifact, corpus untouched.
    "q201_dup_degree_profile" -> ((s, dir) =>
      Dedup.pairDegreeProfile(
          Artifacts.nearDupPairs(s, dir, k = 8, bands = 4,
            minJaccard = 0.2))
        .orderBy("deg")),

    // text analysis — vocabulary coverage curve (Text.vocabCoverage
    // scaladoc): token mass covered by the top-k terms at tokenizer
    // budgets 100/1k/10k; the rank window runs over vocab rows only.
    "q202_vocab_coverage" -> ((s, dir) =>
      Text.vocabCoverage(t(s, dir, "documents"), "text",
          Seq(100, 1000, 10000))
        .orderBy("k")),

    // text analysis — lang-ID confusion matrix (Text.langConfusion
    // scaladoc) over the memoized q170 prediction artifact; the corpus
    // text is never re-touched.
    "q203_langid_confusion" -> ((s, dir) =>
      Text.langConfusion(Artifacts.ctPredictions(s, dir))
        .orderBy("lang", "pred_lang")),

    // curation — CCNet-style perplexity terciles
    // (Curate.perplexityBuckets scaladoc): head/middle/tail cut of the
    // corpus by q200's bigram score, rank-selected exact edges.
    "q204_perplexity_buckets" -> ((s, dir) =>
      Curate.perplexityBucketsFromScores(Artifacts.bigramScores(s, dir))
        .orderBy("bucket")),

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
        .orderBy("doc_id")),

    // dedup — candidate pairs from shared winnowing fingerprints
    // (Dedup.winnowingCandidatePairs scaladoc): the join the selection
    // feeds; fan-in bounded per fingerprint bucket.
    "q208_winnow_candidates" -> ((s, dir) =>
      Dedup.winnowingCandidatePairs(t(s, dir, "documents"), "doc_id",
          "text", w = 3, window = 4, minShared = 2)
        .orderBy("id_a", "id_b")),

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
        .orderBy("layout", "predicate")),

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
        .orderBy("user_id", "event_id")),

    // curation — within-source quantile normalization
    // (Curate.quantileNormalize scaladoc): per-doc score -> empirical
    // percentile, the calibration before any cross-source threshold.
    "q217_quantile_norm" -> ((s, dir) =>
      Curate.quantileNormalize(t(s, dir, "documents"), "doc_id",
          "source", "n_chars")
        .orderBy("doc_id")),

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
      val path = sys.props("java.io.tmpdir") +
        s"/graft-q222-${ProcessHandle.current().pid}"
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
        .orderBy("name")
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
      val km = Sim.kmeansCells(emb, k = 8, iters = 2).localCheckpoint()
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

    // monitoring — AUTO-dispatched Spearman (Agg.spearmanAuto
    // scaladoc), pinned to q209/q230's oracle: the cardinality
    // preflight routes lineitem's 3-value l_returnflag to the
    // hash-distributing domain engine (3 < cores); output is
    // bit-identical to both siblings by construction — THREE queries,
    // ONE oracle string.
    "q233_spearman_auto" -> ((s, dir) =>
      Agg.spearmanAuto(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag"))
  )

  /** CMS geometry shared by q136's query and oracle: 4 md5-salted rows of
    * 64 buckets — small enough that the 150-user fixture collides (the
    * overcount the guarantee bit is ABOUT), large enough for sane
    * estimates.
    */
  private val CmsD = 4
  private val CmsW = 64

  /** PageRank knobs shared by q137's query and oracle: integer mass out
    * of 1e12, 85% damping (Graph.scala scaladoc for the overflow math).
    */
  private val PrScale = 1000000000000L
  private val PrDampPct = 85

  // ---- oracle SQL (DuckDB) ----------------------------------------------

  def oracleSql: Map[String, String] = {
    val dsumS = (c: String) => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
    val clean = cleanSql("text")
    val toks = toksSql("text")
    val cleanToks = toksSql("c")

    // ONE oracle for both brute-force top-k plans: q40 (window) and
    // q102 (typed Aggregator) are result-identical by construction —
    // binding them to the same string makes divergence impossible.
    val topkCosineSql =
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT q_id, c_id,
        |    floor((
        |      list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
        |  FROM c CROSS JOIN q WHERE q_id <> c_id)
        |SELECT q_id, c_id, sim, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT q_id, c_id, sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

    // The deterministic-kmeans cell chain (init = 8 lowest-id vectors,
    // 2 Lloyd iterations, exact decimal centroid means, 9dp-floored
    // argmax with ties to the lowest cell) as a reusable WITH fragment
    // ending in `af(vec_id, v, cell)` — shared by the q125 SemDeDup
    // oracle and q228's ivf_kmeans recall row so both provably run on
    // the identical quantizer.
    val kmeansAfCte: String = {
      // assignment of every e-row to its argmax-cosine centroid in $cents
      def kmAssign(cents: String, out: String): String =
        s"""$out AS (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT e.vec_id, e.v, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |        floor(list_sum(list_transform(range(1, 65),
           |          i -> e.v[i] * c.cv[i])) / c.cn * 1000000000) DESC,
           |        c.cell ASC) AS rn
           |    FROM e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
      // recompute centroids from an assignment; empty cells keep $prev's
      def kmUpdate(assign: String, prev: String, out: String): String =
        s"""${out}m AS (
           |  SELECT cell, p.pos AS pos,
           |    CAST(SUM(CAST(a.v[p.pos] AS DECIMAL(27,10))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM $assign a CROSS JOIN range(1, 65) AS p(pos)
           |  GROUP BY cell, p.pos),
           |${out}l AS (
           |  SELECT cell,
           |    list(CAST(CAST(m AS REAL) AS DOUBLE) ORDER BY pos) AS cv
           |  FROM ${out}m GROUP BY cell),
           |$out AS (
           |  SELECT p.cell, COALESCE(l.cv, p.cv) AS cv,
           |    sqrt(list_sum(list_transform(COALESCE(l.cv, p.cv),
           |      x -> x * x))) AS cn
           |  FROM $prev p LEFT JOIN ${out}l l ON l.cell = p.cell)"""
          .stripMargin
      s"""e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |    v AS cv, sqrt(list_sum(list_transform(v, x -> x * x))) AS cn
         |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
         |${kmAssign("c0", "a1")},
         |${kmUpdate("a1", "c0", "c1")},
         |${kmAssign("c1", "a2")},
         |${kmUpdate("a2", "c1", "c2")},
         |${kmAssign("c2", "af")}""".stripMargin
    }

    // ONE Spearman oracle for BOTH engines (q209 windowed raw-frame,
    // q230 domain-reduced + joint-domain joins): average ranks from
    // per-group value-domain cumsums carried as exact doubled
    // integers; Pearson closed form on decimal sums
    val spearmanSql = {
      def rk(c: String, out: String) =
        s"""(SELECT l_returnflag, v AS $c,
           |    2 * (SUM(cnt) OVER (PARTITION BY l_returnflag
           |      ORDER BY v) - cnt) + cnt + 1 AS $out
           |  FROM (SELECT l_returnflag, $c AS v, COUNT(*) AS cnt
           |    FROM lineitem GROUP BY 1, 2))""".stripMargin
      s"""WITH r AS (SELECT li.l_returnflag, rx.rx, ry.ry
         |  FROM lineitem li
         |  JOIN ${rk("l_quantity", "rx")} rx
         |    ON rx.l_returnflag = li.l_returnflag
         |   AND rx.l_quantity = li.l_quantity
         |  JOIN ${rk("l_extendedprice", "ry")} ry
         |    ON ry.l_returnflag = li.l_returnflag
         |   AND ry.l_extendedprice = li.l_extendedprice),
         |g AS (SELECT l_returnflag, COUNT(*) AS n,
         |    SUM(CAST(rx AS DECIMAL(18,0))) AS sx,
         |    SUM(CAST(ry AS DECIMAL(18,0))) AS sy,
         |    SUM(CAST(rx AS DECIMAL(18,0)) * CAST(rx AS DECIMAL(18,0)))
         |      AS sxx,
         |    SUM(CAST(ry AS DECIMAL(18,0)) * CAST(ry AS DECIMAL(18,0)))
         |      AS syy,
         |    SUM(CAST(rx AS DECIMAL(18,0)) * CAST(ry AS DECIMAL(18,0)))
         |      AS sxy
         |  FROM r GROUP BY 1)
         |SELECT l_returnflag, n, ${Num.floorAtSql(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
             " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
             " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
             " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
             " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)" +
             " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)} AS rho
         |FROM g ORDER BY l_returnflag""".stripMargin
    }

    // q41's and q43's full oracle bodies as vals: q228 measures their
    // recall against q40's, so all three must provably be the SAME
    // queries the standalone entries check
    val topkIvfSql =
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS cell FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS cv, label AS cell FROM embeddings),
        |scored AS (
        |  SELECT q_id, c_id,
        |    floor((
        |      list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
        |  FROM c JOIN q USING (cell) WHERE q_id <> c_id)
        |SELECT q_id, c_id, sim, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT q_id, c_id, sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
        |  FROM scored) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

    def topkLshSqlFor(bits: Int): String =
      s"""WITH dims AS (SELECT MAX(len(embedding)) AS dim FROM embeddings),
         |planes AS (
         |  SELECT CAST(t.i AS INTEGER) AS i,
         |    list_transform(range(0, (SELECT dim FROM dims)), j ->
         |      CAST(CAST((${md5Hex4Sql("CAST(t.i AS VARCHAR) || ':' || CAST(j AS VARCHAR)")} / 65535.0) * 2 - 1 AS FLOAT) AS DOUBLE)) AS pv
         |  FROM range(0, $bits) t(i)),
         |bucket AS (
         |  SELECT vec_id, SUM(CASE WHEN dot > 0 THEN (1 << i) ELSE 0 END) AS cell
         |  FROM (
         |    SELECT e.vec_id, p.i,
         |      list_sum(list_transform(range(1, len(e.embedding) + 1), x ->
         |        CAST(e.embedding[x] AS DOUBLE) * p.pv[x])) AS dot
         |    FROM embeddings e CROSS JOIN planes p)
         |  GROUP BY vec_id),
         |q AS (SELECT cell, e.vec_id AS q_id, e.embedding AS qv
         |      FROM embeddings e JOIN bucket USING (vec_id) WHERE e.vec_id < 10),
         |c AS (SELECT cell, e.vec_id AS c_id, e.embedding AS cv
         |      FROM embeddings e JOIN bucket USING (vec_id)),
         |scored AS (
         |  SELECT q_id, c_id,
         |    floor((
         |      list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
         |  FROM c JOIN q USING (cell) WHERE q_id <> c_id)
         |SELECT q_id, c_id, sim, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT q_id, c_id, sim,
         |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
         |  FROM scored) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

    val topkLshSql = topkLshSqlFor(4)

    // OR-amplified sign-LSH top-5 (q_id, c_id) set for `tables`
    // independent plane sets at bits = 4: table 0 keeps the q43 "i:j"
    // md5 derivation (so tables = 1 IS the q43/q231 engine), table
    // t > 0 seeds "t<t>:i:j" (Sim.hyperplanes); a pair is a candidate
    // if buckets agree in ANY table (DISTINCT union — scoring is
    // table-independent, so this equals the engine's first-match-wins)
    def lshTablesTkSqlFor(tables: Int): String = {
      val keyExpr = "CASE WHEN t.tbl = 0" +
        " THEN CAST(p.i AS VARCHAR) || ':' || CAST(j AS VARCHAR)" +
        " ELSE 't' || CAST(t.tbl AS VARCHAR) || ':' ||" +
        " CAST(p.i AS VARCHAR) || ':' || CAST(j AS VARCHAR) END"
      s"""WITH dims AS (SELECT MAX(len(embedding)) AS dim FROM embeddings),
         |planes AS (
         |  SELECT CAST(t.tbl AS INTEGER) AS tbl, CAST(p.i AS INTEGER) AS i,
         |    list_transform(range(0, (SELECT dim FROM dims)), j ->
         |      CAST(CAST((${md5Hex4Sql(keyExpr)} / 65535.0) * 2 - 1 AS FLOAT) AS DOUBLE)) AS pv
         |  FROM range(0, $tables) t(tbl) CROSS JOIN range(0, 4) p(i)),
         |bucket AS (
         |  SELECT vec_id, tbl, SUM(CASE WHEN dot > 0 THEN (1 << i) ELSE 0 END) AS cell
         |  FROM (
         |    SELECT e.vec_id, p.tbl, p.i,
         |      list_sum(list_transform(range(1, len(e.embedding) + 1), x ->
         |        CAST(e.embedding[x] AS DOUBLE) * p.pv[x])) AS dot
         |    FROM embeddings e CROSS JOIN planes p)
         |  GROUP BY vec_id, tbl),
         |qb AS (SELECT tbl, cell, vec_id AS q_id FROM bucket WHERE vec_id < 10),
         |pairs AS (SELECT DISTINCT q.q_id, c.vec_id AS c_id
         |  FROM qb q JOIN bucket c ON q.tbl = c.tbl AND q.cell = c.cell
         |  WHERE q.q_id <> c.vec_id),
         |scored AS (
         |  SELECT p.q_id, p.c_id,
         |    floor((
         |      list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
         |  FROM pairs p
         |  JOIN embeddings a ON a.vec_id = p.q_id
         |  JOIN embeddings b ON b.vec_id = p.c_id)
         |SELECT q_id, c_id FROM (
         |  SELECT q_id, c_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
         |  FROM scored) WHERE rk <= 5""".stripMargin
    }

    // the q111 LSH-then-verify pair generation as a reusable CTE chain
    // ending in `pairs(id_a, id_b)` — shared by the CC oracle and the
    // triangle-census oracle so every graph query provably runs on the
    // identical edge set
    val verifiedPairsCte =
      s"""cleaned AS (SELECT doc_id AS id, ${cleanSql("text")} AS c FROM documents),
         |sh AS (SELECT id, ${shinglesSql("t")} AS shs
         |       FROM (SELECT id, ${toksSql("c")} AS t FROM cleaned)),
         |sig AS (SELECT id,
         |  list_transform(range(0, 8), s ->
         |    COALESCE(list_min(list_transform(shs, x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')) AS sig
         |  FROM sh WHERE len(shs) > 0),
         |banded AS (
         |  SELECT id, sig, CAST(b.i AS INTEGER) AS band,
         |         md5(sig[CAST(b.i*2+1 AS INTEGER)] || '|' || sig[CAST(b.i*2+2 AS INTEGER)]) AS bkey
         |  FROM sig CROSS JOIN range(0, 4) AS b(i)),
         |cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.id < b.id),
         |dsh AS (SELECT id, list_distinct(shs) AS shs FROM sh
         |        WHERE len(shs) > 0),
         |scored AS (SELECT id_a, id_b,
         |  len(list_filter(x.shs, e -> list_contains(y.shs, e))) AS c,
         |  len(x.shs) AS na, len(y.shs) AS nb
         |  FROM cands JOIN dsh x ON x.id = cands.id_a
         |             JOIN dsh y ON y.id = cands.id_b),
         |pairs AS (SELECT id_a, id_b,
         |    floor(CAST(c AS DOUBLE) / (na + nb - c) * 10000) / 10000
         |      AS jacc
         |  FROM scored
         |  WHERE floor(CAST(c AS DOUBLE) / (na + nb - c) * 10000) / 10000
         |    >= 0.2)""".stripMargin

    // ONE oracle for both connected-components engines: q128 (fixpoint
    // label propagation) and q130 (alternating large-star/small-star)
    // must produce the identical component map over the identical q111
    // pair graph — sharing the string makes divergence impossible to
    // miss. Reachability via a recursive CTE; component = min reachable.
    // exact components over the verified pairs as a reusable CTE chain
    // ending in `comp(doc_id, component)` — reachability via a
    // recursive CTE; component = min reachable id
    val ccCte =
      """edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id AS doc_id, MIN(lbl) AS component
        |         FROM reach GROUP BY id)""".stripMargin

    val ccOracleSql =
      s"""WITH RECURSIVE
         |$verifiedPairsCte,
         |$ccCte
         |SELECT doc_id, component,
         |  COUNT(*) OVER (PARTITION BY component) AS n_members,
         |  (doc_id = component) AS is_survivor
         |FROM comp ORDER BY doc_id""".stripMargin

    // the q170 Cavnar–Trenkle prediction as a reusable CTE chain ending
    // in `ct_pred(doc_id, lang, pred_lang, dist)` — shared by the
    // lang-ID oracle and the predicted-language mixture oracle (q173)
    // so both provably score the identical classifier
    val ctPredCte =
      s"""ct_cleaned AS (SELECT doc_id, lang, ${cleanSql("text")} AS c
         |  FROM documents),
         |ct_tri AS (SELECT doc_id, lang,
         |    UNNEST(CASE WHEN strlen(c) < 3 THEN []
         |      ELSE list_transform(range(0, strlen(c) - 2),
         |        i -> substring(c, CAST(i + 1 AS INTEGER), 3)) END)
         |      AS g
         |  FROM ct_cleaned),
         |ct_lp AS (SELECT lang AS cand_lang, g, rank_l FROM (
         |    SELECT lang, g, row_number() OVER (PARTITION BY lang
         |      ORDER BY COUNT(*) DESC, g) AS rank_l
         |    FROM ct_tri GROUP BY lang, g) WHERE rank_l <= 40),
         |ct_dp AS (SELECT doc_id, g, rank_d FROM (
         |    SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY COUNT(*) DESC, g) AS rank_d
         |    FROM ct_tri GROUP BY doc_id, g) WHERE rank_d <= 40),
         |ct_m AS (SELECT doc_id, cand_lang,
         |    CAST(SUM(abs(rank_d - rank_l)) AS BIGINT) AS md,
         |    COUNT(*) AS nm
         |  FROM ct_dp JOIN ct_lp USING (g) GROUP BY 1, 2),
         |ct_grid AS (SELECT ds.doc_id, ds.n_prof, langs.cand_lang
         |  FROM (SELECT doc_id, COUNT(*) AS n_prof FROM ct_dp
         |    GROUP BY 1) ds
         |  CROSS JOIN (SELECT DISTINCT cand_lang FROM ct_lp) langs),
         |ct_best AS (SELECT doc_id, cand_lang, dist, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY dist, cand_lang) AS rk
         |  FROM (SELECT g.doc_id, g.cand_lang,
         |      CAST(COALESCE(m.md, 0)
         |        + (g.n_prof - COALESCE(m.nm, 0)) * 40 AS BIGINT)
         |        AS dist
         |    FROM ct_grid g LEFT JOIN ct_m m ON m.doc_id = g.doc_id
         |      AND m.cand_lang = g.cand_lang)),
         |ct_pred AS (SELECT d.doc_id, d.lang,
         |    COALESCE(b.cand_lang, 'und') AS pred_lang, b.dist
         |  FROM documents d
         |  LEFT JOIN (SELECT * FROM ct_best WHERE rk = 1) b
         |    ON b.doc_id = d.doc_id)""".stripMargin

    // the q200 interpolated-bigram scorer as a reusable CTE chain ending
    // in `bg_scored(doc_id, n_bigrams, mean_log2p)` — shared by the
    // q200 oracle and the q204 bucket oracle so both provably score the
    // identical model
    val bigramScoredCte =
      s"""bg_tokd AS (SELECT doc_id, $cleanToks AS t
         |  FROM (SELECT doc_id, $clean AS c FROM documents)),
         |bg_n AS (SELECT CAST(SUM(len(t)) AS DOUBLE) AS n FROM bg_tokd),
         |bg_s AS (SELECT doc_id, bg,
         |    string_split(bg, ' ')[1] AS w1,
         |    string_split(bg, ' ')[2] AS w2
         |  FROM (SELECT doc_id,
         |      UNNEST(${shinglesSql("t", 2)}) AS bg FROM bg_tokd)),
         |bg_tf AS (SELECT bg, COUNT(*) AS cbg FROM bg_s GROUP BY 1),
         |bg_ctx AS (SELECT w1, COUNT(*) AS cctx FROM bg_s GROUP BY 1),
         |bg_uni AS (SELECT w2, COUNT(*) AS cu
         |  FROM (SELECT UNNEST(t) AS w2 FROM bg_tokd) GROUP BY 1),
         |bg_sc AS (SELECT doc_id, CAST(${Num.floorAtSql(
           "log2(0.5 * cbg / cctx + 0.5 * cu / n)", 9)}
         |    AS DECIMAL(28,9)) AS lp
         |  FROM bg_s JOIN bg_tf USING (bg) JOIN bg_ctx USING (w1)
         |  JOIN bg_uni USING (w2) CROSS JOIN bg_n),
         |bg_scored AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |  ${Num.floorAtSql(
           "CAST(SUM(lp) AS DOUBLE) / COUNT(*)", 6)} AS mean_log2p
         |FROM bg_sc GROUP BY 1)""".stripMargin

    // the q207 winnowing selection as a reusable CTE chain ending in
    // `wn_sel(doc_id, h, sp)` — shared by the fingerprint oracle and
    // the q208 candidate-pair oracle
    val winnowCte =
      s"""wn_tokd AS (SELECT doc_id, $cleanToks AS t
         |  FROM (SELECT doc_id, $clean AS c FROM documents)),
         |wn_hs AS (SELECT doc_id,
         |    list_transform(${shinglesSql("t")},
         |      s -> ${md5HexNSql("s", 8)}) AS h
         |  FROM wn_tokd),
         |wn_hw AS (SELECT doc_id, h FROM wn_hs WHERE len(h) >= 4),
         |wn_sel AS (SELECT doc_id, h,
         |    list_sort(list_distinct(list_transform(
         |      range(0, len(h) - 4 + 1),
         |      i -> i + 4 - list_position(list_reverse(h[i+1:i+4]),
         |        list_min(h[i+1:i+4]))))) AS sp
         |  FROM wn_hw)""".stripMargin

    // the q211 multi-pass blocking chain as a reusable CTE ending in
    // `mp(id_a, id_b)` (verified pairs) and `g(id_a, id_b, passes)` —
    // shared with the q227 entity-cluster oracle so both provably run
    // on the identical candidate graph
    val multiBlockCte =
      """mk AS (SELECT DISTINCT p_name AS name FROM part),
        |mbk AS (SELECT name,
        |    string_split(name, ' ')[1] AS blk_first,
        |    string_split(name, ' ')[-1] AS blk_last,
        |    array_to_string(list_sort(string_split(name, ' ')), ' ')
        |      AS blk_sorted
        |  FROM mk),
        |mc AS (
        |  SELECT a.name AS id_a, b.name AS id_b, 'first' AS pass
        |  FROM mbk a JOIN mbk b
        |    ON a.blk_first = b.blk_first AND a.name < b.name
        |  UNION ALL SELECT a.name, b.name, 'last'
        |  FROM mbk a JOIN mbk b
        |    ON a.blk_last = b.blk_last AND a.name < b.name
        |  UNION ALL SELECT a.name, b.name, 'sorted'
        |  FROM mbk a JOIN mbk b
        |    ON a.blk_sorted = b.blk_sorted AND a.name < b.name),
        |g AS (SELECT id_a, id_b,
        |    array_to_string(list_sort(list(DISTINCT pass)), ',')
        |      AS passes
        |  FROM mc GROUP BY 1, 2),
        |mp AS (SELECT id_a, id_b FROM g
        |  WHERE levenshtein(id_a, id_b) <= 3)""".stripMargin

    ListMap(
      "q01_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           | SUM(l_quantity) AS sum_qty,
           | ${dsumS("l_extendedprice")} AS sum_base_price,
           | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           | SUM(l_quantity) / COUNT(*) AS avg_qty,
           | ${dsumS("l_extendedprice")} / COUNT(*) AS avg_price,
           | COUNT(*) AS n_rows
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q02_keyword_topn" ->
        """SELECT doc_id, source, lang, n_chars FROM documents
          |WHERE COALESCE(regexp_matches(text, '(?i)stream|window|merge'), FALSE)
          |ORDER BY n_chars DESC, doc_id LIMIT 50""".stripMargin,

      "q03_csv_roundtrip" ->
        """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "q04_partitioned_prune" ->
        """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source""".stripMargin,

      "q05_bucketed_join" ->
        s"""SELECT c_mktsegment, COUNT(*) AS n, ${dsumS("o_totalprice")} AS total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "q06_sql_api" ->
        s"""SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
           | ${dsumS("o_totalprice")} AS total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment, o_orderstatus
           |ORDER BY c_mktsegment, o_orderstatus""".stripMargin,

      "q44_jsonl_roundtrip" ->
        """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q45_orc_roundtrip" ->
        """SELECT lang, COUNT(*) AS n,
          | SUM(n_chars) / COUNT(*) AS avg_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q07_dedup_keepfirst" ->
        """SELECT doc_id, source FROM (
          |  SELECT doc_id, source,
          |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          |  FROM documents) WHERE rn = 1 ORDER BY source""".stripMargin,

      "q08_clean_text" ->
        s"SELECT doc_id, $clean AS clean_text FROM documents ORDER BY doc_id",

      "q09_regex_flag" ->
        """SELECT doc_id,
          | COALESCE(regexp_matches(text, '(?i)drop[\s-]?out|dropped out'), FALSE) AS dropout_mentioned,
          | COALESCE(regexp_matches(text, '(?i)spark|stream'), FALSE) AS mentions_spark
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q10_sentiment" ->
        s"""WITH cleaned AS (SELECT doc_id, $clean AS c FROM documents)
           |SELECT doc_id, ${Sentiment.scoreSqlInline("c")} AS sentiment
           |FROM cleaned ORDER BY doc_id""".stripMargin,

      "q11_sentiment_label" ->
        s"""WITH cleaned AS (SELECT doc_id, $clean AS c FROM documents),
           |scored AS (SELECT doc_id, ${Sentiment.scoreSqlInline("c")} AS sentiment FROM cleaned)
           |SELECT doc_id, sentiment, $labelCase AS label
           |FROM scored ORDER BY doc_id""".stripMargin,

      "q12_year_extract" ->
        """SELECT CAST(year(o_orderdate) AS INTEGER) AS year, COUNT(*) AS n
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

      "q13_star_join" ->
        s"""SELECT n_name, COUNT(*) AS n_orders,
           | ${dsumS("o_totalprice")} AS total_price
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin,

      "q14_dim_lookup" ->
        """WITH dim AS (
          |  SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS source_id
          |  FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL))
          |SELECT doc_id, documents.source AS source, source_id
          |FROM documents LEFT JOIN dim USING (source) ORDER BY doc_id""".stripMargin,

      "q15_surrogate_dim" ->
        """SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS source_id
          |FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL)
          |ORDER BY source_id""".stripMargin,

      "q16_label_distribution" ->
        // source IS NOT NULL mirrors the inner star-join path: a null
        // source has no dim row, so the fact row drops out of the join
        s"""WITH cleaned AS (SELECT doc_id, $clean AS c FROM documents
           |                 WHERE source IS NOT NULL),
           |scored AS (SELECT doc_id, ${Sentiment.scoreSqlInline("c")} AS sentiment FROM cleaned)
           |SELECT $labelCase AS label, COUNT(*) AS n
           |FROM scored GROUP BY label ORDER BY label""".stripMargin,

      "q17_count_2keys" ->
        """SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderstatus, COUNT(*) AS n
          |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q18_pivot_counts" ->
        """SELECT source,
          | COUNT(*) FILTER (WHERE lang = 'de') AS de,
          | COUNT(*) FILTER (WHERE lang = 'en') AS en,
          | COUNT(*) FILTER (WHERE lang = 'es') AS es,
          | COUNT(*) FILTER (WHERE lang = 'fr') AS fr,
          | COUNT(*) FILTER (WHERE lang = 'zh') AS zh
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "q19_scalar_insights" ->
        s"""WITH cleaned AS (SELECT doc_id, text, $clean AS c FROM documents),
           |scored AS (SELECT doc_id, text, ${Sentiment.scoreSqlInline("c")} AS sentiment FROM cleaned),
           |labeled AS (SELECT doc_id, text, $labelCase AS label FROM scored)
           |SELECT COUNT(*) AS n_docs,
           | CAST(SUM(CAST(COALESCE(regexp_matches(text, '(?i)spark|stream'), FALSE) AS BIGINT)) AS BIGINT) AS n_flagged,
           | floor((10000.0 * SUM(CASE WHEN label = 'neutral' THEN 1 ELSE 0 END)) / COUNT(*)) / 100 AS pct_neutral
           |FROM labeled""".stripMargin,

      "q20_argmax" ->
        """SELECT source, COUNT(*) AS n FROM documents
          |GROUP BY source ORDER BY n DESC, source ASC LIMIT 1""".stripMargin,

      "q21_distinct_sorted" ->
        "SELECT DISTINCT lang FROM documents ORDER BY lang",

      "q22_topn_per_group" ->
        """SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
          |FROM (
          |  SELECT o_orderstatus, o_orderkey, o_totalprice,
          |         row_number() OVER (PARTITION BY o_orderstatus
          |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          |  FROM orders) WHERE rk <= 3 ORDER BY o_orderstatus, rk""".stripMargin,

      "q23_upsert_ignore" ->
        """SELECT doc_id FROM documents
          |WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
          |ORDER BY doc_id""".stripMargin,

      "q24_dim_upsert" ->
        """WITH ex AS (
          |  SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS source_id
          |  FROM (SELECT DISTINCT source FROM documents
          |        WHERE source IN ('src0','src1','src2') AND source IS NOT NULL)),
          |mx AS (SELECT COALESCE(MAX(source_id), 0) AS base FROM ex),
          |nw AS (
          |  SELECT source, CAST(base + rn AS BIGINT) AS source_id
          |  FROM (SELECT source, row_number() OVER (ORDER BY source) AS rn
          |        FROM (SELECT DISTINCT source FROM documents
          |              WHERE source IS NOT NULL
          |                AND source NOT IN (SELECT source FROM ex)))
          |  CROSS JOIN mx)
          |SELECT source, source_id FROM ex
          |UNION ALL SELECT source, source_id FROM nw
          |ORDER BY source_id""".stripMargin,

      "q25_set_ops" ->
        """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
          |b AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
          |SELECT doc_id FROM (
          |  (SELECT doc_id FROM a UNION SELECT doc_id FROM b)
          |  EXCEPT
          |  (SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b))
          |ORDER BY doc_id""".stripMargin,

      "q68_except_all" ->
        """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey % 2 = 0),
          |b AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey % 3 = 0)
          |SELECT l_orderkey, COUNT(*) AS n FROM
          |  (SELECT l_orderkey FROM a EXCEPT ALL SELECT l_orderkey FROM b)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q69_collect_agg" ->
        """SELECT source,
          | array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
          | COUNT(*) AS n
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "q26_rollup" ->
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           | ${dsumS("l_extendedprice")} AS total
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST,
           | l_linestatus ASC NULLS FIRST""".stripMargin,

      "q27_cube" ->
        """SELECT year, o_orderstatus, COUNT(*) AS n FROM
          | (SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderstatus
          |  FROM orders)
          |GROUP BY CUBE (year, o_orderstatus)
          |ORDER BY year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

      "q28_range_join" ->
        s"""WITH bands(lo, hi, band) AS (VALUES
           | (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
           | (150000.0, 1000000000.0, 'high'))
           |SELECT band, COUNT(*) AS n, ${dsumS("o_totalprice")} AS total
           |FROM orders JOIN bands
           |  ON o_totalprice >= lo AND o_totalprice < hi
           |GROUP BY band ORDER BY band""".stripMargin,

      "q29_quantiles" ->
        """SELECT l_returnflag,
          | floor(quantile_cont(l_extendedprice, 0.5) * 100) / 100 AS p50,
          | floor(quantile_cont(l_extendedprice, 0.9) * 100) / 100 AS p90,
          | COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      "q30_fingerprint" ->
        s"SELECT doc_id, md5($clean) AS fp FROM documents ORDER BY doc_id",

      "q31_fingerprint_dedup" ->
        s"""WITH fp AS (SELECT doc_id, lang, md5($clean) AS fp FROM documents),
           |dedup AS (SELECT doc_id, lang FROM (
           |  SELECT doc_id, lang,
           |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           |  FROM fp) WHERE rn = 1)
           |SELECT lang, COUNT(*) AS n FROM dedup GROUP BY lang ORDER BY lang""".stripMargin,

      "q32_minhash_pairs" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |sh AS (SELECT id, ${shinglesSql("t")} AS shs
           |       FROM (SELECT id, $cleanToks AS t FROM cleaned)),
           |sig AS (SELECT id,
           |  list_transform(range(0, 8), s ->
           |    COALESCE(list_min(list_transform(shs, x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')) AS sig
           |  FROM sh WHERE len(shs) > 0),
           |banded AS (
           |  SELECT id, sig, CAST(b.i AS INTEGER) AS band,
           |         md5(sig[CAST(b.i*2+1 AS INTEGER)] || '|' || sig[CAST(b.i*2+2 AS INTEGER)]) AS bkey
           |  FROM sig CROSS JOIN range(0, 4) AS b(i))
           |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |  CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 8 AS est_jaccard
           |FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
           |WHERE a.id < b.id
           |ORDER BY id_a, id_b""".stripMargin,

      "q33_jaccard_pairs" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents WHERE doc_id < 200),
           |tok AS (SELECT id, $cleanToks AS t FROM cleaned),
           |sh AS (SELECT id, UNNEST(list_distinct(${shinglesSql("t")})) AS sh FROM tok),
           |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
           |common AS (
           |  SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS c
           |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.id < y.id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  ${Num.floorAtSql("CAST(c AS DOUBLE) / (na.n + nb.n - c)", 4)} AS jaccard
           |FROM common
           |JOIN sizes na ON na.id = id_a
           |JOIN sizes nb ON nb.id = id_b
           |WHERE ${Num.floorAtSql("CAST(c AS DOUBLE) / (na.n + nb.n - c)", 4)} >= 0.1
           |ORDER BY id_a, id_b""".stripMargin,

      "q34_simhash" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |             FROM (SELECT doc_id, $clean AS c FROM documents)),
           |hashed AS (SELECT doc_id,
           |  list_transform(t, tk ->
           |    (strpos('0123456789abcdef', substring(md5(tk), 1, 1)) - 1) * 4096 +
           |    (strpos('0123456789abcdef', substring(md5(tk), 2, 1)) - 1) * 256 +
           |    (strpos('0123456789abcdef', substring(md5(tk), 3, 1)) - 1) * 16 +
           |    (strpos('0123456789abcdef', substring(md5(tk), 4, 1)) - 1)) AS hs
           |  FROM tok)
           |SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), b ->
           |  CASE WHEN COALESCE(list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)), 0) > 0
           |       THEN (1 << b) ELSE 0 END)) AS INTEGER) AS simhash
           |FROM hashed ORDER BY doc_id""".stripMargin,

      "q35_simhash_dups" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |             FROM (SELECT doc_id, $clean AS c FROM documents)),
           |hashed AS (SELECT doc_id,
           |  list_transform(t, tk -> ${md5Hex4Sql("tk")}) AS hs
           |  FROM tok),
           |sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), b ->
           |  CASE WHEN COALESCE(list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)), 0) > 0
           |       THEN (1 << b) ELSE 0 END)) AS INTEGER) AS sh
           |  FROM hashed),
           |banded AS (SELECT doc_id AS id, sh, CAST(b.i AS INTEGER) AS band,
           |  (sh >> (CAST(b.i AS INTEGER) * 4)) & 15 AS nib
           |  FROM sim CROSS JOIN range(0, 4) b(i)),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.nib = b.nib AND a.id < b.id)
           |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
           |ORDER BY id_a, id_b""".stripMargin,

      "q55_simhash60_dups" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |             FROM (SELECT doc_id, $clean AS c FROM documents)),
           |hashed AS (SELECT doc_id,
           |  list_transform(t, tk -> ${md5HexNSql("tk", 15)}) AS hs
           |  FROM tok),
           |sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b ->
           |  CASE WHEN COALESCE(list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)), 0) > 0
           |       THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sh
           |  FROM hashed),
           |banded AS (SELECT doc_id AS id, sh, CAST(b.i AS INTEGER) AS band,
           |  (sh >> (CAST(b.i AS INTEGER) * 15)) & 32767 AS nib
           |  FROM sim CROSS JOIN range(0, 4) b(i)),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.nib = b.nib AND a.id < b.id)
           |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
           |ORDER BY id_a, id_b""".stripMargin,

      "q36_skew_salted_agg" ->
        s"""SELECT event_type, ${dsumS("value")} AS total, COUNT(*) AS n
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q37_semi_join" ->
        """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "q38_outer_join" ->
        """WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
          |                  COUNT(*) AS n_orders FROM orders GROUP BY 1),
          |l AS (SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
          |             COUNT(*) AS n_ship FROM lineitem GROUP BY 1)
          |SELECT COALESCE(o.year, l.year) AS year, n_orders, n_ship
          |FROM o FULL JOIN l ON o.year = l.year
          |ORDER BY year ASC NULLS FIRST""".stripMargin,

      "q39_count_distinct" ->
        """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
          | COUNT(*) AS n_orders
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

      "q40_topk_cosine" -> topkCosineSql,

      "q41_topk_ivf" -> topkIvfSql,

      "q43_topk_lsh" -> topkLshSql,

      "q42_near_dup_cosine" ->
        """WITH a AS (SELECT label AS cell, vec_id AS id_a, embedding AS va FROM embeddings),
          |b AS (SELECT label AS cell, vec_id AS id_b, embedding AS vb FROM embeddings),
          |scored AS (
          |  SELECT id_a, id_b,
          |    floor((
          |      list_sum(list_transform(range(1, len(va)+1), i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))
          |      / (sqrt(list_sum(list_transform(range(1, len(va)+1), i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE))))
          |       * sqrt(list_sum(list_transform(range(1, len(vb)+1), i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
          |  FROM a JOIN b USING (cell) WHERE id_a < id_b)
          |SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.2
          |ORDER BY id_a, id_b""".stripMargin,

      "q50_text_stats" ->
        s"""WITH base AS (SELECT doc_id, text, $toks AS t FROM documents),
           |stats AS (SELECT doc_id, text,
           |  CAST(len(t) AS INTEGER) AS n_tokens,
           |  CAST(len(t) + COALESCE(list_sum(list_transform(t, w ->
           |    CASE WHEN length(w) > 8 THEN (length(w) - 1) // 4 ELSE 0 END)), 0) AS INTEGER) AS n_tokens_est,
           |  CAST(len(list_filter(t, x -> x IN ('the','a','of','to','and','in','is'))) AS INTEGER) AS n_stopwords
           |  FROM base)
           |SELECT doc_id, n_tokens, n_tokens_est, n_stopwords,
           |  floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
           |    * (CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
           |       / CAST(greatest(length(text), 1) AS DOUBLE))
           |    * (1.0 - least(CAST(n_stopwords AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0), 1.0))) * 10000) / 10000 AS quality,
           |  CASE WHEN n_tokens = 0 THEN 'und'
           |       WHEN CAST(n_stopwords AS DOUBLE) / n_tokens > 0.05 THEN 'en'
           |       WHEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           |            / greatest(length(text), 1) > 0.7 THEN 'latin'
           |       ELSE 'other' END AS lang_id
           |FROM stats ORDER BY doc_id""".stripMargin,

      "q51_lang_breakdown" ->
        s"""WITH base AS (SELECT text, $toks AS t FROM documents),
           |stats AS (SELECT text, len(t) AS n_tokens,
           |  len(list_filter(t, x -> x IN ('the','a','of','to','and','in','is'))) AS n_stopwords
           |  FROM base)
           |SELECT CASE WHEN n_tokens = 0 THEN 'und'
           |       WHEN CAST(n_stopwords AS DOUBLE) / n_tokens > 0.05 THEN 'en'
           |       WHEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           |            / greatest(length(text), 1) > 0.7 THEN 'latin'
           |       ELSE 'other' END AS lang_id, COUNT(*) AS n
           |FROM stats GROUP BY lang_id ORDER BY lang_id""".stripMargin,

      "q52_ngram_topk" ->
        s"""WITH tok AS (SELECT $cleanToks AS t
           |             FROM (SELECT $clean AS c FROM documents)),
           |grams AS (SELECT UNNEST(${shinglesSql("t", 2)}) AS bigram FROM tok)
           |SELECT bigram, COUNT(*) AS n FROM grams GROUP BY bigram
           |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

      "q53_tfidf" ->
        s"""WITH terms AS (SELECT id, UNNEST($cleanToks) AS term
           |  FROM (SELECT doc_id AS id, $clean AS c FROM documents)),
           |tf AS (SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
           |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
           |n AS (SELECT COUNT(*) AS n_docs FROM documents),
           |scored AS (SELECT id, term, tf, df,
           |  floor((tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1))) * 10000) / 10000 AS tfidf
           |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
           |ranked AS (SELECT id, term, tf, df, tfidf,
           |  row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS rk
           |  FROM scored)
           |SELECT id AS doc_id, term, tf, df, tfidf, CAST(rk AS INTEGER) AS rk
           |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

      "q60_tumbling_counts" ->
        s"""SELECT (${epochSql("ts")} // 3600) * 3600 AS window_start, event_type,
           | COUNT(*) AS n, ${dsumS("value")} AS total_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q61_sliding_counts" ->
        s"""WITH es AS (SELECT event_type, ${epochSql("ts")} AS es FROM events),
           |win AS (SELECT event_type,
           |  ((es - CAST(i.i AS BIGINT) * 3600) // 3600) * 3600 AS window_start
           |  FROM es CROSS JOIN range(0, 2) AS i(i))
           |SELECT window_start, event_type, COUNT(*) AS n
           |FROM win WHERE window_start >= 0
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q62_sessionize" ->
        s"""WITH es AS (SELECT user_id, event_id, ${epochSql("ts")} AS es FROM events),
           |flagged AS (SELECT user_id, event_id, es,
           |  CASE WHEN es - lag(es, 1) OVER w > 1800 THEN 1
           |       WHEN lag(es, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
           |  FROM es WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
           |sessions AS (SELECT user_id, event_id, es,
           |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           |  FROM flagged)
           |SELECT user_id, session_id, MIN(es) AS session_start,
           |  MAX(es) AS session_end, COUNT(*) AS n_events
           |FROM sessions GROUP BY user_id, session_id
           |ORDER BY user_id, session_id""".stripMargin,

      "q63_asof_join" ->
        s"""WITH l AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |                  1 AS is_left, CAST(NULL AS BIGINT) AS r_id
           |           FROM events WHERE event_type = 'purchase'),
           |r AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             0 AS is_left, event_id AS r_id
           |      FROM events WHERE event_type = 'click'),
           |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
           |m AS (SELECT *,
           |  last_value(r_id IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY es, is_left, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_event_id
           |  FROM u)
           |SELECT user_id, event_id, es, matched_event_id FROM m
           |WHERE is_left = 1 ORDER BY user_id, event_id""".stripMargin,

      "q79_asof_tolerance" ->
        s"""WITH l AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |                  1 AS is_left
           |           FROM events WHERE event_type = 'purchase'),
           |r AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             0 AS is_left
           |      FROM events WHERE event_type = 'click'),
           |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
           |m AS (SELECT *,
           |  last_value(CASE WHEN is_left = 0
           |                  THEN struct_pack(r_es := es, r_id := event_id)
           |             END IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY es, is_left, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mm
           |  FROM u)
           |SELECT user_id, event_id, es,
           |  CASE WHEN es - mm.r_es <= 900 THEN mm.r_id END AS matched_event_id
           |FROM m WHERE is_left = 1 ORDER BY user_id, event_id""".stripMargin,

      "q64_json_extract" ->
        """SELECT event_id,
          | CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin,

      "q65_grouping_sets" ->
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           | ${dsumS("l_extendedprice")} AS total
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag ASC NULLS FIRST,
           | l_linestatus ASC NULLS FIRST""".stripMargin,

      "q66_moving_stats" ->
        s"""WITH ev AS (SELECT user_id, event_id, ${epochSql("ts")} AS es, value
           |            FROM events)
           |SELECT user_id, event_id, es, value,
           |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev_value,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
           |    ORDER BY es, event_id
           |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv_sum,
           |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY es, event_id) AS INTEGER) AS rn
           |FROM ev ORDER BY user_id, rn""".stripMargin,

      "q67_session_window" ->
        s"""WITH es AS (SELECT user_id, event_id, ${epochSql("ts")} AS es FROM events),
           |flagged AS (SELECT user_id, event_id, es,
           |  CASE WHEN es - lag(es, 1) OVER w > 1800 THEN 1
           |       WHEN lag(es, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
           |  FROM es WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
           |sessions AS (SELECT user_id, es,
           |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           |  FROM flagged)
           |SELECT user_id, MIN(es) AS session_start, MAX(es) + 1800 AS session_end,
           |  COUNT(*) AS n_events
           |FROM sessions GROUP BY user_id, session_id
           |ORDER BY user_id, session_start""".stripMargin,

      "q73_rank_family" ->
        s"""SELECT o_orderstatus, o_orderkey, o_totalprice,
           |  CAST(dense_rank() OVER w AS INTEGER) AS drk,
           |  ${Num.floorAtSql("percent_rank() OVER w", 6)} AS prk,
           |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           |  ${Num.floorAtSql("cume_dist() OVER w", 6)} AS cd,
           |  CAST(row_number() OVER w AS INTEGER) AS rn
           |FROM orders WHERE o_orderkey % 10 = 0
           |WINDOW w AS (PARTITION BY o_orderstatus
           |             ORDER BY o_totalprice DESC, o_orderkey ASC)
           |ORDER BY o_orderstatus, rn""".stripMargin,

      "q74_hash_split" ->
        s"""SELECT CASE WHEN ${md5Hex4Sql("CAST(doc_id AS VARCHAR)")} % 10 < 8
           |            THEN 'train' ELSE 'eval' END AS split,
           |       lang, COUNT(*) AS n
           |FROM documents GROUP BY split, lang ORDER BY split, lang""".stripMargin,

      "q75_token_histogram" ->
        s"""WITH tok AS (SELECT ${toksSql("text")} AS t FROM documents)
           |SELECT CAST(floor(len(t) / 10) * 10 AS INTEGER) AS bucket,
           |       COUNT(*) AS n
           |FROM tok GROUP BY bucket ORDER BY bucket""".stripMargin,

      "q76_det_sample" ->
        """SELECT doc_id, lang, source FROM (
          |  SELECT doc_id, lang, source FROM documents
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC LIMIT 100)
          |ORDER BY doc_id""".stripMargin,

      "q77_profile" ->
        s"""SELECT COUNT(*) AS n_rows,
           | CAST(SUM(CAST(o_custkey IS NULL AS BIGINT)) AS BIGINT) AS null_custkey,
           | COUNT(DISTINCT o_orderstatus) AS n_statuses,
           | MIN(o_totalprice) AS min_price,
           | MAX(o_totalprice) AS max_price,
           | ${dsumS("o_totalprice")} AS sum_price
           |FROM orders""".stripMargin,

      "q78_prep_pipeline" ->
        s"""WITH toks0 AS (SELECT doc_id, text, n_chars, ${toksSql("text")} AS t
           |               FROM documents),
           |quality AS (SELECT doc_id, text, n_chars, t FROM toks0 WHERE
           |  floor((least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
           |    * (CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
           |       / CAST(greatest(length(text), 1) AS DOUBLE))
           |    * (1.0 - least(CAST(len(list_filter(t, x -> x IN ('the','a','of','to','and','in','is'))) AS DOUBLE)
           |             / greatest(CAST(len(t) AS DOUBLE), 1.0), 1.0))) * 10000) / 10000 >= 0.1),
           |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM (
           |  SELECT doc_id, UNNEST(${shinglesSql("t", 2)}) AS bg
           |  FROM quality) GROUP BY doc_id, bg),
           |repbad AS (SELECT doc_id FROM bgc GROUP BY doc_id
           |  HAVING floor(CAST(MAX(c) AS DOUBLE) / SUM(c) * 10000) / 10000 > 0.2),
           |qg AS (SELECT doc_id,
           |    UNNEST(list_concat(t, ${shinglesSql("t", 2)})) AS g
           |  FROM (SELECT doc_id, ${toksSql("c2")} AS t
           |        FROM (SELECT doc_id, ${cleanSql("text")} AS c2
           |              FROM documents))),
           |qwt AS (SELECT doc_id,
           |    CAST((${Curate.QualityWeights.mkString("[", ", ", "]")})[
           |      CAST(${md5HexNSql("g", 8)} % ${Curate.QualityBuckets}
           |        AS INTEGER) + 1] AS DECIMAL(18,6)) AS wt
           |  FROM qg),
           |qlow AS (SELECT doc_id FROM qwt GROUP BY doc_id
           |  HAVING ${Num.floorAtSql(
                s"1.0 / (1.0 + exp(-((${Curate.QualityBias}) " +
                  "+ CAST(SUM(wt) AS DOUBLE) / COUNT(*))))", 6)} < 0.484),
           |gated AS (SELECT doc_id, text, n_chars FROM quality
           |  WHERE doc_id NOT IN (SELECT doc_id FROM repbad)
           |    AND doc_id NOT IN (SELECT doc_id FROM qlow)),
           |fp AS (SELECT doc_id, text, n_chars, md5(${cleanSql("text")}) AS fp
           |       FROM gated),
           |exact AS (SELECT doc_id, text, n_chars FROM (
           |  SELECT doc_id, text, n_chars,
           |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           |  FROM fp) WHERE rn = 1),
           |sh AS (SELECT doc_id, ${shinglesSql("t")} AS shs FROM
           |  (SELECT doc_id, $cleanToks AS t FROM
           |    (SELECT doc_id, ${cleanSql("text")} AS c FROM exact))),
           |sig AS (SELECT doc_id,
           |  list_transform(range(0, 8), s ->
           |    COALESCE(list_min(list_transform(shs, x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')) AS sig
           |  FROM sh WHERE len(shs) > 0),
           |banded AS (
           |  SELECT doc_id, sig, CAST(b.i AS INTEGER) AS band,
           |         md5(sig[CAST(b.i*2+1 AS INTEGER)] || '|' || sig[CAST(b.i*2+2 AS INTEGER)]) AS bkey
           |  FROM sig CROSS JOIN range(0, 4) AS b(i)),
           |losers AS (SELECT DISTINCT b.doc_id AS doc_id
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |  WHERE CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 8 >= 0.5),
           |final AS (SELECT doc_id, n_chars FROM exact
           |          WHERE doc_id NOT IN (SELECT doc_id FROM losers))
           |SELECT CASE WHEN ${md5Hex4Sql("CAST(doc_id AS VARCHAR)")} % 10 < 8
           |            THEN 'train' ELSE 'eval' END AS split,
           |       COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
           |FROM final GROUP BY split ORDER BY split""".stripMargin,

      // replay of the PPM fixture rule: byte j of a (4+id%5)x(3+id%4)
      // image is (id+j)%256; header "P6\n<w> <h>\n255\n" is always 11
      // bytes (w,h single-digit). Channel means = exact integer sums /
      // n_pixels — one IEEE division, bit-equal across engines.
      "q70_media_features" ->
        """WITH m AS (SELECT doc_id, source,
          |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
          |    CAST(3 + doc_id % 4 AS INTEGER) AS h
          |  FROM documents)
          |SELECT doc_id AS media_id, source AS kind,
          |  CAST(11 + 3 * w * h AS BIGINT) AS n_bytes,
          |  w AS width, h AS height,
          |  CAST(w * h AS BIGINT) AS n_pixels,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p) % 256)) AS DOUBLE) / (w*h) AS mean_r,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p + 1) % 256)) AS DOUBLE) / (w*h) AS mean_g,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p + 2) % 256)) AS DOUBLE) / (w*h) AS mean_b
          |FROM m ORDER BY media_id""".stripMargin,

      // payload is UTF-8 text and the corpus is pure ASCII, so byte
      // slicing == character slicing and the frame md5s reproduce in SQL
      "q71_media_frames" ->
        """WITH f AS (SELECT doc_id AS media_id,
          |  CAST(UNNEST(list_filter(range(0, (strlen(text) + 255) // 256),
          |    i -> i % 2 = 0)) AS INTEGER) AS frame_idx, text
          |  FROM documents WHERE strlen(text) > 0)
          |SELECT media_id, frame_idx,
          |  CAST(strlen(substring(text, frame_idx * 256 + 1, 256)) AS BIGINT) AS n_bytes,
          |  md5(substring(text, frame_idx * 256 + 1, 256)) AS fingerprint
          |FROM f ORDER BY media_id, frame_idx""".stripMargin,

      "q72_media_resize" ->
        """SELECT doc_id AS media_id, source AS kind,
          | CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
          | md5(substring(repeat(text, CAST(64 // strlen(text) + 1 AS INTEGER)), 1, 64)) AS payload_md5
          |FROM documents WHERE strlen(text) > 0 ORDER BY media_id""".stripMargin,

      // t IS NOT NULL mirrors Spark's posexplode-of-null => zero rows
      // (DuckDB least(NULL, 3) is 3, which would fabricate 3 null-token
      // rows for a null-text document)
      "q80_posexplode_tokens" ->
        s"""WITH toks AS (SELECT doc_id, ${toksSql("text")} AS t
           |              FROM documents),
           |p AS (SELECT doc_id, t,
           |        unnest(range(0, least(len(t), 3))) AS pos FROM toks
           |      WHERE t IS NOT NULL)
           |SELECT doc_id, pos, t[pos + 1] AS tok FROM p
           |ORDER BY doc_id, pos""".stripMargin,

      "q81_exists_subquery" ->
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderstatus = 'F')
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin,

      "q82_scalar_subquery" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > 0.5 * (SELECT MAX(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin,

      "q83_range_frame" ->
        s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             value FROM events)
           |SELECT user_id, event_id, es,
           | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mv_sum,
           | COUNT(*) OVER w AS n_frame
           |FROM e
           |WINDOW w AS (PARTITION BY user_id ORDER BY es
           |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
           |ORDER BY user_id, event_id""".stripMargin,

      "q84_lead_lag_gaps" ->
        s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             event_type FROM events)
           |SELECT user_id, event_id, es, event_type,
           | es - lag(es) OVER w AS gap_s,
           | lag(event_type) OVER w AS prev_type
           |FROM e
           |WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
           |ORDER BY user_id, event_id""".stripMargin,

      "q85_first_last" ->
        s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             event_type FROM events),
           |f AS (SELECT user_id,
           |  first_value(event_type) OVER w AS first_type,
           |  last_value(event_type) OVER (PARTITION BY user_id
           |    ORDER BY es, event_id ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND UNBOUNDED FOLLOWING) AS last_type,
           |  COUNT(*) OVER (PARTITION BY user_id) AS n_events,
           |  row_number() OVER w AS rn
           | FROM e
           | WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
           |SELECT user_id, first_type, last_type, n_events FROM f
           |WHERE rn = 1 ORDER BY user_id""".stripMargin,

      "q86_union_by_name" ->
        """SELECT * FROM (
          |  SELECT o_orderkey, o_totalprice, 'fin' AS src FROM orders
          |  WHERE o_orderstatus = 'F'
          |  UNION ALL BY NAME
          |  SELECT o_orderkey, 'open' AS src FROM orders
          |  WHERE o_orderstatus = 'O')
          |ORDER BY o_orderkey, src""".stripMargin,

      // backslash/quote escapes mirror Spark's to_json for the common
      // cases (full JSON escaping also covers control chars — the
      // contract documented on Agg.mapCounts excludes those from keys)
      "q87_map_counts" ->
        """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
          |           FROM events GROUP BY 1, 2)
          |SELECT user_id,
          | '{' || string_agg(
          |   '"' || replace(replace(event_type, '\', '\\'), '"', '\"')
          |     || '":' || n, ',' ORDER BY event_type) || '}' AS counts_json
          |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

      "q88_scd2_intervals" ->
        s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             event_type FROM events),
           |m AS (SELECT user_id, event_id, es, event_type,
           |  CASE WHEN lag(event_type) OVER w IS NULL
           |         OR lag(event_type) OVER w <> event_type
           |       THEN 1 ELSE 0 END AS new_run
           | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
           |r AS (SELECT user_id, es, event_type,
           |  CAST(SUM(new_run) OVER (PARTITION BY user_id
           |    ORDER BY es, event_id ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND CURRENT ROW) AS BIGINT) AS run_id FROM m),
           |g AS (SELECT user_id, run_id, min(event_type) AS event_type,
           |        min(es) AS valid_from, COUNT(*) AS n_events
           |      FROM r GROUP BY 1, 2)
           |SELECT user_id, run_id, event_type, valid_from,
           | lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
           |   AS valid_to,
           | n_events
           |FROM g ORDER BY user_id, run_id""".stripMargin,

      "q89_integrity_orphans" ->
        """SELECT
          | (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
          |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
          |   AS orphan_orders,
          | (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          |   (SELECT 1 FROM orders o2 WHERE o2.o_orderkey = l.l_orderkey))
          |   AS orphan_lineitems""".stripMargin,

      // q90_approx_profile: intentionally no oracle — approx sketches are
      // estimator-specific; the driver records a rows-only check and
      // SketchSpec pins the estimates against exact counts.

      "q91_stratified_sample" ->
        """SELECT doc_id, lang, source FROM (
          |  SELECT doc_id, lang, source,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          |  FROM documents)
          |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

      "q92_dup_clusters" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |sh AS (SELECT id, ${shinglesSql("t")} AS shs
           |       FROM (SELECT id, $cleanToks AS t FROM cleaned)),
           |sig AS (SELECT id,
           |  list_transform(range(0, 8), s ->
           |    COALESCE(list_min(list_transform(shs, x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')) AS sig
           |  FROM sh WHERE len(shs) > 0),
           |banded AS (
           |  SELECT id, sig, CAST(b.i AS INTEGER) AS band,
           |         md5(sig[CAST(b.i*2+1 AS INTEGER)] || '|' || sig[CAST(b.i*2+2 AS INTEGER)]) AS bkey
           |  FROM sig CROSS JOIN range(0, 4) AS b(i)),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
           |  WHERE a.id < b.id
           |    AND CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 8 >= 0.5),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
           |l0 AS (SELECT src AS id, least(src, MIN(dst)) AS lbl
           |       FROM edges GROUP BY src),
           |n1 AS (SELECT e.src AS id, MIN(l.lbl) AS nlbl
           |       FROM edges e JOIN l0 l ON l.id = e.dst GROUP BY e.src)
           |SELECT l0.id AS doc_id, least(l0.lbl, n1.nlbl) AS cluster_id
           |FROM l0 JOIN n1 ON n1.id = l0.id
           |ORDER BY doc_id""".stripMargin,

      "q93_bm25" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |terms AS (SELECT id, UNNEST($cleanToks) AS term FROM cleaned),
           |tf AS (SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
           |dl AS (SELECT id, COUNT(*) AS dl FROM terms GROUP BY 1),
           |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
           |stats AS (SELECT (SELECT COUNT(*) FROM terms) AS n_terms,
           |                 (SELECT COUNT(*) FROM documents) AS n_docs),
           |scored AS (SELECT id, term, tf, df, dl,
           |  floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |    * (tf * 2.5)
           |    / (tf + 1.5 * (0.25 + 0.75 * dl / (CAST(n_terms AS DOUBLE) / n_docs)))) * 10000) / 10000 AS score
           |  FROM tf JOIN dl USING (id) JOIN dfreq USING (term)
           |  CROSS JOIN stats),
           |ranked AS (SELECT id, term, tf, df, dl, score,
           |  row_number() OVER (PARTITION BY id ORDER BY score DESC, term ASC) AS rk
           |  FROM scored)
           |SELECT id AS doc_id, term, tf, df, dl, score,
           |  CAST(rk AS INTEGER) AS rk
           |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

      "q94_gap_fill" ->
        s"""WITH b AS (SELECT user_id,
           |    (${epochSql("ts")} // 3600) * 3600 AS bucket,
           |    COUNT(*) AS n, ${dsumS("value")} AS total
           |  FROM events GROUP BY 1, 2),
           |frame AS (SELECT user_id,
           |    UNNEST(generate_series(MIN(bucket), MAX(bucket), 3600))
           |      AS bucket
           |  FROM b GROUP BY user_id),
           |j AS (SELECT f.user_id, f.bucket, COALESCE(b.n, 0) AS n, b.total
           |      FROM frame f LEFT JOIN b
           |        ON b.user_id = f.user_id AND b.bucket = f.bucket)
           |SELECT user_id, bucket, n,
           |  last_value(total IGNORE NULLS) OVER (PARTITION BY user_id
           |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND CURRENT ROW) AS ffill_total
           |FROM j ORDER BY user_id, bucket""".stripMargin,

      "q95_share_of_total" ->
        """WITH c AS (SELECT source, lang, COUNT(*) AS n
          |           FROM documents GROUP BY 1, 2)
          |SELECT source, lang, n,
          |  floor((n / CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT))
          |    * 1000000) / 1000000 AS share,
          |  CAST(row_number() OVER (PARTITION BY source
          |    ORDER BY n DESC, lang ASC) AS INTEGER) AS rk
          |FROM c ORDER BY source, rk""".stripMargin,

      "q96_extract_all" ->
        """SELECT doc_id,
          | CAST(len(regexp_extract_all(text, '[a-z]+er\b')) AS INTEGER)
          |   AS n_matches,
          | COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+er\b'),
          |   ','), '') AS matches
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q97_fuzzy_pairs" ->
        """WITH k AS (SELECT DISTINCT p_name AS name FROM part),
          |b AS (SELECT name, string_split(name, ' ')[1] AS blk FROM k)
          |SELECT a.name AS id_a, b.name AS id_b,
          |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
          |FROM b a JOIN b b ON a.blk = b.blk AND a.name < b.name
          |WHERE levenshtein(a.name, b.name) <= 3
          |ORDER BY id_a, id_b""".stripMargin,

      "q98_exact_variance" ->
        """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
          |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
          |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx
          | FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          | floor((CAST(sx AS DOUBLE) / n) * 1000000) / 1000000 AS mean,
          | floor(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) * 10000) / 10000 AS var_samp,
          | floor(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) * 10000) / 10000 AS stddev
          |FROM g ORDER BY l_returnflag""".stripMargin,

      "q99_exact_corr" ->
        """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
          |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
          |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
          |  SUM(CAST(l_quantity AS DECIMAL(18,2))
          |    * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
          |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
          |  SUM(CAST(l_quantity AS DECIMAL(18,2))
          |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
          | FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          | floor(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |   / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1000000) / 1000000 AS corr
          |FROM g ORDER BY l_returnflag""".stripMargin,

      "q100_date_buckets" ->
        s"""SELECT ${epochSql("date_trunc('month', o_orderdate)")}
           |   AS month_start,
           | CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           | COUNT(*) AS n, ${dsumS("o_totalprice")} AS total
           |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q101_snapshot_diff" -> {
        val cents = (p: String) =>
          s"CAST(CAST(CAST($p AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)"
        s"""WITH oldsnap AS (SELECT o_orderkey AS k,
           |    md5(o_orderstatus || '|' || ${cents("o_totalprice")}) AS fo
           |  FROM orders WHERE o_orderkey % 11 <> 0),
           |newsnap AS (SELECT o_orderkey AS k,
           |    md5(o_orderstatus || '|' || ${cents(
              "CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 " +
                "ELSE o_totalprice END")}) AS fn
           |  FROM orders WHERE o_orderkey % 13 <> 0),
           |j AS (SELECT fo, fn FROM oldsnap FULL OUTER JOIN newsnap
           |      ON oldsnap.k = newsnap.k)
           |SELECT CASE WHEN fo IS NULL THEN 'added'
           |            WHEN fn IS NULL THEN 'deleted'
           |            WHEN fo <> fn THEN 'changed'
           |            ELSE 'unchanged' END AS status, COUNT(*) AS n
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
      },

      // bound to the SAME string as q40: the Aggregator plan is
      // result-identical to the window plan by construction
      "q102_topk_agg" -> topkCosineSql,

      "q103_weighted_sample" ->
        s"""SELECT doc_id, lang, n_chars FROM (
           |  SELECT doc_id, lang, n_chars,
           |    floor((ln((${md5HexNSql("CAST(doc_id AS VARCHAR)", 12)} + 1)
           |      / 281474976710656.0) / n_chars) * 100000000) / 100000000
           |      AS sample_key
           |  FROM documents
           |  ORDER BY sample_key DESC, doc_id ASC LIMIT 100)
           |ORDER BY doc_id""".stripMargin,

      "q104_funnel" ->
        s"""WITH e AS (SELECT user_id, event_type, ${epochSql("ts")} AS es
           |           FROM events),
           |s AS (SELECT user_id, MIN(es) AS s_es FROM e
           |      WHERE event_type = 'signup' GROUP BY 1),
           |p AS (SELECT user_id, es FROM e WHERE event_type = 'purchase'),
           |j AS (SELECT s.user_id, s.s_es,
           |        MIN(CASE WHEN p.es >= s.s_es THEN p.es END) AS p_es
           |      FROM s LEFT JOIN p ON p.user_id = s.user_id
           |      GROUP BY 1, 2)
           |SELECT COUNT(*) AS n_start,
           | CAST(SUM(COALESCE(CAST(p_es - s_es <= 86400 AS BIGINT), 0))
           |   AS BIGINT) AS n_converted,
           | floor((10000.0 * SUM(COALESCE(CAST(p_es - s_es <= 86400 AS BIGINT), 0)))
           |   / COUNT(*)) / 100 AS pct_converted
           |FROM j""".stripMargin,

      "q105_transitions" ->
        s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es,
           |             event_type FROM events),
           |l AS (SELECT event_type,
           |        lag(event_type) OVER (PARTITION BY user_id
           |          ORDER BY es, event_id) AS prev_type
           |      FROM e)
           |SELECT prev_type, event_type, COUNT(*) AS n FROM l
           |WHERE prev_type IS NOT NULL
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q106_retention" ->
        s"""WITH w AS (SELECT user_id, ${epochSql("ts")} // 604800 AS week
           |           FROM events),
           |f AS (SELECT user_id, MIN(week) AS cohort_week FROM w
           |      GROUP BY 1),
           |o AS (SELECT DISTINCT w.user_id, f.cohort_week,
           |        w.week - f.cohort_week AS week_offset
           |      FROM w JOIN f ON f.user_id = w.user_id)
           |SELECT cohort_week, week_offset, COUNT(*) AS n_users
           |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q107_embedding_dedup" ->
        """WITH a AS (SELECT label AS cell, vec_id AS id_a, embedding AS va FROM embeddings),
          |b AS (SELECT label AS cell, vec_id AS id_b, embedding AS vb FROM embeddings),
          |scored AS (
          |  SELECT id_a, id_b,
          |    floor((
          |      list_sum(list_transform(range(1, len(va)+1), i -> CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))
          |      / (sqrt(list_sum(list_transform(range(1, len(va)+1), i -> CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE))))
          |       * sqrt(list_sum(list_transform(range(1, len(vb)+1), i -> CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
          |  FROM a JOIN b USING (cell) WHERE id_a < id_b),
          |losers AS (SELECT DISTINCT id_b FROM scored WHERE sim >= 0.2)
          |SELECT label, COUNT(*) AS n_kept FROM embeddings
          |WHERE vec_id NOT IN (SELECT id_b FROM losers)
          |GROUP BY label ORDER BY label""".stripMargin,

      // exact twin of q90: quantile_cont == Spark percentile (both linear
      // interpolation); floor-at-2dp stabilizes the interpolated double
      // (same recipe as q29)
      "q108_exact_profile" ->
        """SELECT event_type,
          | COUNT(DISTINCT user_id) AS n_users,
          | floor(quantile_cont(value, 0.5) * 100) / 100 AS p50_value,
          | COUNT(*) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q109_quality_flags" ->
        s"""WITH base AS (SELECT doc_id, text, $toks AS t FROM documents),
           |rowstats AS (SELECT doc_id,
           |  len(t) AS n_tokens,
           |  floor(CAST(COALESCE(list_sum(list_transform(t, w -> strlen(w))), 0) AS DOUBLE)
           |    / greatest(len(t), 1) * 10000) / 10000 AS mean_word_len,
           |  floor(CAST((strlen(text) - strlen(replace(text, '#', '')))
           |      + (strlen(text) - strlen(replace(text, '...', ''))) // 3 AS DOUBLE)
           |    / greatest(len(t), 1) * 10000) / 10000 AS symbol_ratio
           |  FROM base),
           |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM (
           |  SELECT doc_id, UNNEST(${shinglesSql("t", 2)}) AS bg
           |  FROM base) GROUP BY doc_id, bg),
           |rep AS (SELECT doc_id,
           |  floor(CAST(MAX(c) AS DOUBLE) / SUM(c) * 10000) / 10000 AS top_bigram_frac
           |  FROM bgc GROUP BY doc_id)
           |SELECT r.doc_id, r.n_tokens, r.mean_word_len, r.symbol_ratio,
           |  COALESCE(p.top_bigram_frac, 0.0) AS top_bigram_frac,
           |  (r.n_tokens >= 10 AND r.mean_word_len >= 3.0
           |   AND r.mean_word_len <= 10.0 AND r.symbol_ratio <= 0.1
           |   AND COALESCE(p.top_bigram_frac, 0.0) <= 0.2) AS keep
           |FROM rowstats r LEFT JOIN rep p USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

      "q110_domain_quota" ->
        """WITH d AS (SELECT doc_id,
          |  regexp_extract('https://' || source || '.example.com/doc/'
          |      || CAST(doc_id AS VARCHAR),
          |    '^https?://([^/]+)/', 1) AS domain
          |  FROM documents),
          |counts AS (SELECT domain, COUNT(*) AS n_domain FROM d GROUP BY 1),
          |s AS (SELECT doc_id, domain,
          |  row_number() OVER (PARTITION BY domain
          |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          |  FROM d)
          |SELECT doc_id, domain, n_domain FROM s JOIN counts USING (domain)
          |WHERE rn <= 50 ORDER BY doc_id""".stripMargin,

      "q111_lsh_verified_pairs" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |sh AS (SELECT id, ${shinglesSql("t")} AS shs
           |       FROM (SELECT id, $cleanToks AS t FROM cleaned)),
           |sig AS (SELECT id,
           |  list_transform(range(0, 8), s ->
           |    COALESCE(list_min(list_transform(shs, x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')) AS sig
           |  FROM sh WHERE len(shs) > 0),
           |banded AS (
           |  SELECT id, sig, CAST(b.i AS INTEGER) AS band,
           |         md5(sig[CAST(b.i*2+1 AS INTEGER)] || '|' || sig[CAST(b.i*2+2 AS INTEGER)]) AS bkey
           |  FROM sig CROSS JOIN range(0, 4) AS b(i)),
           |cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
           |  WHERE a.id < b.id),
           |dsh AS (SELECT id, list_distinct(shs) AS shs FROM sh
           |        WHERE len(shs) > 0),
           |scored AS (SELECT id_a, id_b,
           |  len(list_filter(x.shs, e -> list_contains(y.shs, e))) AS c,
           |  len(x.shs) AS na, len(y.shs) AS nb
           |  FROM cands JOIN dsh x ON x.id = cands.id_a
           |             JOIN dsh y ON y.id = cands.id_b)
           |SELECT id_a, id_b,
           |  floor(CAST(c AS DOUBLE) / (na + nb - c) * 10000) / 10000 AS jaccard
           |FROM scored
           |WHERE floor(CAST(c AS DOUBLE) / (na + nb - c) * 10000) / 10000 >= 0.2
           |ORDER BY id_a, id_b""".stripMargin,

      // the JDBC trip is lossless for INT/VARCHAR, so the oracle is the
      // same aggregate straight over the parquet table
      "q112_jdbc_roundtrip" ->
        """SELECT n_regionkey, COUNT(*) AS n,
          | CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

      "q113_sequence_packing" ->
        s"""WITH t AS (SELECT doc_id,
           |  CAST(len($toks) AS BIGINT) AS n_tokens,
           |  CAST(${md5Hex4Sql("CAST(doc_id AS VARCHAR)")} % 32 AS INTEGER) AS shard
           |  FROM documents),
           |o AS (SELECT doc_id, n_tokens, shard,
           |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
           |    ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS start_offset
           |  FROM t)
           |SELECT doc_id, n_tokens, shard, start_offset,
           |  CAST(start_offset // 4096 AS BIGINT) AS pack_id
           |FROM o ORDER BY doc_id""".stripMargin,

      "q114_decontamination" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, (doc_id % 97 = 0) AS ev,
           |                        $clean AS c FROM documents),
           |sh AS (SELECT id, ev, UNNEST(list_distinct(${shinglesSql("t")})) AS sh
           |       FROM (SELECT id, ev, $cleanToks AS t FROM cleaned)),
           |evalsh AS (SELECT DISTINCT sh FROM sh WHERE ev)
           |SELECT id AS doc_id, COUNT(*) AS n_shared
           |FROM sh JOIN evalsh USING (sh) WHERE NOT ev
           |GROUP BY id ORDER BY doc_id""".stripMargin,

      "q115_pii_redact" ->
        """WITH r AS (SELECT doc_id,
          |  text || ' contact user' || CAST(doc_id AS VARCHAR)
          |       || '@example.com or +1-555-0100' AS raw
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          |     + len(regexp_extract_all(raw, '\+?\d[\d-]{7,}\d')) AS INTEGER) AS n_pii,
          |  md5(regexp_replace(
          |        regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |        '\+?\d[\d-]{7,}\d', '<PHONE>', 'g')) AS redacted_md5
          |FROM r ORDER BY doc_id""".stripMargin,

      "q116_incremental_agg" ->
        s"""SELECT event_type, COUNT(*) AS n,
           |  ${dsumS("value")} AS sum_value,
           |  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           |  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q117_mixture_sample" ->
        s"""SELECT doc_id, source, lang FROM documents
           |WHERE ${md5HexNSql("CAST(doc_id AS VARCHAR)", 8)} / 4294967296.0 <
           |  CASE (CAST(substring(source, 4) AS INT) % 3)
           |    WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END
           |ORDER BY doc_id""".stripMargin,

      "q118_vocab_oov" ->
        s"""WITH toks AS (SELECT id AS doc_id, UNNEST($cleanToks) AS term
           |              FROM (SELECT doc_id AS id, $clean AS c FROM documents)),
           |vocab AS (SELECT term FROM (
           |  SELECT term, COUNT(*) AS n FROM toks GROUP BY term
           |  ORDER BY n DESC, term ASC LIMIT 10)),
           |j AS (SELECT t.doc_id, (v.term IS NOT NULL) AS iv
           |      FROM toks t LEFT JOIN vocab v ON t.term = v.term)
           |SELECT doc_id, COUNT(*) AS n_tokens,
           |  CAST(SUM(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           |  CAST(SUM(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q119_dup_ngram_share" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |sh AS (SELECT id, UNNEST(list_distinct(${shinglesSql("t", 5)})) AS sh
           |       FROM (SELECT id, $cleanToks AS t FROM cleaned)),
           |dfq AS (SELECT sh, COUNT(*) AS n_docs FROM sh GROUP BY sh)
           |SELECT id AS doc_id, COUNT(*) AS n_shingles,
           |  CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           |  CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_share
           |FROM sh JOIN dfq USING (sh)
           |GROUP BY id ORDER BY doc_id""".stripMargin,

      "q120_median_rank" ->
        """WITH r AS (SELECT l_returnflag AS k, l_extendedprice AS x,
          |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
          |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          |  FROM lineitem)
          |SELECT k AS l_returnflag, floor(AVG(x) * 100) / 100 AS p50, MAX(n) AS n
          |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          |GROUP BY k ORDER BY l_returnflag""".stripMargin,

      // exact-by-definition oracle: the brute all-pairs form — the engine
      // must produce the SAME pairs through prefix filtering
      "q121_prefix_filter_pairs" ->
        s"""WITH cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |tok AS (SELECT id, $cleanToks AS t FROM cleaned),
           |sh AS (SELECT id, UNNEST(list_distinct(${shinglesSql("t")})) AS sh FROM tok),
           |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
           |common AS (
           |  SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS c
           |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.id < y.id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  ${Num.floorAtSql("CAST(c AS DOUBLE) / (na.n + nb.n - c)", 4)} AS jaccard
           |FROM common
           |JOIN sizes na ON na.id = id_a
           |JOIN sizes nb ON nb.id = id_b
           |WHERE ${Num.floorAtSql("CAST(c AS DOUBLE) / (na.n + nb.n - c)", 4)} >= 0.8
           |ORDER BY id_a, id_b""".stripMargin,

      // the mergeability flag is TRUE by construction (HLL registers are
      // element-wise maxima; union is associative) — the oracle pins it
      // as a literal plus the exact distinct counts
      // the oracle cannot replay datasketches HLL; it checks the exact
      // count and the engine-side >3-sigma accuracy gate (see the
      // engine's contract note: merge == full is NOT an HLL guarantee)
      "q122_incremental_distinct" ->
        """SELECT event_type, TRUE AS merged_within_5pct,
          |  COUNT(DISTINCT user_id) AS n_users
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q123_chunk_windows" ->
        s"""WITH toks AS (SELECT doc_id, $cleanToks AS t
           |              FROM (SELECT doc_id, $clean AS c FROM documents)),
           |b AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
           |idx AS (SELECT doc_id, t, UNNEST(range(0,
           |          CASE WHEN n <= 64 THEN 1
           |               ELSE (n - 64 + 47) // 48 + 1 END)) AS chunk_idx
           |        FROM b),
           |ch AS (SELECT doc_id, chunk_idx,
           |         t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64] AS chunk
           |       FROM idx)
           |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           |  CAST(len(chunk) AS INT) AS n_chunk_tokens,
           |  md5(array_to_string(chunk, ' ')) AS chunk_md5
           |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

      "q124_negative_sample" ->
        """WITH a AS (SELECT vec_id AS q_id, label AS q_label
          |           FROM embeddings WHERE vec_id < 10),
          |c AS (SELECT vec_id AS neg_id, label AS neg_label FROM embeddings),
          |j AS (SELECT q_id, neg_id, neg_label,
          |        row_number() OVER (PARTITION BY q_id
          |          ORDER BY md5(CAST(q_id AS VARCHAR) || ':' ||
          |                       CAST(neg_id AS VARCHAR)) ASC,
          |                   neg_id ASC) AS rk
          |      FROM a JOIN c ON q_label <> neg_label)
          |SELECT q_id, rk, neg_id, neg_label FROM j
          |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

      // replays BOTH Lloyd's iterations: assignment = 9dp-floored cosine
      // argmax (ties -> lowest cell), centroid mean = exact DECIMAL sum /
      // count cast through REAL — bit-identical to the engine's
      // decimal-stable kmeansCells at every step, then the within-cell
      // min-id cosine dedup on the final assignment
      "q125_semdedup" ->
        s"""WITH $kmeansAfCte,
           |n AS (SELECT vec_id, v, cell,
           |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nr FROM af),
           |pairs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |  WHERE floor(list_sum(list_transform(range(1, 65),
           |      i -> a.v[i] * b.v[i])) / (a.nr * b.nr) * 10000) / 10000
           |    >= 0.2),
           |losers AS (SELECT DISTINCT id_b FROM pairs)
           |SELECT CAST(af.cell AS INT) AS cell, COUNT(*) AS n_total,
           |  COUNT(*) - COUNT(l.id_b) AS n_kept,
           |  COUNT(l.id_b) AS n_dropped
           |FROM af LEFT JOIN losers l ON af.vec_id = l.id_b
           |GROUP BY af.cell ORDER BY cell""".stripMargin,

      // q123's chunk fragment at 16/16 (non-overlapping), then keep-first
      // on the segment hash and the per-doc survival rollup
      "q126_segment_dedup" ->
        s"""WITH toks AS (SELECT doc_id, $cleanToks AS t
           |              FROM (SELECT doc_id, $clean AS c FROM documents)),
           |b AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
           |idx AS (SELECT doc_id, t, UNNEST(range(0,
           |          CASE WHEN n <= 16 THEN 1
           |               ELSE (n - 16 + 15) // 16 + 1 END)) AS chunk_idx
           |        FROM b),
           |seg AS (SELECT doc_id, chunk_idx,
           |          md5(array_to_string(
           |            t[chunk_idx * 16 + 1 : chunk_idx * 16 + 16], ' '))
           |            AS chunk_md5
           |        FROM idx),
           |rn AS (SELECT doc_id, chunk_idx,
           |         row_number() OVER (PARTITION BY chunk_md5
           |           ORDER BY doc_id ASC, chunk_idx ASC) AS rn
           |       FROM seg)
           |SELECT doc_id, COUNT(*) AS n_segments,
           |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / COUNT(*) AS kept_share
           |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q127_unigram_logprob" ->
        s"""WITH toks AS (SELECT doc_id, UNNEST($cleanToks) AS term
           |              FROM (SELECT doc_id, $clean AS c FROM documents)),
           |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM toks),
           |tf AS (SELECT doc_id, term,
           |         COUNT(*) OVER (PARTITION BY term) AS tf
           |       FROM toks)
           |SELECT doc_id, COUNT(*) AS n_tokens,
           |  floor(AVG(log2(tf / tot.n_total)) * 1000000) / 1000000
           |    AS mean_log2p
           |FROM tf CROSS JOIN tot
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q111's LSH-then-verify pair CTEs verbatim, then reachability via a
      // recursive CTE: component = min id reachable (exact CC — the
      // fixpoint the engine's label-propagation loop converges to).
      // q130 runs the alternating large-star/small-star algorithm over
      // the SAME pair graph — binding both to ONE oracle string makes
      // divergence between the two CC engines impossible to miss.
      "q128_cc_converged" -> ccOracleSql,

      "q130_cc_bigstar" -> ccOracleSql,

      // incremental fold of a delta batch into standing labels — must
      // equal the from-scratch components exactly (contraction argument
      // in Dedup.componentsIncremental's scaladoc)
      "q140_cc_incremental" -> ccOracleSql,

      // q40's brute-force oracle with the label inequality — hard
      // negatives are exact by definition (no blocking step to trust)
      "q141_hard_negatives" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS ql
          |  FROM embeddings WHERE vec_id < 10),
          |c AS (SELECT vec_id AS c_id, embedding AS cv, label AS cl
          |  FROM embeddings),
          |scored AS (
          |  SELECT q_id, c_id,
          |    floor((
          |      list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
          |      / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
          |       * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))) * 10000) / 10000 AS sim
          |  FROM c CROSS JOIN q WHERE ql <> cl)
          |SELECT q_id, c_id, sim, CAST(rk AS INTEGER) AS rk FROM (
          |  SELECT q_id, c_id, sim,
          |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rk
          |  FROM scored) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

      // same degree-ordered orientation as the engine: an edge (or
      // wedge leg) goes from its (deg, id)-smaller endpoint via DuckDB
      // row-value comparison, so the closing probe is a plain equi-join
      "q142_triangle_census" ->
        s"""WITH $verifiedPairsCte,
           |deg AS (SELECT node, COUNT(*) AS deg FROM (
           |    SELECT id_a AS node FROM pairs
           |    UNION ALL SELECT id_b FROM pairs) GROUP BY 1),
           |dir AS (SELECT
           |    CASE WHEN (da.deg, p.id_a) < (db.deg, p.id_b)
           |         THEN p.id_a ELSE p.id_b END AS src,
           |    CASE WHEN (da.deg, p.id_a) < (db.deg, p.id_b)
           |         THEN p.id_b ELSE p.id_a END AS dst
           |  FROM pairs p JOIN deg da ON da.node = p.id_a
           |               JOIN deg db ON db.node = p.id_b),
           |dird AS (SELECT dir.src, dir.dst, d.deg AS ddst
           |  FROM dir JOIN deg d ON d.node = dir.dst),
           |wedge AS (SELECT x.dst AS src, y.dst AS dst
           |  FROM dird x JOIN dird y ON x.src = y.src
           |    AND (x.ddst, x.dst) < (y.ddst, y.dst)),
           |tri AS (SELECT COUNT(*) AS n_triangles
           |  FROM wedge JOIN dir USING (src, dst)),
           |m AS (SELECT COUNT(*) AS n_edges FROM pairs),
           |w AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
           |    AS n_wedges FROM deg)
           |SELECT n_edges, n_wedges, n_triangles,
           |  CASE WHEN n_wedges = 0 THEN 0.0 ELSE
           |    floor(3.0 * n_triangles / n_wedges * 1000000) / 1000000
           |  END AS clustering_coeff
           |FROM m CROSS JOIN w CROSS JOIN tri""".stripMargin,

      // identical IEEE-double expression tree as the engine: one
      // round-half-up divide per element, sequential list_sum folds
      "q143_int8_quant" ->
        s"""WITH v AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
           |  FROM embeddings),
           |m AS (SELECT vec_id, vd, len(vd) AS n_dims,
           |    list_max(list_transform(vd, x -> abs(x))) AS maxabs
           |  FROM v),
           |e AS (SELECT vec_id, vd, n_dims, maxabs,
           |    list_transform(vd, x ->
           |      x - floor(x * 127 / maxabs + 0.5) * (maxabs / 127))
           |      AS errs,
           |    list_transform(vd, x ->
           |      floor(x * 127 / maxabs + 0.5) * (maxabs / 127)) AS recon
           |  FROM m)
           |SELECT vec_id, CAST(n_dims AS INTEGER) AS n_dims,
           |  CASE WHEN maxabs = 0 THEN 0.0
           |    ELSE ${Num.floorAtSql("maxabs / 127", 8)} END AS qscale,
           |  CASE WHEN maxabs = 0 THEN 0.0
           |    ELSE ${Num.floorAtSql(
               "list_max(list_transform(errs, x -> abs(x)))", 8)}
           |  END AS max_abs_err,
           |  CASE WHEN maxabs = 0 THEN 0.0
           |    ELSE ${Num.floorAtSql(
               "list_sum(list_transform(errs, x -> x * x))", 8)}
           |  END AS l2_err,
           |  CASE WHEN maxabs = 0 THEN 1.0
           |    ELSE ${Num.floorAtSql(
               "list_sum(list_transform(range(1, len(vd)+1), i -> vd[i] * recon[i])) / " +
               "(sqrt(list_sum(list_transform(vd, x -> x * x))) * " +
               "sqrt(list_sum(list_transform(recon, x -> x * x))))", 6)}
           |  END AS cos_recon
           |FROM e ORDER BY vec_id""".stripMargin,

      "q144_token_budget" ->
        s"""WITH t AS (SELECT doc_id, source AS grp,
           |    CAST(len($toks) AS BIGINT) AS n_tokens,
           |    md5(CAST(doc_id AS VARCHAR)) AS okey FROM documents),
           |o AS (SELECT doc_id, grp, n_tokens,
           |    CAST(SUM(n_tokens) OVER (PARTITION BY grp
           |      ORDER BY okey ASC, doc_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum_tokens
           |  FROM t)
           |SELECT doc_id, grp, n_tokens, cum_tokens FROM o
           |WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,

      // same five decimal sums as q99; closed forms evaluated in the
      // identical double op order as Agg.exactOls
      "q145_group_ols" -> {
        val (sx, sy) = ("CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)")
        val (sxx, syy) = ("CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)")
        val sxy = "CAST(sxy AS DOUBLE)"
        val cov = s"(n * $sxy - $sx * $sy)"
        val varx = s"(n * $sxx - $sx * $sx)"
        val vary = s"(n * $syy - $sy * $sy)"
        s"""WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
           |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
           |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           |  SUM(CAST(l_quantity AS DECIMAL(18,2))
           |    * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
           |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
           |  SUM(CAST(l_quantity AS DECIMAL(18,2))
           |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
           | FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, n,
           | ${Num.floorAtSql(s"$cov / $varx", 6)} AS slope,
           | ${Num.floorAtSql(s"($sy - ($cov / $varx) * $sx) / n", 4)}
           |   AS intercept,
           | ${Num.floorAtSql(s"($cov / $varx) * ($cov / $vary)", 6)}
           |   AS r2
           |FROM g ORDER BY l_returnflag""".stripMargin
      },

      "q146_source_overlap" ->
        s"""WITH base AS (SELECT source AS src, $cleanToks AS t
           |  FROM (SELECT source, $clean AS c FROM documents)),
           |ssh AS (SELECT DISTINCT src, sh FROM (
           |  SELECT src, UNNEST(list_distinct(${shinglesSql("t", 3)}))
           |    AS sh FROM base)),
           |tot AS (SELECT src, COUNT(*) AS n_sh FROM ssh GROUP BY 1),
           |shared AS (SELECT a.src AS source_a, b.src AS source_b,
           |    COUNT(*) AS n_shared
           |  FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.src < b.src
           |  GROUP BY 1, 2)
           |SELECT source_a, source_b, n_shared,
           |  ${Num.floorAtSql(
             "CAST(n_shared AS DOUBLE) / least(ta.n_sh, tb.n_sh)", 6)}
           |    AS overlap_coeff
           |FROM shared JOIN tot ta ON ta.src = source_a
           |            JOIN tot tb ON tb.src = source_b
           |ORDER BY source_a, source_b""".stripMargin,

      // same exact-decimal moment sums as q98; z floored at 4 dp and
      // the flag tests the floored z, mirroring the engine exactly
      "q147_daily_anomalies" -> {
        val (sn, snn) = ("CAST(sn AS DOUBLE)", "CAST(snn AS DOUBLE)")
        s"""WITH daily AS (SELECT event_type,
           |    CAST(${epochSql("ts")} // 86400 AS BIGINT) AS day,
           |    COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |stats AS (SELECT event_type, COUNT(*) AS n_days,
           |    SUM(CAST(n AS DECIMAL(18,2))) AS sn,
           |    SUM(CAST(n AS DECIMAL(18,2)) * CAST(n AS DECIMAL(18,2)))
           |      AS snn
           |  FROM daily GROUP BY 1),
           |z AS (SELECT d.event_type, d.day, d.n,
           |    ${Num.floorAtSql(
             s"(CAST(n AS DOUBLE) - $sn / n_days) / " +
             s"sqrt(($snn - $sn * $sn / n_days) / (n_days - 1))", 4)} AS z
           |  FROM daily d JOIN stats s ON s.event_type = d.event_type
           |  WHERE n_days > 1 AND $snn - $sn * $sn / n_days > 0)
           |SELECT event_type, day, n, z, abs(z) >= 3.0 AS is_anomaly
           |FROM z ORDER BY event_type, day""".stripMargin
      },

      // hot-key tie-break mirrors the engine's max_by(k, (cnt, k)):
      // ORDER BY cnt DESC, k DESC LIMIT 1. skew uses the RAW mean;
      // needs_salt tests the floored skew — both as in Skew.keyProfile.
      "q148_key_profile" -> {
        val profile = (tbl: String, key: String) =>
          s"""(WITH c AS (SELECT CAST($key AS VARCHAR) AS k,
             |    COUNT(*) AS cnt FROM $tbl GROUP BY 1),
             |p AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |    COUNT(*) AS n_keys, CAST(MAX(cnt) AS BIGINT) AS max_cnt
             |  FROM c),
             |h AS (SELECT k AS hot_key FROM c
             |  ORDER BY cnt DESC, k DESC LIMIT 1)
             |SELECT '$key' AS key_col, n_rows, n_keys, max_cnt, hot_key,
             |  ${Num.floorAtSql("CAST(n_rows AS DOUBLE) / n_keys", 4)}
             |    AS mean_cnt,
             |  ${Num.floorAtSql("CAST(max_cnt AS DOUBLE) / " +
                 "(CAST(n_rows AS DOUBLE) / n_keys)", 4)} AS skew_factor
             |FROM p CROSS JOIN h)"""
        s"""SELECT key_col, n_rows, n_keys, max_cnt, hot_key, mean_cnt,
           |  skew_factor, skew_factor >= 5.0 AS needs_salt
           |FROM (${profile("lineitem", "l_suppkey").stripMargin}
           |  UNION ALL ${profile("documents", "lang").stripMargin})
           |ORDER BY key_col""".stripMargin
      },

      // the oracle is the PLAIN overlap predicate — result identity
      // with the binned equi-join plan is the correctness claim (the
      // q129 pattern: the mitigation must not change the answer)
      "q149_interval_overlap" ->
        """WITH li AS (SELECT l_orderkey, l_linenumber,
          |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
          |      AS BIGINT) AS s,
          |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
          |      AS BIGINT) + 1 + (l_orderkey * 7 + l_linenumber) % 45
          |      AS e
          |  FROM lineitem),
          |mo AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS m
          |  FROM orders),
          |mb AS (SELECT
          |    CAST(CAST(m AS DATE) - DATE '1970-01-01' AS BIGINT) AS bs,
          |    CAST(CAST(m + INTERVAL 1 MONTH AS DATE)
          |      - DATE '1970-01-01' AS BIGINT) AS be
          |  FROM mo),
          |j AS (SELECT DISTINCT li.l_orderkey, li.l_linenumber, mb.bs
          |  FROM mb JOIN li ON li.s < li.e AND mb.bs < mb.be
          |    AND li.s < mb.be AND mb.bs < li.e)
          |SELECT bs AS month_start_day, COUNT(*) AS n_shipments
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

      "q150_tombstone_sweep" -> {
        val per = (tbl: String, id: String) =>
          s"""SELECT '$tbl' AS table_name,
             |  (SELECT COUNT(*) FROM $tbl) AS n_before,
             |  (SELECT COUNT(*) FROM $tbl x WHERE EXISTS
             |    (SELECT 1 FROM tomb WHERE tid = x.$id)) AS n_removed,
             |  (SELECT COUNT(*) FROM $tbl x WHERE NOT EXISTS
             |    (SELECT 1 FROM tomb WHERE tid = x.$id)) AS n_after"""
        s"""WITH tomb AS (SELECT doc_id AS tid FROM documents
           |  WHERE doc_id % 101 = 0)
           |SELECT table_name, n_before, n_removed, n_after FROM (
           |${per("documents", "doc_id").stripMargin}
           |UNION ALL
           |${per("embeddings", "vec_id").stripMargin}
           |UNION ALL
           |${per("events", "user_id").stripMargin})
           |ORDER BY table_name""".stripMargin
      },

      // same integer-count identity as the engine:
      // H = log2(n) - sum(c*log2(c)) / n, floored at 6 dp
      "q151_vocab_entropy" ->
        s"""WITH tf AS (SELECT source, term, COUNT(*) AS c FROM (
           |    SELECT source, UNNEST($toks) AS term FROM documents)
           |  GROUP BY 1, 2),
           |g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |    COUNT(*) AS n_terms,
           |    SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sclgc
           |  FROM tf GROUP BY 1)
           |SELECT source, n_tokens, n_terms,
           |  ${Num.floorAtSql(
             "log2(CAST(n_tokens AS DOUBLE)) - sclgc / n_tokens", 6)}
           |    AS entropy_bits
           |FROM g ORDER BY source""".stripMargin,

      // pow/normalizer evaluated in the same double op order; floor
      // (not CAST) for expected_tokens — DuckDB CAST rounds, Spark
      // truncates, floor agrees
      "q152_mixture_weights" ->
        s"""WITH c AS (SELECT source, CAST(SUM(len($toks)) AS BIGINT)
           |    AS n_tokens
           |  FROM documents GROUP BY 1),
           |z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           |    SUM(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z FROM c)
           |SELECT source, n_tokens,
           |  ${Num.floorAtSql(
             "CAST(n_tokens AS DOUBLE) / total_tokens", 6)} AS share,
           |  ${Num.floorAtSql(
             "pow(CAST(n_tokens AS DOUBLE), 0.5) / z", 6)} AS weight,
           |  CAST(floor(pow(CAST(n_tokens AS DOUBLE), 0.5) / z
           |    * 1000000) AS BIGINT) AS expected_tokens
           |FROM c CROSS JOIN z ORDER BY source""".stripMargin,

      // identical following-window: the next B strictly AFTER this row
      // in (es, event_id) order, then day-grain conversion rates
      "q153_multitouch_funnel" ->
        s"""WITH e AS (SELECT user_id, event_type, event_id,
           |    ${epochSql("ts")} AS es FROM events),
           |n AS (SELECT user_id, event_type, es,
           |    MIN(CASE WHEN event_type = 'purchase' THEN es END)
           |      OVER (PARTITION BY user_id ORDER BY es, event_id
           |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           |      AS next_b
           |  FROM e)
           |SELECT CAST(es // 86400 AS BIGINT) AS day,
           |  COUNT(*) AS n_from,
           |  CAST(SUM(COALESCE(CAST(next_b - es <= 7200 AS BIGINT), 0))
           |    AS BIGINT) AS n_converted,
           |  floor(10000.0 * SUM(COALESCE(CAST(next_b - es <= 7200
           |    AS BIGINT), 0)) / COUNT(*)) / 100 AS pct_converted
           |FROM n WHERE event_type = 'view'
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // q98's decimal moment sums; same double op order; floor (not
      // CAST) closes the sample counts
      "q154_neyman_alloc" -> {
        val (sx, sxx) = ("CAST(sx AS DOUBLE)", "CAST(sxx AS DOUBLE)")
        val sd = s"CASE WHEN n > 1 THEN " +
          s"sqrt(($sxx - $sx * $sx / n) / (n - 1)) ELSE 0.0 END"
        s"""WITH g AS (SELECT event_type AS stratum, COUNT(*) AS n,
           |    SUM(CAST(value AS DECIMAL(18,2))) AS sx,
           |    SUM(CAST(value AS DECIMAL(18,2))
           |      * CAST(value AS DECIMAL(18,2))) AS sxx
           |  FROM events GROUP BY 1),
           |ns AS (SELECT stratum, n, $sd AS sd, n * ($sd) AS nsd
           |  FROM g),
           |z AS (SELECT SUM(nsd) AS z FROM ns)
           |SELECT stratum, n AS n_rows,
           |  ${Num.floorAtSql("sd", 4)} AS stddev,
           |  ${Num.floorAtSql("nsd / z", 6)} AS alloc_weight,
           |  CAST(floor(nsd / z * 10000) AS BIGINT) AS n_sample
           |FROM ns CROSS JOIN z ORDER BY stratum""".stripMargin
      },

      // truth = brute exact Jaccard >= 0.8 over the same shingle space
      // (reusing the verified-pairs chain's dsh frame); lsh = the
      // chain's pairs at the 0.8 floor — both 4dp-floored exactly as
      // the engine floors
      "q155_dedup_eval" ->
        s"""WITH $verifiedPairsCte,
           |tsh AS (SELECT id, UNNEST(shs) AS s FROM dsh),
           |sizes AS (SELECT id, len(shs) AS n FROM dsh),
           |tcommon AS (SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS c
           |  FROM tsh x JOIN tsh y ON x.s = y.s AND x.id < y.id
           |  GROUP BY 1, 2),
           |truth AS (SELECT id_a, id_b FROM tcommon
           |  JOIN sizes na ON na.id = id_a JOIN sizes nb ON nb.id = id_b
           |  WHERE ${Num.floorAtSql(
             "CAST(c AS DOUBLE) / (na.n + nb.n - c)", 4)} >= 0.8),
           |lsh AS (SELECT id_a, id_b FROM pairs WHERE jacc >= 0.8),
           |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
           |nl AS (SELECT COUNT(*) AS n_lsh FROM lsh),
           |nc AS (SELECT COUNT(*) AS n_common
           |  FROM truth JOIN lsh USING (id_a, id_b))
           |SELECT n_truth, n_lsh, n_common,
           |  CASE WHEN n_truth = 0 THEN 1.0 ELSE
           |    floor(CAST(n_common AS DOUBLE) / n_truth * 10000) / 10000
           |  END AS recall,
           |  CASE WHEN n_lsh = 0 THEN 1.0 ELSE
           |    floor(CAST(n_common AS DOUBLE) / n_lsh * 10000) / 10000
           |  END AS precision
           |FROM nt CROSS JOIN nl CROSS JOIN nc""".stripMargin,

      // same integer-midpoint era split, Laplace shares, and double op
      // order as EventsOps.psiDrift; ln is DuckDB's natural log
      "q156_psi_drift" ->
        s"""WITH d AS (SELECT event_type,
           |    CAST(${epochSql("ts")} // 86400 AS BIGINT) AS day
           |  FROM events),
           |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
           |c AS (SELECT event_type,
           |    CAST(SUM(CASE WHEN day <= (d0 + d1) // 2 THEN 1 ELSE 0
           |      END) AS BIGINT) AS ca,
           |    CAST(SUM(CASE WHEN day > (d0 + d1) // 2 THEN 1 ELSE 0
           |      END) AS BIGINT) AS cb
           |  FROM d CROSS JOIN b GROUP BY 1),
           |n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
           |    CAST(SUM(cb) AS BIGINT) AS nb, COUNT(*) AS k FROM c),
           |t AS (SELECT event_type,
           |    CAST(ca + 1 AS DOUBLE) / (na + k) AS share_a,
           |    CAST(cb + 1 AS DOUBLE) / (nb + k) AS share_b,
           |    (CAST(ca + 1 AS DOUBLE) / (na + k)
           |      - CAST(cb + 1 AS DOUBLE) / (nb + k))
           |      * ln((CAST(ca + 1 AS DOUBLE) / (na + k))
           |          / (CAST(cb + 1 AS DOUBLE) / (nb + k))) AS psi_term
           |  FROM c CROSS JOIN n),
           |tot AS (SELECT SUM(psi_term) AS tp FROM t)
           |SELECT event_type,
           |  ${Num.floorAtSql("share_a", 6)} AS share_a,
           |  ${Num.floorAtSql("share_b", 6)} AS share_b,
           |  ${Num.floorAtSql("psi_term", 6)} AS psi_term,
           |  ${Num.floorAtSql("tp", 6)} AS total_psi,
           |  ${Num.floorAtSql("tp", 6)} >= 0.2 AS drifted
           |FROM t CROSS JOIN tot ORDER BY event_type""".stripMargin,

      // the CC chain + the q134 quality chain (reusing the pairs CTE's
      // `cleaned`), survivor = rank 1 by (floored score DESC, doc_id)
      "q157_survivor_quality" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte,
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
           |ranked AS (SELECT c.doc_id, c.component, q.quality_score,
           |    row_number() OVER (PARTITION BY c.component
           |      ORDER BY q.quality_score DESC, c.doc_id ASC) AS rk
           |  FROM comp c JOIN qs q USING (doc_id))
           |SELECT doc_id, component, quality_score,
           |  rk = 1 AS is_survivor
           |FROM ranked ORDER BY doc_id""".stripMargin,

      // same single-order-statistic ranks (floor((n-1)p)+1), min/max
      // recovery of (lo, hi), and 4dp floors as Agg.winsorize
      "q158_winsorize" ->
        s"""WITH r AS (SELECT event_type, value,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM events),
           |b AS (SELECT event_type, MAX(n) AS n, MIN(value) AS lo,
           |    MAX(value) AS hi
           |  FROM r
           |  WHERE rn = floor((n - 1) * 0.05) + 1
           |     OR rn = floor((n - 1) * 0.95) + 1
           |  GROUP BY 1)
           |SELECT e.event_type, MAX(b.n) AS n,
           |  ${Num.floorAtSql("MAX(b.lo)", 4)} AS p_lo,
           |  ${Num.floorAtSql("MAX(b.hi)", 4)} AS p_hi,
           |  CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_clipped_lo,
           |  CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_clipped_hi,
           |  ${Num.floorAtSql(
             "CAST(SUM(CAST(greatest(b.lo, least(b.hi, e.value))" +
               " AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)}
           |    AS mean_winsorized
           |FROM events e JOIN b ON b.event_type = e.event_type
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q159_cluster_sizes" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte,
           |sz AS (SELECT component, COUNT(*) AS sz FROM comp
           |  GROUP BY 1)
           |SELECT CAST(floor(log2(sz)) AS INTEGER) AS log2_size,
           |  COUNT(*) AS n_clusters, CAST(SUM(sz) AS BIGINT) AS n_docs
           |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

      // the q134 quality chain (same CTE names as q157's replay) +
      // q120's two-middle-ranks median + a DECIMAL mean of the floored
      // scores
      "q160_source_quality" ->
        s"""WITH cleaned AS (SELECT doc_id, source, $clean AS c
           |  FROM documents),
           |qtok AS (SELECT doc_id, source, $cleanToks AS t FROM cleaned),
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
           |      AS q
           |  FROM qwt GROUP BY doc_id),
           |sq AS (SELECT s.source, q.q FROM qs q
           |  JOIN (SELECT doc_id, source FROM documents) s
           |    USING (doc_id)),
           |r AS (SELECT source, q,
           |    row_number() OVER (PARTITION BY source ORDER BY q) AS rn,
           |    COUNT(*) OVER (PARTITION BY source) AS n
           |  FROM sq),
           |med AS (SELECT source,
           |    ${Num.floorAtSql("AVG(q)", 6)} AS p50
           |  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
           |  GROUP BY 1)
           |SELECT source, COUNT(*) AS n_docs,
           |  ${Num.floorAtSql(
             "CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)",
             6)} AS mean_quality,
           |  MAX(p50) AS p50
           |FROM sq JOIN med USING (source)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // same three aggregation grains and the vocab-entropy identity;
      // the flag tests the FLOORED rate, as in the engine
      "q161_bot_profile" ->
        s"""WITH e AS (SELECT user_id, event_type, ${epochSql("ts")}
           |    AS es FROM events),
           |bm AS (SELECT user_id, CAST(MAX(c) AS BIGINT)
           |    AS max_per_minute FROM (
           |  SELECT user_id, es // 60 AS m, COUNT(*) AS c FROM e
           |  GROUP BY 1, 2) GROUP BY 1),
           |b AS (SELECT user_id, COUNT(*) AS n_events,
           |    COUNT(DISTINCT es // 86400) AS active_days
           |  FROM e GROUP BY 1),
           |en AS (SELECT user_id,
           |    ${Num.floorAtSql(
             "log2(CAST(nt AS DOUBLE)) - sclgc / nt", 6)}
           |      AS type_entropy
           |  FROM (SELECT user_id, CAST(SUM(c) AS BIGINT) AS nt,
           |      SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
           |        AS sclgc
           |    FROM (SELECT user_id, event_type, COUNT(*) AS c FROM e
           |      GROUP BY 1, 2) GROUP BY 1)),
           |j AS (SELECT b.user_id, n_events, active_days,
           |    CAST(n_events AS DOUBLE) / active_days AS epd,
           |    max_per_minute, type_entropy
           |  FROM b JOIN bm USING (user_id) JOIN en USING (user_id))
           |SELECT user_id, n_events, active_days,
           |  ${Num.floorAtSql("epd", 4)} AS events_per_day,
           |  max_per_minute, type_entropy,
           |  max_per_minute >= 2 AND ${Num.floorAtSql("epd", 4)} >= 2.8
           |    AS is_bot
           |FROM j ORDER BY user_id""".stripMargin,

      // digit via string of the integer part (no log10 edge cases);
      // chi2 terms in the same double op order as the engine
      "q162_benford" ->
        s"""WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
           |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           |    COUNT(*) AS n_obs
           |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c),
           |t AS (SELECT digit, n_obs,
           |    CAST(n_obs AS DOUBLE) / n AS obs_share,
           |    log10(1.0 + 1.0 / digit) AS p,
           |    (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
           |        * log10(1.0 + 1.0 / digit))
           |      * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
           |        * log10(1.0 + 1.0 / digit))
           |      / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit))
           |      AS raw_term
           |  FROM c CROSS JOIN tot),
           |c2 AS (SELECT SUM(raw_term) AS c2 FROM t)
           |SELECT digit, n_obs,
           |  ${Num.floorAtSql("obs_share", 6)} AS obs_share,
           |  ${Num.floorAtSql("p", 6)} AS benford_p,
           |  ${Num.floorAtSql("raw_term", 4)} AS chi2_term,
           |  ${Num.floorAtSql("c2", 4)} AS chi2_total,
           |  ${Num.floorAtSql("c2", 4)} < 15.5073 AS follows_benford
           |FROM t CROSS JOIN c2 ORDER BY digit""".stripMargin,

      "q163_k_anonymity" ->
        """WITH c AS (SELECT source, lang, COUNT(*) AS n_rows
          |  FROM documents GROUP BY 1, 2),
          |km AS (SELECT CAST(MIN(n_rows) AS BIGINT) AS k_min FROM c)
          |SELECT source, lang, n_rows, n_rows < 10 AS below_k, k_min
          |FROM c CROSS JOIN km ORDER BY source, lang""".stripMargin,

      // top-100 by (tf DESC, term), ln/ln OLS closed form in the same
      // double op order as Text.zipfFit
      "q164_zipf_fit" ->
        s"""WITH tf AS (SELECT term, COUNT(*) AS tf FROM (
           |    SELECT UNNEST($toks) AS term FROM documents)
           |  GROUP BY 1 ORDER BY tf DESC, term LIMIT 100),
           |r AS (SELECT tf,
           |    row_number() OVER (ORDER BY tf DESC, term) AS rk
           |  FROM tf),
           |p AS (SELECT ln(CAST(rk AS DOUBLE)) AS x,
           |    ln(CAST(tf AS DOUBLE)) AS y, tf FROM r),
           |g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy,
           |    CAST(MAX(tf) AS BIGINT) AS top_tf FROM p)
           |SELECT n AS n_terms, top_tf,
           |  CASE WHEN CAST(n AS DOUBLE) * syy - sy * sy = 0 THEN 0.0
           |  ELSE ${Num.floorAtSql(
             "-((CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(CAST(n AS DOUBLE) * sxx - sx * sx))", 4)}
           |  END AS zipf_alpha,
           |  CASE WHEN CAST(n AS DOUBLE) * syy - sy * sy = 0 THEN 0.0
           |  ELSE ${Num.floorAtSql(
             "((CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(CAST(n AS DOUBLE) * sxx - sx * sx)) * " +
             "((CAST(n AS DOUBLE) * sxy - sx * sy) / " +
             "(CAST(n AS DOUBLE) * syy - sy * sy))", 4)}
           |  END AS r2
           |FROM g""".stripMargin,

      // GROUP BY the typed key columns — the same format-immune key
      // as the engine
      "q165_key_uniqueness" -> {
        val per = (tbl: String, keys: String) =>
          s"""SELECT '$tbl' AS table_name,
             |  CAST(SUM(c) AS BIGINT) AS n_rows,
             |  COUNT(*) AS n_distinct_keys,
             |  CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_rows,
             |  ${Num.floorAtSql(
               "CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c)", 6)}
             |    AS dup_pct
             |FROM (SELECT COUNT(*) AS c FROM $tbl GROUP BY $keys)"""
        s"""SELECT * FROM (
           |${per("documents", "doc_id").stripMargin}
           |UNION ALL ${per("events", "event_id").stripMargin}
           |UNION ALL ${per("lineitem",
               "l_orderkey, l_linenumber").stripMargin}
           |UNION ALL ${per("orders", "o_orderkey").stripMargin})
           |ORDER BY table_name""".stripMargin
      },

      // min-id survivor rule over the CC chain; docs outside the pair
      // graph never appear in comp, so the left join leaves them kept
      "q166_dedup_impact" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte,
           |losers AS (SELECT doc_id FROM comp WHERE doc_id <> component),
           |d AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT)
           |    AS nt FROM documents)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_removed,
           |  CAST(SUM(nt) AS BIGINT) AS tokens_total,
           |  CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN nt ELSE 0 END)
           |    AS BIGINT) AS tokens_removed,
           |  ${Num.floorAtSql(
             "CAST(SUM(nt) - SUM(CASE WHEN l.doc_id IS NOT NULL " +
             "THEN nt ELSE 0 END) AS DOUBLE) / SUM(nt)", 6)}
           |    AS token_retention
           |FROM d LEFT JOIN losers l USING (doc_id)
           |GROUP BY source ORDER BY source""".stripMargin,

      // the artifact round-trip is lossless, so the oracle is the same
      // pair+CC replay the rest of the family shares, summarized
      "q167_artifact_store" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte,
           |p AS (SELECT COUNT(*) AS n_pairs,
           |  ${Num.floorAtSql(
             "CAST(SUM(CAST(jacc AS DECIMAL(18,4))) AS DOUBLE)" +
               " / COUNT(*)", 4)} AS mean_jaccard FROM pairs),
           |c AS (SELECT component, COUNT(*) AS sz FROM comp
           |  GROUP BY 1),
           |cs AS (SELECT COUNT(*) AS n_components,
           |  CAST(SUM(sz) AS BIGINT) AS n_labeled_docs,
           |  CAST(MAX(sz) AS BIGINT) AS max_cluster FROM c)
           |SELECT p.n_pairs, p.mean_jaccard, cs.n_components,
           |  cs.n_labeled_docs, cs.max_cluster FROM p, cs""".stripMargin,

      // full CT replay: trigram ranks (count desc, trigram asc — the
      // same total order both engines sort), out-of-place distance
      // with the absent-trigram penalty, argmin with alphabetical
      // tie-break; SUMs cast to BIGINT (DuckDB HUGEINT would surface
      // as float through pandas). Chain shared with q173.
      "q170_langid_ct" ->
        s"""WITH $ctPredCte
           |SELECT doc_id, lang, pred_lang, dist FROM ct_pred
           |ORDER BY doc_id""".stripMargin,

      // q152's weight arithmetic verbatim, grouped on q170's PREDICTED
      // language (the shared ct_pred chain)
      "q173_pred_lang_mixture" ->
        s"""WITH $ctPredCte,
           |c AS (SELECT p.pred_lang,
           |    CAST(SUM(len($toks)) AS BIGINT) AS n_tokens
           |  FROM documents JOIN ct_pred p USING (doc_id) GROUP BY 1),
           |z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           |    SUM(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z FROM c)
           |SELECT pred_lang, n_tokens,
           |  ${Num.floorAtSql(
             "CAST(n_tokens AS DOUBLE) / total_tokens", 6)} AS share,
           |  ${Num.floorAtSql(
             "pow(CAST(n_tokens AS DOUBLE), 0.5) / z", 6)} AS weight,
           |  CAST(floor(pow(CAST(n_tokens AS DOUBLE), 0.5) / z
           |    * 1000000) AS BIGINT) AS expected_tokens
           |FROM c CROSS JOIN z ORDER BY pred_lang""".stripMargin,

      // fold = md5 of the COMPONENT (the q74 hash-split rule lifted to
      // the dup-cluster grain); pair+CC replay shared with the q128
      // family
      "q172_leakage_safe_split" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte,
           |g AS (SELECT d.doc_id,
           |    COALESCE(c.component, d.doc_id) AS split_group
           |  FROM documents d LEFT JOIN comp c USING (doc_id))
           |SELECT doc_id, split_group,
           |  CAST(${md5Hex4Sql("CAST(split_group AS VARCHAR)")} % 5
           |    AS INTEGER) AS fold
           |FROM g ORDER BY doc_id""".stripMargin,

      // double rank selection: the q120 middle-rank median, then the
      // same selection over |x - p50| — identical IEEE subtract/abs on
      // identical doubles in both engines
      "q174_mad" ->
        s"""WITH r1 AS (SELECT event_type, value,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM events),
           |m AS (SELECT event_type, AVG(value) AS p50 FROM r1
           |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
           |d AS (SELECT e.event_type, abs(e.value - m.p50) AS dv
           |  FROM events e JOIN m USING (event_type)),
           |r2 AS (SELECT event_type, dv,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY dv) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM d),
           |md AS (SELECT event_type, MAX(n) AS n, AVG(dv) AS mad
           |  FROM r2
           |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1)
           |SELECT m.event_type, md.n,
           |  ${Num.floorAtSql("m.p50", 4)} AS p50,
           |  ${Num.floorAtSql("md.mad", 4)} AS mad
           |FROM m JOIN md USING (event_type)
           |ORDER BY event_type""".stripMargin,

      // the q93 BM25 replay joined to a literal query list; per-doc
      // scores sum the 4dp-floored weights through DECIMAL(18,4) (the
      // q160 floored-score-sum contract) so ranking is order-free
      "q176_bm25_retrieval" ->
        s"""WITH q(query_id, query_text) AS (VALUES
           |    ('kw_cust', 'customer order value'),
           |    ('kw_join', 'join merge hash'),
           |    ('kw_scan', 'spark scan filter'),
           |    ('kw_win', 'window batch sort')),
           |qt AS (SELECT query_id, UNNEST(list_distinct(
           |    ${toksSql(cleanSql("query_text"))})) AS term FROM q),
           |cleaned AS (SELECT doc_id AS id, $clean AS c FROM documents),
           |terms AS (SELECT id, UNNEST($cleanToks) AS term FROM cleaned),
           |tf AS (SELECT id, term, COUNT(*) AS tf FROM terms
           |  GROUP BY 1, 2),
           |dl AS (SELECT id, COUNT(*) AS dl FROM terms GROUP BY 1),
           |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
           |stats AS (SELECT (SELECT COUNT(*) FROM terms) AS n_terms,
           |                 (SELECT COUNT(*) FROM documents) AS n_docs),
           |w AS (SELECT qt.query_id, tf.id,
           |    floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |      * (tf * 2.5)
           |      / (tf + 1.5 * (0.25 + 0.75 * dl
           |        / (CAST(n_terms AS DOUBLE) / n_docs)))) * 10000)
           |      / 10000 AS w
           |  FROM tf JOIN qt USING (term) JOIN dl USING (id)
           |  JOIN dfreq USING (term) CROSS JOIN stats),
           |s AS (SELECT query_id, id, COUNT(*) AS n_matched,
           |    ${Num.floorAtSql(
             "CAST(SUM(CAST(w AS DECIMAL(18,4))) AS DOUBLE)", 4)}
           |      AS score
           |  FROM w GROUP BY 1, 2),
           |r AS (SELECT query_id, id, n_matched, score, row_number()
           |    OVER (PARTITION BY query_id ORDER BY score DESC, id)
           |    AS rk
           |  FROM s)
           |SELECT query_id, id AS doc_id, n_matched, score,
           |  CAST(rk AS INTEGER) AS rk
           |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

      // observed cells + marginals replay; zero-observed cells enter
      // via the closed form n - sum(E_observed); 9dp-floored decimal
      // term sums mirror the engine exactly
      "q180_chi2_independence" ->
        s"""WITH obs AS (SELECT source AS va, lang AS vb, COUNT(*) AS o
           |  FROM documents GROUP BY 1, 2),
           |ra AS (SELECT va, CAST(SUM(o) AS BIGINT) AS ta FROM obs
           |  GROUP BY 1),
           |rb AS (SELECT vb, CAST(SUM(o) AS BIGINT) AS tb FROM obs
           |  GROUP BY 1),
           |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
           |  COUNT(*) AS n_cells FROM obs),
           |ks AS (SELECT (SELECT COUNT(*) FROM ra) AS ka,
           |  (SELECT COUNT(*) FROM rb) AS kb),
           |cells AS (SELECT o, CAST(ta AS DOUBLE) * tb / n AS e
           |  FROM obs JOIN ra USING (va) JOIN rb USING (vb)
           |  CROSS JOIN nn),
           |tm AS (SELECT
           |  CAST(SUM(CAST(${Num.floorAtSql(
             "(o - e) * (o - e) / e", 9)} AS DECIMAL(28,9)))
           |    AS DOUBLE) AS chi2obs,
           |  CAST(SUM(CAST(${Num.floorAtSql("e", 9)}
           |    AS DECIMAL(28,9))) AS DOUBLE) AS esum
           |  FROM cells)
           |SELECT nn.n, nn.n_cells,
           |  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
           |  ${Num.floorAtSql("chi2obs + (nn.n - esum)", 6)}
           |    AS chi2_total
           |FROM nn CROSS JOIN ks CROSS JOIN tm""".stripMargin,

      // shared-term join + exclusive-mass closed form, log2 floored at
      // 9dp per term and summed through decimal (the q151 log2
      // precedent)
      "q181_js_divergence" ->
        s"""WITH cleaned AS (SELECT source AS g, $clean AS c
           |  FROM documents),
           |tc AS (SELECT g, term, COUNT(*) AS cnt FROM (
           |    SELECT g, UNNEST($cleanToks) AS term FROM cleaned)
           |  GROUP BY 1, 2),
           |tot AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM tc
           |  GROUP BY 1),
           |p AS (SELECT g, term, CAST(cnt AS DOUBLE) / n AS p
           |  FROM tc JOIN tot USING (g)),
           |j AS (SELECT x.g AS g_a, y.g AS g_b,
           |    COUNT(*) AS n_shared_terms,
           |    CAST(SUM(CAST(${Num.floorAtSql(
             "x.p/2 * log2(x.p / ((x.p + y.p)/2))" +
               " + y.p/2 * log2(y.p / ((x.p + y.p)/2))", 9)}
           |      AS DECIMAL(28,9))) AS DOUBLE) AS shared,
           |    CAST(SUM(CAST(${Num.floorAtSql("x.p", 9)}
           |      AS DECIMAL(28,9))) AS DOUBLE) AS sp,
           |    CAST(SUM(CAST(${Num.floorAtSql("y.p", 9)}
           |      AS DECIMAL(28,9))) AS DOUBLE) AS sq
           |  FROM p x JOIN p y ON x.term = y.term AND x.g < y.g
           |  GROUP BY 1, 2)
           |SELECT g_a, g_b, n_shared_terms,
           |  ${Num.floorAtSql(
             "shared + (1.0 - sp)/2 + (1.0 - sq)/2", 6)} AS jsd
           |FROM j ORDER BY g_a, g_b""".stripMargin,

      // qualifying set {v : 2*W(<=v) >= W} is tie-order invariant, so
      // both engines pick the identical lower weighted median
      "q184_weighted_median" ->
        """WITH r AS (SELECT l_returnflag AS k, l_extendedprice AS x,
          |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
          |c AS (SELECT k, x,
          |    SUM(w) OVER (PARTITION BY k ORDER BY x
          |      ROWS UNBOUNDED PRECEDING) AS cum,
          |    SUM(w) OVER (PARTITION BY k) AS tw
          |  FROM r)
          |SELECT k AS l_returnflag, CAST(MAX(tw) AS BIGINT)
          |    AS total_weight, MIN(x) AS wmedian
          |FROM c WHERE cum * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin,

      // shares from exact BIGINT token sums; share^2 terms floored at
      // 9dp and decimal-summed (order-free), one floored close
      "q185_source_hhi" ->
        s"""WITH g AS (SELECT source, CAST(SUM(len($toks)) AS BIGINT)
           |    AS m FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS total,
           |    COUNT(*) AS n_groups FROM g),
           |h AS (SELECT CAST(SUM(CAST(${Num.floorAtSql(
             "(CAST(m AS DOUBLE) / total) * (CAST(m AS DOUBLE) / total)",
             9)} AS DECIMAL(28,9))) AS DOUBLE) AS hhiraw
           |  FROM g CROSS JOIN tot)
           |SELECT tot.n_groups, tot.total,
           |  ${Num.floorAtSql("hhiraw", 6)} AS hhi,
           |  ${Num.floorAtSql("1.0 / hhiraw", 4)} AS effective_groups
           |FROM tot CROSS JOIN h""".stripMargin,

      // one scan-local pass per vector: squared norm via the same
      // left-to-right double fold as the engine's aggregate(); norms
      // floored at 6 dp BEFORE the decimal mean (order-free), the
      // mean divided double/count like the engine
      "q186_embedding_audit" ->
        s"""WITH a AS (SELECT label, len(embedding) AS dim,
           |    list_sum(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq,
           |    len(list_filter(embedding,
           |      x -> isnan(x) OR isinf(x))) > 0 AS bad
           |  FROM embeddings)
           |SELECT label, COUNT(*) AS n_vecs,
           |  COUNT(DISTINCT dim) AS n_dims,
           |  CAST(SUM(CASE WHEN NOT bad AND nsq = 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_zero,
           |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nonfinite,
           |  ${Num.floorAtSql(
             "CAST(SUM(CASE WHEN NOT bad THEN CAST(floor(sqrt(nsq) " +
               "* 1000000) / 1000000 AS DECIMAL(28,6)) END) AS DOUBLE) " +
               "/ SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END)", 6)}
           |    AS mean_norm,
           |  MIN(CASE WHEN NOT bad
           |    THEN floor(sqrt(nsq) * 1000000) / 1000000 END) AS min_norm,
           |  MAX(CASE WHEN NOT bad
           |    THEN floor(sqrt(nsq) * 1000000) / 1000000 END) AS max_norm
           |FROM a GROUP BY label ORDER BY label""".stripMargin,

      // (source, term) counts over the CLEANED tokenizer (the engine's
      // cleanTokens), rolled up to vocab/hapax/dis counts; ratios
      // floored after one double division each
      "q187_vocab_growth" ->
        s"""WITH cl AS (SELECT source, $clean AS c FROM documents),
           |tf AS (SELECT source, term, COUNT(*) AS cnt FROM (
           |    SELECT source, UNNEST($cleanToks) AS term FROM cl)
           |  GROUP BY 1, 2),
           |g AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           |    COUNT(*) AS vocab,
           |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS hapax,
           |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS dis_legomena
           |  FROM tf GROUP BY 1),
           |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents
           |  GROUP BY 1)
           |SELECT g.source, nd.n_docs, g.n_tokens, g.vocab, g.hapax,
           |  g.dis_legomena,
           |  ${Num.floorAtSql("CAST(g.vocab AS DOUBLE) / g.n_tokens", 6)}
           |    AS ttr,
           |  ${Num.floorAtSql("CAST(g.hapax AS DOUBLE) / g.vocab", 6)}
           |    AS hapax_share
           |FROM g JOIN nd ON nd.source = g.source
           |ORDER BY g.source""".stripMargin,

      // containment from the SAME scored CTE the verified-pair oracle
      // uses (c, na, nb are the exact distinct-shingle counts), joined
      // back to the >= 0.2 pair list
      "q188_containment_pairs" ->
        s"""WITH $verifiedPairsCte
           |SELECT s.id_a, s.id_b,
           |  ${Num.floorAtSql("CAST(s.c AS DOUBLE) / s.na", 4)}
           |    AS containment_a,
           |  ${Num.floorAtSql("CAST(s.c AS DOUBLE) / s.nb", 4)}
           |    AS containment_b
           |FROM scored s JOIN pairs p
           |  ON p.id_a = s.id_a AND p.id_b = s.id_b
           |ORDER BY s.id_a, s.id_b""".stripMargin,

      // the SAME pair + CC CTE chain as q128/q130, then a capped
      // ranking per component (row_number cast to INTEGER to match
      // Spark's int rank)
      "q189_cluster_cap" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |$ccCte
           |SELECT doc_id, component, CAST(rk AS INTEGER) AS rk FROM (
           |  SELECT doc_id, component,
           |    row_number() OVER (PARTITION BY component
           |      ORDER BY doc_id) AS rk
           |  FROM comp) WHERE rk <= 2 ORDER BY doc_id""".stripMargin,

      // every register replayed exactly (md5-nibble index, hex-string
      // leading-zero rank); the indicator sum is the integer T
      // (2^52-scaled bit shifts); the estimator constant is ONE
      // precomputed double literal shared with the engine
      // (Sketch.HllC), so the only per-row float is the final floored
      // estimate / linear-counting ln
      "q190_hll_distinct" -> {
        val rankCase =
          """CASE WHEN length(st) = 0 THEN 53
            |      ELSE (13 - length(st)) * 4 +
            |        (CASE WHEN substring(st, 1, 1) >= '8' THEN 0
            |              WHEN substring(st, 1, 1) >= '4' THEN 1
            |              WHEN substring(st, 1, 1) >= '2' THEN 2
            |              ELSE 3 END) + 1 END""".stripMargin
        s"""WITH h AS (SELECT event_type,
           |    ${md5HexNSql("CAST(user_id AS VARCHAR)", 2)} AS reg,
           |    regexp_replace(substring(
           |      md5(CAST(user_id AS VARCHAR)), 3, 13), '^0+', '') AS st
           |  FROM events),
           |r AS (SELECT event_type, reg, $rankCase AS rank FROM h),
           |regs AS (SELECT event_type, reg, MAX(rank) AS mx
           |  FROM r GROUP BY 1, 2),
           |agg AS (SELECT event_type, COUNT(*) AS nz,
           |    CAST(SUM(CAST(1 AS BIGINT) << (52 - mx)) AS BIGINT)
           |      AS t_nz
           |  FROM regs GROUP BY 1),
           |est AS (SELECT event_type,
           |    CAST(nz AS BIGINT) AS nz_registers,
           |    CAST(256 - nz AS BIGINT) AS v_zero,
           |    t_nz + (256 - nz) * (CAST(1 AS BIGINT) << 52) AS t
           |  FROM agg),
           |ex AS (SELECT event_type,
           |    COUNT(DISTINCT user_id) AS exact_distinct
           |  FROM events GROUP BY 1)
           |SELECT est.event_type, ex.exact_distinct,
           |  CAST(floor(CASE
           |    WHEN ${Sketch.HllC} / t <= 640.0 AND v_zero > 0
           |    THEN 256.0 * ln(256.0 / v_zero)
           |    ELSE ${Sketch.HllC} / t END) AS BIGINT) AS hll_estimate,
           |  nz_registers, v_zero,
           |  CAST(0 AS BIGINT) AS n_cell_diff
           |FROM est JOIN ex USING (event_type)
           |ORDER BY event_type""".stripMargin
      },

      // the verified pair list joined to its endpoints' sources;
      // least/greatest canonicalize the unordered source pair
      "q191_pair_source_matrix" ->
        s"""WITH RECURSIVE
           |$verifiedPairsCte,
           |src AS (SELECT doc_id AS id, source FROM documents),
           |ps AS (SELECT least(x.source, y.source) AS src_a,
           |    greatest(x.source, y.source) AS src_b
           |  FROM pairs JOIN src x ON x.id = pairs.id_a
           |             JOIN src y ON y.id = pairs.id_b)
           |SELECT src_a, src_b, COUNT(*) AS n_pairs,
           |  (src_a = src_b) AS within_source
           |FROM ps GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

      // counts reduce to the value domain, the ECDF runs over it;
      // D and the critical value floor BEFORE the reject comparison
      "q192_ks_two_sample" -> {
        val crit = Num.floorAtSql(
          "1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b))", 6)
        s"""WITH cnt AS (SELECT n_chars AS v,
           |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
           |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
           |  FROM documents WHERE source IN ('src0', 'src1')
           |  GROUP BY 1),
           |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
           |    CAST(SUM(cb) AS BIGINT) AS n_b FROM cnt),
           |cum AS (SELECT
           |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           |      AS cuma,
           |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           |      AS cumb
           |  FROM cnt),
           |d AS (SELECT MAX(abs(CAST(cuma AS DOUBLE) / n_a
           |      - CAST(cumb AS DOUBLE) / n_b)) AS draw
           |  FROM cum CROSS JOIN tot)
           |SELECT n_a, n_b,
           |  ${Num.floorAtSql("draw", 6)} AS d_stat, $crit AS crit_05,
           |  (${Num.floorAtSql("draw", 6)} > $crit) AS reject_05
           |FROM d CROSS JOIN tot""".stripMargin
      },

      // rank-weighted exact BIGINT sums; ties are order-free because
      // sum(rn*x) over a tied block is x*sum(rn)
      "q193_gini_lengths" ->
        s"""WITH r AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars) AS BIGINT) AS rn
           |  FROM documents)
           |SELECT source, COUNT(*) AS n,
           |  CAST(SUM(x) AS BIGINT) AS total,
           |  CASE WHEN SUM(x) > 0 THEN ${Num.floorAtSql(
             "2.0 * SUM(rn * x) / (COUNT(*) * SUM(x))" +
               " - (COUNT(*) + 1.0) / COUNT(*)", 6)} END AS gini
           |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

      // the sorted-distinct-token key replayed byte-for-byte (tokens
      // are lowercased ASCII, so binary sort order agrees)
      "q194_bow_dedup" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |  FROM (SELECT doc_id, $clean AS c FROM documents)),
           |k AS (SELECT doc_id, md5(array_to_string(
           |    list_sort(list_distinct(t)), ' ')) AS bow_key FROM tok),
           |g AS (SELECT doc_id, bow_key,
           |    row_number() OVER (PARTITION BY bow_key
           |      ORDER BY doc_id) AS rn,
           |    COUNT(*) OVER (PARTITION BY bow_key) AS n_docs
           |  FROM k)
           |SELECT doc_id, bow_key, (rn = 1) AS is_keeper
           |FROM g WHERE n_docs > 1 ORDER BY doc_id""".stripMargin,

      // centroid coordinates: floored 9 dp element terms summed
      // through decimal (order-free), ONE double division; the pair
      // stage re-floors its product terms the same way
      "q195_centroid_cosine" -> {
        def dterm(e: String) =
          s"CAST(${Num.floorAtSql(e, 9)} AS DECIMAL(38,9))"
        s"""WITH el AS (SELECT label AS lab,
           |    UNNEST(range(1, len(embedding) + 1)) AS i,
           |    UNNEST(embedding) AS x
           |  FROM embeddings),
           |c AS (SELECT lab, i, COUNT(*) AS n,
           |    CAST(SUM(CAST(${Num.floorAtSql("CAST(x AS DOUBLE)", 9)}
           |      AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS c
           |  FROM el GROUP BY 1, 2),
           |p AS (SELECT a.lab AS label_a, b.lab AS label_b,
           |    CAST(MAX(a.n) AS BIGINT) AS n_a,
           |    CAST(MAX(b.n) AS BIGINT) AS n_b,
           |    CAST(SUM(${dterm("a.c * b.c")}) AS DOUBLE) AS dot,
           |    CAST(SUM(${dterm("a.c * a.c")}) AS DOUBLE) AS na2,
           |    CAST(SUM(${dterm("b.c * b.c")}) AS DOUBLE) AS nb2
           |  FROM c a JOIN c b ON a.i = b.i AND a.lab < b.lab
           |  GROUP BY 1, 2)
           |SELECT label_a, label_b, n_a, n_b,
           |  ${Num.floorAtSql("dot / (sqrt(na2) * sqrt(nb2))", 6)}
           |    AS cos_sim
           |FROM p ORDER BY label_a, label_b""".stripMargin
      },

      // the |days|-domain cumulative scan; argmax with the earlier-day
      // tie-break, exactly the engine's ORDER BY ... LIMIT 1
      "q196_changepoint" ->
        s"""WITH daily AS (SELECT
           |    CAST(${epochSql("ts")} // 86400 AS BIGINT) AS day,
           |    COUNT(*) AS c,
           |    SUM(CAST(${Num.floorAtSql("value", 6)}
           |      AS DECIMAL(28,6))) AS s
           |  FROM events GROUP BY 1),
           |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
           |    SUM(s) AS s_total, COUNT(*) AS n_days FROM daily),
           |cum AS (SELECT day,
           |    CAST(SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS nl,
           |    SUM(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           |      AS sl,
           |    row_number() OVER (ORDER BY day) AS rd
           |  FROM daily)
           |SELECT day AS split_day, nl AS n_left,
           |  n_total - nl AS n_right,
           |  ${Num.floorAtSql(
             "abs(CAST(sl AS DOUBLE) / nl" +
               " - CAST(s_total - sl AS DOUBLE) / (n_total - nl))" +
               " * sqrt(CAST(nl * (n_total - nl) AS DOUBLE) / n_total)",
             6)} AS shift_stat
           |FROM cum CROSS JOIN tot WHERE rd < n_days
           |ORDER BY shift_stat DESC, split_day LIMIT 1""".stripMargin,

      // positional shingles replayed; islands = constant (pa - rank)
      // per (pair, diagonal); run of r shingles = r + w - 1 tokens
      "q197_common_run" ->
        s"""WITH $verifiedPairsCte,
           |tokd AS (SELECT doc_id AS id, $cleanToks AS t
           |  FROM (SELECT doc_id, $clean AS c FROM documents)),
           |shl AS (SELECT id, ${shinglesSql("t")} AS shs FROM tokd),
           |posed AS (SELECT id,
           |    UNNEST(range(1, len(shs) + 1)) - 1 AS pos,
           |    UNNEST(shs) AS sh
           |  FROM shl),
           |m AS (SELECT p.id_a, p.id_b, a.pos AS pa,
           |    a.pos - b.pos AS d
           |  FROM pairs p
           |  JOIN posed a ON a.id = p.id_a
           |  JOIN posed b ON b.id = p.id_b AND b.sh = a.sh),
           |isl AS (SELECT id_a, id_b, d,
           |    pa - row_number() OVER (PARTITION BY id_a, id_b, d
           |      ORDER BY pa) AS isl
           |  FROM m),
           |runs AS (SELECT id_a, id_b, d, isl, COUNT(*) AS run
           |  FROM isl GROUP BY 1, 2, 3, 4),
           |agg AS (SELECT id_a, id_b,
           |    CAST(SUM(run) AS BIGINT) AS n_pos_matches,
           |    CAST(MAX(run) + 2 AS BIGINT) AS max_run_tokens
           |  FROM runs GROUP BY 1, 2)
           |SELECT p.id_a, p.id_b,
           |  CAST(COALESCE(n_pos_matches, 0) AS BIGINT)
           |    AS n_pos_matches,
           |  CAST(COALESCE(max_run_tokens, 0) AS BIGINT)
           |    AS max_run_tokens
           |FROM pairs p LEFT JOIN agg USING (id_a, id_b)
           |ORDER BY id_a, id_b""".stripMargin,

      // the q178 rank-selected decile edges over doc lengths + the
      // pair-membership probe; bin = edges strictly below the value
      "q198_dup_rate_by_length" ->
        s"""WITH $verifiedPairsCte,
           |dup AS (SELECT DISTINCT id FROM
           |  (SELECT id_a AS id FROM pairs
           |   UNION ALL SELECT id_b FROM pairs)),
           |tot AS (SELECT COUNT(*) AS n FROM documents),
           |vc AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents
           |  GROUP BY 1),
           |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM vc),
           |eq AS (SELECT q, MIN(v) AS edge
           |  FROM cum CROSS JOIN tot
           |  CROSS JOIN (SELECT UNNEST(range(1, 10)) AS q)
           |  WHERE cum >= (n - 1) * q // 10 + 1 GROUP BY q),
           |edges AS (SELECT list_sort(list(edge)) AS es FROM eq),
           |b AS (SELECT
           |    CAST(len(list_filter(es, e -> d.n_chars > e))
           |      AS INTEGER) AS bin,
           |    CASE WHEN dup.id IS NULL THEN 0 ELSE 1 END AS dup
           |  FROM documents d CROSS JOIN edges
           |  LEFT JOIN dup ON dup.id = d.doc_id)
           |SELECT bin, COUNT(*) AS n_docs,
           |  CAST(SUM(dup) AS BIGINT) AS n_dup,
           |  ${Num.floorAtSql("CAST(SUM(dup) AS DOUBLE) / COUNT(*)", 6)}
           |    AS dup_rate
           |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

      // per-doc distinct tokens; idf floored 6 dp into decimal, all
      // sums decimal, ONE double division per pair at the close
      "q199_idf_jaccard" ->
        s"""WITH $verifiedPairsCte,
           |tok AS (SELECT id, UNNEST(list_distinct(t)) AS tok
           |  FROM (SELECT doc_id AS id, $cleanToks AS t
           |    FROM (SELECT doc_id, $clean AS c FROM documents))),
           |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
           |idf AS (SELECT tok, CAST(${Num.floorAtSql(
             "ln(CAST(n_docs + 1 AS DOUBLE) / COUNT(*))", 6)}
           |    AS DECIMAL(28,6)) AS w
           |  FROM tok CROSS JOIN nd GROUP BY tok, n_docs),
           |wt AS (SELECT id, tok.tok AS tok, w
           |  FROM tok JOIN idf USING (tok)),
           |dw AS (SELECT id, SUM(w) AS wtot FROM wt GROUP BY id),
           |inter AS (SELECT p.id_a, p.id_b,
           |    COUNT(*) AS n_shared_tokens, SUM(a.w) AS wi
           |  FROM pairs p
           |  JOIN wt a ON a.id = p.id_a
           |  JOIN wt b ON b.id = p.id_b AND b.tok = a.tok
           |  GROUP BY 1, 2)
           |SELECT i.id_a, i.id_b, n_shared_tokens,
           |  ${Num.floorAtSql(
             "CAST(wi AS DOUBLE) / CAST(x.wtot + y.wtot - wi AS DOUBLE)",
             6)} AS w_jaccard
           |FROM inter i
           |JOIN dw x ON x.id = i.id_a
           |JOIN dw y ON y.id = i.id_b
           |ORDER BY id_a, id_b""".stripMargin,

      // Jelinek-Mercer 0.5/0.5 replay: bigram tf, context counts
      // re-aggregated from the bigram stream, unigram tf on the second
      // token; per-term log2 floored 9 dp, decimal-summed per doc
      // (the CTE chain is shared with the q204 bucket oracle)
      "q200_bigram_logprob" ->
        s"""WITH $bigramScoredCte
           |SELECT doc_id, n_bigrams, mean_log2p
           |FROM bg_scored ORDER BY doc_id""".stripMargin,

      // q200's scores, tercile edges by the q178 rank rule (k = 3),
      // deterministic (score desc, doc_id) ties
      "q204_perplexity_buckets" ->
        s"""WITH $bigramScoredCte,
           |tc AS (SELECT COUNT(*) AS nd FROM bg_scored),
           |rk AS (SELECT doc_id, mean_log2p, n_bigrams,
           |    row_number() OVER (ORDER BY mean_log2p DESC, doc_id)
           |      AS rk
           |  FROM bg_scored),
           |b AS (SELECT mean_log2p, n_bigrams,
           |    CASE WHEN rk > (nd - 1) * 2 // 3 + 1 THEN 2
           |         WHEN rk > (nd - 1) * 1 // 3 + 1 THEN 1
           |         ELSE 0 END AS bucket
           |  FROM rk CROSS JOIN tc)
           |SELECT bucket, COUNT(*) AS n_docs,
           |  ${Num.floorAtSql("MIN(mean_log2p)", 6)} AS min_score,
           |  ${Num.floorAtSql("MAX(mean_log2p)", 6)} AS max_score,
           |  CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams
           |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

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

      // degrees from both endpoint columns, then the histogram
      "q201_dup_degree_profile" ->
        s"""WITH $verifiedPairsCte,
           |deg AS (SELECT id, COUNT(*) AS deg FROM
           |  (SELECT id_a AS id FROM pairs
           |   UNION ALL SELECT id_b FROM pairs) GROUP BY 1)
           |SELECT deg, COUNT(*) AS n_docs, MIN(id) AS min_doc_id
           |FROM deg GROUP BY 1 ORDER BY deg""".stripMargin,

      // rank over the vocabulary frame, (tf desc, term) ties; coverage
      // from exact BIGINT mass sums, one double division per k
      "q202_vocab_coverage" ->
        s"""WITH tf AS (SELECT term, COUNT(*) AS tf
           |  FROM (SELECT UNNEST(t) AS term
           |    FROM (SELECT $cleanToks AS t
           |      FROM (SELECT ${cleanSql("text")} AS c FROM documents)))
           |  GROUP BY 1),
           |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total,
           |    COUNT(*) AS vocab FROM tf),
           |rk AS (SELECT tf, row_number() OVER
           |    (ORDER BY tf DESC, term) AS rk FROM tf),
           |ks AS (SELECT UNNEST([100, 1000, 10000]) AS k)
           |SELECT k, CAST(least(k, vocab) AS BIGINT) AS n_terms,
           |  ${Num.floorAtSql("CAST(SUM(tf) AS DOUBLE) / total", 6)}
           |    AS coverage
           |FROM rk CROSS JOIN ks CROSS JOIN tot
           |WHERE rk <= k GROUP BY k, vocab, total ORDER BY k""".stripMargin,

      // cells + row totals over the shared ct_pred CTE — the same
      // classifier the q170/q173 oracles replay
      "q203_langid_confusion" ->
        s"""WITH $ctPredCte,
           |cells AS (SELECT lang, pred_lang, COUNT(*) AS n
           |  FROM ct_pred GROUP BY 1, 2),
           |rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
           |  FROM cells GROUP BY 1)
           |SELECT c.lang, c.pred_lang, c.n,
           |  ${Num.floorAtSql("CAST(c.n AS DOUBLE) / n_lang", 6)}
           |    AS row_share,
           |  (c.lang = c.pred_lang) AS is_correct
           |FROM cells c JOIN rt USING (lang)
           |ORDER BY lang, pred_lang""".stripMargin,

      // the q174 double-rank chain (deviations from the RAW median,
      // per the engine), then scoring against the FLOORED (p50, mad)
      // — the same values the engine broadcasts; flags test the
      // floored score so the boundary decision is bit-portable
      "q182_robust_anomalies" ->
        s"""WITH r1 AS (SELECT event_type, value,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM events),
           |mraw AS (SELECT event_type, AVG(value) AS p50raw FROM r1
           |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
           |d AS (SELECT e.event_type, abs(e.value - m.p50raw) AS dv
           |  FROM events e JOIN mraw m USING (event_type)),
           |r2 AS (SELECT event_type, dv,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY dv) AS rn,
           |    COUNT(*) OVER (PARTITION BY event_type) AS n
           |  FROM d),
           |md AS (SELECT event_type, MAX(n) AS n, AVG(dv) AS madraw
           |  FROM r2
           |  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
           |st AS (SELECT m.event_type, md.n,
           |    ${Num.floorAtSql("m.p50raw", 4)} AS p50,
           |    ${Num.floorAtSql("md.madraw", 4)} AS mad
           |  FROM mraw m JOIN md USING (event_type))
           |SELECT e.event_type, MAX(st.n) AS n, MAX(st.p50) AS p50,
           |  MAX(st.mad) AS mad,
           |  CAST(SUM(CASE WHEN st.mad > 0 AND ${Num.floorAtSql(
             "abs(e.value - st.p50) / (1.4826 * st.mad)", 4)} > 3.5
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           |  MAX(CASE WHEN st.mad > 0 THEN ${Num.floorAtSql(
             "abs(e.value - st.p50) / (1.4826 * st.mad)", 4)}
           |    ELSE 0.0 END) AS max_score
           |FROM events e JOIN st USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // distinct batch shingles anti-joined on the standing distinct
      // set; docs with < w tokens absent on both sides (empty UNNEST
      // == empty explode)
      "q183_batch_novelty" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |  FROM (SELECT doc_id, $clean AS c FROM documents)),
           |sh AS (SELECT doc_id,
           |    UNNEST(list_distinct(${shinglesSql("t")})) AS sh
           |  FROM tok),
           |standing AS (SELECT DISTINCT sh FROM sh
           |  WHERE doc_id % 5 <> 0),
           |batch AS (SELECT doc_id, sh FROM sh WHERE doc_id % 5 = 0),
           |nv AS (SELECT b.doc_id, COUNT(*) AS n_novel FROM batch b
           |  WHERE b.sh NOT IN (SELECT sh FROM standing) GROUP BY 1),
           |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM batch
           |  GROUP BY 1)
           |SELECT t.doc_id, t.n_shingles,
           |  CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
           |  ${Num.floorAtSql(
             "CAST(COALESCE(nv.n_novel, 0) AS DOUBLE) / t.n_shingles",
             6)} AS novelty
           |FROM tot t LEFT JOIN nv USING (doc_id)
           |ORDER BY t.doc_id""".stripMargin,

      // the invariant IS the oracle: delta pairs == the full-corpus
      // pair set (the shared CTE) filtered to pairs touching the batch
      "q179_ingest_delta_pairs" ->
        s"""WITH $verifiedPairsCte
           |SELECT id_a, id_b, jacc AS jaccard FROM pairs
           |WHERE id_a % 5 = 0 OR id_b % 5 = 0
           |ORDER BY id_a, id_b""".stripMargin,

      // rank-selected edges replayed over the value-domain cumsum;
      // binning = count of edges strictly below the value, so tie
      // ordering cannot matter
      "q178_equidepth_hist" ->
        """WITH tot AS (SELECT COUNT(*) AS n FROM events),
          |vc AS (SELECT value AS v, COUNT(*) AS c FROM events
          |  GROUP BY 1),
          |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM vc),
          |eq AS (SELECT q, MIN(v) AS edge
          |  FROM cum CROSS JOIN tot
          |  CROSS JOIN (SELECT UNNEST(range(1, 8)) AS q)
          |  WHERE cum >= (n - 1) * q // 8 + 1 GROUP BY q),
          |edges AS (SELECT list_sort(list(edge)) AS es FROM eq),
          |b AS (SELECT CAST(len(list_filter(es, e -> value > e))
          |    AS INTEGER) AS bin, value
          |  FROM events CROSS JOIN edges)
          |SELECT bin, COUNT(*) AS n,
          |  floor(MIN(value) * 10000) / 10000 AS lo,
          |  floor(MAX(value) * 10000) / 10000 AS hi
          |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

      // the same decimal power sums the engine accumulates, one scan,
      // closed forms per pair off the 1-row state
      "q177_corr_matrix" -> {
        val mcols = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_tax")
        def dsql(c: String) = s"CAST($c AS DECIMAL(18,2))"
        val sums = (Seq("COUNT(*) AS n") ++
          mcols.map(c => s"SUM(${dsql(c)}) AS s_$c") ++
          mcols.map(c => s"SUM(${dsql(c)} * ${dsql(c)}) AS ss_$c") ++
          (for (i <- mcols.indices; j <- i + 1 until mcols.size)
            yield s"SUM(${dsql(mcols(i))} * ${dsql(mcols(j))})" +
              s" AS sp_${mcols(i)}_${mcols(j)}")).mkString(", ")
        val selects = (for (i <- mcols.indices; j <- i + 1 until
          mcols.size) yield {
          val (a, b) = (mcols(i), mcols(j))
          def dbl(c: String) = s"CAST($c AS DOUBLE)"
          s"SELECT '$a' AS col_a, '$b' AS col_b, n, " + Num.floorAtSql(
            s"(n * ${dbl(s"sp_${a}_$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")})" +
              s" / (sqrt(n * ${dbl(s"ss_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})" +
              s" * sqrt(n * ${dbl(s"ss_$b")} - ${dbl(s"s_$b")} * ${dbl(s"s_$b")}))",
            6) + " AS corr FROM g"
        }).mkString(" UNION ALL ")
        s"WITH g AS (SELECT $sums FROM lineitem) $selects " +
          "ORDER BY col_a, col_b"
      },

      // energy replay from the sample rule: e_w = s_{2w}² + s_{2w+1}²
      // (1-based list indexing), bit w = e_{w+1} > e_w, all integer
      "q175_audio_fingerprint" ->
        s"""WITH m AS (SELECT doc_id, source,
           |    CAST(50 + doc_id % 30 AS INTEGER) AS n FROM documents),
           |s AS (SELECT doc_id, source, n,
           |    list_transform(range(0, n),
           |      i -> (doc_id*31 + i*17) % 4001 - 2000) AS smp
           |  FROM m),
           |e AS (SELECT doc_id, source, n // 2 AS nw,
           |    list_transform(range(0, n // 2), w ->
           |      smp[CAST(2*w + 1 AS INTEGER)]
           |        * smp[CAST(2*w + 1 AS INTEGER)]
           |      + smp[CAST(2*w + 2 AS INTEGER)]
           |        * smp[CAST(2*w + 2 AS INTEGER)]) AS ev
           |  FROM s),
           |f AS (SELECT doc_id AS media_id, source AS kind,
           |    CAST(nw AS BIGINT) AS n_windows,
           |    CAST(COALESCE(list_sum(list_transform(
           |      range(0, least(nw - 1, 63)),
           |      w -> CASE WHEN ev[CAST(w + 2 AS INTEGER)]
           |          > ev[CAST(w + 1 AS INTEGER)]
           |        THEN CAST(1 AS BIGINT) << CAST(w AS INTEGER)
           |        ELSE 0 END)), 0) AS BIGINT) AS fingerprint
           |  FROM e)
           |SELECT media_id, kind, n_windows, fingerprint,
           |  COUNT(*) OVER (PARTITION BY fingerprint) AS n_bucket
           |FROM f ORDER BY media_id""".stripMargin,

      // the WAV sample-rule replay (lists are 1-based in DuckDB; the
      // crossing pairs smp[i], smp[i+1] for i in 1..n-1 are exactly the
      // engine's consecutive-sample pairs). All sums integer-exact;
      // mean and rms floored after one double division / IEEE sqrt.
      "q169_wav_decode" ->
        s"""WITH m AS (SELECT doc_id, source,
           |    CAST(50 + doc_id % 30 AS INTEGER) AS n FROM documents),
           |s AS (SELECT doc_id, source, n,
           |    list_transform(range(0, n),
           |      i -> (doc_id*31 + i*17) % 4001 - 2000) AS smp
           |  FROM m)
           |SELECT doc_id AS media_id, source AS kind,
           |  CAST(8000 AS INTEGER) AS sample_rate,
           |  CAST(n AS BIGINT) AS n_samples,
           |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
           |  CAST(list_max(list_transform(smp, x -> abs(x)))
           |    AS BIGINT) AS peak_abs,
           |  CAST(len(list_filter(range(1, n),
           |    i -> (smp[CAST(i AS INTEGER)] < 0)
           |      <> (smp[CAST(i + 1 AS INTEGER)] < 0)))
           |    AS BIGINT) AS n_zero_cross,
           |  ${Num.floorAtSql(
             "CAST(list_sum(smp) AS DOUBLE) / n", 4)} AS mean_sample,
           |  ${Num.floorAtSql(
             "sqrt(CAST(list_sum(list_transform(smp, x -> x*x))" +
               " AS DOUBLE) / n)", 4)} AS rms
           |FROM s ORDER BY media_id""".stripMargin,

      // aHash replay from the pixel rule: nearest-neighbor sample
      // indices ((b//6)*h)//6 rows, ((b%6)*w)//6 cols — identical
      // integer division order to the engine; the strict gray*36 > sum
      // threshold and bit b -> 1<<b reconstruction keep every step in
      // signed 64-bit BIGINTs
      "q171_image_phash" ->
        """WITH m AS (SELECT doc_id, source,
          |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
          |    CAST(3 + doc_id % 4 AS INTEGER) AS h
          |  FROM documents),
          |px AS (SELECT doc_id, source, list_transform(range(0, 36),
          |    b -> (((b // 6) * h) // 6) * w + (((b % 6) * w) // 6))
          |    AS ps
          |  FROM m),
          |g AS (SELECT doc_id, source, list_transform(ps, p ->
          |    (doc_id + 3*p) % 256 + (doc_id + 3*p + 1) % 256
          |      + (doc_id + 3*p + 2) % 256) AS gv
          |  FROM px),
          |hh AS (SELECT doc_id AS media_id, source AS kind,
          |    CAST(COALESCE(list_sum(list_transform(range(0, 36), b ->
          |      CASE WHEN gv[CAST(b + 1 AS INTEGER)] * 36
          |        > list_sum(gv)
          |      THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
          |      ELSE 0 END)), 0) AS BIGINT) AS phash
          |  FROM g)
          |SELECT media_id, kind, phash,
          |  COUNT(*) OVER (PARTITION BY phash) AS n_bucket
          |FROM hh ORDER BY media_id""".stripMargin,

      // q70's pixel-rule replay minus n_bytes: PNG decode is lossless,
      // so decoded statistics equal the generating rule exactly
      "q168_png_decode" ->
        """WITH m AS (SELECT doc_id, source,
          |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
          |    CAST(3 + doc_id % 4 AS INTEGER) AS h
          |  FROM documents)
          |SELECT doc_id AS media_id, source AS kind,
          |  w AS width, h AS height,
          |  CAST(w * h AS BIGINT) AS n_pixels,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p) % 256)) AS DOUBLE) / (w*h) AS mean_r,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p + 1) % 256)) AS DOUBLE) / (w*h) AS mean_g,
          |  CAST(list_sum(list_transform(range(0, w*h),
          |    p -> (doc_id + 3*p + 2) % 256)) AS DOUBLE) / (w*h) AS mean_b
          |FROM m ORDER BY media_id""".stripMargin,

      // the salt is engine-internal, so the oracle is the PLAIN join —
      // result-identity with the unsalted plan is the correctness claim
      "q129_skew_salted_join" ->
        s"""SELECT o_orderpriority,
           |  ${dsumS("l_extendedprice")} AS revenue, COUNT(*) AS n
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      // the Bloom probe is a pre-filter whose false positives the exact
      // semi join removes — the oracle is the plain IN-subquery
      // (l_quantity is integral-valued double, so SUM is exact and
      // order-insensitive in both engines)
      "q131_bloom_prune" ->
        """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
          |FROM lineitem
          |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
          |                     WHERE o_orderpriority = '1-URGENT')
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      // bit-for-bit replay of the Morton interleave (a's bit i at 2i,
      // b's at 2i+1); day base 7305 = 1990-01-01
      "q132_zorder_key" -> {
        def zSql(a: String, b: String, bits: Int): String =
          (0 until bits).map(i =>
            s"((($a) & ${1L << i}) << $i) | ((($b) & ${1L << i}) << ${i + 1})")
            .mkString("(", " | ", ")")
        val day = s"(${epochSql("o_orderdate")} // 86400 - 7305)"
        s"""SELECT o_orderkey,
           |  CAST(${zSql("o_custkey", day, 16)} AS BIGINT) AS zval
           |FROM orders ORDER BY o_orderkey""".stripMargin
      },

      // shard = first-8-nibble md5 fraction bucketed into 32 fixed
      // ranges (Curate.md5Frac replayed nibble-for-nibble); pos = rank
      // within shard by the full md5 hex key
      "q133_det_shuffle" ->
        s"""WITH t AS (SELECT doc_id,
           |    md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
           |    CAST(FLOOR(${md5HexNSql("CAST(doc_id AS VARCHAR)", 8)}
           |      / 4294967296.0 * 32) AS INTEGER) AS shard
           |  FROM documents)
           |SELECT doc_id, shuffle_key, shard,
           |  CAST(row_number() OVER (PARTITION BY shard
           |    ORDER BY shuffle_key, doc_id) - 1 AS INTEGER) AS pos
           |FROM t ORDER BY shard, pos""".stripMargin,

      // weight lookup replayed as the same array-literal index; DECIMAL
      // sum (order-independent) then floor-at-6dp sigmoid
      "q134_quality_score" ->
        s"""WITH cleaned AS (SELECT doc_id, $clean AS c FROM documents),
           |tok AS (SELECT doc_id, $cleanToks AS t FROM cleaned),
           |g AS (SELECT doc_id,
           |    UNNEST(list_concat(t, ${shinglesSql("t", 2)})) AS g FROM tok),
           |wt AS (SELECT doc_id,
           |    CAST((${Curate.QualityWeights.mkString("[", ", ", "]")})[
           |      CAST(${md5HexNSql("g", 8)} % ${Curate.QualityBuckets}
           |        AS INTEGER) + 1] AS DECIMAL(18,6)) AS wt
           |  FROM g)
           |SELECT doc_id, COUNT(*) AS n_grams,
           |  ${Num.floorAtSql(
               s"1.0 / (1.0 + exp(-((${Curate.QualityBias}) " +
                 "+ CAST(SUM(wt) AS DOUBLE) / COUNT(*))))", 6)}
           |    AS quality_score
           |FROM wt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the q78 sig CTE's minhash replay, keyed as md5 of the
      // NUL-joined signature — the same key function as the streaming
      // near-dup filter's state key, so batch and streaming sig_keys
      // are interchangeable; short docs keep the all-sentinel signature
      "q135_dedup_admission" ->
        s"""WITH tok AS (SELECT doc_id, $cleanToks AS t
           |  FROM (SELECT doc_id, $clean AS c FROM documents)),
           |sig AS (SELECT doc_id,
           |    md5(array_to_string(list_transform(range(0, 8), s ->
           |      COALESCE(list_min(list_transform(${shinglesSql("t")},
           |        x -> md5(CAST(s AS VARCHAR) || ':' || x))), '~empty')),
           |      chr(0))) AS sig_key
           |  FROM tok),
           |basek AS (SELECT DISTINCT sig_key FROM sig WHERE doc_id % 5 <> 0),
           |cand AS (SELECT doc_id, sig_key FROM sig
           |  WHERE doc_id % 5 = 0
           |    AND sig_key NOT IN (SELECT sig_key FROM basek)),
           |ranked AS (SELECT doc_id, sig_key,
           |    row_number() OVER (PARTITION BY sig_key ORDER BY doc_id)
           |      AS rn
           |  FROM cand)
           |SELECT doc_id, sig_key FROM ranked WHERE rn = 1
           |ORDER BY doc_id""".stripMargin,

      // exact cell replay: the counter matrix, the probes, and the min
      // are all reconstructed from the same md5-salted bucket function
      // the engine uses; merged==full is arithmetic identity (cell sums
      // commute), so the oracle pins it as the literal TRUE
      "q136_cms_heavy_hitters" -> {
        def bucket(j: Int) =
          s"(${md5HexNSql(s"'$j:' || CAST(user_id AS VARCHAR)", 8)} % $CmsW)"
        val cells = (0 until CmsD)
          .map(j => s"SELECT $j AS r, ${bucket(j)} AS b FROM events")
          .mkString("\n  UNION ALL ")
        val probeCells = (0 until CmsD)
          .map(j => s"SELECT user_id, $j AS r, ${bucket(j)} AS b FROM hh")
          .mkString("\n  UNION ALL ")
        s"""WITH hh AS (SELECT user_id, count(*) AS exact_cnt
           |  FROM events GROUP BY 1 HAVING count(*) >= 80),
           |cells AS ($cells),
           |counters AS (SELECT r, b, count(*) AS cnt FROM cells
           |  GROUP BY 1, 2),
           |pc AS ($probeCells),
           |est AS (SELECT user_id, min(COALESCE(cnt, CAST(0 AS BIGINT)))
           |    AS cms_est
           |  FROM pc LEFT JOIN counters USING (r, b) GROUP BY 1)
           |SELECT hh.user_id, exact_cnt, cms_est,
           |  cms_est >= exact_cnt AS never_under,
           |  TRUE AS merge_equals_full
           |FROM hh JOIN est USING (user_id)
           |ORDER BY user_id""".stripMargin
      },

      // the three damped rounds unrolled as CTE pairs; every arithmetic
      // op is BIGINT `//`, mirroring the engine's `div` exactly. Nodes
      // iterate as BIGINTs (custkey*2 / suppkey*2+1, same encoding as
      // the engine); the 'c:'/'s:' label is derived only in the final
      // projection, and the top-25 tie-break orders by that label.
      "q137_pagerank" -> {
        val S = PrScale
        val D = PrDampPct
        val iter = (k: Int) =>
          s"""i$k AS (SELECT ew.dst AS node,
             |    CAST(sum(p.r * ew.w // ew.outw) AS BIGINT) AS inflow
             |  FROM ew JOIN r${k - 1} p ON ew.src = p.node GROUP BY 1),
             |r$k AS (SELECT nodes.node,
             |    (($S - $S * $D // 100) // n)
             |      + $D * COALESCE(inflow, CAST(0 AS BIGINT)) // 100 AS r
             |  FROM nodes CROSS JOIN nn
             |  LEFT JOIN i$k ON nodes.node = i$k.node)"""
        s"""WITH e0 AS (
           |  SELECT CAST(o_custkey AS BIGINT) * 2 AS src,
           |         CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst,
           |         CAST(1 AS BIGINT) AS w
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |eg AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
           |    SELECT src, dst, w FROM e0
           |    UNION ALL SELECT dst, src, w FROM e0)
           |  GROUP BY 1, 2),
           |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM eg
           |  GROUP BY 1),
           |ew AS (SELECT eg.src, eg.dst, eg.w, outw.outw
           |  FROM eg JOIN outw ON eg.src = outw.src),
           |nodes AS (SELECT DISTINCT src AS node FROM eg),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |r0 AS (SELECT node, $S // n AS r FROM nodes CROSS JOIN nn),
           |${iter(1).stripMargin},
           |${iter(2).stripMargin},
           |${iter(3).stripMargin}
           |SELECT node, r FROM (
           |  SELECT CASE WHEN node % 2 = 0 THEN 'c:' ELSE 's:' END
           |      || CAST(node // 2 AS VARCHAR) AS node, r
           |  FROM r3)
           |ORDER BY r DESC, node LIMIT 25""".stripMargin
      },

      "q138_pmi_collocations" ->
        s"""WITH tok AS (SELECT $cleanToks AS t
           |  FROM (SELECT $clean AS c FROM documents)),
           |uni AS (SELECT UNNEST(t) AS term FROM tok),
           |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
           |bgl AS (SELECT UNNEST(${shinglesSql("t", 2)}) AS bigram
           |  FROM tok),
           |bc AS (SELECT bigram, count(*) AS c_ab FROM bgl GROUP BY 1
           |  HAVING count(*) >= 5),
           |tot AS (SELECT (SELECT count(*) FROM uni) AS n_uni,
           |               (SELECT count(*) FROM bgl) AS n_bg),
           |scored AS (SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b,
           |    ${Num.floorAtSql(
               "ln((CAST(c_ab AS DOUBLE) / CAST(n_bg AS DOUBLE)) / " +
               "((CAST(a.c AS DOUBLE) / CAST(n_uni AS DOUBLE)) * " +
               "(CAST(b.c AS DOUBLE) / CAST(n_uni AS DOUBLE))))", 6)} AS pmi
           |  FROM bc CROSS JOIN tot
           |  JOIN uc a ON a.term = string_split(bigram, ' ')[1]
           |  JOIN uc b ON b.term = string_split(bigram, ' ')[2])
           |SELECT bigram, c_ab, c_a, c_b, pmi FROM scored
           |ORDER BY pmi DESC, bigram LIMIT 30""".stripMargin,

      // the q120 rank-selection oracle shape on events; within_bound is
      // the GK guarantee — TRUE by contract, integer-checked in-query
      "q139_approx_median_bound" ->
        """WITH r AS (SELECT event_type AS k, value AS x,
          |    row_number() OVER (PARTITION BY event_type ORDER BY value)
          |      AS rn,
          |    COUNT(*) OVER (PARTITION BY event_type) AS n
          |  FROM events)
          |SELECT k AS event_type,
          |  floor(AVG(x) * 10000) / 10000 AS p50, MAX(n) AS n,
          |  TRUE AS within_bound
          |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          |GROUP BY k ORDER BY event_type""".stripMargin,

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
           |  CAST(n_pairs AS DECIMAL(38,0)) AS n_pairs, total_pairs, n_keys,
           |  ${Num.floorAtSql(
             "CAST(n_pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE)", 6)}
           |    AS share
           |FROM j CROSS JOIN tt
           |ORDER BY n_pairs DESC, user_id LIMIT 10""".stripMargin,

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
        s"""WITH $kmeansAfCte,
           |brute AS (SELECT q_id, c_id FROM ($topkCosineSql)),
           |ivf AS (SELECT q_id, c_id FROM ($topkIvfSql)),
           |lshk AS (SELECT q_id, c_id FROM ($topkLshSql)),
           |kmn AS (SELECT vec_id, v, cell,
           |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nr
           |  FROM af),
           |kmscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           |    floor(list_sum(list_transform(range(1, 65),
           |        i -> a.v[i] * b.v[i])) / (a.nr * b.nr) * 10000)
           |      / 10000 AS sim
           |  FROM kmn a JOIN kmn b ON a.cell = b.cell
           |    AND a.vec_id <> b.vec_id
           |  WHERE a.vec_id < 10),
           |ivfkm AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY sim DESC, c_id ASC) AS rk FROM kmscored)
           |  WHERE rk <= 5),
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
           |FROM stats CROSS JOIN nt ORDER BY tables""".stripMargin
    )
  }
}
