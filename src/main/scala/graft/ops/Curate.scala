package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining pipeline runs after cleaning
  * and dedup: sequence packing, eval-set decontamination, and PII
  * redaction. All deterministic and oracle-expressible (md5-derived
  * shards, ANSI window frames, RE2-compatible regexes).
  */
object Curate {

  /** GPT-style sequence packing: concatenate documents in a deterministic
    * order and chunk the token stream into `ctxTokens`-sized packs. Each
    * doc's pack is derived from its START OFFSET in the stream (docs may
    * straddle pack boundaries — standard concat-and-chunk packing).
    *
    * Packing is sharded: the stream is per md5-shard of the id, not
    * global — a single global cumulative sum would serialize on one
    * partition, while per-shard packing is embarrassingly parallel (one
    * window shuffle on shard) and is how packing actually runs at corpus
    * scale (each worker packs its own shard). Shard assignment is
    * md5-derived, so the layout is reproducible across engines and runs.
    *
    * Output: (doc_id, shard, n_tokens, start_offset, pack_id).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    ctxTokens: Int, shards: Int): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % shards))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("start_offset") / ctxTokens).cast("long"))
  }

  /** Eval-set decontamination: train docs sharing at least one distinct
    * w-shingle with ANY doc of the eval set, with the shared-shingle
    * count (the standard n-gram-overlap contamination check run before
    * training). `isEval` is a deterministic predicate over the id.
    *
    * Shape at scale: one shingle-keyed join; the eval side (distinct eval
    * shingles) is a tiny fraction of the corpus and broadcasts — the
    * train side never self-joins and nothing is all-pairs.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isEval: Column, w: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), isEval.as("ev"),
        Text.cleanTokens(col(textCol)).as("t"))
      .select(col("id"), col("ev"),
        explode(array_distinct(Dedup.shingles(col("t"), w))).as("sh"))
    val evalSh = sh.where(col("ev")).select(col("sh")).distinct()
    sh.where(!col("ev"))
      .join(broadcast(evalSh), Seq("sh"))
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .select(col("id").as("doc_id"), col("n_shared"))
  }

  /** Email pattern (RE2-compatible — identical semantics in Java regex
    * and DuckDB, so the oracle replays it exactly).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone pattern: international-ish digit runs with dashes. */
  val PhoneRe = "\\+?\\d[\\d-]{7,}\\d"

  /** PII redaction: count and replace email/phone matches. Emails are
    * redacted first; the `<EMAIL>` placeholder contains no digits, so the
    * phone pass cannot re-match inside it (order is part of the
    * contract). One projection — scan-local at any scale.
    *
    * Output: input columns + (n_pii, redacted).
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_pii",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))) +
          size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))
}
