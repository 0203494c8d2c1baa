package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexicon-average sentiment (SURVEY.md §2 op 10; reference
  * reddit_etl_proj/etl_pipeline.py:78 — TextBlob mean token polarity).
  *
  * Same algorithm shape as the reference (mean per-token polarity, 0.0 when
  * no token matches), but over a small deterministic lexicon that ships as
  * code, so the DuckDB oracle reproduces it exactly (SURVEY.md §7.4).
  *
  * Physical design: NOT explode + join + groupBy (that costs a shuffle per
  * pass). The lexicon is tiny, so we inline it as a map literal and score
  * each row with `transform`/`filter`/`aggregate` over the token array —
  * one codegen'd projection, zero shuffles, linear scan at any scale.
  *
  * Scores are exact binary fractions (eighths) so summation is exact and
  * order-insensitive — Spark and DuckDB produce bit-identical doubles.
  */
object Sentiment {

  /** (word, polarity) — polarities are multiples of 1/8 in [-1, 1]. */
  val Lexicon: Seq[(String, Double)] = Seq(
    "fast" -> 0.875, "good" -> 0.75, "great" -> 0.875, "spark" -> 0.5,
    "merge" -> 0.25, "stream" -> 0.125, "big" -> 0.375, "value" -> 0.25,
    "slow" -> -0.875, "bad" -> -0.75, "error" -> -0.875, "dup" -> -0.5,
    "small" -> -0.25, "drop" -> -0.375, "fail" -> -0.75, "dirty" -> -0.625)

  private val lexMap: Column =
    map(Lexicon.flatMap { case (w, s) => Seq(lit(w), lit(s)) }: _*)

  /** Mean polarity of lexicon tokens in [-1, 1]; 0.0 when none match.
    * Input is expected to be cleaned text (Text.cleanText).
    */
  def score(cleaned: Column): Column = {
    val matched = filter(
      transform(Text.tokens(cleaned), t => element_at(lexMap, t)),
      s => s.isNotNull)
    round(
      when(size(matched) > 0,
        aggregate(matched, lit(0.0), (acc, s) => acc + s) / size(matched))
        .otherwise(0.0),
      4)
  }

  /** The oracle-side lexicon as a SQL VALUES list (scores cast to DOUBLE —
    * DuckDB would otherwise type bare decimals as DECIMAL and change the
    * arithmetic).
    */
  def lexiconValuesSql: String =
    Lexicon.map { case (w, s) => s"('$w', CAST($s AS DOUBLE))" }
      .mkString(", ")

  /** Full DuckDB expression (no lateral needed): computes the matched-score
    * list inline. `cleanedExpr` must be a DuckDB expression yielding the
    * cleaned text. Mirrors `score` exactly.
    */
  def scoreSqlInline(cleanedExpr: String): String = {
    val caseExpr = Lexicon.map { case (w, s) =>
      s"WHEN '$w' THEN CAST($s AS DOUBLE)"
    }.mkString(" ")
    val matched =
      s"list_filter(list_transform(list_filter(string_split($cleanedExpr, ' '), t -> t <> ''), t -> CASE t $caseExpr ELSE NULL END), s -> s IS NOT NULL)"
    s"round(CASE WHEN len($matched) > 0 THEN list_sum($matched) / len($matched) ELSE 0.0 END, 4)"
  }
}
