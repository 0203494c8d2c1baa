package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Sentiment, Star, Text}

/** Helpers and constants shared by every registry part and by
  * SparkEntry itself — split out of SparkEntry.scala (round 10).
  */
private[graft] object Shared {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact order-insensitive sum of a 2-dp double column, as double. */
  private[graft] def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Staging path for queries that WRITE derived files at build time and
    * read them lazily: keyed by (pid, fixture dir), never pid alone — a
    * pid-only path is overwritten when the same query is built for a
    * second scale factor while the first invocation's DataFrame is still
    * live, so that frame would silently read the other fixture's bytes
    * (the r12 ADVICE q283 hazard; same class for every staging query).
    */
  private[graft] def stagePath(tag: String, dir: String): String =
    sys.props("java.io.tmpdir") +
      s"/graft-$tag-${ProcessHandle.current().pid}-" +
      java.lang.Integer.toHexString(dir.hashCode)

  /** [[stagePath]]'s suffix for SQL table/database identifiers (q05's
    * bucketed tables, q112's Derby database): letters/digits only.
    */
  private[graft] def stageId(dir: String): String =
    ProcessHandle.current().pid.toString + "x" +
      java.lang.Integer.toHexString(dir.hashCode)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole analytics spine (SURVEY.md §7.3 M1): clean →
    * sentiment → label → dims → fact → star-join-back → distribution.
    */
  /** M1 spine (ops 8,10,11,13,14,15,16). */
  private[graft] def labelDistribution(s: SparkSession, dir: String): DataFrame = {
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
  private[graft] def cleanSql(c: String): String =
    s"lower(trim(regexp_replace($c, 'http\\S+|www\\S+|[^a-zA-Z\\s]', '', 'g')))"

  /** DuckDB expression for Text.tokens over a text expr. */
  private[graft] def toksSql(c: String): String =
    s"list_filter(string_split($c, ' '), t -> t <> '')"

  private[graft] val labelCase =
    "CASE WHEN sentiment > 0.1 THEN 'positive' " +
      "WHEN sentiment < -0.1 THEN 'negative' ELSE 'neutral' END"

  /** DuckDB: epoch seconds (floor) of a timestamp, BIGINT — matches Spark's
    * unix_timestamp (floorDiv of microseconds).
    */
  private[graft] def epochSql(c: String): String = s"(epoch_us($c) // 1000000)"

  /** DuckDB: first 4 md5 hex nibbles of `arg` as an INTEGER in [0, 65535]
    * (no hex→int builtin; decode via character position — same trick as the
    * q34 oracle). Shared by the SimHash and sign-LSH oracles.
    */
  private[graft] def md5Hex4Sql(arg: String): String = md5HexNSql(arg, 4)

  /** DuckDB: first `n` md5 hex nibbles of `arg` as a BIGINT (n <= 15 so
    * the value stays positive in a signed 64-bit int).
    */
  private[graft] def md5HexNSql(arg: String, n: Int): String = {
    require(n >= 1 && n <= 15, s"need 1 <= n <= 15 nibbles, got $n")
    (0 until n).map { i =>
      s"(strpos('0123456789abcdef', substring(md5($arg), ${i + 1}, 1)) - 1) * ${1L << (4 * (n - 1 - i))}"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB expression mirroring Dedup.shingles(clean, w) over a token-list
    * expr.
    */
  private[graft] def shinglesSql(toks: String, w: Int = 3): String = {
    val parts = (0 until w).map(k => s"t[i+${k + 1}]")
      .mkString(" || ' ' || ")
    s"CASE WHEN len($toks) < $w THEN [] ELSE " +
      s"list_transform(range(0, len($toks) - $w + 1), i -> $parts) END"
  }


  /** CMS geometry shared by q136's query and oracle: 4 md5-salted rows of
    * 64 buckets — small enough that the 150-user fixture collides (the
    * overcount the guarantee bit is ABOUT), large enough for sane
    * estimates.
    */
  private[graft] val CmsD = 4
  private[graft] val CmsW = 64

  /** PageRank knobs shared by q137's query and oracle: integer mass out
    * of 1e12, 85% damping (Graph.scala scaladoc for the overflow math).
    */
  private[graft] val PrScale = 1000000000000L
  private[graft] val PrDampPct = 85

}
