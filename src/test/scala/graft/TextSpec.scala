package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Sentiment, Text}

/** Ops 8-12 (clean_text, regex flag, sentiment, label) over the golden edge
  * rows from FIXTURES.md §1 plus hand-rolled scalacheck properties (the
  * scalatestplus bridge isn't on the offline classpath, so we sample Gen
  * directly).
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic N samples from a Gen. */
  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def clean(ss: Seq[String]): Seq[String] =
    ss.toDF("t").select(Text.cleanText(col("t"))).as[String].collect().toSeq

  test("cleanText strips urls, digits, punctuation; lowercases; trims") {
    assert(clean(Seq("Visit http://x.co/a?b=1 NOW!! 42 times"))
      === Seq("visit  now  times"))
    assert(clean(Seq("www.spam.com only")) === Seq("only"))
    assert(clean(Seq("")) === Seq(""))
    assert(clean(Seq("?!?!...  42 --")) === Seq(""))
  }

  test("native cleanText == regex formulation, byte for byte, on " +
    "adversarial inputs (property) and the fixture corpus") {
    // adversarial: url literals split/joined/cased, unicode, all Java \s
    // whitespace chars, digits, edge positions
    val frag = Gen.frequency(
      5 -> Gen.oneOf("http", "www", "HTTP", "Www", "ttp", "ww", "xhttp",
        "https://a.b/c?d=1", "www.x.co", "http", "w", "h"),
      5 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      3 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  "),
      2 -> Gen.oneOf("é", "中文", "!?#;", "..", "-", "_", "42"))
    val gen = Gen.listOf(frag).map(_.mkString)
    val xs = samples(gen, 120) ++ Seq("", " ", "http", "http ", "httpx",
      "www", "wwww", "a http://x b", "whttp://x", "HTTP://x.co",
      "http\thttp x", "wwwhttp zz", "http!")
    val df = xs.toDF("t")
    val got = df.select(Text.cleanText(col("t")).as("fast"),
        Text.cleanTextRegex(col("t")).as("ref"))
      .collect()
    got.zip(xs).foreach { case (r, in) =>
      assert(r.getString(0) === r.getString(1), s"input: <$in>")
    }
    // and the whole documents fixture at sf0.01
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val diff = docs.select(Text.cleanText(col("text")).as("fast"),
        Text.cleanTextRegex(col("text")).as("ref"))
      .where(!(col("fast") <=> col("ref"))).count()
    assert(diff === 0)
  }

  test("fused cleanTokens == tokens(cleanTextRegex), element for " +
    "element, on adversarial inputs and the fixture corpus") {
    val frag = Gen.frequency(
      5 -> Gen.oneOf("http", "www", "HTTP", "https://a.b/c", "www.x.co",
        "xhttp", "w", "h", "ww"),
      5 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      3 -> Gen.oneOf(" ", "\t", "\n", "", "\u000B", "\f", "\r", "  ",
        " \t "),
      2 -> Gen.oneOf("é", "中", "!?", "-", "42"))
    val gen = Gen.listOf(frag).map(_.mkString)
    val xs = samples(gen, 120) ++ Seq("", " ", "a\tb c", "\ta b\t",
      " http://x a", "a  b", "http x www y z")
    val df = xs.toDF("t")
    val got = df.select(Text.cleanTokens(col("t")).as("fast"),
        Text.tokens(Text.cleanTextRegex(col("t"))).as("ref"))
      .collect()
    got.zip(xs).foreach { case (r, in) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"input: <$in>")
    }
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val diff = docs.select(Text.cleanTokens(col("text")).as("fast"),
        Text.tokens(Text.cleanTextRegex(col("text"))).as("ref"))
      .where(!(col("fast") <=> col("ref"))).count()
    assert(diff === 0)
  }

  test("native cleanText null -> null, and works via SQL registration") {
    val r = spark.sql(
      "SELECT clean_text_fast(CAST(NULL AS STRING)) AS a, " +
        "clean_text_fast('Mixed http://x.co CASE 42!') AS b").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) === "mixed  case")
  }

  test("cleanText is idempotent (property)") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '!', '?', '\t'),
      1 -> Gen.oneOf('é', '中', ' '))).map(_.mkString)
    val xs = samples(gen)
    val once = clean(xs)
    val twice = clean(once)
    assert(twice === once)
  }

  test("regexFlag matches dropout variants, null yields false (na=False)") {
    val df = Seq(
      (1L, "thinking of dropping college"),
      (2L, "i will drop out soon"),
      (3L, "DROP-OUT risk"),
      (4L, "dropped out last year"),
      (5L, null.asInstanceOf[String]),
      (6L, "nothing here")
    ).toDF("id", "text")
    val got = df.select(col("id"), Text.regexFlag(col("text")).as("f"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false))
  }

  test("sentimentLabel thresholds are exclusive at ±0.1") {
    val got = Seq(0.1, -0.1, 0.100001, -0.100001, 0.0)
      .toDF("s").select(Text.sentimentLabel(col("s"))).as[String].collect()
    assert(got.toSeq === Seq("neutral", "neutral", "positive", "negative",
      "neutral"))
  }

  test("tokens drops empty strings from repeated spaces") {
    val got = Seq("a  b   c ").toDF("t")
      .select(Text.tokens(col("t"))).as[Seq[String]].head()
    assert(got === Seq("a", "b", "c"))
  }

  test("sentiment score: mean of matched lexicon words, 0.0 when none") {
    val df = Seq(
      (1L, "spark is fast"),        // (0.5 + 0.875) / 2 = 0.6875
      (2L, "no lexicon words xyz"), // 0.0
      (3L, ""),                     // 0.0
      (4L, "bad bad good")          // (-0.75 - 0.75 + 0.75) / 3 = -0.25
    ).toDF("id", "t")
    val got = df.select(col("id"),
        Sentiment.score(Text.cleanText(col("t"))).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 0.6875, 2L -> 0.0, 3L -> 0.0, 4L -> -0.25))
  }

  test("sentiment score stays in [-1, 1] (property)") {
    val word = Gen.oneOf(Sentiment.Lexicon.map(_._1) ++ Seq("zz", "qq"))
    val texts = samples(Gen.listOf(word).map(_.mkString(" ")))
    val vs = texts.toDF("t").select(Sentiment.score(col("t")))
      .as[Double].collect()
    assert(vs.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("every sentiment maps to exactly one label (partition totality)") {
    val vs = samples(Gen.chooseNum(-1.0, 1.0), 200)
    val labels = vs.toDF("s").select(Text.sentimentLabel(col("s")))
      .as[String].collect()
    assert(labels.forall(Set("positive", "negative", "neutral")))
    assert(labels.length === vs.length)
  }

  test("ngramQualityScore stays in [0, 1] and is deterministic " +
      "(property)") {
    import graft.ops.Curate
    val frag = Gen.frequency(
      5 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      3 -> Gen.oneOf(" ", "  ", "\t"),
      2 -> Gen.oneOf("the", "http://x.y", "é", "!?", "42"))
    val texts = samples(Gen.listOf(frag).map(_.mkString))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    def run() = Curate.ngramQualityScore(df, "doc_id", "text")
      .select("doc_id", "quality_score").as[(Long, Double)]
      .collect().toMap
    val s1 = run()
    assert(s1.values.forall(v => v >= 0.0 && v <= 1.0),
      s"out-of-range scores: ${s1.filterNot(kv => kv._2 >= 0 && kv._2 <= 1)}")
    assert(s1 === run(), "score not deterministic across runs")
    // docs with at least one clean token are scored, token-less docs are
    // absent (the documented contract)
    val tokenless = df
      .where(size(graft.ops.Text.cleanTokens(col("text"))) === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.keySet.intersect(tokenless).isEmpty)
    assert(s1.size === texts.size - tokenless.size)
  }

  test("quality / lang-id / token-count edge rows") {
    val row = Seq((1L, "")).toDF("id", "t")
      .withColumn("toks", Text.tokens(col("t")))
      .select(Text.tokenCount(col("toks")).as("n"),
        Text.langIdHeuristic(col("t"), col("toks")).as("lang"),
        Text.qualityScore(col("t"), col("toks")).as("q"))
      .collect().head
    assert(row === Row(0, "und", 0.0))
    val en = Seq("the cat sat on the mat and the dog is in a box of hats")
      .toDF("t").withColumn("toks", Text.tokens(col("t")))
      .select(Text.langIdHeuristic(col("t"), col("toks"))).as[String].head()
    assert(en === "en")
  }

  test("Cavnar-Trenkle lang ID: distinct trigram alphabets separate, " +
      "self-profiles win, empty doc gets 'und'") {
    // two 'languages' with disjoint character alphabets, one doc whose
    // text matches xx's alphabet but carries no declared profile help,
    // and one trigram-less doc
    val docs = Seq(
      (1L, "aaab aaab aaab baaa", "xx"),
      (2L, "aaba aaab baab aaab", "xx"),
      (3L, "zzzy zzzy yzzz zyzz", "yy"),
      (4L, "zzyz yzzy zzzy zzzz", "yy"),
      (5L, "aaab aaba baaa aaab", "xx"),
      (6L, "", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = Text.langIdNgram(docs, "doc_id", "lang", "text", k = 10)
      .orderBy("doc_id")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) === "xx" && out(2L) === "xx" && out(5L) === "xx")
    assert(out(3L) === "yy" && out(4L) === "yy")
    assert(out(6L) === "und")
    // a/b docs score FAR from yy: every profile trigram pays the k
    // penalty against the disjoint alphabet
    val dist = Text.langIdNgram(docs, "doc_id", "lang", "text", k = 10)
      .where(col("doc_id") === 1L).select("dist").as[Long].head()
    assert(dist >= 0L)
  }
}
