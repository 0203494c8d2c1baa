package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** graft.plans optimizer rules: the bounded-Levenshtein filter rewrite
  * must fire on the plan AND preserve semantics exactly.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("thresholded levenshtein builtin semantics: d <= k returns d, " +
    "d > k returns -1 (the equivalence the rule relies on)") {
    val r = spark.sql(
      """SELECT levenshtein('kitten', 'sitting', 3) AS a,
        |       levenshtein('kitten', 'sitting', 2) AS b,
        |       levenshtein('abc', 'abc', 0) AS c""".stripMargin).head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === -1)
    assert(r.getInt(2) === 0)
  }

  test("levenshtein(a,b) <= k filter is rewritten to the banded form") {
    // a LocalRelation would be constant-folded away before the plan can
    // be inspected — use a parquet-backed input
    val part = Tables.load(spark, "/root/testdata/sf0.001", "part")
    val df = part.where(levenshtein(col("p_name"), lit("red bolt")) <= 2)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(p_name#") && opt.contains("Some(2)) >= 0"),
      s"rewrite did not fire:\n$opt")
    // and the rewritten plan returns exactly the rows the raw distance says
    val expected = part
      .select(col("p_name"), levenshtein(col("p_name"), lit("red bolt"))
        .as("d"))
      .where(col("d") <= 2).count()
    assert(df.count() === expected && expected > 0)
  }

  test("rewrite preserves semantics on <=, <, ==, reversed >=, and nulls") {
    val rows = Seq(
      ("kitten", "sitting"),   // d=3
      ("red bolt", "red bolts"), // d=1
      ("same", "same"),        // d=0
      (null, "x"),             // null -> filtered out in both forms
      ("abcdef", "zzzzzz"))    // d=6
      .toDF("a", "b")
    def ids(c: org.apache.spark.sql.Column) =
      rows.where(c).select("a").as[String].collect().toSet
    // ground truth computed WITHOUT the rule: evaluate distance in a
    // projection (projections are not rewritten), then filter on the value
    val dists = rows.select(col("a"),
      levenshtein(col("a"), col("b")).as("d"))
    def truth(p: org.apache.spark.sql.Column) =
      dists.where(p).select("a").as[String].collect().toSet
    assert(ids(levenshtein(col("a"), col("b")) <= 3) ===
      truth(col("d") <= 3))
    assert(ids(levenshtein(col("a"), col("b")) < 3) === truth(col("d") < 3))
    assert(ids(levenshtein(col("a"), col("b")) === 1) ===
      truth(col("d") === 1))
    assert(ids(lit(3) >= levenshtein(col("a"), col("b"))) ===
      truth(col("d") <= 3))
  }

  test("q121 prefix document-frequency is a partial-aggregated groupBy " +
    "joined back — never a count window over the shingle key") {
    // the count-window form (Window.partitionBy("sh")) has no partial
    // aggregation: every row of a hot boilerplate shingle buffers on one
    // reducer — a straggler/OOM at corpus scale. The pinned shape is
    // partial_count + final count on the shingle key (map-side combine)
    // joined back; doc-keyed windows (bounded by doc length) stay.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(
        Dedup.hashedShingles(Text.cleanTokens(col("text"))))).as("sh"))
    val prefix = Dedup.prefixRows(sh, 0.8, dfOrdered = true)
    val p = prefix.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"),
      "df must partial-aggregate map-side:\n" + p.take(1500))
    assert(!p.contains("windowspecdefinition(sh#"),
      "count window over the shingle key crept back in:\n" + p.take(1500))
  }

  test("fuzzyPairs' plan gets the banded rewrite end-to-end") {
    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name").as("name")).distinct()
    val df = Dedup.fuzzyPairs(names, "name", "name", maxDist = 3)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(3)) >= 0"),
      s"fuzzyPairs filter not rewritten:\n$opt")
    assert(df.count() === 16)  // matches the q97 oracle at sf0.001
  }
}
