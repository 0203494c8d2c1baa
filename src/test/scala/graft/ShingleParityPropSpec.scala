package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Dedup

/** Property parity for the round-9 native shingle expressions against
  * their HOF twins, over GENERATED token arrays (unicode tokens, empty
  * strings, empty arrays, w in 1..4) — the fixture parity test covers
  * the realistic corpus; this covers the adversarial shapes (scalacheck
  * Gen sampled directly — scalatestplus is not on the offline
  * classpath).
  */
class ShingleParityPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // token alphabet deliberately includes the empty string, multi-byte
  // unicode, and space-free ASCII (cleanTokens never EMITS "" or
  // spaces, but the expression contract is over ANY array<string>)
  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const(""),
    Gen.oneOf("héllo", "naïve", "日本語", "z", "αβγ"))

  private val arrGen: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokenGen))

  test("native shingles/hashedShingles == HOF twins on 120 generated " +
      "arrays x w in 1..4 (incl. empty strings, unicode, empty arrays)") {
    val rows = samples(arrGen, 120).zipWithIndex
      .map { case (a, i) => (i.toLong, a) }
    val df = rows.toDF("id", "toks")
    for (w <- 1 to 4) {
      val got = df.select(col("id"),
          Dedup.shingles(col("toks"), w).as("sN"),
          Dedup.shinglesHof(col("toks"), w).as("sH"),
          Dedup.hashedShingles(col("toks"), w).as("hN"),
          Dedup.hashedShinglesHof(col("toks"), w).as("hH"))
        .as[(Long, Seq[String], Seq[String], Seq[Long], Seq[Long])]
        .collect()
      assert(got.nonEmpty)
      got.foreach { case (id, sN, sH, hN, hH) =>
        assert(sN === sH, s"string parity broke: id=$id w=$w")
        assert(hN === hH, s"hash parity broke: id=$id w=$w")
      }
    }
  }

  test("null array and null-element arrays: native matches HOF") {
    val df = Seq(
      (1L, null.asInstanceOf[Array[String]]),
      (2L, Array[String]("a", null, "b", "c")),
      (3L, Array[String](null, null, null))
    ).toDF("id", "toks")
    val got = df.select(col("id"),
        Dedup.shingles(col("toks"), 3).as("sN"),
        Dedup.shinglesHof(col("toks"), 3).as("sH"),
        Dedup.hashedShingles(col("toks"), 3).as("hN"),
        Dedup.hashedShinglesHof(col("toks"), 3).as("hH"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null-out parity: $r")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) === r.getSeq[String](2), s"$r")
      assert(r.isNullAt(3) === r.isNullAt(4), s"null-out parity: $r")
      if (!r.isNullAt(3))
        assert(r.getSeq[Long](3) === r.getSeq[Long](4), s"$r")
    }
  }
}
