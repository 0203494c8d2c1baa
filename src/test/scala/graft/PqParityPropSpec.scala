package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.graftbridge.Bridge

/** Property parity for the round-11 native PQ expressions against the
  * composed HOF/literal reference semantics, over GENERATED float
  * vectors (negatives, zeros, denormal-ish tiny values, exact ties) —
  * the oracle gates cover the fixture; this covers adversarial
  * numerics. scalacheck Gen sampled directly (scalatestplus is not on
  * the offline classpath).
  */
class PqParityPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val floatGen: Gen[Float] = Gen.oneOf(
    Gen.choose(-2.0f, 2.0f),
    Gen.const(0.0f),
    Gen.const(1.0f),
    Gen.const(-1.0f),
    Gen.const(1e-7f),
    Gen.const(123.456f))

  private def vecGen(dim: Int): Gen[List[Float]] =
    Gen.listOfN(dim, floatGen)

  test("PqAssignExpr / PqLutExpr == the HOF l2sq reference fold on 80 " +
      "generated vectors against a generated codebook (ties to the " +
      "lowest code; raw LUT distances bit-equal)") {
    val dim = 8
    val k = 6
    val books: Seq[Seq[Float]] = samples(vecGen(dim), k).map(_.toSeq)
    // force an exact tie: codebook entries 4 and 5 identical
    val tiedBooks = (books.take(k - 1) :+ books(k - 2)).toIndexedSeq
    val bookArr = tiedBooks.map(_.map(_.toDouble).toArray).toArray
    val vecs = (samples(vecGen(dim), 78) :+ tiedBooks(4).toList :+
      List.fill(dim)(0.0f)).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(identity)) }
    val df = vecs.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    // HOF reference: same 9dp floor + lowest-code tie via struct min
    val refAssign = array_min(array(tiedBooks.zipWithIndex.map {
      case (cv, j) =>
        struct(
          (floor(graft.ops.Sim.l2sq(col("v"), typedLit(cv)) * 1e9) / 1e9)
            .as("d"),
          lit(j).as("code"))
    }: _*)).getField("code")
    val refLuts = array(tiedBooks.map(cv =>
      graft.ops.Sim.l2sq(col("v"), typedLit(cv))): _*)
    val got = df.select(col("id"),
        Bridge.column(graft.functions.PqAssignExpr(
          Bridge.expression(col("v")), bookArr)).as("aN"),
        refAssign.as("aH"),
        Bridge.column(graft.functions.PqLutExpr(
          Bridge.expression(col("v")), bookArr)).as("lN"),
        refLuts.as("lH"))
      .as[(Long, Int, Int, Seq[Double], Seq[Double])]
      .collect()
    assert(got.length === 80)
    got.foreach { case (id, aN, aH, lN, lH) =>
      assert(aN === aH, s"assign parity broke: id=$id")
      // bit equality, not approx: both sides fold left-to-right from 0.0
      assert(lN === lH, s"LUT parity broke: id=$id")
    }
    // the duplicated codebook entry can never win as code k-1: ties go
    // to the lowest code, so code k-2 shadows it on every row
    assert(!got.exists(_._2 == k - 1), "tie must resolve to lowest code")
  }

  test("PqAssignAtExpr dispatches per-row on the subspace index " +
      "exactly as per-subspace PqAssignExpr") {
    val dim = 4
    val m = 3
    val books = (0 until m).map(s =>
      samples(vecGen(dim), 4).map(_.toSeq).toIndexedSeq)
    val bookArr = books.map(_.map(_.map(_.toDouble).toArray).toArray)
      .toArray
    val rows = for {
      (v, i) <- samples(vecGen(dim), 30).zipWithIndex
      s <- 0 until m
    } yield (i.toLong, s, v)
    val df = rows.toDF("id", "s", "v")
      .select(col("id"), col("s"), col("v").cast("array<float>").as("v"))
    val got = df.select(col("id"), col("s"),
        Bridge.column(graft.functions.PqAssignAtExpr(
          Bridge.expression(col("s")), Bridge.expression(col("v")),
          bookArr)).as("at"))
      .as[(Long, Int, Int)].collect()
    val single = (0 until m).map { s =>
      s -> df.where(col("s") === s).select(col("id"),
          Bridge.column(graft.functions.PqAssignExpr(
            Bridge.expression(col("v")), bookArr(s))).as("a"))
        .as[(Long, Int)].collect().toMap
    }.toMap
    got.foreach { case (id, s, at) =>
      assert(at === single(s)(id), s"dispatch diverged at id=$id s=$s")
    }
  }
}
