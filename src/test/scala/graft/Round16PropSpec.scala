package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.Sim

/** Property checks for the round-16 geometry-partials fold: the claim
  * the ANN segment history rests on is that [[Sim.centroidsFromPartials]]
  * over ANY disjoint partition of a corpus's
  * [[Sim.cellCentroidPartials]] equals the one-pass
  * [[Sim.cellCentroids]] bit-for-bit — DECIMAL sums are exact and
  * associative, so geometry-as-of-version can fold published segment
  * bytes without a float-drift caveat. Generated corpora, arbitrary
  * segment counts, adversarial float components (tiny, huge,
  * negative, denormal-ish).
  */
class Round16PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("centroidsFromPartials over an arbitrary disjoint partition " +
      "of a generated corpus equals one-pass cellCentroids " +
      "bit-for-bit — cell vectors AND norms, any segment count, " +
      "adversarial component magnitudes") {
    val comp: Gen[Float] = Gen.oneOf(
      Gen.choose(-1.0f, 1.0f),
      Gen.oneOf(0.0f, -0.0f, 1e-8f, -1e-8f, 123456.78f, -0.333333f),
      Gen.choose(-1e6f, 1e6f))
    val corpus: Gen[(List[(Int, List[Float])], Int)] = for {
      dim <- Gen.choose(2, 6)
      nCells <- Gen.choose(1, 4)
      rows <- Gen.listOfN(40, for {
        c <- Gen.choose(0, nCells - 1)
        v <- Gen.listOfN(dim, comp)
      } yield (c, v))
      nSeg <- Gen.choose(2, 6)
    } yield (rows, nSeg)
    samples(corpus, 6).foreach { case (rows, nSeg) =>
      val df = rows.zipWithIndex
        .map { case ((c, v), i) => (i.toLong, c, v) }
        .toDF("vec_id", "cell", "embedding")
        .localCheckpoint()
      val folded = Sim.centroidsFromPartials(
        (0 until nSeg).map(s =>
            Sim.cellCentroidPartials(
              df.where(col("vec_id") % nSeg === s), "cell"))
          .reduce(_.unionByName(_)))
      val onePass = Sim.cellCentroids(df, "cell")
      assert(folded.exceptAll(onePass).count() === 0L &&
        onePass.exceptAll(folded).count() === 0L,
        s"$nSeg-way partial fold must equal the one-pass geometry " +
          "exactly (floats compared bit-for-bit by exceptAll)")
    }
  }

  test("the fold is also REORDER-invariant: folding segments in " +
      "reverse publish order yields the identical frame — an as-of " +
      "read may union segment bytes in any order") {
    val df = (0 until 60)
      .map(i => (i.toLong, i % 3,
        List(math.sin(i).toFloat, math.cos(i * 7).toFloat,
          (i * 0.1237f) - 3.0f)))
      .toDF("vec_id", "cell", "embedding")
      .localCheckpoint()
    val parts = (0 until 4).map(s =>
      Sim.cellCentroidPartials(
        df.where(col("vec_id") % 4 === s), "cell"))
    val fwd = Sim.centroidsFromPartials(parts.reduce(_.unionByName(_)))
    val rev = Sim.centroidsFromPartials(
      parts.reverse.reduce(_.unionByName(_)))
    assert(fwd.exceptAll(rev).count() === 0L &&
      rev.exceptAll(fwd).count() === 0L)
  }
}
