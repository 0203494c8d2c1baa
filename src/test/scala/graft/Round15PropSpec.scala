package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.{Curate, LexIndex}

/** Property checks for the round-15 operators over GENERATED inputs:
  * the sizing policy's algebraic bounds, the mass allocator's exact
  * budget identity on arbitrary weight tables, and the N-way segment
  * fold's equality with a from-scratch build on generated corpora
  * (the q292 merge property generalized to [[LexIndex.mergeAll]]).
  */
class Round15PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("AnnIndex.sizing bounds hold for arbitrary corpus sizes: k is " +
      "nondecreasing, the per-cell candidate bound n/k never exceeds " +
      "sqrt(n)+1, and probes stays in [2, ceil(k/4)] with quarter " +
      "coverage exact past the floor") {
    val ns = samples(Gen.choose(1L, 4000000000L), 200) ++
      Seq(1L, 2L, 3L, 4L, 63L, 64L, 65L, 1L << 40)
    var prevN = 0L; var prevK = 0
    ns.sorted.foreach { n =>
      val (k, p) = ops.AnnIndex.sizing(n)
      assert(k >= 1 && k.toLong * k >= n,
        s"k=ceil(sqrt(n)) must cover n: n=$n k=$k")
      assert((k - 1).toLong * (k - 1) < n,
        s"k must be the LEAST such integer: n=$n k=$k")
      // the scale claim itself: per-cell candidate bound ~ sqrt(n)
      assert(n.toDouble / k <= math.sqrt(n.toDouble) + 1,
        s"per-cell bound must track sqrt(n): n=$n k=$k")
      assert(p == math.max(2, math.ceil(k * 0.25).toInt),
        s"probes must be the quarter-coverage budget: k=$k p=$p")
      if (prevN > 0) assert(k >= prevK,
        s"k must be nondecreasing in n: ($prevN,$prevK) -> ($n,$k)")
      prevN = n; prevK = k
    }
  }

  test("mixtureAllocationByMass allocations are integers summing " +
      "EXACTLY to the target on arbitrary weight tables, and a " +
      "source's allocation is monotone in its mass at fixed others") {
    val table: Gen[List[(Int, Long)]] = for {
      nSrc <- Gen.choose(2, 7)
      rows <- Gen.listOfN(40, for {
        s <- Gen.choose(0, nSrc - 1)
        w <- Gen.choose(1L, 100000L)
      } yield (s, w))
    } yield rows
    samples(table, 8).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.zipWithIndex
        .map { case ((s, w), i) => (s"src$s", i.toLong, w) }
        .toDF("src", "id", "wt")
      val target = 17L + 31L * ci
      val alloc = Curate.mixtureAllocationByMass(df, "src", "wt", target)
        .collect().map(r => (r.getString(0), r.getLong(3)))
      assert(alloc.map(_._2).sum === target,
        s"allocations must sum exactly to $target: ${alloc.toSeq}")
      assert(alloc.forall(_._2 >= 0))
      // monotonicity: quadruple one source's mass, its quota must not
      // shrink (sqrt damping preserves order)
      val boosted = df.withColumn("wt",
        when(col("src") === "src0", col("wt") * 4).otherwise(col("wt")))
      val a0 = alloc.toMap.getOrElse("src0", 0L)
      val b0 = Curate.mixtureAllocationByMass(boosted, "src", "wt",
          target).collect()
        .map(r => (r.getString(0), r.getLong(3))).toMap
        .getOrElse("src0", 0L)
      assert(b0 >= a0,
        s"quadrupling src0's mass shrank its quota: $a0 -> $b0")
    }
  }

  test("LexIndex.mergeAll over an arbitrary disjoint partition of a " +
      "generated corpus equals build(whole corpus) on all four " +
      "frames — the segment fold is partition-invariant") {
    val corpus: Gen[(List[String], Int)] = for {
      texts <- Gen.listOfN(30, Gen.listOfN(8,
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" ")))
      nSeg <- Gen.choose(2, 5)
    } yield (texts, nSeg)
    samples(corpus, 5).foreach { case (texts, nSeg) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .localCheckpoint()
      val segs = (0 until nSeg).map(s =>
        LexIndex.buildFrames(docs.where(col("doc_id") % nSeg === s)))
      val folded = LexIndex.mergeAll(segs)
      val whole = LexIndex.buildFrames(docs)
      def same(a: org.apache.spark.sql.DataFrame,
               b: org.apache.spark.sql.DataFrame, what: String): Unit =
        assert(a.exceptAll(b).count() === 0L &&
          b.exceptAll(a).count() === 0L,
          s"$what: $nSeg-way fold must equal build(all)")
      same(folded._1, whole._1, "tf")
      same(folded._2, whole._2, "dl")
      same(folded._3, whole._3, "df")
      same(folded._4, whole._4, "stats")
    }
  }
}
