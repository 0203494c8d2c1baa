package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.{Append, Chains, Delete, Segment}

/** Property checks for the round-17 chain ALGEBRA
  * ([[graft.ops.Chains]]): the claims the mixed append→delete→append
  * histories rest on, over GENERATED chains (arbitrary interleavings,
  * not just the registered ""/c3/c4/md/m3 fixtures):
  *
  *  - capture-time semantics: [[Chains.effective]] gives each delete
  *    exactly the rows live when it runs — a row appended later stays
  *    live even when it matches the delete predicate;
  *  - [[Chains.liveAsOf]] at every version equals a step-by-step set
  *    simulator folding appends and deletes in order;
  *  - tombstone GLOBAL masking is exact: because captured ids identify
  *    rows that appear in exactly one EARLIER append, anti-joining the
  *    union of all appends ≤ v against the union of all captured
  *    deletes ≤ v equals the simulator's live set — the identity the
  *    framesAsOf/postingsAsOf reads rely on to mask with one broadcast
  *    anti-join instead of per-segment masks.
  */
class Round17PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // a generated chain: appends partition the 0..59 universe by id mod
  // nApp (disjoint by construction — the chain contract), deletes are
  // arbitrary (p, q) predicates interleaved anywhere after the first
  // append
  private case class SimSeg(isDelete: Boolean, a: Int, b: Int)

  private val chainGen: Gen[(Int, List[SimSeg])] = for {
    nApp <- Gen.choose(2, 4)
    appOrder <- Gen.const(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle((0 until nApp).toList))
    nDel <- Gen.choose(1, 3)
    dels <- Gen.listOfN(nDel, for {
      p <- Gen.choose(2, 7)
      q <- Gen.choose(0, 6)
    } yield SimSeg(isDelete = true, p, math.min(q, p - 1)))
    // interleave: delete i goes after append position pos_i (>= 1)
    positions <- Gen.listOfN(nDel, Gen.choose(1, nApp))
  } yield {
    val apps = appOrder.map(r => SimSeg(isDelete = false, nApp, r))
    val byPos = dels.zip(positions).groupBy(_._2)
    val segs = (1 to nApp).flatMap { i =>
      apps(i - 1) :: byPos.getOrElse(i, Nil).map(_._1)
    }.toList
    (nApp, segs)
  }

  private def toSegments(segs: List[SimSeg]): Seq[Segment] =
    segs.zipWithIndex.map {
      case (SimSeg(false, m, r), i) =>
        Append(s"a$i", col("id") % m === r)
      case (SimSeg(true, p, q), i) =>
        Delete(s"d$i", col("id") % p === q)
    }

  // the step-by-step set simulator over universe 0..59
  private def simulate(segs: List[SimSeg])
      : (Seq[Set[Long]], Seq[Set[Long]]) = {
    val universe = (0L until 60L)
    var live = Set.empty[Long]
    val liveAt = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val captured = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    segs.foreach {
      case SimSeg(false, m, r) =>
        val slice = universe.filter(_ % m == r).toSet
        live = live ++ slice
        captured += Set.empty
        liveAt += live
      case SimSeg(true, p, q) =>
        val doomed = live.filter(_ % p == q)
        live = live -- doomed
        captured += doomed
        liveAt += live
    }
    (liveAt.toSeq, captured.toSeq)
  }

  test("Chains.effective captures each delete against the then-live " +
      "corpus and Chains.liveAsOf equals the set simulator at EVERY " +
      "version of generated mixed chains") {
    val ids = (0L until 60L).toDF("id").localCheckpoint()
    samples(chainGen, 8).foreach { case (_, simSegs) =>
      val segs = toSegments(simSegs)
      val (liveAt, captured) = simulate(simSegs)
      Chains.effective(segs).zipWithIndex.foreach {
        case ((Delete(_, _), eff), v) =>
          val got = ids.where(eff).collect().map(_.getLong(0)).toSet
          assert(got === captured(v),
            s"v$v capture mismatch on chain $simSegs")
        case _ => ()
      }
      segs.indices.foreach { v =>
        val got = ids.where(Chains.liveAsOf(segs, v.toLong))
          .collect().map(_.getLong(0)).toSet
        assert(got === liveAt(v),
          s"liveAsOf($v) mismatch on chain $simSegs")
      }
    }
  }

  test("global tombstone masking is exact on generated chains: " +
      "(union of appends <= v) ANTI-JOIN (union of captured deletes " +
      "<= v) equals the simulator's live set — the one-broadcast-mask " +
      "identity the as-of reads rely on") {
    val ids = (0L until 60L).toDF("id").localCheckpoint()
    samples(chainGen, 8).foreach { case (_, simSegs) =>
      val segs = toSegments(simSegs)
      val (liveAt, captured) = simulate(simSegs)
      val eff = Chains.effective(segs)
      segs.indices.foreach { v =>
        val apps = eff.take(v + 1).collect {
          case (Append(_, slice), _) => ids.where(slice) }
        val dels = captured.take(v + 1).flatten.toSeq
        val folded = apps.reduce(_.unionByName(_))
        val masked =
          if (dels.isEmpty) folded
          else folded.join(broadcast(dels.toDF("id")), Seq("id"),
            "left_anti")
        val got = masked.collect().map(_.getLong(0)).toSet
        assert(got === liveAt(v),
          s"global mask at v$v diverges from per-step deletion on " +
            s"chain $simSegs")
      }
    }
  }
}
