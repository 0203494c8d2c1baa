package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{Multimodal, Sim}

/** Similarity search over embeddings + multimodal plumbing. */
class SimSpec extends SparkSpec {
  import spark.implicits._

  // unit-ish vectors with obvious geometry
  private def emb: DataFrame = Seq(
    (1L, Seq(1f, 0f, 0f), 0),
    (2L, Seq(0.9f, 0.1f, 0f), 0),   // close to 1
    (3L, Seq(0f, 1f, 0f), 0),       // orthogonal to 1
    (4L, Seq(-1f, 0f, 0f), 1),      // opposite of 1, other cell
    (5L, Seq(1f, 0.01f, 0f), 0)     // closest to 1
  ).toDF("vec_id", "embedding", "label")

  test("topK ranks by cosine desc with id tie-break, excludes self") {
    val got = Sim.topK(emb.where($"vec_id" === 1L), emb, 3)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.map(_._2) === Seq(5L, 2L, 3L))
    assert(got.map(_._4) === Seq(1, 2, 3))
    assert(got.head._3 > 0.99)
    assert(got.last._3 === 0.0)
  }

  test("topKIvf only probes the query's own cell") {
    val got = Sim.topKIvf(emb.where($"vec_id" === 1L), emb, 10, "label")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.map(_._2).toSet === Set(2L, 3L, 5L)) // 4 is in cell 1
  }

  test("nearDupPairs finds high-cosine pairs within cells only") {
    val got = Sim.nearDupPairs(emb, 0.9, "label")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("lshBucket groups cosine-identical vectors; topKLsh self-consistent") {
    val planes = Sim.hyperplanes(bits = 4, dim = 3)
    val buckets = emb.select($"vec_id",
        Sim.lshBucket($"embedding", planes).as("b"))
      .as[(Long, Int)].collect().toMap
    // parallel vectors (1 and 5) always share a bucket; antiparallel (4)
    // lands in the complement bucket
    assert(buckets(1L) === buckets(5L))
    assert(buckets(4L) === (~buckets(1L) & 0xf))
    val got = Sim.topKLsh(emb.where($"vec_id" === 1L), emb, 3, bits = 4)
      .as[(Long, Long, Double, Int)].collect()
    // every returned candidate shares vec 1's bucket and ranks by cosine
    assert(got.forall(r => buckets(r._2) === buckets(1L)))
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.reverse.toSeq)
  }

  test("multimodal resize + frameSample plumbing") {
    val docs = Seq((1L, "abcdefghij" * 10, "en", "vid", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(docs)
    val resized = Multimodal.resize(media, 64, 64).collect().head
    assert(resized.width === 64 && resized.height === 64)
    assert(resized.payload.length === 64) // 64*64/64
    val frames = Multimodal.frameSample(media, frameBytes = 16, everyNth = 2)
      .collect()
    // 100 bytes → 7 frames (last partial), keep idx 0,2,4,6
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    assert(frames.take(3).forall(_.n_bytes === 16) &&
      frames.last.n_bytes === 4)
    assert(frames.map(_.fingerprint).distinct.length === 4)
  }

  test("multimodal decode: schema and deterministic stub features") {
    val docs = Seq((7L, "hello world", "en", "srcX", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decode(Multimodal.mediaFromDocuments(docs)).collect()
    assert(out.length === 1)
    val f = out.head
    assert(f.media_id === 7L && f.kind === "srcX" && f.n_bytes === 11L)
    assert(f.width === 12 && f.height === 12)
    assert(f.fingerprint === "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }
}
