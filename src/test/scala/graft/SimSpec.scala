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

  test("PPM decoder: known pixel values round-trip, comments skipped, " +
      "malformed payloads rejected") {
    val rgb = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
      .map(_.toByte)
    val ppm = Multimodal.ppmEncode(2, 2, rgb)
    val r = Multimodal.decodePpm(ppm).get
    assert(r.width === 2 && r.height === 2)
    assert(r.pixels.toSeq === rgb.toSeq)
    val stats = Multimodal.rasterStats(1L, "img", ppm.length.toLong, r)
    assert(stats.mean_r === 55.0 && stats.mean_g === 65.0 &&
      stats.mean_b === 75.0)
    assert(stats.n_pixels === 4L && stats.n_bytes === ppm.length.toLong)
    // header comments are part of the netpbm spec
    val commented =
      "P6\n# a comment\n2 2\n# another\n255\n".getBytes("US-ASCII") ++ rgb
    assert(Multimodal.decodePpm(commented).get.pixels.toSeq === rgb.toSeq)
    // malformed: wrong magic, truncated raster, maxval out of range
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes ++ rgb).isEmpty)
    assert(Multimodal.decodePpm(ppm.dropRight(1)).isEmpty)
    assert(Multimodal.decodePpm(
      "P6\n2 2\n65535\n".getBytes ++ rgb ++ rgb).isEmpty)
  }

  test("BMP decoder: bottom-up BGR padded rows normalize to the same " +
      "raster as the equivalent PPM") {
    def bmpEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val data = new Array[Byte](rowSize * h)
      for (y <- 0 until h; x <- 0 until w) {
        val src = (y * w + x) * 3
        val dst = (h - 1 - y) * rowSize + x * 3
        data(dst) = rgb(src + 2)
        data(dst + 1) = rgb(src + 1)
        data(dst + 2) = rgb(src)
      }
      val bb = java.nio.ByteBuffer.allocate(54 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + data.length)
        .putInt(0).putInt(54)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(data.length)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(data)
      bb.array()
    }
    val rgb = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
      .map(_.toByte)
    val bmp = bmpEncode(2, 2, rgb)
    val r = Multimodal.decodeBmp(bmp).get
    assert(r.width === 2 && r.height === 2)
    assert(r.pixels.toSeq ===
      Multimodal.decodePpm(Multimodal.ppmEncode(2, 2, rgb)).get.pixels.toSeq)
    // outside the subset: 8bpp and compressed are refused, not guessed
    val bad = bmp.clone(); bad(28) = 8
    assert(Multimodal.decodeBmp(bad).isEmpty)
  }

  test("PNG codec: lossless round-trip through javax.imageio matches " +
      "the equivalent PPM raster; non-PNG payloads rejected") {
    val rgb = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
      .map(_.toByte)
    val png = Multimodal.pngEncode(2, 2, rgb)
    // real PNG signature on the wire
    assert((png(0) & 0xFF) === 0x89 &&
      new String(png.slice(1, 4), "US-ASCII") === "PNG")
    val r = Multimodal.decodePng(png).get
    assert(r.width === 2 && r.height === 2)
    assert(r.pixels.toSeq ===
      Multimodal.decodePpm(Multimodal.ppmEncode(2, 2, rgb)).get.pixels.toSeq)
    // PPM bytes are not PNG; truncated PNG fails the reader, not us
    assert(Multimodal.decodePng(Multimodal.ppmEncode(2, 2, rgb)).isEmpty)
    assert(Multimodal.decodePng(png.take(16)).isEmpty)
  }

  test("aHash36: all-equal raster hashes to 0 (strict threshold); " +
      "half-bright raster sets exactly the bright cells; shift " +
      "invariance across brightness") {
    import graft.ops.Multimodal.Raster
    val flat = Raster(8, 8, Array.fill(8 * 8 * 3)(100.toByte))
    assert(Multimodal.aHash36(flat) === 0L)
    // left half dark (0), right half bright (200): grid cols 0-2 sample
    // x = (j*8)/6 in {0,1,2} -> dark; cols 3-5 -> x in {4,5,6} -> bright
    val half = Raster(8, 8, Array.tabulate(8 * 8 * 3) { k =>
      val x = (k / 3) % 8
      if (x < 4) 0.toByte else 200.toByte
    })
    val h = Multimodal.aHash36(half)
    val bits = (0 until 36).filter(b => (h >> b & 1L) == 1L)
    assert(bits === (0 until 36).filter(b => b % 6 >= 3),
      s"bright-column bits wrong: $bits")
    // adding constant brightness to every pixel must not change the hash
    val shifted = Raster(8, 8, half.pixels.map(p => ((p & 0xFF) + 30).toByte))
    assert(Multimodal.aHash36(shifted) === h)
  }

  test("decodeImages over the deterministic PPM fixture computes real " +
      "per-pixel stats (hand-checked for one doc)") {
    val docs = Seq((7L, "x", "en", "img", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeImages(
      Multimodal.ppmMediaFromDocuments(docs)).collect().head
    // id=7: w = 4 + 7%5 = 6, h = 3 + 7%4 = 6, byte j = (7 + j) % 256
    assert(out.width === 6 && out.height === 6 && out.n_pixels === 36L)
    assert(out.n_bytes === 11L + 3 * 36)
    val exp = (ch: Int) =>
      (0 until 36).map(p => (7 + 3 * p + ch) % 256).sum.toDouble / 36
    assert(out.mean_r === exp(0) && out.mean_g === exp(1) &&
      out.mean_b === exp(2))
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

  test("quantizeInt8: max elementwise error bounded by scale/2, extreme " +
      "element reconstructs exactly, zero vector hits the convention") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, -1.0f, 0.0f)),
      (2L, Array(0.003f, -0.001f, 0.002f, 0.0015f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Sim.quantizeInt8(vecs, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Int, Double, Double, Double, Double)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (id, nDims, qscale, maxErr, l2, cosR) =>
      assert(nDims === 4, s"vec $id")
      // floor-at-8dp can only shrink values, so the bound still holds
      assert(maxErr <= qscale / 2 + 1e-8, s"vec $id: $maxErr > $qscale/2")
      assert(l2 >= 0.0 && cosR <= 1.0, s"vec $id")
    }
    // +-maxabs maps to exactly +-127 and 0 to 0, so vec 1 reconstructs
    // losslessly (0.5 would NOT: 63.5 rounds up — only 0 and +-maxabs
    // are guaranteed exact)
    // cos floors at 6dp, and an ulp-below-1 quotient truncates to
    // 0.999999 — the error metrics are the exactness claim, the cosine
    // only corroborates
    assert(byId(1L)._4 === 0.0 && byId(1L)._5 === 0.0 &&
      byId(1L)._6 >= 0.999999)
    // near-parallel reconstruction even for sub-scale values
    assert(byId(2L)._6 >= 0.99, s"cos_recon ${byId(2L)._6}")
    // zero vector: scale 0, no error, cosine 1 by convention
    assert(byId(3L) === ((3L, 4, 0.0, 0.0, 0.0, 1.0)))
  }
}
