package graft

import graft.ops.Jpeg

/** Baseline-JPEG codec: real bitstream round-trip against the modeled
  * integer transform chain, structural rejection, and the q234 rule.
  */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  /** The decoded pixels the fixed-basis chain PREDICTS for a raw gray
    * block image — fdct -> quantize -> dequantize -> idct -> clamp,
    * block by block, no entropy coding. decode(encode(x)) must equal
    * this exactly: any disagreement is a bug in the huffman/zigzag/
    * stuffing layer (which is lossless by spec).
    */
  private def modeled(w: Int, h: Int, gray: Array[Byte]): Array[Int] = {
    val out = new Array[Int](w * h)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val block = Array.tabulate(64) { i =>
        (gray((by * 8 + i / 8) * w + bx * 8 + i % 8) & 0xff) - 128L
      }
      val coef = Jpeg.fdct(block)
      val deq = Array.tabulate(64)(i =>
        Jpeg.quantize(coef(i), Jpeg.QTable(i)) * Jpeg.QTable(i))
      val pix = Jpeg.idct(deq)
      for (x <- 0 until 8; y <- 0 until 8)
        out((by * 8 + x) * w + bx * 8 + y) = pix(x * 8 + y)
    }
    out
  }

  test("decode(encode(x)) equals the modeled integer chain exactly — " +
      "the entropy layer is bit-perfect over varied content") {
    for (docId <- Seq(0L, 1L, 7L, 12L, 255L, 100000L)) {
      val (w, h) = Jpeg.ruleDims(docId)
      val gray = Jpeg.ruleGray(docId, w, h)
      val got = Jpeg.decode(Jpeg.encode(w, h, gray))
        .getOrElse(fail(s"doc $docId: decode failed"))
      assert(got.width === w && got.height === h)
      val want = modeled(w, h, gray)
      assert(got.pixels.map(_ & 0xff).toSeq === want.toSeq,
        s"doc $docId: pixel mismatch")
    }
  }

  test("constant-gray block survives losslessly (all-zero AC, DC exact)") {
    val gray = Array.fill(64)(128.toByte)
    val got = Jpeg.decode(Jpeg.encode(8, 8, gray)).get
    assert(got.pixels.forall(b => (b & 0xff) === 128))
  }

  test("encode is deterministic; decode rejects malformed payloads") {
    val (w, h) = (16, 8)
    val gray = Jpeg.ruleGray(5L, w, h)
    val a = Jpeg.encode(w, h, gray)
    val b = Jpeg.encode(w, h, gray)
    assert(a.toSeq === b.toSeq)
    assert(Jpeg.decode(Array[Byte]()) === None)
    assert(Jpeg.decode("not a jpeg".getBytes) === None)
    assert(Jpeg.decode(a.take(20)) === None, "truncated pre-SOS")
    // PNG payload is not baseline JPEG
    val png = graft.ops.Multimodal.pngEncode(4, 3,
      Array.fill(36)(7.toByte))
    assert(Jpeg.decode(png) === None)
  }

  test("quantize matches the oracle's half-up-magnitude closed form") {
    for (f <- Seq(-100L, -9L, -8L, -1L, 0L, 1L, 7L, 8L, 9L, 100L);
         q <- Seq(1, 10, 16)) {
      val a = math.abs(f)
      val expect = (if (f < 0) -1 else 1) * ((2 * a + q) / (2 * q))
      assert(Jpeg.quantize(f, q) === expect, s"f=$f q=$q")
    }
  }

  test("decodeJpegs over the rule fixture: dims follow the rule, " +
      "stats integer-consistent") {
    val docs = Seq((0L, "a"), (1L, "b"), (5L, "c"))
      .toDF("doc_id", "source")
    val got = Jpeg.decodeJpegs(Jpeg.jpegMediaFromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(got.map(r => (r.width, r.height)).toSeq ===
      Seq((8, 8), (16, 16), (16, 24)))
    got.foreach { r =>
      assert(r.n_pixels === r.width.toLong * r.height)
      assert(r.mean_gray === r.sum_gray.toDouble / r.n_pixels)
      assert(r.sum_gray > 0L && r.sum_gray <= 255L * r.n_pixels)
    }
  }
}
