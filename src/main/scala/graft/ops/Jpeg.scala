package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL baseline-JPEG (grayscale, sequential DCT, Annex-K huffman
  * tables) encoder + decoder — closing the one labeled stub in the
  * multimodal matrix (PPM/BMP/PNG/WAV are real since rounds 8/9).
  *
  * Why this is oracle material when "JPEG decode" generally is not:
  * lossy JPEG is implementation-defined ONLY in its DCT rounding —
  * the entropy layer (huffman + zigzag + byte stuffing) is lossless
  * and exact. This codec pins the transform to a FIXED integer basis:
  * B(u,x) = round(0.5 · c(u) · cos((2x+1)uπ/16) · 2¹²) with
  * c(0) = 1/√2, c(u>0) = 1 (computed once with StrictMath — bit-exact
  * by JVM spec — and interpolated as INTEGER literals into the DuckDB
  * oracle, one source of truth), every divide a floor-division with
  * explicit half-up rounding. Decoded pixels are then a pure integer
  * function of the payload bytes, replayable by the oracle as
  * rule → FDCT → quantize → dequantize → IDCT → clamp — which means a
  * single wrong huffman bit, zigzag slot, or stuffing byte in the REAL
  * bitstream round-trip shows up as a hash mismatch.
  *
  * Scope (documented, like the other codecs): single-component
  * (grayscale) baseline sequential, dimensions multiples of 8, no
  * restart markers — the JFIF structure (SOI/APP0/DQT/SOF0/DHT/SOS/
  * EOI, stuffed entropy bytes) is real and the decoder walks it from
  * the stream's own tables, so it also reads third-party grayscale
  * baseline files (their pixels exact under THIS basis's IDCT).
  *
  * Scale shape: identical to [[Multimodal.decodeImages]] — payloads
  * stay opaque binary until the per-partition batch boundary; decode
  * is scan-local, no shuffle.
  */
object Jpeg {

  // ---- fixed integer transform ------------------------------------------

  /** Fixed-point scale of the DCT basis (2^12). */
  val BScale = 4096
  private val BScale2 = BScale.toLong * BScale // 2^24

  /** The fixed integer DCT-II basis, B(u)(x) = round(0.5·c(u)·
    * cos((2x+1)uπ/16)·4096). Orthonormal up to the fixed-point
    * rounding; shared verbatim with the oracle SQL.
    */
  val Basis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    StrictMath.round(
      0.5 * c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        * BScale)
  }

  /** Annex-K luminance quantization table (quality ~50), zigzag-flat
    * in NATURAL (row-major) order here.
    */
  val QTable: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** JPEG zigzag order: Zigzag(k) = natural index of the k-th zigzag
    * coefficient. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** floor(a / b) with b > 0 — both engines share this exact form
    * (Scala Math.floorDiv; SQL (a - ((a % b + b) % b)) / b). */
  @inline private def fdiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** Round-half-up division: floor((2a + b) / 2b), b > 0. */
  @inline def divHalfUp(a: Long, b: Long): Long = fdiv(2 * a + b, 2 * b)

  /** Forward transform of one level-shifted 8×8 block (values −128..127,
    * natural order) → integer coefficients (natural order). */
  def fdct(block: Array[Long]): Array[Long] = {
    val out = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var t = 0L
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            t += block(x * 8 + y) * Basis(u)(x) * Basis(v)(y)
            y += 1
          }
          x += 1
        }
        out(u * 8 + v) = divHalfUp(t, BScale2)
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse transform: dequantized coefficients (natural order) →
    * clamped 0..255 pixels (natural order, +128 level shift). */
  def idct(coef: Array[Long]): Array[Int] = {
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var t = 0L
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            t += coef(u * 8 + v) * Basis(u)(x) * Basis(v)(y)
            v += 1
          }
          u += 1
        }
        val p = divHalfUp(t, BScale2) + 128
        out(x * 8 + y) = if (p < 0) 0 else if (p > 255) 255 else p.toInt
        y += 1
      }
      x += 1
    }
    out
  }

  /** Quantize with round-half-up-magnitude matching the oracle:
    * q = sign(F) · floor((2|F| + Q) / 2Q). */
  @inline def quantize(f: Long, q: Int): Long = {
    val a = if (f < 0) -f else f
    val m = fdiv(2 * a + q, 2L * q)
    if (f < 0) -m else m
  }

  // ---- Annex-K huffman tables (luminance DC + AC) -----------------------

  // (bits, values) per JPEG spec Table K.3 / K.5
  private val DcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical code assignment: (code, length) per symbol value. */
  private def buildCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private val DcCodes = buildCodes(DcBits, DcVals)
  private val AcCodes = buildCodes(AcBits, AcVals)

  // ---- bit IO -----------------------------------------------------------

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        bos.write(b)
        if (b == 0xff) bos.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Array[Byte] = {
      if (nBits > 0) put(0x7f, 8 - nBits) // pad with 1s per spec
      bos.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    /** Read one bit; -1 on a marker / end of stream. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed ff
          else return -1 // a real marker: stop
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      ((acc >> nBits) & 1).toInt
    }
  }

  /** Magnitude category (JPEG "SSSS") of a value. */
  @inline private def category(v: Long): Int = {
    var a = if (v < 0) -v else v
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** The "additional bits" encoding: v >= 0 → v; v < 0 → v + 2^s − 1. */
  @inline private def mantissa(v: Long, s: Int): Int =
    (if (v >= 0) v else v + (1L << s) - 1).toInt

  @inline private def extend(bits: Int, s: Int): Long =
    if (s == 0) 0L
    else if (bits < (1 << (s - 1))) bits.toLong - (1L << s) + 1
    else bits.toLong

  // ---- encoder ----------------------------------------------------------

  /** Encode an 8-bit grayscale image (row-major, dims multiples of 8)
    * as a real baseline JFIF stream. */
  def encode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0,
      s"dims must be multiples of 8, got ${width}x$height")
    require(gray.length == width * height,
      s"need ${width * height} bytes, got ${gray.length}")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    marker(0xe0); w16(16) // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    marker(0xdb); w16(67); w8(0) // DQT, table 0, 8-bit
    var z = 0
    while (z < 64) { w8(QTable(Zigzag(z))); z += 1 }
    marker(0xc0); w16(11) // SOF0: 8-bit, 1 component
    w8(8); w16(height); w16(width); w8(1)
    w8(1); w8(0x11); w8(0) // comp 1, 1x1 sampling, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); w16(19 + vals.length); w8(cls << 4)
      var i = 1
      while (i <= 16) { w8(bits(i)); i += 1 }
      vals.foreach(w8)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda); w16(8) // SOS
    w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
    // entropy-coded MCUs, row-major block order
    val bw = new BitWriter
    var prevDc = 0L
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        val block = new Array[Long](64)
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            block(x * 8 + y) =
              (gray((by * 8 + x) * width + bx * 8 + y) & 0xff) - 128L
            y += 1
          }
          x += 1
        }
        val coef = fdct(block)
        val q = new Array[Long](64)
        var i = 0
        while (i < 64) { q(i) = quantize(coef(i), QTable(i)); i += 1 }
        // DC
        val diff = q(0) - prevDc
        prevDc = q(0)
        val s = category(diff)
        val (dcode, dlen) = DcCodes(s)
        bw.put(dcode, dlen)
        if (s > 0) bw.put(mantissa(diff, s), s)
        // AC, zigzag
        var run = 0
        var k = 1
        while (k < 64) {
          val v = q(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); run -= 16
            }
            val ss = category(v)
            val (ac, al) = AcCodes((run << 4) | ss)
            bw.put(ac, al)
            bw.put(mantissa(v, ss), ss)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) }
        bx += 1
      }
      by += 1
    }
    out.write(bw.flush())
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----------------------------------------------------------

  /** Decoded grayscale raster. */
  case class GrayRaster(width: Int, height: Int, pixels: Array[Byte])

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode: per length, [first code, last code), value base
    private val firstCode = new Array[Int](17)
    private val firstVal = new Array[Int](17)
    private val count = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        firstCode(len) = code; firstVal(len) = k; count(len) = bits(len)
        code = (code + bits(len)) << 1; k += bits(len)
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (count(len) > 0 && code - firstCode(len) < count(len))
          return vals(firstVal(len) + (code - firstCode(len)))
      }
      -1
    }
  }

  /** Decode a baseline grayscale JFIF stream produced by [[encode]] (or
    * any single-component baseline file without restart markers). The
    * quant + huffman tables are read from the STREAM, not assumed.
    * Returns None on malformed structure — never a guess.
    */
  def decode(payload: Array[Byte]): Option[GrayRaster] = {
    if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
      (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    var qt: Array[Int] = null // natural order
    var dcT: HuffTable = null
    var acT: HuffTable = null
    var width = 0
    var height = 0
    def u16(o: Int): Int =
      ((payload(o) & 0xff) << 8) | (payload(o + 1) & 0xff)
    try {
      while (pos + 4 <= payload.length) {
        if ((payload(pos) & 0xff) != 0xff) return None
        val m = payload(pos + 1) & 0xff
        if (m == 0xd9) return None // EOI before SOS
        val len = u16(pos + 2)
        val seg = pos + 4
        m match {
          case 0xdb =>
            var o = seg
            while (o < seg + len - 2) {
              val pq = (payload(o) & 0xff) >> 4
              val tq = payload(o) & 0x0f
              if (pq != 0) return None // 8-bit tables only
              if (tq == 0) {
                qt = new Array[Int](64)
                var z = 0
                while (z < 64) {
                  qt(Zigzag(z)) = payload(o + 1 + z) & 0xff; z += 1
                }
              }
              o += 65
            }
          case 0xc0 =>
            if ((payload(seg) & 0xff) != 8) return None
            height = u16(seg + 1); width = u16(seg + 3)
            if ((payload(seg + 5) & 0xff) != 1) return None // 1 component
            if ((payload(seg + 7) & 0xff) != 0x11) return None
            if (width % 8 != 0 || height % 8 != 0) return None
            if (width == 0 || height == 0) return None
            // a third-party header's two dim fields must not drive an
            // Int-overflowing (or multi-GB) allocation: the raster
            // cannot plausibly exceed the entropy stream that encodes
            // it, so bound pixels by payload size (64 px max per ~1.6
            // bytes of minimal MCU) — rejects 65528x65528 bombs while
            // admitting any real file
            if (width.toLong * height > 64L * payload.length) return None
            // the payload bound alone admits a >2 GiB dims product on a
            // ~33 MB+ payload, and Int multiplication in the raster
            // allocation would wrap negative — reject explicitly
            if (width.toLong * height > Int.MaxValue) return None
          case 0xc4 =>
            var o = seg
            while (o < seg + len - 2) {
              val cls = (payload(o) & 0xff) >> 4
              val bits = new Array[Int](17)
              var tot = 0
              var i = 1
              while (i <= 16) {
                bits(i) = payload(o + i) & 0xff; tot += bits(i); i += 1
              }
              val vals = new Array[Int](tot)
              var k = 0
              while (k < tot) {
                vals(k) = payload(o + 17 + k) & 0xff; k += 1
              }
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcT = t else acT = t
              o += 17 + tot
            }
          case 0xda =>
            if (qt == null || dcT == null || acT == null ||
              width == 0) return None
            val scanStart = seg + (payload(seg) & 0xff) * 2 + 4
            val br = new BitReader(payload, scanStart)
            val px = new Array[Byte](width * height)
            var prevDc = 0L
            var by = 0
            while (by < height / 8) {
              var bx = 0
              while (bx < width / 8) {
                val q = new Array[Long](64)
                val s = dcT.decode(br)
                // a hostile DHT can emit any raw byte as the category;
                // baseline spec caps DC SSSS at 11 — beyond that the
                // Int shifts in extend() wrap silently into garbage
                // pixels instead of the documented None-never-a-guess
                if (s < 0 || s > 11) return None
                var bits = 0
                var i = 0
                while (i < s) {
                  val b = br.bit(); if (b < 0) return None
                  bits = (bits << 1) | b; i += 1
                }
                prevDc += extend(bits, s)
                q(0) = prevDc
                var k = 1
                var ok = true
                while (k < 64 && ok) {
                  val rs = acT.decode(br)
                  if (rs < 0) return None
                  if (rs == 0) ok = false // EOB
                  else if (rs == 0xf0) k += 16
                  else {
                    k += rs >> 4
                    val ss = rs & 0x0f
                    // baseline spec caps AC SSSS at 10 (F.1.2.2.1)
                    if (k > 63 || ss > 10) return None
                    var ab = 0
                    var j = 0
                    while (j < ss) {
                      val b = br.bit(); if (b < 0) return None
                      ab = (ab << 1) | b; j += 1
                    }
                    q(Zigzag(k)) = extend(ab, ss)
                    k += 1
                  }
                }
                val deq = new Array[Long](64)
                var n = 0
                while (n < 64) { deq(n) = q(n) * qt(n); n += 1 }
                val pix = idct(deq)
                var x = 0
                while (x < 8) {
                  var y = 0
                  while (y < 8) {
                    px((by * 8 + x) * width + bx * 8 + y) =
                      pix(x * 8 + y).toByte
                    y += 1
                  }
                  x += 1
                }
                bx += 1
              }
              by += 1
            }
            return Some(GrayRaster(width, height, px))
          case _ => () // skip APPn/COM/...
        }
        pos = seg + len - 2
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  // ---- harness plumbing -------------------------------------------------

  /** Per-image decoded statistics, integer-exact but the mean. */
  case class JpegStats(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, n_pixels: Long,
                       sum_gray: Long, mean_gray: Double)

  /** Deterministic grayscale rule shared with the oracle:
    * gray(p) = (doc_id + 3p) % 256 over w×h, w = 8·(1 + doc_id % 2),
    * h = 8·(1 + doc_id % 3). */
  def ruleDims(docId: Long): (Int, Int) =
    (8 * (1 + (docId % 2).toInt), 8 * (1 + (docId % 3).toInt))

  def ruleGray(docId: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(p => ((docId + 3L * p) % 256).toByte)

  /** Real JFIF payloads built from the rule — the q-fixture builder
    * (encode is part of the round-trip under test). */
  def jpegMediaFromDocuments(docs: DataFrame)
      : Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val (w, h) = ruleDims(id)
        Multimodal.MediaRow(id, encode(w, h, ruleGray(id, w, h)), src)
      }
  }

  /** Partition-parallel REAL JPEG decode + stats. */
  def decodeJpegs(ds: Dataset[Multimodal.MediaRow]): Dataset[JpegStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val g = decode(r.payload).getOrElse(
        throw new IllegalArgumentException(
          s"media ${r.media_id}: not a decodable baseline JPEG"))
      var s = 0L
      var p = 0
      while (p < g.pixels.length) { s += g.pixels(p) & 0xff; p += 1 }
      val n = g.width.toLong * g.height
      JpegStats(r.media_id, r.kind, r.payload.length.toLong,
        g.width, g.height, n, s, s.toDouble / n)
    })
  }
}
