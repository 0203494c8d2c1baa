package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * travel as opaque `binary` columns with typed metadata, processed
  * per-partition in batches.
  *
  * Codec status: PPM (P6) and BMP (24-bit BI_RGB) are REAL pure-JVM
  * decoders (public, header+raster simple); PNG encode/decode and
  * WAV/PCM16 audio (see [[Audio]]) are REAL too — PNG via the JDK's own
  * `javax.imageio` (its PNG reader ships in every JDK; PNG is LOSSLESS,
  * so decoded pixels are exact and oracle-replayable regardless of which
  * encoder produced the file). q70/q168 run these over real image bytes
  * and the oracle replays the per-pixel statistics. JPEG remains a
  * clearly-marked deterministic stub ([[fakeDecode]]) for a narrower
  * reason: `javax.imageio` CAN decode it, but lossy JPEG decode is not
  * bit-stable across JVM vendors/versions (IDCT rounding is
  * implementation-defined), so its pixel values are bad oracle material
  * — the Spark-side plumbing (schema, batch iteration,
  * partition-parallel execution) is identical either way; swap the stub
  * for the imageio call when exactness isn't contractual.
  */
object Multimodal {

  // NOTE: these decoders want imageio's in-memory stream cache
  // (ImageIO.setUseCache(false)) — the default FILE-backed cache costs
  // a temp file per decode for payloads that are already on-heap byte
  // arrays (measured as q168's 2.08x late-session inflation, SCALE.md
  // round-9 drift A/B). The flag is JVM-global, so it is set at the
  // SESSION entry point (graft.Sessions.local) rather than as a
  // class-load side effect of this library object — an embedding
  // application that wants file-backed caching elsewhere keeps it.

  /** Typed media row: the binary payload plus source metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)

  /** Decoded raster: dimensions + 8-bit RGB interleaved pixel bytes. */
  case class Raster(width: Int, height: Int, pixels: Array[Byte])

  /** REAL P6 (binary) PPM encoder — fixture builder for specs/queries. */
  def ppmEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} bytes, got ${rgb.length}")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** REAL P6 PPM decoder (format spec: netpbm, public): ASCII header
    * `P6 <w> <h> <maxval>` with `#` comments and any whitespace, then
    * w*h*3 raw RGB bytes. Returns None on any malformation (wrong magic,
    * maxval != 1..255, truncated raster) — never a guess.
    */
  def decodePpm(payload: Array[Byte]): Option[Raster] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    var i = 2
    // read the next whitespace-delimited ASCII int, skipping # comments
    def nextInt(): Option[Int] = {
      while (i < payload.length &&
        (payload(i).toChar.isWhitespace || payload(i) == '#')) {
        if (payload(i) == '#')
          while (i < payload.length && payload(i) != '\n') i += 1
        else i += 1
      }
      val start = i
      while (i < payload.length && payload(i).toChar.isDigit) i += 1
      if (i == start) None
      else Some(new String(payload, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates maxval from the raster
      if i < payload.length && payload(i).toChar.isWhitespace
      raster = payload.drop(i + 1)
      if raster.length >= w * h * 3
    } yield Raster(w, h, raster.take(w * h * 3))
  }

  /** REAL BMP decoder for the uncompressed 24-bit BI_RGB subset (format
    * spec: Windows BITMAPINFOHEADER, public): rows are stored bottom-up,
    * BGR byte order, each row padded to a 4-byte boundary. Output raster
    * is normalized to top-down RGB so PPM and BMP decode to identical
    * [[Raster]]s for the same image. None on anything outside the subset
    * (compression, other bit depths, top-down negative heights).
    */
  def decodeBmp(payload: Array[Byte]): Option[Raster] = {
    def u16(o: Int): Int =
      (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M')
      return None
    val dataOffset = u32(10).toInt
    val w = u32(18).toInt
    val h = u32(22).toInt // negative (top-down) is outside the subset
    val bpp = u16(28)
    val compression = u32(30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0L) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (payload.length < dataOffset + rowSize * h) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // bottom-up: stored row (h-1-y) is display row y
      val src = dataOffset + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        out((y * w + x) * 3) = payload(src + x * 3 + 2)     // R <- BGR
        out((y * w + x) * 3 + 1) = payload(src + x * 3 + 1) // G
        out((y * w + x) * 3 + 2) = payload(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, out))
  }

  /** REAL PNG encoder via the JDK's `javax.imageio` (PNG writer ships in
    * every JDK — no external codec library). Fixture builder for
    * specs/queries; because PNG is lossless, any spec-compliant decoder
    * recovers these exact RGB bytes.
    */
  def pngEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // bulk setRGB: per-pixel setRGB pays a color-model conversion call
    // per pixel; the packed-int batch form converts the row in one call
    val packed = new Array[Int](width * height)
    var p = 0
    while (p < width * height) {
      packed(p) =
        ((rgb(p * 3) & 0xFF) << 16) | ((rgb(p * 3 + 1) & 0xFF) << 8) |
          (rgb(p * 3 + 2) & 0xFF)
      p += 1
    }
    img.setRGB(0, 0, width, height, packed, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL PNG decoder via the JDK's `javax.imageio`. PNG is lossless, so
    * the decoded raster is exact — unlike JPEG, safe oracle material.
    * Returns None unless the payload carries the 8-byte PNG signature
    * and parses (truncated/corrupt files fail the reader, not us).
    */
  def decodePng(payload: Array[Byte]): Option[Raster] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    if (payload.length < 8 ||
      !(0 until 8).forall(i => (payload(i) & 0xFF) == (sig(i) & 0xFF)))
      return None
    val img = try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
    } catch { case _: java.io.IOException => None }
    img.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val out = new Array[Byte](w * h * 3)
      // bulk getRGB (one color-model conversion pass, not one per pixel)
      val packed = im.getRGB(0, 0, w, h, null, 0, w)
      var p = 0
      while (p < w * h) {
        val argb = packed(p)
        out(p * 3) = ((argb >> 16) & 0xFF).toByte
        out(p * 3 + 1) = ((argb >> 8) & 0xFF).toByte
        out(p * 3 + 2) = (argb & 0xFF).toByte
        p += 1
      }
      Raster(w, h, out)
    }
  }

  /** Per-channel pixel statistics of a decoded raster (the "feature
    * extract" step): exact integer sums divided once, so the doubles are
    * bit-identical to any engine computing the same mean.
    */
  case class ImageStats(media_id: Long, kind: String, n_bytes: Long,
                        width: Int, height: Int, n_pixels: Long,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  def rasterStats(id: Long, kind: String, nBytes: Long,
                  r: Raster): ImageStats = {
    val n = r.width.toLong * r.height
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = 0
    while (p < n) {
      sr += r.pixels(p * 3) & 0xFF
      sg += r.pixels(p * 3 + 1) & 0xFF
      sb += r.pixels(p * 3 + 2) & 0xFF
      p += 1
    }
    ImageStats(id, kind, nBytes, r.width, r.height, n,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Partition-parallel REAL image decode: PPM, BMP, and PNG payloads
    * are parsed and measured for real (format sniffed by magic bytes);
    * anything else fails loudly (the caller routes lossy formats to the
    * labeled stub instead).
    */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val raster = decodePpm(r.payload).orElse(decodeBmp(r.payload))
        .orElse(decodePng(r.payload))
        .getOrElse(throw new IllegalArgumentException(
          s"media ${r.media_id}: not a decodable PPM/BMP/PNG payload"))
      rasterStats(r.media_id, r.kind, r.payload.length.toLong, raster)
    })
  }

  /** 36-bit average perceptual hash of a raster (aHash — the public
    * image near-dup fingerprint family: Niu & Jiao 2008 survey; the
    * imagehash library's average_hash): sample a 6×6 grid by
    * nearest-neighbor downscale (cell (i,j) reads pixel
    * ((i·h)/6, (j·w)/6) — integer-exact for ANY geometry, unlike
    * area-averaging with fractional blocks), gray = r+g+b per sample,
    * bit b set iff gray·36 > Σgray (strict — the all-equal raster
    * hashes to 0). 36 bits keeps every arithmetic step inside a signed
    * 64-bit int in any engine; near-dup = small hamming distance, via
    * the same signature banding as SimHash.
    */
  def aHash36(r: Raster): Long = {
    val g = new Array[Long](36)
    var sum = 0L
    var b = 0
    while (b < 36) {
      val y = ((b / 6) * r.height) / 6
      val x = ((b % 6) * r.width) / 6
      val p = (y * r.width + x) * 3
      g(b) = (r.pixels(p) & 0xFF) + (r.pixels(p + 1) & 0xFF) +
        (r.pixels(p + 2) & 0xFF)
      sum += g(b)
      b += 1
    }
    var h = 0L
    b = 0
    while (b < 36) {
      if (g(b) * 36 > sum) h |= 1L << b
      b += 1
    }
    h
  }

  /** Hashed image row: the raster reduced to its perceptual hash. */
  case class ImageHash(media_id: Long, kind: String, phash: Long)

  /** Partition-parallel decode + perceptual hash: the image analog of
    * the text MinHash signature pass — scan-local, no shuffle; bucket
    * joins over the hash come afterwards on a 36-bit key.
    */
  def perceptualHash(ds: Dataset[MediaRow]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val raster = decodePpm(r.payload).orElse(decodeBmp(r.payload))
        .orElse(decodePng(r.payload))
        .getOrElse(throw new IllegalArgumentException(
          s"media ${r.media_id}: not a decodable PPM/BMP/PNG payload"))
      ImageHash(r.media_id, r.kind, aHash36(raster))
    })
  }

  /** Decoded feature row produced by the (stub) decoder. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, fingerprint: String)

  /** STUB decoder: deterministic fake "decode" of one payload. A real
    * implementation would hand `payload` to an image/audio library here.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
      width = (r.payload.length % 640) + 1,
      height = (r.payload.length % 480) + 1,
      fingerprint = fp)
  }

  /** Partition-parallel decode: batches of rows per partition through the
    * decoder (the batch shape mirrors how a vectorized/py-arrow decoder
    * would consume them; batching matters when the real decoder has
    * per-call setup cost).
    */
  def decode(ds: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.map(fakeDecode) }
    }
  }

  /** Resized media row (payload re-encoded at the target geometry). */
  case class ResizedMedia(media_id: Long, kind: String, width: Int,
                          height: Int, payload: Array[Byte])

  /** STUB resize: deterministic fake re-encode — scales the payload to
    * width*height/64 bytes by cyclic sampling. A real implementation
    * would decode, resample, and re-encode here; the Spark plumbing
    * (typed Dataset, per-partition batching) is the real part.
    */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int)
      : Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val n = math.max(1, width * height / 64)
      val out = new Array[Byte](n)
      if (r.payload.nonEmpty) {
        var i = 0
        while (i < n) { out(i) = r.payload(i % r.payload.length); i += 1 }
      }
      ResizedMedia(r.media_id, r.kind, width, height, out)
    })
  }

  /** One sampled frame of a (fake) video payload. */
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long,
                   fingerprint: String)

  /** STUB frame sampling: treats the payload as fixed-size frames and
    * keeps every `everyNth` one — the flatMap shape (1 row → n frames)
    * and per-frame fingerprints are what a real video pipeline needs from
    * the engine; swap the slicer for a container demuxer to productionize.
    */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int,
                  everyNth: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % everyNth == 0 }
        .map { case (bytes, i) =>
          Frame(r.media_id, i, bytes.length.toLong,
            md.digest(bytes).map("%02x".format(_)).mkString)
        }
    }
  }

  /** Build a media table from the documents fixture: text bytes stand in
    * for the binary payload (UTF-8), `source` for the media kind.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source").as("kind"))
      .as[MediaRow]
  }

  /** Build a table of REAL P6 PPM payloads, deterministically derived
    * from the documents fixture (the corpus ships no image files): doc
    * id → a (4 + id%5) × (3 + id%4) image whose byte j is (id + j) mod
    * 256. Every payload is a real, spec-valid PPM file; the closed-form
    * pixel rule is what lets the DuckDB oracle replay the decoded
    * statistics exactly (q70).
    */
  def ppmMediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val rgb = Array.tabulate(w * h * 3)(j => ((id + j) % 256).toByte)
        MediaRow(id, ppmEncode(w, h, rgb), src)
      }
  }

  /** Same closed-form pixel rule as [[ppmMediaFromDocuments]], encoded
    * as REAL PNG files (q168). PNG's losslessness is what makes this a
    * valid oracle fixture: the encoder's byte stream varies by
    * implementation, but every decoder must recover the exact pixels —
    * so the oracle replays the pixel RULE, never the file bytes.
    */
  def pngMediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val rgb = Array.tabulate(w * h * 3)(j => ((id + j) % 256).toByte)
        MediaRow(id, pngEncode(w, h, rgb), src)
      }
  }
}
