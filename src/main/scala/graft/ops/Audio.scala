package graft.ops

import org.apache.spark.sql.Dataset

import graft.ops.Multimodal.MediaRow

/** Audio modality — REAL pure-JVM WAV/PCM16 codec (the PPM of audio:
  * RIFF is a public, header+raster-simple container; PCM samples are
  * stored verbatim, so decode is exact and oracle-replayable).
  * Complements [[Multimodal]]'s image codecs: audio travels as the same
  * opaque `binary` column + typed metadata, decoded partition-parallel.
  *
  * Feature exactness contract (the q70 image-stats design, applied to
  * audio): every statistic is either a 64-bit integer (sample counts,
  * peak, zero crossings, integer-division duration) or one double
  * produced by a single division / IEEE-exact sqrt of integer sums —
  * so a SQL oracle replaying the generating rule matches bit-for-bit.
  *
  * Compressed audio (MP3/AAC/Opus) is out of scope the same way JPEG
  * is for images: lossy decode is implementation-defined, so its sample
  * values are bad oracle material; the plumbing is format-agnostic.
  *
  * Reference contrast: the reference has no binary columns at all (its
  * one payload is Reddit post text, reddit_etl_proj/etl_pipeline.py:53);
  * this is north-star extension surface.
  */
object Audio {

  /** Decoded PCM stream: rate, channel count, interleaved samples. */
  case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** REAL WAV (RIFF/WAVE, PCM16 mono) encoder — fixture builder for
    * specs/queries; any spec-compliant reader recovers these exact
    * samples.
    */
  def wavEncode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)               // audio format: PCM
      .putShort(1)               // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)    // byte rate
      .putShort(2)               // block align
      .putShort(16)              // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL WAV decoder for the PCM16 subset (format spec: RIFF/WAVE,
    * public): walks the chunk list (chunks are word-aligned — odd-sized
    * ones carry a pad byte), requires a PCM16 MONO `fmt ` chunk before
    * `data`, and returns the verbatim samples. None on anything outside
    * the subset (wrong magic, compressed format codes, other bit
    * depths, multi-channel, truncated data) — never a guess.
    */
  def decodeWav(payload: Array[Byte]): Option[Pcm] = {
    def u16(o: Int): Int =
      (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    while (i + 8 <= payload.length) {
      val id = tag(i)
      val sz = u32(i + 4).toInt
      if (sz < 0 || i + 8 + sz > payload.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val audioFormat = u16(i + 8)
          val channels = u16(i + 10)
          val rate = u32(i + 12).toInt
          val bits = u16(i + 22)
          // format 1 = uncompressed PCM; 16-bit MONO is the subset —
          // pcmStats treats samples as one stream (duration = n/rate,
          // crossings over consecutive samples), which is only correct
          // single-channel; stereo is out-of-subset, refused loudly
          // rather than decoded into stats off by the channel count
          if (audioFormat != 1 || bits != 16 || channels != 1 ||
            rate <= 0) return None
          fmt = Some((rate, channels))
        case "data" =>
          return fmt.map { case (rate, channels) =>
            val n = sz / 2
            val out = new Array[Short](n)
            var j = 0
            while (j < n) {
              out(j) = u16(i + 8 + j * 2).toShort
              j += 1
            }
            Pcm(rate, channels, out)
          }
        case _ => // LIST/INFO/fact/… chunks are skipped, not errors
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    None
  }

  /** Exact audio features of a decoded PCM stream. All integer sums;
    * the two doubles are one division (mean) and one IEEE sqrt of an
    * integer ratio (rms), floored at 4 dp by the caller's contract.
    */
  case class AudioStats(media_id: Long, kind: String, sample_rate: Int,
                        n_samples: Long, duration_ms: Long,
                        peak_abs: Long, n_zero_cross: Long,
                        mean_sample: Double, rms: Double)

  def pcmStats(id: Long, kind: String, p: Pcm): AudioStats = {
    val n = p.samples.length.toLong
    var (sum, sumSq, peak, zc) = (0L, 0L, 0L, 0L)
    var j = 0
    while (j < p.samples.length) {
      val s = p.samples(j).toLong
      sum += s
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      // crossing = consecutive samples on strictly opposite sides of 0
      // (s == 0 counts as non-negative — pinned so the oracle agrees)
      if (j > 0 && ((p.samples(j - 1) < 0) != (s < 0))) zc += 1
      j += 1
    }
    AudioStats(id, kind, p.sampleRate, n,
      duration_ms = if (p.sampleRate > 0) n * 1000L / p.sampleRate else 0L,
      peak_abs = peak, n_zero_cross = zc,
      mean_sample =
        if (n == 0) 0.0 else Num.floorDouble(sum.toDouble / n, 4),
      rms = if (n == 0) 0.0
        else Num.floorDouble(math.sqrt(sumSq.toDouble / n), 4))
  }

  /** Energy-delta sign fingerprint of a PCM stream — the public
    * audio-fingerprint family's core idea (Haitsma & Kalker 2002 /
    * chromaprint reduce spectral energies to sign-of-delta bits; this
    * is the time-domain form): integer energy per `win`-sample window
    * (Σ s², exact 64-bit), bit w set iff energy rises window w → w+1.
    * Robust to constant gain ≠ 1 only in the spectral form — THIS form
    * is the exact-dup/bit-rot fingerprint (same samples ⇒ same bits),
    * the audio twin of [[Multimodal.aHash36]]'s exact buckets.
    * Bits cap at 63 so the fingerprint stays a signed BIGINT in any
    * engine.
    */
  def energyFingerprint(p: Pcm, win: Int = 2): (Long, Long) = {
    require(win >= 1, s"window must be >= 1, got $win")
    val nw = p.samples.length / win
    val e = Array.tabulate(nw) { w =>
      var acc = 0L
      var k = 0
      while (k < win) {
        val s = p.samples(w * win + k).toLong
        acc += s * s
        k += 1
      }
      acc
    }
    var f = 0L
    var w = 0
    while (w < math.min(nw - 1, 63)) {
      if (e(w + 1) > e(w)) f |= 1L << w
      w += 1
    }
    (nw.toLong, f)
  }

  /** Fingerprinted audio row. */
  case class AudioFingerprint(media_id: Long, kind: String,
                              n_windows: Long, fingerprint: Long)

  /** Partition-parallel decode + fingerprint — the audio signature
    * pass; exact-dup buckets come from a keyed count afterwards.
    */
  def fingerprintAudio(ds: Dataset[MediaRow], win: Int = 2)
      : Dataset[AudioFingerprint] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val pcm = decodeWav(r.payload).getOrElse(
        throw new IllegalArgumentException(
          s"media ${r.media_id}: not a decodable PCM16 WAV payload"))
      val (nw, f) = energyFingerprint(pcm, win)
      AudioFingerprint(r.media_id, r.kind, nw, f)
    })
  }

  /** Partition-parallel REAL audio decode: WAV/PCM16 payloads parsed
    * and measured for real; anything else fails loudly.
    */
  def decodeAudio(ds: Dataset[MediaRow])
      : Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val pcm = decodeWav(r.payload).getOrElse(
        throw new IllegalArgumentException(
          s"media ${r.media_id}: not a decodable PCM16 WAV payload"))
      pcmStats(r.media_id, r.kind, pcm)
    })
  }

  /** Deterministic WAV fixture from the documents table (the corpus
    * ships no audio files): doc id → 8 kHz mono PCM16 with
    * n = 50 + id%30 samples, sample i = ((id*31 + i*17) mod 4001) −
    * 2000. Every payload is a real, spec-valid WAV file; the closed
    * form is what lets the DuckDB oracle replay the decoded statistics
    * exactly (q169) — same design as
    * [[Multimodal.ppmMediaFromDocuments]].
    */
  def wavMediaFromDocuments(
      docs: org.apache.spark.sql.DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val n = (50 + id % 30).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i * 17) % 4001) - 2000).toShort)
        MediaRow(id, wavEncode(8000, samples), src)
      }
  }
}
