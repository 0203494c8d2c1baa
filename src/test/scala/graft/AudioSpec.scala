package graft

import graft.ops.Audio
import graft.ops.Multimodal.MediaRow

/** WAV/PCM16 codec: lossless round-trip, chunk walking, hand-checked
  * features, malformed-payload rejection.
  */
class AudioSpec extends SparkSpec {

  private val samples = Array[Short](100, -200, 300, 0, -50)

  test("WAV round-trip recovers exact samples; stats hand-check") {
    val wav = Audio.wavEncode(8000, samples)
    assert(wav.length === 44 + 10)
    val pcm = Audio.decodeWav(wav).get
    assert(pcm.sampleRate === 8000 && pcm.channels === 1)
    assert(pcm.samples.toSeq === samples.toSeq)
    val st = Audio.pcmStats(7L, "wav", pcm)
    assert(st.n_samples === 5L && st.sample_rate === 8000)
    assert(st.duration_ms === 0L) // 5 * 1000 / 8000 = 0 (integer div)
    assert(st.peak_abs === 300L)
    // sign pairs: (+,-) (-,+) (+,0/nonneg? 0 counts non-negative: no)
    // 100,-200 cross; -200,300 cross; 300,0 no; 0,-50 cross
    assert(st.n_zero_cross === 3L)
    assert(st.mean_sample === 30.0) // (100-200+300+0-50)/5 = 30
    // rms = sqrt((10000+40000+90000+0+2500)/5) = sqrt(28500)
    assert(st.rms === math.floor(math.sqrt(28500.0) * 10000) / 10000)
  }

  test("energyFingerprint: hand-checked bits; identical samples give " +
    "identical fingerprints, a changed sample flips them") {
    // win=2 energies: (100,-200)->50000, (300,0)->90000 -> rising: bit 0
    val (nw, f) = Audio.energyFingerprint(
      Audio.Pcm(8000, 1, samples), win = 2)
    assert(nw === 2L && f === 1L)
    val same = Audio.energyFingerprint(
      Audio.Pcm(8000, 1, samples.clone()), win = 2)
    assert(same === ((2L, 1L)))
    val changed = samples.clone(); changed(2) = 10
    // energies: 50000, 100 -> falling: bit 0 clear
    assert(Audio.energyFingerprint(
      Audio.Pcm(8000, 1, changed), win = 2)._2 === 0L)
  }

  test("chunk walker skips LIST chunks and pads odd sizes; " +
    "non-subset payloads rejected") {
    val wav = Audio.wavEncode(8000, samples)
    // splice an odd-sized junk chunk between fmt and data
    val junk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte]('a', 'b', 'c', 0)) // 3 bytes + pad
    val spliced = wav.take(36) ++ junk.array() ++ wav.drop(36)
    assert(Audio.decodeWav(spliced).get.samples.toSeq === samples.toSeq)

    assert(Audio.decodeWav("RIFX".getBytes ++ wav.drop(4)).isEmpty)
    assert(Audio.decodeWav(wav.take(40)).isEmpty) // truncated
    val mulaw = wav.clone(); mulaw(20) = 7 // format code != PCM
    assert(Audio.decodeWav(mulaw).isEmpty)
    val bits8 = wav.clone(); bits8(34) = 8 // 8-bit outside subset
    assert(Audio.decodeWav(bits8).isEmpty)
    // stereo is out-of-subset: pcmStats' duration/crossings assume one
    // stream, so a 2-channel file must be refused, not mis-analyzed
    val stereo = wav.clone(); stereo(22) = 2
    assert(Audio.decodeWav(stereo).isEmpty)
  }

  test("decodeAudio over the deterministic fixture (hand-checked for " +
    "one doc) and loud failure on non-WAV payloads") {
    import spark.implicits._
    val docs = Seq((7L, "x", "en", "wav", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val st = Audio.decodeAudio(Audio.wavMediaFromDocuments(docs))
      .collect().head
    // id=7: n = 50 + 7%30 = 57; s_i = (217 + 17i) % 4001 - 2000
    assert(st.n_samples === 57L && st.sample_rate === 8000)
    assert(st.duration_ms === 57L * 1000 / 8000)
    val exp = Array.tabulate(57)(i => (7L * 31 + i * 17) % 4001 - 2000)
    assert(st.peak_abs === exp.map(math.abs).max)
    assert(st.n_zero_cross ===
      (1 until 57).count(i => (exp(i - 1) < 0) != (exp(i) < 0)).toLong)

    val bad = Seq(MediaRow(1L, "not audio".getBytes, "x")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Audio.decodeAudio(bad).collect()
    }
    assert(e.getMessage != null)
  }
}
