package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * travel as opaque `binary` columns with typed metadata, processed
  * per-partition in batches.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (header-derived dimensions + md5
  * fingerprint) — the Spark-side plumbing (schema, batch iteration,
  * partition-parallel execution) is real. Swap `fakeDecode` for a codec
  * call to productionize.
  */
object Multimodal {

  /** Typed media row: the binary payload plus source metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)

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
}
