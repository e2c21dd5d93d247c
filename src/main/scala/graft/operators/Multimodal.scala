package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.B.9): media as opaque binary
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this container): `FakeCodec` derives deterministic "frames" from the
  * raw bytes. Everything around it — binary column schema, partition
  * batching, feature schema, the mapPartitions signature — is the real
  * production shape: swap `FakeCodec.decode` for a JNI/FFmpeg call and
  * nothing else changes.
  */
object Multimodal {

  /** Typed per-item features extracted from a binary payload. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      checksum: String)

  /** STUB codec: deterministic fake in place of a real media decoder. */
  object FakeCodec {
    val FrameSize = 256

    /** "Decode" a payload into frame count + content checksum. */
    def decode(payload: Array[Byte]): (Long, String) = {
      val nFrames = (payload.length + FrameSize - 1) / FrameSize
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      (nFrames.toLong, hex)
    }
  }

  /** Attach a binary payload column (UTF-8 bytes stand in for media
    * blobs; real pipelines read image/audio bytes the same way).
    */
  def withPayload(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(contentCol), "UTF-8").as("payload"))

  /** Deterministic frame sampling over binary payloads: split into
    * FrameSize-byte frames and keep every `every`-th. A real decoder
    * swaps the substring for codec frame extraction; the explode/batch
    * shape (one row per sampled frame, binary column preserved) is the
    * production-identical part.
    */
  def sampleFrames(payloads: DataFrame, every: Int): DataFrame = {
    val fs = FakeCodec.FrameSize
    payloads
      .withColumn("n_frames", ceil(length(col("payload")) / lit(fs.toDouble)).cast("long"))
      .filter(col("n_frames") > 0) // sequence(0, -1) would run backwards
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(n_frames - 1 AS INT)), i -> substring(payload, i * $fs + 1, $fs))"))
        .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % every === 0)
  }

  /** Typed output of the resize pass. */
  case class ResizedMedia(
      doc_id: Long,
      n_bytes: Long,
      n_resized: Long,
      resized_md5: String)

  /** STUB "resize": keep every `factor`-th byte of the payload — the
    * deterministic stand-in for a resolution downsample (a real codec
    * call replaces the byte loop; the mapPartitions batch shape, binary
    * in/out, and metadata schema are the production-identical part).
    */
  def resize(payloads: DataFrame, factor: Int): DataFrame = {
    implicit val enc = Encoders.product[ResizedMedia]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          md.reset()
          val hex = md.digest(out).map("%02x".format(_)).mkString
          ResizedMedia(id, bytes.length.toLong, out.length.toLong, hex)
        }
      }
      .toDF()
  }

  /** Per-partition batched feature extraction over binary payloads.
    * One codec instance per partition (the expensive init a real
    * decoder would amortize), streaming rows through it.
    */
  def extractFeatures(payloads: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) =>
          val (frames, sum) = FakeCodec.decode(bytes)
          MediaFeatures(id, bytes.length.toLong, frames, sum)
        }
      }
      .toDF()
  }
}
