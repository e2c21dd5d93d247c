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

  /** REAL pure-JVM image codec: `java.awt.image.BufferedImage` +
    * `javax.imageio.ImageIO` (headless-safe, in every JRE). Unlike
    * [[FakeCodec]], nothing here is a stand-in — payloads are genuine
    * PNG-encoded bitmaps and the resize decodes them and samples
    * actual pixels. The oracle cross-checks REAL output values: the
    * synthetic bitmap's channels follow a closed-form per-pixel
    * formula, so DuckDB recomputes the resized image's channel sums
    * from first principles — a wrong decode, wrong stride, or wrong
    * sample coordinate shows up as a value mismatch, not just a
    * count mismatch.
    */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no tmp-file staging per call

    /** Deterministic synthetic RGB bitmap for doc `id`, PNG-encoded.
      * Channel formulas are the oracle contract (mirrored in
      * `q_multimodal_image_resize`'s SQL):
      * r=(7x+13y+id)%256, g=(3x+id)%256, b=(5y+id)%256.
      */
    def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 7 + y * 13 + id) % 256).toInt
          val g = ((x * 3 + id) % 256).toInt
          val b = ((y * 5 + id) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** PNG decode + nearest-neighbor downsample by `factor`: sampled
      * pixel (x, y) reads source (x·factor, y·factor). Returns source
      * and target dimensions plus per-channel sums over the RESIZED
      * pixels — exact integers, independent of PNG compressor details.
      */
    def decodeResize(png: Array[Byte], factor: Int): ImageResized0 = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val w = img.getWidth; val h = img.getHeight
      val dw = w / factor; val dh = h / factor
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          val rgb = img.getRGB(x * factor, y * factor)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      ImageResized0(w, h, dw, dh, sr, sg, sb)
    }
  }

  case class ImageResized0(src_w: Int, src_h: Int, dst_w: Int, dst_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  case class ImageResized(doc_id: Long, src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Attach a REAL PNG payload per doc: a deterministic
    * (32+id%16)×(24+id%8) bitmap, encoded per-partition (one encoder
    * init per partition — the amortization pattern a JNI codec needs).
    */
  def withImagePayload(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val inEnc = Encoders.scalaLong
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, ImageCodec.synthPng(id, (32 + id % 16).toInt, (24 + id % 8).toInt))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Image resize over PNG payloads — the REAL-codec occupant of the
    * resize slot ([[resize]] keeps the byte-thinning twin for opaque
    * non-image media): per-partition decode, nearest-neighbor
    * downsample, typed metadata out. Swapping PNG for JPEG/video
    * frames changes only the codec call.
    */
  def imageResize(payloads: DataFrame, factor: Int): DataFrame = {
    implicit val enc = Encoders.product[ImageResized]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, png) =>
          val r = ImageCodec.decodeResize(png, factor)
          ImageResized(id, r.src_w, r.src_h, r.dst_w, r.dst_h,
            r.sum_r, r.sum_g, r.sum_b)
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
