package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / frame-sample as partition-wise batch
  * operators.
  *
  * The decode step is REAL for still images: [[ImageIoDecoder]] wraps
  * `javax.imageio` (pure JVM — PNG/BMP/GIF readers ship with the JDK)
  * and extracts width / height / band count / exact per-channel pixel
  * means. Payloads no reader claims (text bytes, audio, video — the
  * container has no such codecs) fall back to the deterministic
  * [[StubDecoder]], whose image fields are zero. Everything around the
  * codec — binary column handling, metadata schema, the mapPartitions
  * batch shape (the Scala analogue of `mapInPandas`: one decoder
  * instance per partition, streaming batches, no per-row setup cost),
  * partitioning — is codec-independent; adding an audio/video codec
  * changes only the Decoder implementation.
  */
object Multimodal {

  /** Typed record for the decode stage. */
  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

  /** Decode output. The image fields (`width`…`mean_b`) are 0 when the
    * payload is not a decodable image; channel means are truncating
    * integer division (exact for the solid-color fixtures).
    */
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Long,
      checksum60: Long, n_frames: Long, feat: Long,
      width: Long, height: Long, n_channels: Long,
      mean_r: Long, mean_g: Long, mean_b: Long)

  /** Decoder contract: one instance per partition, called per record.
    * A real implementation would wrap an image/audio library handle
    * (expensive init amortized across the partition).
    */
  trait Decoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** STUB decoder — deterministic fallback for payloads with no codec.
    * Checksum = first 60 bits of md5 (matches the SQL oracle's
    * md5-prefix arithmetic); "frames" = 1 KiB payload slices; `feat`
    * stands in for a model feature vector; image fields all zero.
    */
  object StubDecoder extends Decoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      val checksum60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val nBytes = r.payload.length.toLong
      // frames = ceil(nBytes / 1KiB), 0 for empty payloads — same count
      // frameSample slices ((n-1)/1024+1 would give 1 for n=0 under
      // Java's truncating division)
      MediaFeatures(r.doc_id, r.modality, nBytes, checksum60,
        (nBytes + 1023) / 1024, checksum60 % 997, 0L, 0L, 0L, 0L, 0L, 0L)
    }
  }

  /** Real still-image decoder over `javax.imageio` (JDK-bundled PNG /
    * BMP / GIF / JPEG readers — no external codec needed). Undecodable
    * payloads fall back to [[StubDecoder]], so this is a safe default
    * for mixed-modality tables. Channel means come from `getRGB` (the
    * color-model-independent ARGB view), summed exactly and divided by
    * the pixel count — deliberately integer-exact so the fixture oracle
    * can replay them arithmetically.
    */
  object ImageIoDecoder extends Decoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) StubDecoder.decode(r)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val stub = StubDecoder.decode(r) // payload checksum is codec-independent
        val n = w.toLong * h
        stub.copy(n_frames = 1L, width = w, height = h,
          n_channels = img.getRaster.getNumBands,
          mean_r = sr / n, mean_g = sg / n, mean_b = sb / n)
      }
    }
  }

  /** Documents as a multimodal table: text bytes standing in for the
    * opaque payload, modality assigned deterministically.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select($"doc_id",
        element_at(typedlit(Seq("image", "audio", "video")),
          ($"doc_id" % 3).cast("int") + 1).as("modality"),
        encode($"text", "UTF-8").as("payload"),
        $"source")

  /** Metadata projection: schema-level multimodal handling only (no
    * decode): modality, byte size, source.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select($"doc_id", $"modality",
        length($"payload").cast("bigint").as("n_bytes"), $"source")

  /** Decode + feature-extract via mapPartitions: the batch-shaped decode
    * stage. Narrow (no shuffle); each partition streams through one
    * decoder instance.
    */
  def decodeFeaturesOf(media: Dataset[MediaRecord],
      decoder: Decoder): DataFrame = {
    val featEnc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions(it => it.map(decoder.decode))(featEnc).toDF()
  }

  /** [[decodeFeaturesOf]] over [[mediaTable]]. The registry projects the
    * codec-independent columns (the table's payloads are text bytes, so
    * the image fields are all zero — asserted by MultimodalSpec).
    */
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: Decoder = ImageIoDecoder): DataFrame = {
    val recEnc = org.apache.spark.sql.Encoders.product[MediaRecord]
    decodeFeaturesOf(mediaTable(spark, dir)
      .select($"doc_id", $"modality", $"payload").as[MediaRecord](recEnc),
      decoder)
  }

  /** Deterministic still-image fixtures: one solid-color image per doc,
    * dimensions and RGB derived from `doc_id`, PNG for even ids / BMP
    * for odd — ENCODED with the same `javax.imageio` the decoder reads,
    * inside the partition (never on the driver). Solid color makes the
    * per-channel mean exactly the seed color, so [[imageRoundtrip]] has
    * a pure-arithmetic DuckDB oracle despite real codec bytes in the
    * middle.
    */
  def imageFixtures(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    val recEnc = org.apache.spark.sql.Encoders.product[MediaRecord]
    // per-row codec work (encode+decode) dwarfs a row's shuffle cost —
    // the one stage where Tables.spread pays for its exchange
    Tables.spread(documents(spark, dir).select($"doc_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
          val (r, g, b) = ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val gfx = img.createGraphics()
          gfx.setColor(new java.awt.Color(r, g, b))
          gfx.fillRect(0, 0, w, h)
          gfx.dispose()
          val codec = if (id % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, codec, bos)
          MediaRecord(id, codec, bos.toByteArray)
        }
      }(recEnc)
  }

  /** Registry query `mm_image_roundtrip`: encode → decode through real
    * JDK codecs, emitting the stats the arithmetic oracle predicts.
    * End-to-end proof the decode path reads genuine PNG/BMP bytes.
    */
  def imageRoundtrip(spark: SparkSession, dir: String): DataFrame =
    decodeFeaturesOf(imageFixtures(spark, dir), ImageIoDecoder)
      .select($"doc_id", $"modality".as("codec"), $"width", $"height",
        $"n_channels", $"mean_r", $"mean_g", $"mean_b")

  /** Frame sampling: explode the fake 1 KiB "frames" and keep every 4th —
    * the distributed shape of video frame-sampling (generator + filter;
    * at scale the payload fetch happens inside the partition, never on
    * the driver).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select($"doc_id", $"modality",
        length($"payload").cast("bigint").as("n_bytes"))
      .filter($"n_bytes" > 0) // empty payload ⇒ zero frames, not one
      .select($"doc_id", $"modality",
        explode(sequence(lit(0L), expr("(n_bytes - 1) div 1024"))).as("frame_id"))
      .filter($"frame_id" % 4 === 0)
}
