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

  /** One-time per-JVM ImageIO setup: the DEFAULT ImageIO stream cache is
    * DISK-backed — every `ImageIO.read`/`write` creates and deletes a
    * temp file, a per-image syscall tax that dominates small-image codec
    * work at corpus scale. Payloads here are in-memory byte arrays, so
    * the memory-backed cache is strictly better. Referenced at the top
    * of every codec-touching partition function so the switch happens on
    * executors (not just the driver) on a real cluster.
    */
  private[functions] lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
    media.mapPartitions { it =>
      imageIoMemCache
      it.map(decoder.decode)
    }(featEnc).toDF()
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
        imageIoMemCache
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

  /** Gray-gradient side of the fixture family: 16×16 grayscale PNGs
    * whose pixel (x, y) is
    * `(37b + cx(b)·x + cy(b)·y + cxy(b)·x·y) mod 256` with
    * `b = id div 2` and wide-period mixed slopes (multipliers mod
    * 97/89/83 then range-folded). Ids 2k and 2k+1 render IDENTICAL
    * images (planted duplicate pairs, LINEAR in corpus size). The
    * slope mixing matters: a shared smooth gradient collapses the
    * aHash space (aHash is shift-invariant and sees only slope
    * signs — first draft measured 6.5M hamming-0 pairs at sf1 from
    * 256 distinct hashes); the x·y cross term plus long-cycle slopes
    * yield ~24k distinct hashes over 25k bases, so the pair set is
    * the planted dups plus a thin near-miss tail (184k at sf1). PNG is lossless, so the decoded raster is
    * bit-identical to the formula and the oracle can replay the hash
    * arithmetically while Spark reads genuine codec output.
    */
  def grayFixtures(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    val recEnc = org.apache.spark.sql.Encoders.product[MediaRecord]
    Tables.spread(documents(spark, dir).select($"doc_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions { it =>
        imageIoMemCache
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              // base id reduced mod each mixing modulus BEFORE the
              // multiply: same residues (mod distributes), but neither
              // engine's BIGINT product can overflow at any doc_id —
              // JVM Long wraps silently while DuckDB raises, so the
              // unreduced form diverged cross-engine past ~7e9 ids
              raster.setSample(x, y, 0,
                (((id / 2 % 256 * 37) % 256 +
                  (3 + id / 2 % 97 * 2654435761L % 97 % 16) * x +
                  (5 + id / 2 % 89 * 40503 % 89 % 16) * y +
                  (1 + id / 2 % 83 * 69069 % 83 % 8) * x * y) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "png", bos.toByteArray)
        }
      }(recEnc)
  }

  /** 8×8 average-hash of a decoded 16×16 grayscale raster: cell (i, j)
    * is the 2×2 block sum, bit set iff `blockSum·64 > totalSum`
    * (strict, integer-exact — never a float mean). Bit k = i·8 + j.
    */
  private def aHash64(img: java.awt.image.BufferedImage): Long = {
    val raster = img.getRaster
    val px = Array.ofDim[Long](16, 16)
    var total = 0L
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        px(x)(y) = raster.getSample(x, y, 0).toLong
        total += px(x)(y)
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        val bs = px(2 * i)(2 * j) + px(2 * i + 1)(2 * j) +
          px(2 * i)(2 * j + 1) + px(2 * i + 1)(2 * j + 1)
        if (bs * 64 > total) hash |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    hash
  }

  /** `mm_image_ahash_pairs`: perceptual (average-hash) near-duplicate
    * image pairs — encode the gradient fixtures to real PNG bytes,
    * decode through `javax.imageio`, hash the 8×8 block means, then
    * find pairs at Hamming ≤ [[AHashMaxHamming]] with the SimHash
    * banded join (4 × 16-bit blocks: Hamming ≤ 3 ⇒ at least one
    * block equal — pigeonhole), never an all-pairs scan. The image
    * twin of [[graft.functions.Dedup.simhashPairs]], with the hash
    * derived from DECODED PIXELS (codec-fidelity proof: the oracle
    * recomputes it from the generator formula instead).
    */
  val AHashMaxHamming = 3L

  def imageAHashPairs(spark: SparkSession, dir: String): DataFrame = {
    val recEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val hashes = grayFixtures(spark, dir)
      .mapPartitions { it =>
        imageIoMemCache
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          (r.doc_id, aHash64(img))
        }
      }(recEnc)
      .toDF("doc_id", "ahash")
    val blk = hashes.select($"doc_id", $"ahash",
      explode(expr("sequence(0, 3)")).as("blk"))
      .withColumn("blkval",
        expr("shiftright(ahash, CAST(blk * 16 AS INT)) & 65535"))
    blk.as("x").join(blk.as("y").hint("shuffle_hash"),
        expr("x.blk = y.blk AND x.blkval = y.blkval AND x.doc_id < y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("CAST(bit_count(x.ahash ^ y.ahash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter($"hamming" <= AHashMaxHamming)
  }
}
