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
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder]]); everything
  * around it — binary column handling, metadata schema, the
  * mapPartitions batch shape (the Scala analogue of `mapInPandas`:
  * one decoder instance per partition, streaming batches, no per-row
  * setup cost), partitioning — is real and tested. Swapping in a real
  * codec changes only the Decoder implementation.
  */
object Multimodal {

  /** Typed record for the decode stage. */
  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Long,
      checksum60: Long, n_frames: Long, feat: Long)

  /** Decoder contract: one instance per partition, called per record.
    * A real implementation would wrap an image/audio library handle
    * (expensive init amortized across the partition).
    */
  trait Decoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** STUB decoder — deterministic fake in place of a codec.
    * Checksum = first 60 bits of md5 (matches the SQL oracle's
    * md5-prefix arithmetic); "frames" = 1 KiB payload slices; `feat`
    * stands in for a model feature vector.
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
        (nBytes + 1023) / 1024, checksum60 % 997)
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
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: Decoder = StubDecoder): DataFrame = {
    val recEnc = org.apache.spark.sql.Encoders.product[MediaRecord]
    val featEnc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    val ds: Dataset[MediaRecord] = mediaTable(spark, dir)
      .select($"doc_id", $"modality", $"payload").as[MediaRecord](recEnc)
    ds.mapPartitions(it => it.map(decoder.decode))(featEnc)
      .toDF()
  }

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
