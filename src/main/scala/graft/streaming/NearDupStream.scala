package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft._
import graft.functions.Dedup

/** Streaming near-duplicate detection — the Structured Streaming twin
  * of the batch MinHash-LSH pairs operator ([[Dedup.minhashPairs]]).
  *
  * Shape: per document the codegen'd MinHash kernel produces the
  * signature NARROWLY inside the stream's projection (no shuffle), the
  * signature is banded, and band signatures key a
  * `flatMapGroupsWithState` operator: the FIRST document to present a
  * band signature becomes its owner; any later document colliding on
  * that band within the state TTL emits a (doc_id, dup_of_doc_id)
  * candidate. Downstream consumers dedup candidates per doc (a doc can
  * collide on several bands) and, where exactness matters, re-check the
  * full signatures — same contract as the batch LSH path, where the
  * band join generates candidates and the estimate filters them.
  *
  * State is bounded two ways: one state row per DISTINCT band signature
  * (not per document), and an EVENT-TIME timeout evicts a band owner
  * [[StateTtlMs]] past its last hit (sliding TTL — the discipline of
  * the reference's dim cache, gmall-realtime/.../utils/DimUtil.java:
  * 17-24, under the engine's event-time clock; the other stateful
  * operators use the same EventTimeTimeout pattern).
  *
  * Input: a (doc_id, text, ts epoch-ms) frame, batch or streaming.
  */
object NearDupStream {

  /** Band-owner state TTL (sliding: reset on every hit). */
  val StateTtlMs: Long = 24L * 3600 * 1000

  case class BandHit(band: Int, bandsig: String, doc_id: Long, ts: Long)
  case class Candidate(doc_id: Long, dup_of: Long, band: Int)

  private implicit val bandHitEnc: org.apache.spark.sql.Encoder[BandHit] =
    org.apache.spark.sql.Encoders.product[BandHit]
  private implicit val candidateEnc: org.apache.spark.sql.Encoder[Candidate] =
    org.apache.spark.sql.Encoders.product[Candidate]
  private implicit val keyEnc: org.apache.spark.sql.Encoder[(Int, String)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.STRING)
  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong

  /** (doc_id, text, ts) stream → watermarked banded-signature stream
    * (narrow; the watermark is applied before the signature projection
    * so every document advances the event clock).
    */
  def bandHits(docs: DataFrame): Dataset[BandHit] = {
    // event_time stays in every projection: the watermark must reach the
    // stateful operator (.as[] binds the four BandHit fields but keeps
    // the extra column in the plan). Signature + banding come from the
    // SAME helpers as the batch pairs operator, so the two paths cannot
    // drift.
    Dedup.withMinhashSig(
        docs
          .withColumn("event_time", timestamp_millis($"ts"))
          .withWatermark("event_time", "1 hour"))
      .select($"doc_id", $"ts", $"event_time", Dedup.bandsigCols("sig"))
      .select($"pos".cast("int").as("band"), $"col".as("bandsig"),
        $"doc_id", $"ts", $"event_time")
      .as[BandHit]
  }

  /** Band-keyed first-owner state: emits a candidate for every later
    * doc colliding with the band's owner.
    */
  def candidates(hits: Dataset[BandHit]): Dataset[Candidate] = {
    val isStreaming = hits.isStreaming
    hits
      .groupByKey(h => (h.band, h.bandsig))
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append(),
        if (isStreaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // one pass: min doc_id (batch owner candidate) and max ts.
            // The STORED owner always wins across batches — taking a
            // later, smaller doc_id as owner would silently swallow its
            // own collision (the late doc would have nothing to be
            // flagged against). Within the first batch for a key, the
            // min id owns, which keeps single-batch output
            // arrival-order-independent.
            var minId = Long.MaxValue
            var maxTs = Long.MinValue
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            rows.foreach { h =>
              ids += h.doc_id
              if (h.doc_id < minId) minId = h.doc_id
              if (h.ts > maxTs) maxTs = h.ts
            }
            val owner = state.getOption.getOrElse(minId)
            state.update(owner)
            if (isStreaming) {
              // sliding event-time TTL anchored on the newest hit (the
              // watermark alone is epoch-0 in the first batch)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                maxTs + StateTtlMs))
            }
            ids.iterator.filter(_ != owner).map(Candidate(_, owner, band))
          }
      }
  }

  /** Full pipeline: doc stream → (doc, dup_of) candidates. */
  def nearDups(docs: DataFrame): DataFrame =
    candidates(bandHits(docs)).toDF()
      .select($"doc_id", $"dup_of")
}
