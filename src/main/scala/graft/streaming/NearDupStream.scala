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

  /** Max candidates emitted per band signature per micro-batch — the
    * streaming mirror of the batch operators' bucket-width caps
    * ([[Dedup.DfCapMax]]): a boilerplate band signature shared by millions
    * of docs must not quadratic-blow one state task. Docs beyond the
    * cap in a batch are not flagged (they are overwhelmingly duplicates
    * of an already-flagged template; an exact post-pass catches stragglers).
    */
  val BandWidthCap: Int = 100

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
  private implicit val stateEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)

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
      .flatMapGroupsWithState[(Long, Long), Candidate](
        OutputMode.Append(),
        if (isStreaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // One bounded pass. The STORED owner always wins across
            // batches — taking a later, smaller doc_id as owner would
            // silently swallow its own collision. Within the first
            // batch for a key the min id owns, which keeps single-batch
            // output arrival-order-independent. The candidate buffer is
            // capped at BandWidthCap+1 so a pathological band signature
            // cannot blow up the task.
            val stored = state.getOption // (owner, max event ts seen)
            var minId = Long.MaxValue
            var maxTs = stored.map(_._2).getOrElse(Long.MinValue)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
            rows.foreach { h =>
              if (h.doc_id < minId) minId = h.doc_id
              if (h.ts > maxTs) maxTs = h.ts
              if (buf.size <= BandWidthCap) buf += h.doc_id
            }
            val owner = stored.map(_._1).getOrElse(minId)
            // write state only when it changes (owner is immutable once
            // set; maxTs grows) — a no-op put per key per batch would
            // churn the RocksDB changelog for nothing
            if (!stored.contains((owner, maxTs))) state.update((owner, maxTs))
            if (isStreaming) {
              // sliding event-time TTL anchored on the newest hit EVER
              // seen for the key — anchoring on the current batch alone
              // would move the deadline EARLIER when a batch holds only
              // late (but in-watermark) hits. Monotone since maxTs is.
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                maxTs + StateTtlMs))
            }
            buf.iterator.filter(_ != owner).take(BandWidthCap)
              .map(Candidate(_, owner, band))
          }
      }
  }

  /** Full pipeline: doc stream → (doc, dup_of) candidates. */
  def nearDups(docs: DataFrame): DataFrame =
    candidates(bandHits(docs)).toDF()
      .select($"doc_id", $"dup_of")
}
