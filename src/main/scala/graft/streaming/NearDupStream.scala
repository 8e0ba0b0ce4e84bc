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

  // ---- near-dup census: cluster-size cells served through DwsSink ------

  /** Per-band state for the census fold: owner (first doc in EVENT
    * time), newest hit ts, members already emitted (capped), and the
    * held not-yet-drained buffer.
    */
  case class CensusState(owner: Long, maxTs: Long, seen: List[Long],
      buffer: List[BandHit])

  /** Watermark-bounded (band, bandsig)-keyed fold — the
    * [[RetentionStream]] discipline applied to band ownership: hits
    * newer than the current watermark are held in state and folded only
    * once the watermark passes them, so each band's hits are consumed
    * in global EVENT-TIME order across micro-batches and the owner is
    * the event-time-first document (ties → min doc_id) — a pure
    * function of the closed input, unlike [[candidates]]' stored-owner-
    * wins contract, which is arrival-order-dependent by design (flag
    * fast, never revise). Determinism is what lets the census cells
    * claim batch parity: on a batch Dataset the same operator folds
    * everything in one ordered pass — the batch twin is the operator
    * itself.
    *
    * Each (band, member) pair emits at most once ([[BandWidthCap]]
    * members per band, the usual boilerplate-signature guard); a doc
    * colliding with the same owner on SEVERAL bands emits one pair per
    * band — [[censusCells]] dedups cross-band before counting.
    */
  def memberPairs(hits: Dataset[BandHit]): Dataset[Candidate] = {
    val streaming = hits.isStreaming
    implicit val censusEnc: org.apache.spark.sql.Encoder[CensusState] =
      org.apache.spark.sql.Encoders.product[CensusState]
    hits
      .groupByKey(h => (h.band, h.bandsig))
      .flatMapGroupsWithState[CensusState, Candidate](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[CensusState]) =>
          val st0 = state.getOption.getOrElse(
            CensusState(Long.MinValue, Long.MinValue, Nil, Nil))
          if (state.hasTimedOut && st0.buffer.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
            val (ready, hold) = (st0.buffer ++ rows).partition(_.ts <= wm)
            var owner = st0.owner
            var maxTs = st0.maxTs
            val seen = scala.collection.mutable.LinkedHashSet(st0.seen: _*)
            val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
            ready.sortBy(h => (h.ts, h.doc_id)).foreach { h =>
              if (h.ts > maxTs) maxTs = h.ts
              if (owner == Long.MinValue) owner = h.doc_id
              else if (h.doc_id != owner && !seen(h.doc_id) &&
                  seen.size < BandWidthCap) {
                seen += h.doc_id
                out += Candidate(h.doc_id, owner, band)
              }
            }
            state.update(CensusState(owner, maxTs, seen.toList, hold))
            if (streaming) {
              // held hits must drain even if the band never collides
              // again; otherwise slide the TTL off the newest hit
              state.setTimeoutTimestamp(
                if (hold.nonEmpty) state.getCurrentWatermarkMs() + 1
                else math.max(state.getCurrentWatermarkMs() + 1,
                  maxTs + StateTtlMs))
            }
            out.iterator
          }
      }
  }

  /** Update-mode cluster-size cells over [[memberPairs]] — the frame
    * [[DwsSink.maintain]] serves, keyed by the owning document. The
    * cross-band `dropDuplicates` makes each (member, owner) pair count
    * once however many bands it collides on; its state is bounded by
    * the number of DISTINCT near-dup pairs (the census's own
    * cardinality, never the hit stream's). `cluster_size` counts the
    * owner itself, so a served cell reads as the cluster's total
    * membership — the streaming twin of the batch
    * `dedup_cluster_size_hist` input frame.
    */
  def censusCells(docs: DataFrame): DataFrame =
    memberPairs(bandHits(docs)).toDF()
      .dropDuplicates("doc_id", "dup_of")
      .groupBy($"dup_of".as("owner"))
      .agg((count(lit(1)) + 1L).as("cluster_size"))
      .select($"owner", $"cluster_size")

  /** Start maintaining the near-dup census in the DWS serving store,
    * keyed by owner. Same relaxed-gate rationale as the funnel and
    * retention families: every operator downstream of the state fold is
    * unwatermarked and window-free, so no drained row can be dropped as
    * late.
    */
  def serveCensus(docs: DataFrame, storeDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    DwsSink.withRelaxedCorrectnessGate(docs.sparkSession) {
      DwsSink.maintain(censusCells(docs), storeDir, "neardup_census",
        keyCols = Seq("owner"), checkpoint = checkpoint)
    }

  // ---- collapsed census: exact-fingerprint group cells ------------------

  /** One row per document carrying its order-independent SimHash
    * fingerprint — the SAME kernel expression as the batch collapse
    * family ([[Dedup.simhash]]; unigram SimHash, so mirrored/permuted
    * copies share a fingerprint exactly). Token-less documents have no
    * fingerprint and belong to no collapse group — filtered, like the
    * batch frame.
    */
  case class FpHit(fp: Long, doc_id: Long, ts: Long)

  /** A collapse group's serving cell: its fingerprint, min-doc_id
    * representative (the batch variants' `rep`), total membership, and
    * the within-group pair weight `n_doc_pairs = C(size, 2)` — the
    * exact number of same-fingerprint duplicate pairs the group stands
    * for without materializing them (the accounting identity
    * DedupCollapseSpec pins on the batch side).
    */
  case class CollapseCell(fp: Long, owner: Long, group_size: Long,
      n_doc_pairs: Long)

  private implicit val fpHitEnc: org.apache.spark.sql.Encoder[FpHit] =
    org.apache.spark.sql.Encoders.product[FpHit]
  private implicit val collapseCellEnc: org.apache.spark.sql.Encoder[CollapseCell] =
    org.apache.spark.sql.Encoders.product[CollapseCell]
  private implicit val collapseStateEnc: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)

  /** (doc_id, text, ts) stream → watermarked fingerprint stream (narrow;
    * same Generate barrier as the batch frame so the null filter can't
    * be pushed into a second kernel evaluation).
    */
  def fingerprintHits(docs: DataFrame): Dataset[FpHit] =
    docs
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .select(explode(array(graft.plans.ArrayOps.simhashFp(
          graft.functions.TextAnalysis.tokens($"text"), Dedup.SimBits))).as("fp"),
        $"doc_id", $"ts", $"event_time")
      .filter($"fp".isNotNull)
      .as[FpHit]

  /** The streaming twin of the batch canonical-collapse guard
    * ([[Dedup.simhashPairsCollapsed]]): a fingerprint-keyed fold
    * maintaining (rep = min doc_id, size, pair weight) per collapse
    * group, emitted in UPDATE mode — a crawl-corpus mega-group (10⁵
    * mirrored copies of one template) costs ONE state row and one
    * serving cell per batch it grows in, never Θ(g²) materialized
    * pairs (which is exactly what [[memberPairs]]' per-pair census
    * would emit, BandWidthCap notwithstanding, and what the batch
    * collapse was built to avoid).
    *
    * Determinism without watermark ordering: min and count are
    * commutative over arrival order, so the final cell per fingerprint
    * is a pure function of the closed input — on a batch Dataset the
    * operator IS its own batch twin (one ordered pass per group,
    * NoTimeout), and the streaming run's last update per key converges
    * to the batch answer. State is one row per DISTINCT fingerprint
    * with the family's sliding event-time TTL.
    */
  def collapsedCells(hits: Dataset[FpHit]): Dataset[CollapseCell] = {
    val streaming = hits.isStreaming
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    hits
      .groupByKey((h: FpHit) => h.fp)
      .flatMapGroupsWithState[(Long, Long, Long), CollapseCell](
        OutputMode.Update(),
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        case (fp, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // (rep, size, max event ts) — one bounded pass per batch
            var (rep, size, maxTs) = state.getOption
              .getOrElse((Long.MaxValue, 0L, Long.MinValue))
            rows.foreach { h =>
              if (h.doc_id < rep) rep = h.doc_id
              if (h.ts > maxTs) maxTs = h.ts
              size += 1
            }
            state.update((rep, size, maxTs))
            if (streaming) {
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                maxTs + StateTtlMs))
            }
            Iterator.single(
              CollapseCell(fp, rep, size, size * (size - 1) / 2))
          }
      }
  }

  /** Full pipeline: doc stream → collapse-group cells. */
  def collapsedCensus(docs: DataFrame): DataFrame =
    collapsedCells(fingerprintHits(docs)).toDF()

  /** Start maintaining the collapsed census in the DWS serving store,
    * keyed by FINGERPRINT (not owner: a group's rep can move to a
    * smaller doc_id as members arrive, and a rep-keyed store would
    * retain the superseded cell; the fingerprint is the group's stable
    * identity, so latest-wins per fp always serves exactly one
    * up-to-date cell per collapse group). No relaxed gate needed —
    * there is no aggregate downstream of the fold.
    */
  def serveCollapsedCensus(docs: DataFrame, storeDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    DwsSink.maintain(collapsedCensus(docs), storeDir, "neardup_collapsed",
      keyCols = Seq("fp"), checkpoint = checkpoint)
}
