package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft._

/** Streaming twin of the cohort retention matrix
  * ([[graft.operators.FunnelOps.retentionCohorts]]): each user's first
  * active day assigns their cohort, every later distinct active day
  * emits one (cohort, day_offset) activation, and the running cell
  * counts are servable through [[DwsSink.maintain]] — the second
  * analytics family on the batch/streaming-parity discipline
  * [[FunnelStream]] established for the funnel.
  *
  * Correctness under out-of-order arrival is the [[FunnelStream]]
  * watermark-bounded fold: events newer than the current watermark are
  * held in state and folded only once the watermark passes them, so each
  * user's events are consumed in global event-time order across
  * micro-batches. The FIRST event folded therefore carries the user's
  * true minimum day — the cohort can never be assigned to a later day
  * and then revised (the revision hazard a naive running-min would hit
  * when a user's earliest event arrives late) — and each (user, day)
  * activates at most once.
  *
  * Scale shape: one shuffle on `user_id` into the state operator.
  * Persistent state per user is the cohort day plus the distinct active
  * DAY set — calendar-bounded (a year of daily activity is ~365 longs),
  * never event-bounded. The downstream count aggregate keys on the
  * (cohort, day_offset) day-domain triangle, exactly the frame the batch
  * operator's matrix is built from.
  */
object RetentionStream {

  case class ActivityEvent(user_id: Long, ts: Long)
  case class DayActive(user_id: Long, cohort_day: Long, day_offset: Long)

  /** Per-user state: cohort day (MinValue = unset), distinct active days
    * already emitted, and the held not-yet-drained buffer.
    */
  case class RetentionState(c0Day: Long, seenDays: List[Long],
      buffer: List[ActivityEvent])

  /** Bounded out-of-orderness of the activity stream. */
  val OutOfOrder = "1 hour"

  private val MillisPerDay = 86400000L

  private def fold(uid: Long, st: RetentionState, evs: Seq[ActivityEvent])
      : (RetentionState, List[DayActive]) = {
    var c0 = st.c0Day
    val seen = scala.collection.mutable.Set(st.seenDays: _*)
    val out = scala.collection.mutable.ListBuffer[DayActive]()
    evs.sortBy(_.ts).foreach { e =>
      val d = Math.floorDiv(e.ts, MillisPerDay)
      if (c0 == Long.MinValue) c0 = d
      // the watermark-ordered fold invariant: nothing precedes the
      // cohort day once it is set (a violation means late data leaked
      // past the watermark — corrupt silently or die loudly; die)
      require(d >= c0,
        s"retention fold: day $d precedes cohort $c0 for user $uid — " +
          "event older than the watermark horizon reached the fold")
      if (!seen(d)) { seen += d; out += DayActive(uid, c0, d - c0) }
    }
    (RetentionState(c0, seen.toList, Nil), out.toList)
  }

  /** Append-mode stream of first-time (user, day) activations tagged
    * with the user's cohort day. On a batch Dataset the same operator
    * folds each user's closed input in one pass — the batch twin is the
    * operator itself.
    */
  def dayActivations(events: Dataset[ActivityEvent]): Dataset[DayActive] = {
    val evEnc = Encoders.product[ActivityEvent]
    val stEnc = Encoders.product[RetentionState]
    val outEnc = Encoders.product[DayActive]
    val streaming = events.isStreaming
    val prepared =
      if (!streaming) events
      else events.toDF()
        .withColumn("event_time", timestamp_millis($"ts"))
        .withWatermark("event_time", OutOfOrder)
        .as[ActivityEvent](evEnc)
    prepared.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[RetentionState, DayActive](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[ActivityEvent], state: GroupState[RetentionState]) =>
          val st0 = state.getOption.getOrElse(
            RetentionState(Long.MinValue, Nil, Nil))
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val (ready, hold) = (st0.buffer ++ it).partition(_.ts <= wm)
          val (next, emits) = fold(uid, st0, ready)
          state.update(next.copy(buffer = hold))
          // held events must drain even if this user never speaks again
          if (streaming && hold.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          emits.iterator
      }(stEnc, outEnc)
  }

  /** Update-mode retention cells over [[dayActivations]] — the frame
    * [[DwsSink.maintain]] serves, keyed (cohort, day_offset). Each
    * activation arrives exactly once, so the running count per cell IS
    * the batch matrix's `users` column once the watermark passes the
    * input; `retained_share` stays a read-time division by the cell at
    * offset 0 (stored alongside every other cell).
    */
  def cellCounts(actives: Dataset[DayActive]): DataFrame =
    actives.toDF()
      .groupBy(
        date_format(date_from_unix_date($"cohort_day".cast("int")), "yyyy-MM-dd")
          .as("cohort"),
        $"day_offset")
      .agg(count(lit(1)).as("users"))

  /** Start maintaining the retention triangle in the DWS serving store,
    * keyed (cohort, day_offset). Same checkCorrectness handling as
    * [[FunnelStream.serveCounts]]: the count aggregate downstream of the
    * state operator is unwatermarked and window-free, so no drained row
    * can be dropped as late; the static gate is relaxed for this query
    * start only.
    */
  def serveCells(actives: Dataset[DayActive], storeDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    DwsSink.withRelaxedCorrectnessGate(actives.sparkSession) {
      DwsSink.maintain(cellCounts(actives), storeDir, "retention",
        keyCols = Seq("cohort", "day_offset"), checkpoint = checkpoint)
    }
}
