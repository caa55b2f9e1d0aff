package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the state
  * primitive for session semantics `session_window` can't express (here:
  * per-session event counts AND value sums AND first/last bounds emitted
  * as one typed row, with the open session carried across micro-batches
  * and flushed on event-time timeout).
  *
  * One function serves both execution modes:
  *  - BATCH (`trailing = true`): the group iterator holds the user's whole
  *    history; sessions are split on gaps and all emitted, including the
  *    trailing open one. Verified row-for-row against the lag()-window
  *    formulation in SessionizeSpec.
  *  - STREAMING (`trailing = false`): closed sessions are emitted as they
  *    close; the open session is stored in [[GroupState]] with an
  *    event-time timeout of (last event + gap) — when the watermark passes
  *    that point the session is flushed and the state removed. State per
  *    key is one fixed-size [[Sessionize.Open]] record, so state size is
  *    O(active users), independent of stream length. The `ts` field must
  *    be the stream's watermark column (its metadata gates the timeout).
  *
  * Scale note: a group invocation buffers and sorts only the key's events
  * OF THAT MICRO-BATCH (or, in batch mode, that user's history) — the
  * standard mapGroups memory contract; user-level skew is bounded by
  * per-user traffic, not corpus size.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class Open(startUs: Long, lastUs: Long, n: Long, sum: Double)
  final case class Summary(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  private def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** For streaming input, apply `withWatermark` on `ts` BEFORE `.as[Event]`
    * (the watermark gates the event-time timeout).
    */
  def sessionSummaries(
      events: Dataset[Event], gapUs: Long, trailing: Boolean
  ): Dataset[Summary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapUs, trailing))
  }

  private def summary(user: Long, s: Open): Summary =
    Summary(user, s.startUs, s.lastUs, s.n, s.sum)

  private def sessionFn(gapUs: Long, trailing: Boolean)(
      user: Long, events: Iterator[Event], state: GroupState[Open]
  ): Iterator[Summary] = {
    if (!events.hasNext) {
      // timeout invocation: the watermark passed last+gap — flush the open
      // session
      if (state.hasTimedOut && state.exists) {
        val s = state.get
        state.remove()
        Iterator.single(summary(user, s))
      } else Iterator.empty
    } else {
      val sorted = events.map(e => (us(e.ts), e.value)).toArray.sortBy(_._1)
      val out = Seq.newBuilder[Summary]
      var open: Option[Open] =
        if (!trailing && state.exists) Some(state.get) else None
      sorted.foreach { case (tUs, v) =>
        open match {
          case Some(s) if tUs - s.lastUs <= gapUs =>
            open = Some(Open(s.startUs, tUs, s.n + 1, s.sum + v))
          case Some(s) =>
            out += summary(user, s)
            open = Some(Open(tUs, tUs, 1L, v))
          case None =>
            open = Some(Open(tUs, tUs, 1L, v))
        }
      }
      open.foreach { s =>
        if (trailing) out += summary(user, s)
        else {
          state.update(s)
          state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
        }
      }
      out.result().iterator
    }
  }

  /** Batch convenience over the events table (`ts_ns` nanos → micros).
    * Nanos must be divided with INTEGER division (`DIV`): `/` promotes the
    * ~1.7e18 nano value to double, which exceeds 2^53 mantissa precision
    * and wobbles the resulting microsecond by ±1.
    */
  def batchSessions(events: DataFrame, gapUs: Long): Dataset[Summary] = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionSummaries(
      events.select(col("user_id"),
        timestamp_micros(expr("ts_ns DIV 1000")).as("ts"),
        col("value").cast("double").as("value")).as[Event],
      gapUs, trailing = true)
  }
}
