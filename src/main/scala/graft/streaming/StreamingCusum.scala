package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous CUSUM monitoring — the streaming twin of
  * [[graft.ops.TimeSeries.cusum]]: per-key burst/drift alarms emitted as
  * micro-batches arrive, with the statistic carried across batches in
  * three longs of [[GroupState]] per key.
  *
  * The batch operator computes the closed form `s = P − min(0, min P)`
  * with two cumulative windows; the stream keeps exactly the two
  * running quantities that form needs — the prefix sum `p` and its
  * running minimum `minP` (seeded at 0, so the `min(0, ·)` clamp is
  * built in) — which makes the per-key state FIXED-SIZE however long
  * the series runs: O(monitored keys), independent of stream length,
  * the same state law as [[Sessionize]]. Each group invocation sorts
  * only its key's rows OF THAT MICRO-BATCH (the standard mapGroups
  * contract); rows at or before the key's last applied step are late
  * duplicates and are dropped deterministically, so replayed batches
  * can't double-count drift.
  *
  * Emitted points are bit-identical to running the batch operator over
  * the concatenated history (asserted in StreamingCusumSpec) — the
  * monitor and the backfill can never disagree.
  */
object StreamingCusum {

  final case class Obs(key: String, step: Long, x: Long)
  final case class CusumState(p: Long, minP: Long, lastStep: Long)
  final case class Point(
      key: String, step: Long, x: Long, drift: Long, cusum: Long,
      alarm: Boolean)

  def monitor(
      obs: Dataset[Obs], ref: Long, slack: Long, threshold: Long
  ): Dataset[Point] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance(ref, slack, threshold))
  }

  /** Fold one key's micro-batch into the carried statistic. Exposed for
    * the spec; pure given (state, sorted rows).
    */
  private[streaming] def advance(ref: Long, slack: Long, threshold: Long)(
      key: String, rows: Iterator[Obs], state: GroupState[CusumState]
  ): Iterator[Point] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0L, Long.MinValue))
    val out = Seq.newBuilder[Point]
    rows.toSeq.sortBy(_.step).foreach { o =>
      if (o.step > st.lastStep) {
        val drift = o.x - ref - slack
        val p = st.p + drift
        val minP = math.min(st.minP, p)
        val s = p - minP
        out += Point(key, o.step, o.x, drift, s, s >= threshold)
        st = CusumState(p, minP, o.step)
      }
    }
    state.update(st)
    out.result().iterator
  }
}
