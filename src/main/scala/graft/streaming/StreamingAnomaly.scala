package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-rate anomaly detection — the streaming complement of
  * the batch hourly-count + MAD composition (`q_event_anomaly`): per
  * group, tumbling event-time windows are counted in state, FINALIZED
  * when the watermark passes their end (the engine's standard finality
  * rule — a late event could otherwise change a count after it was
  * judged), and each finalized window is flagged against the robust
  * baseline of the trailing finalized windows (lower median, the MAD
  * ops' convention). State per group is bounded: the in-watermark
  * pending counts plus a fixed-length ring of finalized (window, count)
  * pairs.
  *
  * Only observed windows enter the baseline (a silent stream produces
  * no zero-count windows) — the right convention for bursty sources,
  * documented so callers on sparse streams know the baseline is
  * activity-conditioned.
  */
object StreamingAnomaly {

  case class RateState(pending: Map[Long, Long], trailing: Vector[(Long, Long)])

  case class RateFlag(grp: String, window: Long, n: Long, baseline: Long,
                      is_anomaly: Boolean)

  /** @param events streaming (grp: string, ts: timestamp)
    * @param windowMs tumbling window width
    * @param history trailing finalized windows forming the baseline
    * @param k flag when count > k * max(baseline median, 1) */
  def rateFlags(events: DataFrame, windowMs: Long, history: Int = 8,
                k: Long = 3L, watermark: String = "10 minutes")
      : Dataset[RateFlag] = {
    require(windowMs > 0 && history >= 1 && k >= 1, "rateFlags: bad params")
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("grp"), col("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RateState, RateFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (grp, incoming, state: GroupState[RateState]) =>
          val wm = state.getCurrentWatermarkMs
          val prev = state.getOption.getOrElse(RateState(Map.empty, Vector.empty))
          var pending = prev.pending
          incoming.foreach { case (_, ts) =>
            val w = ts.getTime / windowMs
            pending = pending.updated(w, pending.getOrElse(w, 0L) + 1L)
          }
          // finalize windows whose END the watermark has passed, oldest first
          val (done, rest) = pending.partition { case (w, _) => (w + 1) * windowMs <= wm }
          var trailing = prev.trailing
          val out = done.toSeq.sortBy(_._1).map { case (w, n) =>
            val base =
              if (trailing.isEmpty) 0L
              else trailing.map(_._2).sorted.apply((trailing.size - 1) / 2)
            val flag = trailing.nonEmpty && n > k * math.max(base, 1L)
            trailing = (trailing :+ (w, n)).takeRight(history)
            RateFlag(grp, w, n, base, flag)
          }
          state.update(RateState(rest, trailing))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(rest.keys.min * windowMs + windowMs, wm + 1))
          out.iterator
      }
  }
}
