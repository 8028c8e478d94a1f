package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel matching — the streaming complement of
  * `ops/Funnel.steps`, with the same greedy strict-after semantics and
  * the same finality rule the other custom-state streams use: an event
  * participates in the fold only once the watermark passes its event
  * time, because a late earlier event (within allowed lateness) could
  * otherwise change which occurrence a step greedily matched. Events
  * still inside the watermark window stay buffered in state.
  *
  * State per user is bounded: the finalized prefix collapses to the fold
  * result (step index + last matched time — two scalars), and the buffer
  * holds only in-watermark events; a completed funnel keeps the O(1)
  * scalar state so later duplicates can't restart it. An event-time
  * timeout re-fires the fold when the watermark passes buffered events
  * on a quiet key.
  *
  * Emits one FunnelUpdate per ADVANCEMENT (append-friendly): the user,
  * the new step count, and the event time that advanced it.
  */
object StreamingFunnel {

  case class FunnelState(done: Int, lastMs: Long, buf: List[(Long, String)])

  case class FunnelUpdate(user_id: Long, steps_done: Int, completed: Boolean,
                          advanced_at: Long)

  /** @param events streaming (user_id: long, ts: timestamp, event_type: string)
    * @param stepTypes ordered step sequence (strict-after matching) */
  def steps(events: DataFrame, stepTypes: Seq[String],
            watermark: String = "10 minutes"): Dataset[FunnelUpdate] = {
    require(stepTypes.nonEmpty, "streaming funnel: need at least one step")
    val n = stepTypes.size
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, incoming, state: GroupState[FunnelState]) =>
          val wm = state.getCurrentWatermarkMs
          val prev = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
          val all = prev.buf ++ incoming.map(e => (e._2.getTime, e._3))
          // finalized events fold now (sorted (ts, type) — the batch
          // struct ordering); in-watermark events stay buffered
          val (finalized, pending) = all.partition(_._1 <= wm)
          var done = prev.done
          var last = prev.lastMs
          val updates = List.newBuilder[FunnelUpdate]
          finalized.sorted.foreach { case (tsMs, ty) =>
            if (done < n && ty == stepTypes(done) && tsMs > last) {
              done += 1; last = tsMs
              updates += FunnelUpdate(user, done, done == n, tsMs)
            }
          }
          if (state.hasTimedOut && pending.isEmpty && done == prev.done) {
            // quiet key, nothing left to finalize: keep the scalar fold
            // state (dropping it would let later duplicates restart the
            // funnel) but stop scheduling wakeups
            state.update(FunnelState(done, last, Nil))
          } else {
            state.update(FunnelState(done, last, pending))
            if (pending.nonEmpty)
              // wake when the watermark passes the earliest buffered
              // event; clamp past the current watermark (late events can
              // sit behind it, which Spark rejects as a timeout)
              state.setTimeoutTimestamp(math.max(pending.map(_._1).min + 1, wm + 1))
          }
          updates.result().iterator
      }
  }
}
