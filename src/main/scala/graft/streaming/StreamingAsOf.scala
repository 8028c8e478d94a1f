package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (backward) join — the streaming complement of
  * `ops/AsOfJoin.backward`: for every left event, the latest right event
  * with the same key and right.ts <= left.ts, optionally within a
  * tolerance. Both sides are unbounded streams.
  *
  * Correctness over latency: a left row is emitted only once the
  * watermark passes its event time — before that, a late right row
  * (within allowed lateness) could still become the better match. This is
  * the same finality rule Spark's windowed aggregates use, applied to the
  * asof frontier.
  *
  * State per key is bounded: pending lefts and buffered rights live only
  * until the watermark passes them; rights older than the watermark fold
  * into a single FLOOR row (the latest finalized right), which is all any
  * future left can ever need from the finalized past — so a quiet key
  * converges to O(1) state, and a hot key holds only its in-watermark
  * window. Same union-tag-resolve shape as the batch operator, executed
  * by `flatMapGroupsWithState` with an event-time timeout so matches
  * emit even when a key goes quiet.
  *
  * Ties among right rows at one timestamp resolve to the max id (the
  * batch operator's greatest-tieBreak convention); tolerance nulls the
  * match out but keeps the left row (left-join shape).
  */
object StreamingAsOf {

  /** Stream-stream TIME-BOUNDED join — the native Structured Streaming
    * interval join: right events within `[left.ts - lowerMs, left.ts +
    * upperMs]` of a left event with the same key. Unlike the as-of join
    * below this needs no custom state: the time-range condition plus both
    * watermarks is exactly what Spark's stream-stream join requires to
    * bound its state buffers, so late rows drop and state is GC'd by the
    * engine itself. Input columns pinned like [[backward]]:
    * left (key, ts, left_id), right (key, ts, right_id, right_value). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lowerMs: Long, upperMs: Long,
                   watermark: String = "10 minutes"): DataFrame = {
    require(lowerMs >= 0 && upperMs >= 0, "intervalJoin: bounds must be >= 0")
    val l = left.select(col("key").cast("long"), col("ts").as("left_ts"),
      col("left_id").cast("long")).withWatermark("left_ts", watermark)
    val r = right.select(col("key").cast("long").as("r_key"), col("ts").as("right_ts"),
      col("right_id").cast("long"), col("right_value").cast("double"))
      .withWatermark("right_ts", watermark)
    l.join(r, col("key") === col("r_key") &&
        col("right_ts") >= col("left_ts") - expr(s"INTERVAL ${lowerMs} MILLISECOND") &&
        col("right_ts") <= col("left_ts") + expr(s"INTERVAL ${upperMs} MILLISECOND"))
      .select("key", "left_ts", "left_id", "right_ts", "right_id", "right_value")
  }

  case class AsOfState(
      pending: List[(Long, Long)],             // (tsMs, leftId) awaiting finality
      rights: List[(Long, Long, Double)],      // (tsMs, rightId, value) in watermark
      floor: Option[(Long, Long, Double)])     // latest finalized right

  case class AsOfMatch(key: Long, ts: Long, left_id: Long,
                       right_ts: Option[Long], right_id: Option[Long],
                       right_value: Option[Double])

  /** @param left   streaming (key: long, ts: timestamp, left_id: long)
    * @param right  streaming (key: long, ts: timestamp, right_id: long,
    *               right_value: double)
    * @param toleranceMs  max (leftTs - rightTs); farther matches null out */
  def backward(left: DataFrame, right: DataFrame, watermark: String = "10 minutes",
               toleranceMs: Option[Long] = None): Dataset[AsOfMatch] = {
    val spark = left.sparkSession
    import spark.implicits._

    val taggedLeft = left.select(col("key").cast("long"), col("ts"),
      lit(1).as("side"), col("left_id").cast("long").as("id"),
      lit(0.0).as("value"))
    val taggedRight = right.select(col("key").cast("long"), col("ts"),
      lit(0).as("side"), col("right_id").cast("long").as("id"),
      col("right_value").cast("double").as("value"))

    taggedRight.unionByName(taggedLeft)
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, events, state: GroupState[AsOfState]) =>
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil, None))
          val evs = if (state.hasTimedOut) Seq.empty else events.toSeq
          val withNew = AsOfState(
            prev.pending ++ evs.filter(_._3 == 1).map(e => (e._2.getTime, e._4)),
            prev.rights ++ evs.filter(_._3 == 0).map(e => (e._2.getTime, e._4, e._5)),
            prev.floor)
          val w = state.getCurrentWatermarkMs
          // finalize: lefts strictly before the watermark can no longer
          // gain a better match — resolve and emit them, oldest first
          val (ready, stillPending) = withNew.pending.partition(_._1 < w)
          val emits = ready.sorted.map { case (t, lid) =>
            val cand = withNew.floor.toList ++ withNew.rights.filter(_._1 <= t)
            val best = cand.sortBy(r => (r._1, r._2)).lastOption
              .filter(r => toleranceMs.forall(tol => t - r._1 <= tol))
            AsOfMatch(key, t, lid, best.map(_._1), best.map(_._2), best.map(_._3))
          }
          // GC: rights before the watermark collapse into the floor — the
          // max of them dominates every older right for any future left
          val (old, keep) = withNew.rights.partition(_._1 < w)
          val floor = (withNew.floor.toList ++ old).sortBy(r => (r._1, r._2)).lastOption
          val next = AsOfState(stillPending, keep, floor)
          if (next.pending.isEmpty && next.rights.isEmpty && next.floor.isEmpty) {
            state.remove()
          } else {
            state.update(next)
            // wake when the watermark passes the oldest pending row (or
            // the oldest buffered right, so GC keeps pace on left-quiet
            // keys); always strictly past the current watermark
            val wake = (next.pending.map(_._1) ++ next.rights.map(_._1))
              .reduceOption(_ min _).getOrElse(Long.MaxValue - 1)
            state.setTimeoutTimestamp(math.max(wake + 1, w + 1))
          }
          emits.iterator
      }
  }
}
