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

  case class FwdState(
      pending: List[(Long, Long)],            // (tsMs, leftId) awaiting finality
      rights: List[(Long, Long, Double)])     // (tsMs, rightId, value) in watermark

  /** Streaming as-of FORWARD join — for every left event, the EARLIEST
    * right event with right.ts >= left.ts (ties at one instant to the max
    * id), optionally within `toleranceMs` of (rightTs - leftTs): direction
    * parity with `ops/AsOfJoin.forward`.
    *
    * Finality is candidate-driven, the mirror image of [[backward]]'s
    * left-driven rule: a left's earliest candidate is final once the
    * watermark passes the CANDIDATE's time (no admissible right can arrive
    * at or before it anymore); a candidate-less left finalizes as a null
    * match once the watermark passes left.ts + tolerance. Without a
    * tolerance a candidate-less left waits for the key's next right — the
    * unavoidable cost of "next event" semantics on an open stream (state
    * stays bounded by key activity, and every buffered right is still
    * inside the watermark window). No floor row is needed: rights behind
    * the watermark can only match lefts that are themselves already final,
    * so they drop entirely rather than fold. */
  def forward(left: DataFrame, right: DataFrame, watermark: String = "10 minutes",
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
      .flatMapGroupsWithState[FwdState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, events, state: GroupState[FwdState]) =>
          val prev = state.getOption.getOrElse(FwdState(Nil, Nil))
          val evs = if (state.hasTimedOut) Seq.empty else events.toSeq
          val pending = prev.pending ++ evs.filter(_._3 == 1).map(e => (e._2.getTime, e._4))
          val rights = prev.rights ++ evs.filter(_._3 == 0).map(e => (e._2.getTime, e._4, e._5))
          val w = state.getCurrentWatermarkMs
          def bestFor(t: Long): Option[(Long, Long, Double)] =
            rights.filter(r => r._1 >= t && toleranceMs.forall(tol => r._1 - t <= tol))
              .sortBy(r => (r._1, -r._2)).headOption // earliest ts, max id on tie
          val (ready, stillPending) = pending.partition { case (t, _) =>
            val best = bestFor(t)
            // candidate settled (nothing can arrive at or before its ts),
            // or provably no candidate can ever arrive inside the tolerance
            best.exists(_._1 < w) || (best.isEmpty && toleranceMs.exists(tol => t + tol < w))
          }
          val emits = ready.sorted.map { case (t, lid) =>
            val best = bestFor(t)
            AsOfMatch(key, t, lid, best.map(_._1), best.map(_._2), best.map(_._3))
          }
          // GC: rights behind the watermark can only serve lefts with
          // t <= ts_r < w — all of which just finalized above
          val keep = rights.filter(_._1 >= w)
          if (stillPending.isEmpty && keep.isEmpty) {
            state.remove()
          } else {
            state.update(FwdState(stillPending, keep))
            val wake = (stillPending.flatMap { case (t, _) =>
              bestFor(t).map(_._1).orElse(toleranceMs.map(t + _))
            } ++ keep.map(_._1)).reduceOption(_ min _).getOrElse(Long.MaxValue - 1)
            state.setTimeoutTimestamp(math.max(wake + 1, w + 1))
          }
          emits.iterator
      }
  }

  case class NearPending(ts: Long, leftId: Long, bFinal: Boolean,
                         b: Option[(Long, Long, Double)])
  case class NearState(
      pending: List[NearPending],
      rights: List[(Long, Long, Double)],
      floor: Option[(Long, Long, Double)])

  /** Streaming as-of NEAREST join — the closer of the backward and forward
    * matches, equal distances resolving backward: direction parity with
    * `ops/AsOfJoin.nearest` (tolerance bounds BOTH distances).
    *
    * Two-phase finality: (1) once the watermark passes left.ts the
    * backward candidate is settled — it is resolved THEN and pinned on the
    * pending row, before older rights collapse into the floor (resolving
    * later against the floor could see a right NEWER than the left);
    * (2) the row emits once the forward side is also decided — its
    * candidate's time passed by the watermark, out of tolerance reach, or
    * provably unable to beat the pinned backward match (any future right
    * is at least watermark-far away, and backward wins distance ties). */
  def nearest(left: DataFrame, right: DataFrame, watermark: String = "10 minutes",
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
      .flatMapGroupsWithState[NearState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, events, state: GroupState[NearState]) =>
          val prev = state.getOption.getOrElse(NearState(Nil, Nil, None))
          val evs = if (state.hasTimedOut) Seq.empty else events.toSeq
          val rights = prev.rights ++ evs.filter(_._3 == 0).map(e => (e._2.getTime, e._4, e._5))
          val pending0 = prev.pending ++
            evs.filter(_._3 == 1).map(e => NearPending(e._2.getTime, e._4, bFinal = false, None))
          val w = state.getCurrentWatermarkMs
          // phase 1: pin the backward candidate the moment it is settled
          val pending = pending0.map { p =>
            if (!p.bFinal && p.ts < w) {
              val cand = prev.floor.toList ++ rights.filter(_._1 <= p.ts)
              val b = cand.sortBy(r => (r._1, r._2)).lastOption
                .filter(r => toleranceMs.forall(tol => p.ts - r._1 <= tol))
              p.copy(bFinal = true, b = b)
            } else p
          }
          def fBestFor(t: Long): Option[(Long, Long, Double)] =
            rights.filter(r => r._1 >= t && toleranceMs.forall(tol => r._1 - t <= tol))
              .sortBy(r => (r._1, -r._2)).headOption
          // phase 2: emit once the forward side can no longer change
          val (ready, stillPending) = pending.partition { p =>
            p.bFinal && {
              val f = fBestFor(p.ts)
              f.exists(_._1 < w) ||
                toleranceMs.exists(tol => p.ts + tol < w) ||
                p.b.exists(b => w - p.ts >= p.ts - b._1)
            }
          }
          val emits = ready.sortBy(p => (p.ts, p.leftId)).map { p =>
            val f = fBestFor(p.ts)
            val chosen = (p.b, f) match {
              case (Some(b), Some(fc)) =>
                if (p.ts - b._1 <= fc._1 - p.ts) Some(b) else Some(fc)
              case (b, fc) => b.orElse(fc)
            }
            AsOfMatch(key, p.ts, p.leftId, chosen.map(_._1), chosen.map(_._2), chosen.map(_._3))
          }
          // GC: old rights fold into the floor for future lefts' backward
          // side (pending lefts already pinned theirs in phase 1)
          val (old, keep) = rights.partition(_._1 < w)
          val floor = (prev.floor.toList ++ old).sortBy(r => (r._1, r._2)).lastOption
          if (stillPending.isEmpty && keep.isEmpty && floor.isEmpty) {
            state.remove()
          } else {
            state.update(NearState(stillPending, keep, floor))
            val wake = (stillPending.flatMap { p =>
              val needs = List(p.ts) ++ fBestFor(p.ts).map(_._1).toList ++
                toleranceMs.map(p.ts + _).toList
              needs
            } ++ keep.map(_._1)).reduceOption(_ min _).getOrElse(Long.MaxValue - 1)
            state.setTimeoutTimestamp(math.max(wake + 1, w + 1))
          }
          emits.iterator
      }
  }
}
