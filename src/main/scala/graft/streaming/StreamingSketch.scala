package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Sketches

/** Streaming sketch maintenance — running distinct-count estimates per
  * group over an unbounded stream, the streaming complement of
  * `Sketches.hllDistinct`: state per group is EXACTLY the 64 HLL
  * registers (one byte of rank each — O(1) regardless of stream volume),
  * updated register-wise per micro-batch and emitted as the same
  * integer register sum + milli estimate the batch sketch produces. A
  * group that goes quiet holds 64 bytes forever — the sketch never
  * grows, which is what makes unbounded-retention distinct counting
  * possible at all (exact streaming distinct state grows with
  * cardinality).
  *
  * Determinism: same salted u60 stream as batch, so after any prefix of
  * the stream the emitted sketch equals `hllDistinct` over that prefix
  * — spec-pinned.
  */
object StreamingSketch {

  case class SketchUpdate(grp: String, hll_regsum: Long, hll_est_milli: Long)

  case class HeavyHitter(grp: String, item: String, est: Long, err: Long)

  case class QuantileUpdate(grp: String, pct: Int, est_value: Long, sample_n: Long)

  /** Streaming bottom-k sample quantiles — the streaming complement of
    * `Sketches.sampleQuantiles`: state per group is the k rows with the
    * smallest u60(id) seen so far (the mergeable bottom-k sample), so
    * after any stream prefix the emitted quantiles EQUAL the batch
    * operator over that prefix — spec-pinned. State is exactly k
    * (hash, id, value) triples per group, independent of stream volume.
    * Emits the current estimates per micro-batch; read the last snapshot
    * per group.
    */
  def sampleQuantilesRunning(stream: DataFrame, k: Int,
                             pcts: Seq[Int] = Seq(25, 50, 75, 90),
                             tweak: String = "sq"): Dataset[QuantileUpdate] = {
    require(k >= 1 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "sampleQuantilesRunning: k >= 1, percentiles in [1,100]")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("grp"), col("id").cast("long"), col("v").cast("long"),
        graft.generators.Gen.u60(col("id"), tweak).as("h"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], QuantileUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (grp, rows, state: GroupState[Vector[(Long, Long, Long)]]) =>
          // state: (h, id, v) sorted by (h, id), size <= k. Duplicate
          // input rows KEEP their multiplicity — the batch operator's
          // row_number sample counts each physical row, and the state
          // store's batch-id checkpointing already makes engine-side
          // replay idempotent (no .distinct needed, and .distinct would
          // silently collapse genuinely duplicated rows)
          val merged = (state.getOption.getOrElse(Vector.empty) ++
            rows.map { case (_, id, v, h) => (h, id, v) })
            .sortBy(t => (t._1, t._2)).take(k)
          state.update(merged)
          // batch rank rule over the sample: value at ceil(n*p/100),
          // ordered by (v, id) like the batch operator
          val byV = merged.sortBy(t => (t._3, t._2))
          val n = byV.size.toLong
          pcts.iterator.map { p =>
            val rk = ((n * p + 99) / 100).toInt // 1-based
            QuantileUpdate(grp, p, byV(rk - 1)._3, n)
          }
      }
  }

  /** Streaming heavy hitters by SPACE-SAVING (Metwally et al.): at most
    * `capacity` counters per group; a new item evicts the minimum
    * counter and inherits its count as overestimation error. The classic
    * guarantees hold regardless of arrival order: every item with true
    * frequency > N/capacity is present, and true <= est <= true + err
    * with err <= N/capacity — so the bounded state answers "what
    * dominates this stream" exactly where exact counting would need
    * cardinality-sized state. Emits the current top-`k` snapshot per
    * micro-batch (a monitoring stream; read the LAST snapshot per group
    * for the final answer).
    */
  def spaceSavingRunning(stream: DataFrame, capacity: Int, k: Int)
      : Dataset[HeavyHitter] = {
    require(capacity >= 1 && k >= 1 && k <= capacity,
      "spaceSaving: need 1 <= k <= capacity")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("grp"), col("v").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, (Long, Long)], HeavyHitter](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (grp, rows, state: GroupState[Map[String, (Long, Long)]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          rows.foreach { case (_, v) =>
            m.get(v) match {
              case Some((c, e)) => m = m.updated(v, (c + 1, e))
              case None if m.size < capacity => m = m.updated(v, (1L, 0L))
              case None =>
                // evict the minimum counter (ties by item for determinism)
                val (minItem, (minC, _)) = m.minBy { case (it, (c, _)) => (c, it) }
                m = (m - minItem).updated(v, (minC + 1, minC))
            }
          }
          state.update(m)
          m.toSeq.sortBy { case (it, (c, _)) => (-c, it) }.take(k)
            .map { case (it, (c, e)) => HeavyHitter(grp, it, c, e) }.iterator
      }
  }

  /** @param stream streaming (grp: string, v: string) */
  def hllRunning(stream: DataFrame): Dataset[SketchUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val m = Sketches.HllM
    stream
      .select(col("grp"), graft.generators.Gen.u60(col("v"), "hll").as("h"))
      .select(col("grp"), (col("h") % m).cast("int").as("reg"),
        shiftright(col("h"), 6).as("w"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], SketchUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (grp, rows, state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { case (_, reg, w) =>
            // rank = 55 - bit_length(w); w = 0 -> 55 (matches hllRank)
            val rank = if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rank > regs(reg)) regs(reg) = rank.toByte
          }
          state.update(regs)
          // same integer sum + single division as the batch estimator
          val regsum = regs.map(r => 1L << (55 - r)).sum
          val nEmpty = regs.count(_ == 0)
          val raw = Sketches.HllNumerator / regsum.toDouble
          val est =
            if (nEmpty == 0 || raw > Sketches.HllSmallRange) raw
            else (m.toLong * (Sketches.LnMNano -
              math.floor(math.log(nEmpty.toDouble) * 1e9 + 0.5).toLong)).toDouble / 1e9
          Iterator(SketchUpdate(grp, regsum,
            math.floor(est * 1000.0 + 0.5).toLong))
      }
  }
}
