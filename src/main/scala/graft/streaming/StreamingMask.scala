package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.{Planner, TableConfig}
import graft.llm.TextOps

/** Structured Streaming surface. The reference is batch-only (a dump is a
  * snapshot, SURVEY §1.2), but the masking plans here are pure per-row
  * projections, so they lift to streams unchanged — `readStream ->
  * transform chain -> writeStream`. These helpers pin the idioms:
  * plan-on-stream, watermarked windowed aggregation, and stateful
  * streaming dedup.
  */
object StreamingMask {

  /** Apply a table masking config to a streaming DataFrame. The planner
    * emits a single select projection — fully streaming-compatible (no
    * limit/sort in streaming configs). */
  def maskStream(stream: DataFrame, cfg: TableConfig): DataFrame = {
    require(cfg.limit.isEmpty, "streaming masking: limit is not applicable")
    Planner.plan(stream, cfg)
  }

  /** Continuous COPY-payload ingestion: watch `dir` for dropped
    * pg-formatted `.dat[.gz/.lz4/.zst]` payloads (pg_dump data members,
    * psql COPY spools, our own archive payloads) and decode each as it
    * lands — the streaming twin of [[graft.sources.CopyText.read]],
    * composing with [[maskStream]] for continuous masked ingestion.
    *
    * The file SOURCE is `binaryFile` pruned to the `path` column — the
    * stream carries file NAMES, never file contents (column pruning
    * means the source does not read payload bytes at all), and each task
    * stream-decodes its files line by line through the batch reader's
    * own machinery (`CopyText.linesFrom`: decompress-by-suffix, decode,
    * cut at the payload's `\.` terminator). Task memory is ONE line
    * buffer, so a multi-GB dropped payload streams through instead of
    * materializing in a single task (the pre-round-11 `wholetext`
    * ingest's failure mode). Trailing blank lines real pg_dump appends
    * AFTER the terminator never emit (the cut stops first); legitimate
    * interior empty-string rows survive. One file = one COPY stream is
    * the format's shape, so per-file decode is sequential and the
    * parallelism unit is files-per-trigger, same as the dump side's
    * bounded members. `maxFilesPerTrigger` bounds each micro-batch (a
    * backlog of thousands of dropped payloads streams through in bounded
    * slices instead of one giant catch-up batch); with a checkpointed
    * file sink the whole pipeline is exactly-once across crashes — the
    * offset log pins each batch's file set, uncommitted batches replay in
    * full on restart, and committed output is never re-emitted (proven by
    * StreamingSpec's kill-mid-batch case). */
  def copyIngestStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                       columns: Seq[String],
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // binaryFile's fixed schema, stated explicitly (streaming sources
    // don't infer); only `path` is ever selected, so the source prunes
    // `content` away and reads no payload bytes
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val reader = spark.readStream.format("binaryFile").schema(binarySchema)
    val lines = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .load(dir)
      .select("path").as[String]
      // only COPY payloads decode: a LIVE archive dir also holds the
      // binary toc.dat, metadata.json, the heartbeat stamp, and `.idx`
      // member sidecars — decoding any of those would inject junk rows
      // (found composing the live pg-dump -> watch-dir flow, r13). The
      // scaladoc contract is `.dat[.gz/.lz4/.zst]`; enforce exactly it.
      .filter { p =>
        val name = new org.apache.hadoop.fs.Path(p).getName
        name != "toc.dat" && name.matches(""".*\.dat(\.(gz|lz4|zst))?$""")
      }
      .flatMap { p =>
        graft.sources.CopyText.linesFrom(p, 0L,
          Long.MaxValue, graft.sources.Compress.algoOfFile(p))
      }
    graft.sources.CopyText.linesToRows(lines, columns)
  }

  /** Watermarked per-window document-quality aggregation: the shape of a
    * continuous training-data quality monitor (event-time + late-data
    * handling via watermark). */
  def qualityByWindow(stream: DataFrame, tsCol: String, textCol: String,
                      windowDur: String = "1 minute",
                      watermark: String = "2 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(
        avg(TextOps.qualityScore(col(textCol))).as("avg_quality"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        count(lit(1)).as("n_docs"))

  /** Streaming model-based quality scoring: apply a batch-trained
    * [[graft.llm.QualityClassifier.NbModel]] to an unbounded document
    * stream. Stateless per-row inference (the bounded weight map rides
    * the plan as a literal; no stream-static join, no state store), so
    * throughput is pure map parallelism — the batch-train /
    * stream-score split a 100 TB/day curation pipeline runs. */
  def classifierScoreStream(stream: DataFrame, textCol: String,
                            model: graft.llm.QualityClassifier.NbModel): DataFrame = {
    val score = graft.llm.QualityClassifier.scoreWith(col(textCol), model)
    stream.withColumn("score_nanonats", score)
      .withColumn("pred", when(col("score_nanonats") >= 0, 1).otherwise(0))
  }

  /** Streaming exact dedup: watermark-bounded state keyed by content
    * digest (dropDuplicates keeps first-seen; state expires past the
    * watermark — bounded memory at 100 TB/day stream rates). */
  def streamingDedup(stream: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming decontamination: drop every stream row whose content
    * digest appears in a (static, batch) holdout/benchmark corpus — the
    * streaming complement of `Dedup.crossCorpusExact`, as a stateless
    * stream-static LEFT ANTI join. The holdout digest set is distinct'd
    * and tiny next to the stream, so it broadcasts; stream rows never
    * leave their micro-batch partitions and text never shuffles. */
  def streamingDecontaminate(stream: DataFrame, holdout: DataFrame,
                             textCol: String): DataFrame = {
    val h = holdout.select(sha2(col(textCol), 256).as("__h")).distinct()
    stream.withColumn("__h", sha2(col(textCol), 256))
      .join(h, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Bloom-prefiltered streaming decontamination — output identical to
    * [[streamingDecontaminate]], but the common case (a clean row) never
    * enters ANY join: the holdout bloom is built once at plan time
    * (batch-side bounded reduction) and probed as a literal inside each
    * micro-batch, so only the ~fpp false-positive sliver reaches the
    * stream-static anti join. Delegates to
    * [[graft.llm.Curation.decontaminateBloom]], whose plan (literal
    * probe + self-union + stream-static LEFT ANTI) is streaming-safe. */
  def streamingDecontaminateBloom(stream: DataFrame, holdout: DataFrame,
                                  textCol: String, expectedItems: Long = 100000L,
                                  fpp: Double = 0.01): DataFrame =
    graft.llm.Curation.decontaminateBloom(stream, holdout, textCol, expectedItems, fpp)

  case class SessionState(count: Long, lastMs: Long)
  case class SessionUpdate(user_id: Long, n_events: Long, closed: Boolean)

  /** Custom streaming state via flatMapGroupsWithState (the
    * KeyValueGroupedDataset path from the brief): per-user session event
    * counters with an EVENT-TIME idle timeout — when the watermark passes
    * last-event + gap, the session closes, emits its final count, and the
    * state is freed (bounded state at stream scale, deterministic in
    * event time — no wall-clock batches). Input: (user_id, ts) columns. */
  def sessionCounts(stream: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                    watermark: String = "10 minutes")
                   : org.apache.spark.sql.Dataset[SessionUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(user, s.count, closed = true))
          } else {
            val evs = events.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val next = SessionState(prev.count + evs.size,
              math.max(prev.lastMs, evs.map(_._2.getTime).max))
            state.update(next)
            // A late event (within allowed lateness) can put lastMs+gap
            // BEHIND the current watermark, which Spark rejects — clamp
            // to just past the watermark so the session times out on the
            // next trigger instead of crashing the query.
            state.setTimeoutTimestamp(
              math.max(next.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            Iterator(SessionUpdate(user, next.count, closed = false))
          }
      }
  }

  case class IndexDelta(doc_id: Long, digest: String, op: String)

  /** Streaming CDC index maintenance — the streaming lift of
    * [[graft.llm.Dedup.incrementalMinhashIndex]]'s reuse rule: per doc
    * id, keep the last content digest in state; a row whose digest equals
    * the stored one emits NOTHING (downstream index writers see only real
    * deltas), a new/changed digest emits an `upsert`, and a row flagged
    * deleted emits a `delete` tombstone and frees the state. Updates for
    * the same id resolve in event-time order WITHIN a micro-batch, so
    * replaying a log reaches the same final index regardless of batching.
    * State is one (digest, ts) pair per LIVE doc — the inherent size of
    * an index, not of the stream. Input columns: (doc_id, ts, text,
    * deleted: boolean). */
  def indexDeltas(stream: DataFrame): org.apache.spark.sql.Dataset[IndexDelta] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("doc_id").cast("long"), col("ts"),
        md5(col("text")).as("digest"), col("deleted").cast("boolean"))
      .as[(Long, java.sql.Timestamp, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long), IndexDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[(String, Long)]) =>
          val out = scala.collection.mutable.ArrayBuffer[IndexDelta]()
          var cur = state.getOption
          rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach {
            case (_, ts, digest, deleted) =>
              val ms = ts.getTime
              if (cur.forall(_._2 <= ms)) {
                if (deleted) {
                  if (cur.isDefined) { out += IndexDelta(id, null, "delete"); cur = None }
                } else if (!cur.exists(_._1 == digest)) {
                  out += IndexDelta(id, digest, "upsert")
                  cur = Some((digest, ms))
                } else cur = Some((digest, ms))
              }
          }
          cur match {
            case Some(c) => state.update(c)
            case None    => if (state.exists) state.remove()
          }
          out.iterator
      }
  }
}
