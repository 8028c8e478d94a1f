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

  /** Streaming exact dedup: watermark-bounded state keyed by content
    * digest (dropDuplicates keeps first-seen; state expires past the
    * watermark — bounded memory at 100 TB/day stream rates). */
  def streamingDedup(stream: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
