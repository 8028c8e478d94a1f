package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.{ColumnTransform, TableConfig}
import graft.streaming.StreamingMask
import graft.transformers.{Masking, RandomInt}

import java.sql.Timestamp

/** Structured Streaming lift of the masking plans + watermarked quality
  * aggregation + stateful streaming dedup, driven through MemoryStream ->
  * memory sink round-trips. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("masking plan applies to a stream unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, String)]
    val stream = input.toDF().toDF("id", "name")
    val masked = StreamingMask.maskStream(stream, TableConfig("s",
      transforms = Seq(ColumnTransform("name", Masking("name")))))
    val q = masked.writeStream.format("memory").queryName("masked_out")
      .outputMode("append").start()
    try {
      input.addData((1, "alice"), (2, "bob"))
      q.processAllAvailable()
      val rows = spark.table("masked_out").as[(Int, String)].collect().toMap
      assert(rows == Map(1 -> "a**", 2 -> "b**"))
    } finally q.stop()
  }

  test("watermarked window aggregates doc quality") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val agg = StreamingMask.qualityByWindow(stream, "ts", "text", "1 minute", "2 minutes")
    val q = agg.writeStream.format("memory").queryName("quality_out")
      .outputMode("update").start()
    try {
      input.addData((ts(0), "the quick brown fox"), (ts(10), "a b c"), (ts(70), "later window"))
      q.processAllAvailable()
      val rows = spark.table("quality_out").collect()
      assert(rows.length >= 2) // two windows
      assert(rows.forall(_.getAs[Long]("n_docs") >= 1))
    } finally q.stop()
  }

  test("streaming dedup drops same-content rows within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val deduped = StreamingMask.streamingDedup(stream, "ts", "text", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "same doc"), (ts(5), "same doc"), (ts(6), "other doc"))
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").as[String].collect().toSeq
      assert(texts.sorted == Seq("other doc", "same doc"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: event-time sessions count, close, and free state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val stream = input.toDF().toDF("user_id", "ts")
    val updates = StreamingMask.sessionCounts(stream,
      gapMs = 60 * 1000L, watermark = "0 seconds")
    val q = updates.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData((7L, ts(100)), (7L, ts(130)), (9L, ts(100)))
      q.processAllAvailable()
      // watermark jumps far past both sessions' last-event + gap:
      // the timed-out states emit closed sessions and are removed
      input.addData((8L, ts(100000)))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[(Long, Long, Boolean)].collect().toSeq
      assert(out.contains((7L, 2L, false))) // running count within the session
      assert(out.contains((9L, 1L, false)))
      assert(out.contains((7L, 2L, true)))  // closed on timeout with final count
      assert(out.contains((9L, 1L, true)))
    } finally q.stop()
  }

  test("very-late events are filtered; sessions survive watermark jumps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val stream = input.toDF().toDF("user_id", "ts")
    val updates = StreamingMask.sessionCounts(stream,
      gapMs = 60 * 1000L, watermark = "0 seconds")
    val q = updates.writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(100000)))
      q.processAllAvailable() // watermark advances to ts(100000)
      // Spark filters rows behind the event-time watermark before they
      // reach the state function (FlatMapGroupsWithStateExec late-data
      // filter), so this event never creates a session. The timeout clamp
      // in sessionCounts is defense-in-depth for the residual paths where
      // lastMs + gap can still trail the watermark.
      input.addData((2L, ts(100)))
      q.processAllAvailable()
      input.addData((3L, ts(200000)))
      q.processAllAvailable()
      val out = spark.table("sess_late_out").as[(Long, Long, Boolean)].collect().toSeq
      assert(!out.exists(_._1 == 2L))      // late row dropped, query alive
      assert(out.contains((1L, 1L, true))) // earlier session still closed cleanly
      assert(out.contains((3L, 1L, false)))
    } finally q.stop()
  }
}
