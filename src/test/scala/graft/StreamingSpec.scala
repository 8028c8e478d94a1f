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

  test("streaming COPY ingest: dropped .dat payloads decode, compose with masking, late files land") {
    val dir = java.nio.file.Files.createTempDirectory("copy_stream")
    def drop(name: String, rows: Seq[(String, String)]): Unit = {
      // pg-shaped payload: escaped fields, \N nulls, terminator + blanks
      val body = rows.map { case (a, b) =>
        Seq(a, b).map(v => if (v == null) "\\N"
          else graft.sources.CopyText.encodeField(v)).mkString("\t")
      }.mkString("", "\n", "\n") + "\\.\n\n\n"
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }
    drop("a.dat", Seq(("1", "alice"), ("2", null), ("3", "tab\there\nand newline")))
    val decoded = StreamingMask.copyIngestStream(spark, dir.toString, Seq("id", "name"))
    val masked = StreamingMask.maskStream(decoded, TableConfig("s",
      transforms = Seq(ColumnTransform("name", Masking("name")))))
    val q = masked.writeStream.format("memory").queryName("copy_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a LATE payload lands in a later micro-batch; a path with a SPACE
      // must not kill the task (hadoop Path, not java.net.URI(raw))
      drop("b.dat", Seq(("4", "dave")))
      drop("late drop.dat", Seq(("5", "eve")))
      q.processAllAvailable()
      val rows = spark.table("copy_stream_out").as[(String, String)].collect().toMap
      // escapes decoded BEFORE masking (first char + '**'); NULL passes
      // through the transformer (keepNull)
      assert(rows == Map("1" -> "a**", "2" -> null,
        "3" -> "t**", "4" -> "d**", "5" -> "e**"))
    } finally q.stop()
  }

  test("streaming COPY ingest is line-streamed: compressed payloads decode, contents never enter the source") {
    val dir = java.nio.file.Files.createTempDirectory("copy_stream_gz")
    // a gzipped drop (pg_dump's default member shape) with interior
    // empty-string rows and post-terminator blanks
    val body = Seq("1\tv1", "2\t", "3\tv3").mkString("", "\n", "\n") + "\\.\n\n\n"
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("a.dat.gz")))
    gz.write(body.getBytes("UTF-8")); gz.close()
    // our own dump output drops WITH its member-index sidecar — the
    // sidecar is metadata and must never decode as COPY rows
    val gzLen = java.nio.file.Files.size(dir.resolve("a.dat.gz"))
    java.nio.file.Files.write(dir.resolve("a.dat.gz.idx"),
      s"graftgzidx v1 $gzLen\n0 $gzLen\n".getBytes("UTF-8"))
    val decoded = StreamingMask.copyIngestStream(spark, dir.toString, Seq("id", "v"))
    // the memory contract: the streaming SOURCE carries file paths only
    // (binaryFile pruned to `path`) — payload bytes stream through the
    // per-task line decoder, so no plan node materializes a whole file
    // (the pre-round-11 wholetext ingest OOM'd on one big drop)
    val planStr = decoded.queryExecution.logical.toString
    assert(!planStr.contains("wholetext"), "wholetext must be gone")
    val q = decoded.writeStream.format("memory").queryName("copy_gz_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("copy_gz_out").as[(String, String)].collect()
        .sortBy(_._1).toSeq
      // interior empty string survives; terminator + trailing blanks cut;
      // and NO sidecar junk rows (no 'graftgzidx …' header, no offsets)
      assert(rows == Seq(("1", "v1"), ("2", ""), ("3", "v3")))
    } finally q.stop()
  }

  test("crash recovery: query dies MID-BATCH, restarts from checkpoint, no lost and no duplicated rows") {
    // The last unproven streaming claim (VERDICT r13 #6 / r14 #2): a
    // checkpointed copyIngestStream + file sink is exactly-once across a
    // real mid-batch death. The crash is genuine — a poisoned payload
    // (invalid gzip bytes under a .gz name) kills the decode task inside
    // batch 1, AFTER batch 0 committed — not a graceful stop().
    val dir = java.nio.file.Files.createTempDirectory("copy_crash")
    val ckpt = java.nio.file.Files.createTempDirectory("copy_crash_ckpt").toString
    val outPath = java.nio.file.Files.createTempDirectory("copy_crash_out").toString
    def payload(ids: Range): Array[Byte] =
      (ids.map(i => s"$i\tv$i").mkString("", "\n", "\n") + "\\.\n\n\n").getBytes("UTF-8")
    def gzBytes(raw: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close(); bos.toByteArray
    }
    // 12 files × 100 unique ids, staggered modTimes so the file source's
    // (modTime, path) order makes batches deterministic at 3 files/trigger
    val t0 = System.currentTimeMillis() - 120000
    for (f <- 0 until 12) {
      val p = dir.resolve(s"r$f.dat.gz")
      val body =
        if (f == 5) "this is not gzip".getBytes("UTF-8") // the poison
        else gzBytes(payload(f * 100 until (f + 1) * 100))
      java.nio.file.Files.write(p, body)
      p.toFile.setLastModified(t0 + f * 1000L)
    }
    def startQuery() = StreamingMask
      .copyIngestStream(spark, dir.toString, Seq("id", "v"),
        maxFilesPerTrigger = Some(3))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outPath)
      .outputMode("append").start()
    val q1 = startQuery()
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      if (q1.exception.isDefined) throw q1.exception.get
    } finally q1.stop()
    // batch 0 (r0-r2) committed before the death; batch 1 (r3-r5) died
    // mid-flight and must NOT be visible (the sink manifest gates reads)
    val committed = spark.read.parquet(outPath).count()
    assert(committed == 300, s"exactly batch 0 committed: $committed")
    // operator fixes the payload IN PLACE; the offset log pinned batch 1's
    // file set, so the restart replays exactly that batch and continues
    java.nio.file.Files.write(dir.resolve("r5.dat.gz"),
      gzBytes(payload(500 until 600)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(outPath)
    assert(rows.count() == 1200, s"no loss, no dup: ${rows.count()}")
    assert(rows.select("id").distinct().count() == 1200)
    val ids = rows.select(col("id").cast("long")).as[Long].collect().sorted
    assert(ids.head == 0 && ids.last == 1199 && ids.length == 1200)
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

  test("streaming asof: matches emit on watermark, floor GC keeps old rights usable") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.backward(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      watermark = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // rights at t=100 (two rows, tie -> max id) and t=200; lefts at 150, 250
      rightIn.addData((1L, ts(100), 10L, 1.0), (1L, ts(100), 11L, 2.0), (1L, ts(200), 12L, 3.0))
      leftIn.addData((1L, ts(150), 500L), (1L, ts(250), 501L))
      q.processAllAvailable()
      // nothing final until the watermark passes the lefts
      rightIn.addData((1L, ts(1000), 13L, 4.0))
      q.processAllAvailable()
      q.processAllAvailable() // extra trigger lets the event-time timeout fire
      val out1 = spark.table("asof_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
      // left 500 (t=150): latest right <= 150 is t=100, tie -> id 11
      assert(out1(500L) == ((Some(100000L), Some(11L), Some(2.0))))
      // left 501 (t=250): right t=200
      assert(out1(501L) == ((Some(200000L), Some(12L), Some(3.0))))

      // floor GC: rights at 100/200 are far behind the watermark now, yet
      // a new left at t=1500 must still match the latest finalized right
      // (t=1000 folded into the floor)
      leftIn.addData((1L, ts(1500), 502L))
      q.processAllAvailable()
      leftIn.addData((1L, ts(5000), 503L)) // advances watermark past 1500
      q.processAllAvailable()
      q.processAllAvailable()
      val out2 = spark.table("asof_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
      assert(out2(502L) == ((Some(1000000L), Some(13L), Some(4.0))))
    } finally q.stop()
  }

  test("streaming asof forward: earliest right >= left, tie to max id, tolerance nulls out") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.forward(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      watermark = "0 seconds", toleranceMs = Some(300 * 1000L))
    val q = joined.writeStream.format("memory").queryName("asof_fwd_out")
      .outputMode("append").start()
    try {
      // rights: t=100 (tie pair -> max id), t=200; lefts: 90 (-> 100),
      // 150 (-> 200), 100 (inclusive -> 100), 900 (no right within 300s -> null)
      rightIn.addData((1L, ts(100), 10L, 1.0), (1L, ts(100), 11L, 2.0), (1L, ts(200), 12L, 3.0))
      leftIn.addData((1L, ts(90), 500L), (1L, ts(150), 501L), (1L, ts(100), 502L),
        (1L, ts(900), 503L))
      q.processAllAvailable()
      // advance the watermark far past every candidate and 900+tolerance
      rightIn.addData((1L, ts(10000), 99L, 9.9))
      q.processAllAvailable()
      q.processAllAvailable() // extra trigger lets the event-time timeout fire
      val out = spark.table("asof_fwd_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
      assert(out(500L) == ((Some(100000L), Some(11L), Some(2.0)))) // tie -> max id
      assert(out(501L) == ((Some(200000L), Some(12L), Some(3.0))))
      assert(out(502L) == ((Some(100000L), Some(11L), Some(2.0)))) // inclusive >=
      assert(out(503L) == ((None, None, None))) // next right 9100s away, out of tolerance
    } finally q.stop()
  }

  test("streaming asof nearest: closer side wins, equal distance resolves backward") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.nearest(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      watermark = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("asof_near_out")
      .outputMode("append").start()
    try {
      // rights at 100 and 200; lefts: 120 (back 20 < fwd 80 -> 100),
      // 180 (fwd 20 < back 80 -> 200), 150 (tie 50/50 -> backward 100),
      // 50 (no backward, fwd -> 100)
      rightIn.addData((1L, ts(100), 10L, 1.0), (1L, ts(200), 12L, 3.0))
      leftIn.addData((1L, ts(120), 600L), (1L, ts(180), 601L), (1L, ts(150), 602L),
        (1L, ts(50), 603L))
      q.processAllAvailable()
      rightIn.addData((1L, ts(10000), 99L, 9.9))
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("asof_near_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
      assert(out(600L) == ((Some(100000L), Some(10L), Some(1.0))))
      assert(out(601L) == ((Some(200000L), Some(12L), Some(3.0))))
      assert(out(602L) == ((Some(100000L), Some(10L), Some(1.0)))) // tie -> backward
      assert(out(603L) == ((Some(100000L), Some(10L), Some(1.0)))) // forward only
    } finally q.stop()
  }

  test("streaming asof nearest: backward candidate pinned before floor GC") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.nearest(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      watermark = "0 seconds", toleranceMs = Some(40 * 1000L))
    val q = joined.writeStream.format("memory").queryName("asof_pin_out")
      .outputMode("append").start()
    try {
      // left 130: backward candidate is 100 (dist 30, in tolerance); a right
      // at 500 later advances the watermark past 130 (pinning backward) and
      // past 130+40 (no forward within tolerance) -> must emit right@100,
      // NOT the floor right@500 (which is newer than the left)
      rightIn.addData((1L, ts(100), 10L, 1.0))
      leftIn.addData((1L, ts(130), 700L))
      q.processAllAvailable()
      rightIn.addData((1L, ts(500), 50L, 5.0))
      q.processAllAvailable()
      rightIn.addData((1L, ts(10000), 99L, 9.9))
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("asof_pin_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5, r._6))).toMap
      assert(out(700L) == ((Some(100000L), Some(10L), Some(1.0))))
    } finally q.stop()
  }

  test("streaming decontamination drops holdout-matching rows statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val holdout = Seq("benchmark question one", "benchmark question two").toDF("text")
    val input = MemoryStream[(Long, String)]
    val cleaned = StreamingMask.streamingDecontaminate(
      input.toDF().toDF("doc_id", "text"), holdout, "text")
    val q = cleaned.writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "benchmark question one"), (2L, "ordinary training text"),
        (3L, "benchmark question two"), (4L, "more ordinary text"))
      q.processAllAvailable()
      val kept = spark.table("decon_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(2L, 4L))
    } finally q.stop()
  }

  test("streaming bloom decontamination matches the exact streaming variant") {
    implicit val sqlCtx = spark.sqlContext
    val texts = (0 until 60).map(i => s"stream doc number $i with payload $i")
    val holdout = texts.zipWithIndex.collect { case (t, i) if i % 5 == 0 => t }.toDF("text")
    val input = MemoryStream[(Long, String)]
    val cleaned = StreamingMask.streamingDecontaminateBloom(
      input.toDF().toDF("doc_id", "text"), holdout, "text", expectedItems = 100L)
    val q = cleaned.writeStream.format("memory").queryName("decon_bloom_out")
      .outputMode("append").start()
    try {
      input.addData(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      q.processAllAvailable()
      val kept = spark.table("decon_bloom_out").select("doc_id").as[Long].collect().sorted.toSeq
      // exactly the non-holdout docs survive — bloom false positives were
      // exact-verified away, and false negatives cannot exist
      assert(kept == (0 until 60).filter(_ % 5 != 0).map(_.toLong))
    } finally q.stop()
  }

  test("streaming asof forward/nearest: randomized parity with the batch operator") {
    import graft.streaming.StreamingAsOf
    import graft.ops.AsOfJoin
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(4242)
    val tolMs = 50000L
    // two arrival slices with disjoint ascending time windows: interleaved
    // left/right arrival stresses mid-stream state, while slice-2 times
    // staying above slice-1's max keeps the 0s watermark from dropping
    // anything (a dropped late row would diverge from batch BY DESIGN)
    def slice(n0: Int, nL: Int, nR: Int, lo: Int) = (
      (1 to nL).map(i => (1L + rnd.nextInt(3), ts(lo + rnd.nextInt(29) * 10), 500L + n0 + i)),
      (1 to nR).map(i => (1L + rnd.nextInt(3), ts(lo + rnd.nextInt(29) * 10), 10L + n0 + i,
        rnd.nextInt(100) / 10.0)))
    val (l1, r1) = slice(0, 9, 6, 0)
    val (l2, r2) = slice(100, 9, 6, 300)
    val sentinel = (99L, ts(100000), 999L, 0.0)

    for (dir <- Seq("forward", "nearest")) {
      val leftIn = MemoryStream[(Long, Timestamp, Long)]
      val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
      val ldf = leftIn.toDF().toDF("key", "ts", "left_id")
      val rdf = rightIn.toDF().toDF("key", "ts", "right_id", "right_value")
      val joined =
        if (dir == "forward") StreamingAsOf.forward(ldf, rdf, "0 seconds", Some(tolMs))
        else StreamingAsOf.nearest(ldf, rdf, "0 seconds", Some(tolMs))
      val q = joined.writeStream.format("memory").queryName(s"asof_rand_$dir")
        .outputMode("append").start()
      try {
        leftIn.addData(l1); rightIn.addData(r1)
        q.processAllAvailable()
        leftIn.addData(l2); rightIn.addData(r2)
        q.processAllAvailable()
        rightIn.addData(sentinel) // advances watermark past everything
        q.processAllAvailable()
        q.processAllAvailable() // extra trigger lets event-time timeouts fire
        val got = spark.table(s"asof_rand_$dir")
          .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
          .collect().toSet
        // batch ground truth over the SAME rows (epoch-ms longs)
        val bl = (l1 ++ l2).map(e => (e._1, e._2.getTime, e._3)).toDF("key", "ts", "left_id")
        val br = (r1 ++ r2 :+ sentinel).map(e => (e._1, e._2.getTime, e._3, e._4))
          .toDF("key", "ts", "right_id", "right_value")
        val batch = (if (dir == "forward")
            AsOfJoin.forward(bl, br, "key", "ts", Seq("left_id"),
              Seq("right_id", "right_value"), "right_id", Some(tolMs))
          else AsOfJoin.nearest(bl, br, "key", "ts", Seq("left_id"),
            Seq("right_id", "right_value"), "right_id", Some(tolMs)))
          .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
          .collect().toSet
        assert(got == batch, s"direction $dir diverged from batch")
      } finally q.stop()
    }
  }

  test("stream-stream interval join: time-bounded matches only, engine-managed state") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.intervalJoin(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      lowerMs = 60 * 1000L, upperMs = 30 * 1000L, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("sij_out")
      .outputMode("append").start()
    try {
      // left at t=100: window is [40, 130]s. rights at 50 (in), 120 (in),
      // 200 (out); other key never matches
      leftIn.addData((1L, ts(100), 700L))
      rightIn.addData((1L, ts(50), 30L, 1.0), (1L, ts(120), 31L, 2.0),
        (1L, ts(200), 32L, 3.0), (2L, ts(100), 33L, 4.0))
      q.processAllAvailable()
      val out = spark.table("sij_out")
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      assert(out == Set((700L, 30L), (700L, 31L)))
    } finally q.stop()
  }

  test("streaming asof: no-match and out-of-tolerance lefts still emit (left-join shape)") {
    import graft.streaming.StreamingAsOf
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = StreamingAsOf.backward(
      leftIn.toDF().toDF("key", "ts", "left_id"),
      rightIn.toDF().toDF("key", "ts", "right_id", "right_value"),
      watermark = "0 seconds", toleranceMs = Some(30 * 1000L))
    val q = joined.writeStream.format("memory").queryName("asof_tol_out")
      .outputMode("append").start()
    try {
      rightIn.addData((2L, ts(100), 20L, 9.0))
      // left at 120 is within 30s of the right; left at 300 is not; key 3
      // has no right at all
      leftIn.addData((2L, ts(120), 600L), (2L, ts(300), 601L), (3L, ts(120), 602L))
      q.processAllAvailable()
      rightIn.addData((2L, ts(10000), 21L, 1.0), (3L, ts(10000), 22L, 1.0))
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("asof_tol_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._3 -> ((r._4, r._5))).toMap
      assert(out(600L) == ((Some(100000L), Some(20L))))
      assert(out(601L) == ((None, None))) // match exists but out of tolerance
      assert(out(602L) == ((None, None))) // no right for the key
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

  test("streaming index deltas: dup digests silent, changes upsert, deletes tombstone") {
    implicit val sqlCtx = spark.sqlContext
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val input = MemoryStream[(Long, Timestamp, String, Boolean)]
    val deltas = StreamingMask.indexDeltas(
      input.toDF().toDF("doc_id", "ts", "text", "deleted"))
    val q = deltas.writeStream.format("memory").queryName("idx_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(100), "hello world", false), (2L, ts(100), "doc two", false))
      q.processAllAvailable()
      input.addData((1L, ts(200), "hello world", false)) // same digest -> silent
      q.processAllAvailable()
      val afterDup = spark.table("idx_out").count()
      assert(afterDup == 2, s"duplicate content emitted a delta: $afterDup rows")
      // out-of-order WITHIN a batch resolves in event-time order: both
      // versions emit (a log replay), final state is the later one
      input.addData((3L, ts(500), "three B", false), (3L, ts(400), "three A", false))
      q.processAllAvailable()
      input.addData((3L, ts(450), "three C", false)) // stale vs state ts=500 -> dropped
      q.processAllAvailable()
      input.addData((1L, ts(300), "hello world v2", false), (2L, ts(300), "", true))
      q.processAllAvailable()
      val out = spark.table("idx_out")
        .as[(Long, String, String)].collect().toSeq
      assert(out.count(_._1 == 3L) == 2)
      assert(out.filter(_._1 == 3L).map(_._2).toSet ==
        Set(md5hex("three A"), md5hex("three B")))
      assert(out.contains((1L, md5hex("hello world v2"), "upsert")))
      assert(out.contains((2L, null, "delete")))
      // stale doc-3 update (event time behind state) emitted nothing
      assert(!out.exists(r => r._1 == 3L && r._2 == md5hex("three C")))
      // total: 2 initial + 2 for doc 3 + change + tombstone
      assert(out.size == 6, s"unexpected deltas: $out")
    } finally q.stop()
  }

  test("streaming HLL: O(1) register state, final sketch equals the batch sketch") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source").as("grp"),
        explode(graft.llm.TextOps.tokens(col("text"))).as("v"))
    val rows = docs.as[(String, String)].collect().toSeq
    val input = MemoryStream[(String, String)]
    val updates = StreamingSketch.hllRunning(input.toDF().toDF("grp", "v"))
    val q = updates.writeStream.format("memory").queryName("hll_out")
      .outputMode("append").start()
    try {
      val (first, second) = rows.splitAt(rows.size / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      // LAST update per group == the batch sketch over the whole stream
      val finals = spark.table("hll_out").as[(String, Long, Long)].collect()
        .zipWithIndex.groupBy(_._1._1)
        .map { case (g, us) => g -> us.maxBy(_._2)._1 }
      val batch = graft.llm.Sketches.hllDistinct(docs.toDF(), "grp", "v")
        .filter(col("grp") =!= "__union__")
        .collect().map(r => r.getString(0) -> ((r.getString(0), r.getLong(1), r.getLong(3)))).toMap
      assert(finals.keySet == batch.keySet)
      finals.foreach { case (g, u) =>
        assert(u == batch(g), s"$g: stream $u vs batch ${batch(g)}")
      }
      // running estimates never decrease (registers are monotone)
      spark.table("hll_out").as[(String, Long, Long)].collect()
        .zipWithIndex.groupBy(_._1._1).foreach { case (g, us) =>
          val sums = us.sortBy(_._2).map(_._1._2)
          sums.sliding(2).foreach {
            case Array(a, b) => assert(b <= a, s"$g regsum increased (fewer distinct?)")
            case _ => ()
          }
        }
    } finally q.stop()
  }

  test("streaming rate anomaly: spike flagged against trailing baseline, steady not") {
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    // 1-second windows; steady 3 events/window for windows 0..5, spike of
    // 30 in window 6, steady again in 7
    val events = (0 to 5).flatMap(w => Seq.fill(3)(("g", ts(100 + w)))) ++
      Seq.fill(30)(("g", ts(106))) ++ Seq.fill(3)(("g", ts(107)))
    val q = StreamingAnomaly.rateFlags(
        input.toDF().toDF("grp", "ts"), windowMs = 1000L, history = 4,
        k = 3L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(("zz", ts(1000))) // push the watermark past everything
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("rate_out").as[(String, Long, Long, Long, Boolean)]
        .collect().filter(_._1 == "g").sortBy(_._2).toSeq
      assert(out.map(_._2) == (100L to 107L))
      // window 0 has no baseline yet; 1..5 steady at 3 vs baseline 3
      assert(out.filter(w => w._2 >= 101 && w._2 <= 105).forall(w => !w._5 && w._4 == 3L))
      val spike = out.find(_._2 == 106L).get
      assert(spike._3 == 30L && spike._4 == 3L && spike._5, s"spike row: $spike")
      // post-spike window 7: baseline median of (3,3,3,30) = 3 -> not flagged
      val after = out.find(_._2 == 107L).get
      assert(!after._5 && after._4 == 3L)
    } finally q.stop()
  }

  test("streaming bottom-k quantiles: final snapshot equals the batch sketch") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source").as("grp"), col("doc_id").as("id"),
        col("n_chars").as("v"))
    val rows = docs.as[(String, Long, Long)].collect().toSeq
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSketch.sampleQuantilesRunning(
        input.toDF().toDF("grp", "id", "v"), k = 64)
      .writeStream.format("memory").queryName("sq_out")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val all = spark.table("sq_out").as[(String, Int, Long, Long)]
        .collect().zipWithIndex
      val fin = all.groupBy(r => (r._1._1, r._1._2))
        .map { case (key, us) => key -> us.maxBy(_._2)._1 }
      val batch = graft.llm.Sketches.sampleQuantiles(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
          "source", "doc_id", "n_chars", k = 64)
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
      assert(fin.keySet == batch.keySet)
      fin.foreach { case (key, u) =>
        assert(u == batch(key), s"$key: stream $u batch ${batch(key)}")
      }
    } finally q.stop()
  }

  test("streaming bottom-k quantiles: duplicate input rows keep multiplicity (= batch)") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    // ids 1..6 once each, id 3 delivered THREE times (genuine duplicates,
    // split across micro-batches) — the batch sample counts each physical
    // row, so the stream must too
    val base = (1L to 6L).map(i => ("g", i, i * 10L))
    val rows = base ++ Seq(("g", 3L, 30L), ("g", 3L, 30L))
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingSketch.sampleQuantilesRunning(
        input.toDF().toDF("grp", "id", "v"), k = 64, pcts = Seq(25, 50, 100))
      .writeStream.format("memory").queryName("sqdup_out")
      .outputMode("append").start()
    try {
      input.addData(base :+ ("g", 3L, 30L): _*); q.processAllAvailable()
      input.addData(("g", 3L, 30L)); q.processAllAvailable()
      val all = spark.table("sqdup_out").as[(String, Int, Long, Long)]
        .collect().zipWithIndex
      val fin = all.groupBy(r => (r._1._1, r._1._2))
        .map { case (key, us) => key -> us.maxBy(_._2)._1 }
      val batchDf = rows.toDF("source", "doc_id", "n_chars")
      val batch = graft.llm.Sketches.sampleQuantiles(
          batchDf, "source", "doc_id", "n_chars", k = 64, pcts = Seq(25, 50, 100))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
      assert(fin.keySet == batch.keySet)
      fin.foreach { case (key, u) =>
        assert(u == batch(key), s"$key: stream $u batch ${batch(key)}")
      }
      // and the multiplicity is real: n = 8 physical rows, not 6 distinct
      assert(fin.values.head._4 == 8L)
    } finally q.stop()
  }

  test("streaming space-saving: bounded counters keep the true heavy hitters") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    // zipf-ish stream: item i appears ~600/i times, 40 distinct items
    val rows = (1 to 40).flatMap(i => Seq.fill(600 / i)(("g", s"item$i")))
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val cap = 12
    val input = MemoryStream[(String, String)]
    val q = StreamingSketch.spaceSavingRunning(
        input.toDF().toDF("grp", "v"), capacity = cap, k = cap)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      // final snapshot = rows of the last batch per group
      val all = spark.table("hh_out").as[(String, String, Long, Long)]
        .collect().zipWithIndex
      val lastStart = all.map(_._2).max - cap + 1
      val fin = all.filter(_._2 >= lastStart).map(_._1)
        .map(r => r._2 -> (r._3, r._4)).toMap
      // space-saving guarantees, independent of arrival order:
      fin.foreach { case (item, (est, err)) =>
        val t = exact.getOrElse(item, 0L)
        assert(est >= t && est <= t + err, s"$item: est $est err $err true $t")
        assert(err <= n / cap, s"$item err $err > N/cap ${n / cap}")
      }
      // every item with true freq > N/cap must be present
      exact.filter(_._2 > n / cap).keys.foreach { it =>
        assert(fin.contains(it), s"heavy item $it missing from $fin")
      }
    } finally q.stop()
  }

  test("streaming funnel: advances on watermark finality, matches the batch fold") {
    import graft.streaming.StreamingFunnel
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "purchase")
    val input = MemoryStream[(Long, Timestamp, String)]
    val updates = StreamingFunnel.steps(
      input.toDF().toDF("user_id", "ts", "event_type"), steps,
      watermark = "0 seconds")
    val q = updates.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // u1 completes; u2 has view BEFORE signup (stuck at 1); u3's view
      // ties signup's ts (strict-after: no advance past step 1)
      input.addData(
        (1L, ts(100), "signup"), (1L, ts(150), "view"), (1L, ts(200), "purchase"),
        (2L, ts(100), "view"), (2L, ts(150), "signup"),
        (3L, ts(100), "signup"), (3L, ts(100), "view"))
      q.processAllAvailable()
      // push the watermark past every event, then extra triggers for the
      // event-time timeouts to flush buffered folds
      input.addData((99L, ts(100000), "noise"))
      q.processAllAvailable()
      q.processAllAvailable()
      val out = spark.table("funnel_out")
        .as[(Long, Int, Boolean, Long)].collect().toSeq
      val maxDone = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(maxDone.get(1L).contains(3))
      assert(out.contains((1L, 3, true, 200000L)))
      assert(maxDone.get(2L).contains(1))
      assert(maxDone.get(3L).contains(1))
      // batch parity on the finalized users
      import graft.ops.Funnel
      val batch = Seq(
        (1L, 100000L, "signup"), (1L, 150000L, "view"), (1L, 200000L, "purchase"),
        (2L, 100000L, "view"), (2L, 150000L, "signup"),
        (3L, 100000L, "signup"), (3L, 100000L, "view"))
        .toDF("user_id", "tsu", "event_type")
      val expect = Funnel.steps(batch, "user_id", col("tsu"), "event_type", steps)
        .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r._2).toMap
      Seq(1L, 2L, 3L).foreach { u =>
        assert(maxDone(u) == expect(u), s"user $u: stream ${maxDone(u)} batch ${expect(u)}")
      }
      // a late duplicate signup can't restart a completed funnel
      input.addData((1L, ts(100500), "signup"), (1L, ts(100600), "view"))
      input.addData((99L, ts(200000), "noise"))
      q.processAllAvailable()
      q.processAllAvailable()
      val after = spark.table("funnel_out").as[(Long, Int, Boolean, Long)]
        .collect().toSeq.filter(_._1 == 1L)
      assert(after.map(_._2).max == 3 && after.size == out.count(_._1 == 1L))
    } finally q.stop()
  }
}
