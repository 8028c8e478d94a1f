package graft

import graft.ops.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** As-of and range join operators: brute-force parity on randomized data
  * plus plan-shape asserts (the whole point of these formulations is what
  * they do NOT plan: no nested-loop join, no per-key materialization). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (key, time, id, value)
  private def rows(n: Int, keys: Int, salt: Int) = (0 until n).map { i =>
    val h = scala.util.hashing.MurmurHash3.stringHash(s"jop$salt|$i").toLong & 0xFFFFFFFFL
    (h % keys, (h >> 8) % 1000L, i.toLong, (h % 97).toDouble)
  }

  test("asof backward matches per-row brute force; ties break to max id") {
    val left = rows(200, 7, 1).toDF("k", "t", "id", "v")
    val right = rows(300, 7, 2).toDF("k", "t", "id", "v")
    val out = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id", "v"), tieBreak = "id")
      .select("k", "t", "id", "right_t", "right_id", "right_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap

    val rightLocal = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (l <- left.collect()) {
      val (k, t, id) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val cand = rightLocal.filter(r => r._1 == k && r._2 <= t)
      val expected =
        if (cand.isEmpty) (None, None, None)
        else {
          val best = cand.maxBy(r => (r._2, r._3)) // latest time, then max id
          (Some(best._2), Some(best._3), Some(best._4))
        }
      assert(out((k, t, id)) == expected, s"key=$k t=$t id=$id")
    }
  }

  test("asof forward matches per-row brute force; inclusive at equal time") {
    val left = rows(200, 7, 3).toDF("k", "t", "id", "v")
    val right = rows(300, 7, 4).toDF("k", "t", "id", "v")
    val out = AsOfJoin.forward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id", "v"), tieBreak = "id")
      .select("k", "t", "id", "right_t", "right_id", "right_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    val rightLocal = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (l <- left.collect()) {
      val (k, t, id) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val cand = rightLocal.filter(r => r._1 == k && r._2 >= t)
      val expected =
        if (cand.isEmpty) (None, None, None)
        else {
          // earliest time; among ties the max id (backward convention)
          val best = cand.minBy(r => (r._2, -r._3))
          (Some(best._2), Some(best._3), Some(best._4))
        }
      assert(out((k, t, id)) == expected, s"key=$k t=$t id=$id")
    }
  }

  test("asof nearest picks the closer side, resolves ties backward, honors tolerance") {
    val left = rows(200, 7, 5).toDF("k", "t", "id", "v")
    val right = rows(300, 7, 6).toDF("k", "t", "id", "v")
    val tol = 80L
    val out = AsOfJoin.nearest(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id", "v"), tieBreak = "id",
      tolerance = Some(tol))
      .select("k", "t", "id", "right_t", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    val rightLocal = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (l <- left.collect()) {
      val (k, t, id) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val back = rightLocal.filter(r => r._1 == k && r._2 <= t && (t - r._2) <= tol)
        .sortBy(r => (r._2, r._3)).lastOption
      val fwd = rightLocal.filter(r => r._1 == k && r._2 >= t && (r._2 - t) <= tol)
        .sortBy(r => (r._2, -r._3)).headOption
      val expected = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if ((t - b._2) <= (f._2 - t)) (Some(b._2), Some(b._3)) else (Some(f._2), Some(f._3))
        case (Some(b), None) => (Some(b._2), Some(b._3))
        case (None, Some(f)) => (Some(f._2), Some(f._3))
        case _ => (None, None)
      }
      assert(out((k, t, id)) == expected, s"key=$k t=$t id=$id")
    }
  }

  test("asof carried columns are atomic: NULL field in the matched right row stays NULL") {
    // latest matching right row (t=95) has v = NULL; an older row (t=90)
    // has v = 7.0. Per-column carry would back-fill v from t=90 — the
    // round-4 advice defect. The struct carry must keep (id=21, v=NULL).
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 20L, Some(7.0)), (1L, 95L, 21L, None))
      .toDF("k", "t", "id", "v")
    val r = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id", "v"), tieBreak = "id")
      .select("right_t", "right_id", "right_v").collect().head
    assert(r.getLong(0) == 95L && r.getLong(1) == 21L && r.isNullAt(2),
      s"expected atomic (95, 21, NULL), got $r")
  }

  test("asof tolerance validates against the matched row's own right_t") {
    // match at t=95 carries v=NULL; tolerance=4 excludes it. A per-column
    // carry that back-filled v from t=90 would also mis-check tolerance
    // against the older row's time.
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 20L, Some(7.0)), (1L, 95L, 21L, None))
      .toDF("k", "t", "id", "v")
    val r = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id", "v"), tieBreak = "id",
      tolerance = Some(4L))
      .select("right_t", "right_id", "right_v").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"match at distance 5 must null out entirely under tolerance 4, got $r")
  }

  test("asof tie-break orders by the raw column (non-numeric tieBreak works)") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    val right = Seq((1L, 95L, "aa"), (1L, 95L, "ab")).toDF("k", "t", "name")
    val r = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("name"), tieBreak = "name")
      .select("right_name").collect().head
    assert(r.getString(0) == "ab") // greatest raw value, not NULL-from-cast
  }

  test("asof tolerance nulls matches farther back than the bound") {
    val left = Seq((1L, 100L, 10L), (1L, 500L, 11L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 20L), (1L, 95L, 21L)).toDF("k", "t", "id")
    val out = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id"), tieBreak = "id",
      tolerance = Some(50L))
      .select("t", "right_id").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == Some(21L)) // within 50
    assert(out(500L) == None)      // 405 back — out of tolerance, row kept
  }

  test("asof plan: window formulation — no join node, one shuffle") {
    val left = rows(50, 3, 3).toDF("k", "t", "id", "v")
    val right = rows(50, 3, 4).toDF("k", "t", "id", "v")
    val plan = AsOfJoin.backward(left, right, "k", "t",
      leftCols = Seq("id"), rightCols = Seq("id"), tieBreak = "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
  }

  test("range join matches brute force and never nested-loops") {
    val points = rows(200, 5, 5).toDF("k", "t", "id", "v")
      .select(col("k"), col("t"), col("id"))
    val intervals = rows(80, 5, 6).toDF("k", "t", "id", "v")
      .select(col("k"), col("t").as("t_start"),
        (col("t") + lit(120L)).as("t_end"), col("id").as("iv_id"))
    val joined = RangeJoin.pointInInterval(points, intervals, "k", "t",
      "t_start", "t_end", Seq("id"), Seq("iv_id"), bucketWidth = 100L)
    val got = joined.select("k", "id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ptsL = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ivsL = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      p <- ptsL; iv <- ivsL
      if p._1 == iv._1 && p._2 >= iv._2 && p._2 <= iv._3
    } yield (p._1, p._3, iv._4)).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // fixture actually produces pairs

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
  }

  test("interval overlap join matches brute force, pair-unique, no nested loop") {
    val left = rows(120, 5, 5).toDF("k", "t", "id", "v")
      .select(col("k"), col("t").as("ls"), (col("t") + lit(150L)).as("le"),
        col("id").as("lid"))
    val right = rows(90, 5, 6).toDF("k", "t", "id", "v")
      .select(col("k"), col("t").as("rs"), (col("t") + lit(220L)).as("re"),
        col("id").as("rid"))
    val joined = RangeJoin.intervalOverlap(left, right, "k", "ls", "le",
      "rs", "re", Seq("lid"), Seq("rid"), bucketWidth = 100L)
    val got = joined.select("k", "lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // unique by construction — no pair twice even across shared buckets
    assert(got.toSet.size == got.length)

    val lL = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rL = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      a <- lL; b <- rL
      if a._1 == b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, a._4, b._4)).toSet
    assert(got.toSet == expected)
    assert(expected.nonEmpty)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap fell back to nested loop:\n$plan")
    // pair-dedup shuffle absent: no aggregate anywhere in the plan
    assert(!plan.contains("HashAggregate"), plan)
  }

  test("range join: duplicate-free across bucket boundaries, inverted intervals dropped") {
    // interval spans 3 buckets; the point matches exactly once
    val points = Seq((1L, 250L, 1L)).toDF("k", "t", "id")
    val intervals = Seq(
      (1L, 10L, 290L, 100L),  // covers buckets 0,1,2 — contains t=250
      (1L, 300L, 200L, 101L)) // inverted: start > end — dropped
      .toDF("k", "t_start", "t_end", "iv_id")
    val out = RangeJoin.pointInInterval(points, intervals, "k", "t",
      "t_start", "t_end", Seq("id"), Seq("iv_id"), bucketWidth = 100L)
      .select("iv_id").as[Long].collect().toSeq
    assert(out == Seq(100L))
  }
}
