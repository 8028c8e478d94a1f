package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — pair each left point with every right interval
  * of the same key that contains it: key match AND start <= t <= end.
  *
  * Catalyst plans a raw range predicate join as BroadcastNestedLoopJoin
  * (quadratic per key) because only equality conditions hash-partition.
  * The scale shape is bucketing: quantize time into fixed-width buckets,
  * explode each interval to the buckets it covers, map each point to its
  * single bucket, then equi-join on (key, bucket) and re-check the exact
  * predicate. Every row shuffles once by (key, bucket); an interval of
  * width W costs ceil(W/bucket)+1 duplicate rows — bounded fan-out chosen
  * by `bucketWidth`, not data-dependent blow-up. No pair is produced twice
  * because a point lives in exactly one bucket.
  *
  * Pick bucketWidth ~ the typical interval width: each interval then
  * explodes to ~2 buckets, and bucket-partition cardinality stays
  * proportional to data volume (AQE coalesces the rest).
  */
object RangeJoin {

  /** @param points     left side: (key, t, pointCols...)
    * @param intervals  right side: (key, start, end, intervalCols...)
    * @return one row per (point, containing interval) pair
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      t: String, start: String, end: String,
                      pointCols: Seq[String], intervalCols: Seq[String],
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "RangeJoin: bucketWidth must be positive")
    val b = lit(bucketWidth)
    val pts = points.select(
      col(key) +: (col(t).cast("long") / b).cast("long").as("__bucket") +:
        col(t) +: pointCols.map(col): _*)
    val ivs = intervals
      .filter(col(start) <= col(end))
      .select(col(key) +: col(start) +: col(end) +: intervalCols.map(col): _*)
      .withColumn("__bucket", explode(sequence(
        (col(start).cast("long") / b).cast("long"),
        (col(end).cast("long") / b).cast("long"))))
    pts.join(ivs, Seq(key, "__bucket"))
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__bucket")
  }

  /** Interval-overlap join — pair each left interval with every right
    * interval of the same key that overlaps it (`lStart <= rEnd AND
    * rStart <= lEnd`, closed ends): sessions × outages, stays × bookings.
    *
    * Same bucket quantization as [[pointInInterval]], but BOTH sides
    * explode, so an overlapping pair can share several buckets. Instead of
    * a pair-dedup shuffle, each pair is emitted only in the FIRST bucket
    * both intervals cover — `max(bucketOf(lStart), bucketOf(rStart))`,
    * computable from columns already in the joined row — making the
    * output unique by construction. One shuffle per side, on
    * (key, bucket); fan-out is ceil(width/bucket)+1 per row. */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      lStart: String, lEnd: String, rStart: String, rEnd: String,
                      leftCols: Seq[String], rightCols: Seq[String],
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "RangeJoin: bucketWidth must be positive")
    val b = lit(bucketWidth)
    def explodeSide(df: DataFrame, start: String, end: String, extra: Seq[String]) =
      df.filter(col(start) <= col(end))
        .select(col(key) +: col(start) +: col(end) +: extra.map(col): _*)
        .withColumn("__bucket", explode(sequence(
          (col(start).cast("long") / b).cast("long"),
          (col(end).cast("long") / b).cast("long"))))
    val l = explodeSide(left, lStart, lEnd, leftCols)
    val r = explodeSide(right, rStart, rEnd, rightCols)
    l.join(r, Seq(key, "__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === greatest(
        (col(lStart).cast("long") / b).cast("long"),
        (col(rStart).cast("long") / b).cast("long")))
      .drop("__bucket")
  }

  /** DuckDB oracle for [[intervalOverlap]]: the exact plain-join
    * formulation. */
  def intervalOverlapSql(leftRel: String, rightRel: String, key: String,
                         lStart: String, lEnd: String, rStart: String, rEnd: String,
                         leftCols: Seq[String], rightCols: Seq[String]): String = {
    val cols = (Seq(s"l.$key AS $key", s"l.$lStart AS $lStart", s"l.$lEnd AS $lEnd") ++
      leftCols.map(c => s"l.$c AS $c") ++
      Seq(s"r.$rStart AS $rStart", s"r.$rEnd AS $rEnd") ++
      rightCols.map(c => s"r.$c AS $c")).mkString(", ")
    s"""SELECT * FROM (SELECT $cols FROM $leftRel l JOIN $rightRel r
       |ON l.$key = r.$key AND l.$lStart <= r.$rEnd AND r.$rStart <= l.$lEnd)""".stripMargin
  }

  /** DuckDB oracle: the exact (small-scale) formulation — a plain range
    * join — must produce identical pairs to the bucketed plan. */
  def pointInIntervalSql(pointsRel: String, intervalsRel: String, key: String,
                         t: String, start: String, end: String,
                         pointCols: Seq[String], intervalCols: Seq[String]): String = {
    val cols = (Seq(s"p.$key AS $key", s"p.$t AS $t") ++ pointCols.map(c => s"p.$c AS $c") ++
      Seq(s"i.$start AS $start", s"i.$end AS $end") ++ intervalCols.map(c => s"i.$c AS $c")).mkString(", ")
    // subquery wrap so an appended ORDER BY sees unambiguous output names
    s"""SELECT * FROM (SELECT $cols FROM $pointsRel p JOIN $intervalsRel i
       |ON p.$key = i.$key AND p.$t >= i.$start AND p.$t <= i.$end)""".stripMargin
  }
}
