package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with the
  * same key and right.time <= left.time, optionally within a tolerance.
  *
  * Spark has no ASOF JOIN operator; the naive formulations are a range
  * theta-join (BroadcastNestedLoopJoin — quadratic per key) or a
  * groupBy-collect_list (whole key group in one task's memory). This is the
  * single-shuffle formulation instead: tag both sides, union, and run ONE
  * window over (key ORDER BY time, side) carrying the right side's values
  * forward with last(_, ignoreNulls). Each key partition streams through
  * the window operator in sorted order — nothing is ever materialized per
  * key, so a hot key degrades to sorted streaming, not OOM. At 100 TB the
  * only cost is the one exchange+sort both inputs need anyway.
  *
  * Right rows order BEFORE left rows at equal timestamps (side 0 < side 1),
  * giving inclusive <= semantics; ties among right rows at the same instant
  * resolve to the greatest `tieBreak` value (last in frame), keeping the
  * result deterministic and oracle-comparable.
  */
object AsOfJoin {

  /** @param leftCols   left columns to carry through (must exist on left)
    * @param rightCols  right columns to attach, emitted as `right_<name>`
    * @param tolerance  max allowed (leftTime - rightTime); matches farther
    *                   back are nulled out (pandas merge_asof `tolerance`)
    */
  def backward(left: DataFrame, right: DataFrame, key: String, time: String,
               leftCols: Seq[String], rightCols: Seq[String],
               tieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    val nullL = (c: String) => lit(null).cast(left.schema(c).dataType).as(c)
    val nullR = (c: String) => lit(null).cast(right.schema(c).dataType).as("right_" + c)
    val rightTie = col(tieBreak).cast("long")

    val taggedRight = right.select(
      col(key) +: col(time) +: lit(0).as("__side") +: rightTie.as("__tie") +:
        (leftCols.map(nullL) ++ rightCols.map(c => col(c).as("right_" + c)) :+
          col(time).as("right_" + time)): _*)
    val taggedLeft = left.select(
      col(key) +: col(time) +: lit(1).as("__side") +: lit(Long.MaxValue).as("__tie") +:
        (leftCols.map(col) ++ rightCols.map(nullR) :+
          lit(null).cast(right.schema(time).dataType).as("right_" + time)): _*)

    val w = Window.partitionBy(key).orderBy(col(time), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("right_" + time) +: rightCols.map("right_" + _)
    val withMatch = taggedRight.unionByName(taggedLeft)
      .select(col(key) +: col(time) +: col("__side") +:
        (leftCols.map(col) ++ carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__side") === 1).drop("__side")

    tolerance match {
      case Some(tol) =>
        // out-of-tolerance matches null out — row stays (left join shape)
        val inTol = col("right_" + time).isNotNull &&
          (col(time) - col("right_" + time)) <= tol
        withMatch.select(col(key) +: col(time) +: leftCols.map(col) ++:
          carried.map(c => when(inTol, col(c)).otherwise(lit(null)).as(c)): _*)
      case None => withMatch
    }
  }

  /** DuckDB rendering of the same plan for the oracle (shared shape so the
    * query and its oracle cannot drift): `IGNORE NULLS` carries the right
    * values, identical ordering and tolerance rules. Caller supplies
    * relation SQL (e.g. "(SELECT ... FROM events WHERE ...)"). */
  def backwardSql(leftRel: String, rightRel: String, key: String, time: String,
                  leftCols: Seq[String], rightCols: Seq[String],
                  tieBreak: String, tolerance: Option[Long] = None): String = {
    val rCarried = ("right_" + time) +: rightCols.map("right_" + _)
    val rSel = (leftCols.map(c => s"NULL AS $c") ++
      rightCols.map(c => s"$c AS right_$c") :+ s"$time AS right_$time").mkString(", ")
    val lSel = (leftCols ++ rightCols.map(c => s"NULL AS right_$c") :+
      s"NULL AS right_$time").mkString(", ")
    val win = s"OVER (PARTITION BY $key ORDER BY $time, __side, __tie " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val carried = rCarried.map(c => s"last_value($c IGNORE NULLS) $win AS $c").mkString(", ")
    val base =
      s"""SELECT $key, $time, __side, ${leftCols.mkString(", ")}, $carried
         |FROM (
         |  SELECT $key, $time, 0 AS __side, ($tieBreak)::BIGINT AS __tie, $rSel FROM $rightRel
         |  UNION ALL BY NAME
         |  SELECT $key, $time, 1 AS __side, 9223372036854775807 AS __tie, $lSel FROM $leftRel
         |)""".stripMargin
    val outer = tolerance match {
      case Some(tol) =>
        val inTol = s"(right_$time IS NOT NULL AND ($time - right_$time) <= $tol)"
        (leftCols.map(identity) ++
          rCarried.map(c => s"CASE WHEN $inTol THEN $c ELSE NULL END AS $c")).mkString(", ")
      case None => (leftCols ++ rCarried).mkString(", ")
    }
    s"SELECT $key, $time, $outer FROM ($base) WHERE __side = 1"
  }
}
