package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
  * The right side's payload (its time plus every carried column) is packed
  * into ONE struct and carried by a single `last(_, ignoreNulls)`: the
  * matched values are atomic — they all come from the SAME right row. (An
  * independent `last` per carried column would back-fill a NULL field from
  * an OLDER right row, silently mixing fields across rows and validating
  * the tolerance against the wrong right_time.)
  *
  * Right rows order BEFORE left rows at equal timestamps (side 0 < side 1),
  * giving inclusive <= semantics; ties among right rows at the same instant
  * resolve to the greatest `tieBreak` value (raw column order, last in
  * frame), keeping the result deterministic and oracle-comparable.
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
    val carried = ("right_" + time) +: rightCols.map("right_" + _)
    // one atomic payload per right row; NULL (typed) on the left side
    val packType = StructType(
      StructField("right_" + time, right.schema(time).dataType) +:
        rightCols.map(c => StructField("right_" + c, right.schema(c).dataType)))
    val pack = struct(col(time).as("right_" + time) +:
      rightCols.map(c => col(c).as("right_" + c)): _*)

    val taggedRight = right.select(
      col(key) +: col(time) +: lit(0).as("__side") +: col(tieBreak).as("__tie") +:
        (leftCols.map(nullL) :+ pack.as("__rpack")): _*)
    val taggedLeft = left.select(
      col(key) +: col(time) +: lit(1).as("__side") +:
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie") +:
        (leftCols.map(col) :+ lit(null).cast(packType).as("__rpack")): _*)

    // __tie is only ordered within (time, side=0) groups — left rows carry
    // NULL and sort last, which is inert because __side already separates
    // the sides. Raw column order, no lossy cast (any orderable type works).
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = taggedRight.unionByName(taggedLeft)
      .select(col(key) +: col(time) +: col("__side") +: (leftCols.map(col) :+
        last(col("__rpack"), ignoreNulls = true).over(w).as("__rpack")): _*)
      .filter(col("__side") === 1)
      .select(col(key) +: col(time) +: leftCols.map(col) ++:
        carried.map(c => col("__rpack").getField(c).as(c)): _*)

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

  /** As-of FORWARD join — for each left row, the EARLIEST right row with
    * right.time >= left.time (inclusive), same single-shuffle shape as
    * [[backward]] with the window read from the other end: left rows order
    * BEFORE right rows at equal timestamps (side DESC) and the frame is
    * [current, unbounded following], so `first(_, ignoreNulls)` picks the
    * next right payload. Ties among right rows at one instant resolve to
    * the greatest `tieBreak` (tie DESC = first in frame), matching the
    * backward convention. `tolerance` bounds (rightTime - leftTime). */
  def forward(left: DataFrame, right: DataFrame, key: String, time: String,
              leftCols: Seq[String], rightCols: Seq[String],
              tieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    val (tagged, carried, _) = tagSides(left, right, key, time, leftCols, rightCols, tieBreak)
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side").desc, col("__tie").desc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withMatch = tagged
      .select(col(key) +: col(time) +: col("__side") +: (leftCols.map(col) :+
        first(col("__rpack"), ignoreNulls = true).over(w).as("__rpack")): _*)
      .filter(col("__side") === 1)
      .select(col(key) +: col(time) +: leftCols.map(col) ++:
        carried.map(c => col("__rpack").getField(c).as(c)): _*)
    tolerance match {
      case Some(tol) =>
        val inTol = col("right_" + time).isNotNull &&
          (col("right_" + time) - col(time)) <= tol
        withMatch.select(col(key) +: col(time) +: leftCols.map(col) ++:
          carried.map(c => when(inTol, col(c)).otherwise(lit(null)).as(c)): _*)
      case None => withMatch
    }
  }

  /** As-of NEAREST join — the closer of the backward and forward matches,
    * equal distances resolving backward (the deterministic convention;
    * document-matching pandas' prior-on-tie behavior). ONE exchange: both
    * window passes share the key partitioning (Catalyst reuses the
    * exchange and re-sorts per window), so a hot key still streams. */
  def nearest(left: DataFrame, right: DataFrame, key: String, time: String,
              leftCols: Seq[String], rightCols: Seq[String],
              tieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    val (tagged, carried, packType) = tagSides(left, right, key, time, leftCols, rightCols, tieBreak)
    val wB = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col(time), col("__side").desc, col("__tie").desc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = tagged
      .select(col(key) +: col(time) +: col("__side") +: (leftCols.map(col) ++ Seq(
        last(col("__rpack"), ignoreNulls = true).over(wB).as("__b"),
        first(col("__rpack"), ignoreNulls = true).over(wF).as("__f"))): _*)
      .filter(col("__side") === 1)
    val rt = (p: String) => col(p).getField("right_" + time)
    val bDist = col(time) - rt("__b")
    val fDist = rt("__f") - col(time)
    val bOk = rt("__b").isNotNull && tolerance.map(t => bDist <= t).getOrElse(lit(true))
    val fOk = rt("__f").isNotNull && tolerance.map(t => fDist <= t).getOrElse(lit(true))
    val chosen = when(bOk && (!fOk || bDist <= fDist), col("__b"))
      .when(fOk, col("__f"))
      .otherwise(lit(null).cast(packType))
    both.select(col(key) +: col(time) +: leftCols.map(col) ++:
      carried.map(c => chosen.getField(c).as(c)): _*)
  }

  /** Tag and union the two sides with the packed right payload (shared by
    * every direction). Returns (tagged union, carried names, pack type). */
  private def tagSides(left: DataFrame, right: DataFrame, key: String, time: String,
                       leftCols: Seq[String], rightCols: Seq[String],
                       tieBreak: String): (DataFrame, Seq[String], StructType) = {
    val nullL = (c: String) => lit(null).cast(left.schema(c).dataType).as(c)
    val carried = ("right_" + time) +: rightCols.map("right_" + _)
    val packType = StructType(
      StructField("right_" + time, right.schema(time).dataType) +:
        rightCols.map(c => StructField("right_" + c, right.schema(c).dataType)))
    val pack = struct(col(time).as("right_" + time) +:
      rightCols.map(c => col(c).as("right_" + c)): _*)
    val taggedRight = right.select(
      col(key) +: col(time) +: lit(0).as("__side") +: col(tieBreak).as("__tie") +:
        (leftCols.map(nullL) :+ pack.as("__rpack")): _*)
    val taggedLeft = left.select(
      col(key) +: col(time) +: lit(1).as("__side") +:
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie") +:
        (leftCols.map(col) :+ lit(null).cast(packType).as("__rpack")): _*)
    (taggedRight.unionByName(taggedLeft), carried, packType)
  }

  /** DuckDB rendering of [[forward]] (shared shape with [[backwardSql]]). */
  def forwardSql(leftRel: String, rightRel: String, key: String, time: String,
                 leftCols: Seq[String], rightCols: Seq[String],
                 tieBreak: String, tolerance: Option[Long] = None): String = {
    val rCarried = ("right_" + time) +: rightCols.map("right_" + _)
    val win = s"OVER (PARTITION BY $key ORDER BY $time, __side DESC, __tie DESC NULLS FIRST " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    val base = taggedSql(leftRel, rightRel, key, time, leftCols, rightCols, tieBreak,
      s"first_value(__rpack IGNORE NULLS) $win AS __rpack")
    val expanded = rCarried.map(c => s"struct_extract(__rpack, '$c') AS $c")
    val mid = s"SELECT $key, $time, ${(leftCols ++ expanded).mkString(", ")} " +
      s"FROM ($base) WHERE __side = 1"
    tolerance match {
      case Some(tol) =>
        val inTol = s"(right_$time IS NOT NULL AND (right_$time - $time) <= $tol)"
        val outer = (leftCols ++
          rCarried.map(c => s"CASE WHEN $inTol THEN $c ELSE NULL END AS $c")).mkString(", ")
        s"SELECT $key, $time, $outer FROM ($mid)"
      case None => mid
    }
  }

  /** DuckDB rendering of [[nearest]]. */
  def nearestSql(leftRel: String, rightRel: String, key: String, time: String,
                 leftCols: Seq[String], rightCols: Seq[String],
                 tieBreak: String, tolerance: Option[Long] = None): String = {
    val rCarried = ("right_" + time) +: rightCols.map("right_" + _)
    val winB = s"OVER (PARTITION BY $key ORDER BY $time, __side, __tie NULLS LAST " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val winF = s"OVER (PARTITION BY $key ORDER BY $time, __side DESC, __tie DESC NULLS FIRST " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    val base = taggedSql(leftRel, rightRel, key, time, leftCols, rightCols, tieBreak,
      s"last_value(__rpack IGNORE NULLS) $winB AS __b, " +
        s"first_value(__rpack IGNORE NULLS) $winF AS __f")
    val rt = (p: String) => s"struct_extract($p, 'right_$time')"
    val bDist = s"($time - ${rt("__b")})"
    val fDist = s"(${rt("__f")} - $time)"
    val bOk = s"(${rt("__b")} IS NOT NULL" +
      tolerance.map(t => s" AND $bDist <= $t").getOrElse("") + ")"
    val fOk = s"(${rt("__f")} IS NOT NULL" +
      tolerance.map(t => s" AND $fDist <= $t").getOrElse("") + ")"
    val chosen = s"CASE WHEN $bOk AND (NOT $fOk OR $bDist <= $fDist) THEN __b " +
      s"WHEN $fOk THEN __f ELSE NULL END"
    val expanded = rCarried.map(c => s"struct_extract($chosen, '$c') AS $c")
    s"SELECT $key, $time, ${(leftCols ++ expanded).mkString(", ")} " +
      s"FROM ($base) WHERE __side = 1"
  }

  private def taggedSql(leftRel: String, rightRel: String, key: String, time: String,
                        leftCols: Seq[String], rightCols: Seq[String],
                        tieBreak: String, windowSel: String): String = {
    val packR = (s"right_$time := $time" +: rightCols.map(c => s"right_$c := $c"))
      .mkString("struct_pack(", ", ", ")")
    val rSel = (leftCols.map(c => s"NULL AS $c") :+ s"$packR AS __rpack").mkString(", ")
    val lSel = (leftCols :+ "NULL AS __rpack").mkString(", ")
    s"""SELECT $key, $time, __side, ${(leftCols :+ windowSel).mkString(", ")}
       |FROM (
       |  SELECT $key, $time, 0 AS __side, $tieBreak AS __tie, $rSel FROM $rightRel
       |  UNION ALL BY NAME
       |  SELECT $key, $time, 1 AS __side, NULL AS __tie, $lSel FROM $leftRel
       |)""".stripMargin
  }

  /** DuckDB rendering of the same plan for the oracle (shared shape so the
    * query and its oracle cannot drift): one `struct_pack` per right row
    * carried by a single `last_value(IGNORE NULLS)`, identical ordering and
    * tolerance rules. Caller supplies relation SQL (e.g.
    * "(SELECT ... FROM events WHERE ...)"). */
  def backwardSql(leftRel: String, rightRel: String, key: String, time: String,
                  leftCols: Seq[String], rightCols: Seq[String],
                  tieBreak: String, tolerance: Option[Long] = None): String = {
    val rCarried = ("right_" + time) +: rightCols.map("right_" + _)
    val packR = (s"right_$time := $time" +: rightCols.map(c => s"right_$c := $c"))
      .mkString("struct_pack(", ", ", ")")
    val rSel = (leftCols.map(c => s"NULL AS $c") :+ s"$packR AS __rpack").mkString(", ")
    val lSel = (leftCols :+ "NULL AS __rpack").mkString(", ")
    val win = s"OVER (PARTITION BY $key ORDER BY $time, __side, __tie NULLS LAST " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val base =
      s"""SELECT $key, $time, __side, ${(leftCols :+
           s"last_value(__rpack IGNORE NULLS) $win AS __rpack").mkString(", ")}
         |FROM (
         |  SELECT $key, $time, 0 AS __side, $tieBreak AS __tie, $rSel FROM $rightRel
         |  UNION ALL BY NAME
         |  SELECT $key, $time, 1 AS __side, NULL AS __tie, $lSel FROM $leftRel
         |)""".stripMargin
    val expanded = rCarried.map(c => s"struct_extract(__rpack, '$c') AS $c")
    val mid = s"SELECT $key, $time, ${(leftCols ++ expanded).mkString(", ")} " +
      s"FROM ($base) WHERE __side = 1"
    tolerance match {
      case Some(tol) =>
        val inTol = s"(right_$time IS NOT NULL AND ($time - right_$time) <= $tol)"
        val outer = (leftCols ++
          rCarried.map(c => s"CASE WHEN $inTol THEN $c ELSE NULL END AS $c")).mkString(", ")
        s"SELECT $key, $time, $outer FROM ($mid)"
      case None => mid
    }
  }
}
