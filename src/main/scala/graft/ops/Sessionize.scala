package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each user's event stream into sessions at
  * idle gaps > `gapSec`. Classic two-window formulation — a new-session
  * flag from lag(), then a running sum as the per-user session index —
  * one shuffle on the user key, everything else window-local. The batch
  * complement of the streaming `StreamingMask.sessionCounts`. */
object Sessionize {

  /** @param tsSecCol epoch-seconds column expression (already integral). */
  def sessions(df: DataFrame, userCol: String, tsSecCol: Column,
               orderCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, "sessions: gapSec must be positive")
    val order = Seq(tsSecCol, col(orderCol))
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val prev = lag(tsSecCol, 1).over(w)
    val newSession = when(prev.isNull || tsSecCol - prev > gapSec, 1L).otherwise(0L)
    df.withColumn("__new", newSession)
      .withColumn("session_id",
        sum("__new").over(Window.partitionBy(userCol).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  def sessionsSql(table: String, userCol: String, tsSecSql: String,
                  orderCol: String, gapSec: Long, selectCols: String): String =
    s"""SELECT ${selectCols} FROM (
          SELECT *, (sum(new_s) OVER (PARTITION BY ${userCol}
            ORDER BY ts_sec, ${orderCol}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
          FROM (
            SELECT *, ${tsSecSql} AS ts_sec,
              CASE WHEN lag(${tsSecSql}) OVER (PARTITION BY ${userCol}
                     ORDER BY ${tsSecSql}, ${orderCol}) IS NULL
                     OR ${tsSecSql} - lag(${tsSecSql}) OVER (PARTITION BY ${userCol}
                     ORDER BY ${tsSecSql}, ${orderCol}) > ${gapSec}
                   THEN 1 ELSE 0 END AS new_s
            FROM ${table}))"""
}
