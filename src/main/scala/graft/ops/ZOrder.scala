package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * file-skipping lever at 100 TB: sorting a write by the interleaved key
  * keeps BOTH dimensions' per-file min/max ranges tight, so a scan with
  * predicates on either column prunes files/row-groups that a
  * single-column sort order can only prune for its leading column.
  *
  * Pure integer bit arithmetic (the standard mask-spread ladder), codegen
  * as built-in shift/and/or expressions — identical rendering exists for
  * the DuckDB oracle. Caller contract: inputs in [0, 2^31) — two 31-bit
  * coordinates interleave into one positive 62-bit key (the spread mask
  * ladder silently ignores bits above 32).
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of x over the even bit positions. */
  def spreadBits(x: Column): Column =
    Masks.foldLeft(x.cast("long")) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }

  def spreadBitsSql(x: String): String =
    Masks.foldLeft(s"(${x})::BIGINT") { case (acc, (s, m)) =>
      s"((${acc} | (${acc} << ${s})) & ${m})"
    }

  /** Morton key of two non-negative 31-bit coordinates: a on even bits,
    * b on odd bits. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  def zValueSql(a: String, b: String): String =
    s"(${spreadBitsSql(a)} | (${spreadBitsSql(b)} << 1))"

  /** Inverse of [[spreadBits]] (driver-side, for tests/debugging). */
  def compactBits(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    (x | (x >> 16)) & 0x00000000FFFFFFFFL
  }

  /** Write `df` as parquet files clustered by the Morton key of the two
    * columns: a range-partition + local sort on the key, so each output
    * file covers a compact rectangle in (aCol, bCol) space and min/max
    * file skipping works for predicates on EITHER column. `files`
    * controls the layout grain (at cluster scale: tasks). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    path: String, files: Int): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
