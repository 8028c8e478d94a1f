package graft.generators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic generator kernel — the Spark-native analog of the
  * reference's "hash engine" (greenmask `internal/generators/hash.go:29-74`,
  * limiters e.g. `internal/generators/transformers/random_int64.go:14-37`:
  * `min + hash % (max-min)`).
  *
  * Design: a salted MD5 of the canonical string form of the input column,
  * truncated to 15 hex chars (60 bits), parsed as a non-negative Long.
  * Every generator transformer maps this uniform u60 into its target domain
  * with a *limiter* (pure arithmetic). Same input + same salt => same
  * output, across runs AND across partitionings — which is what makes
  * FK-consistent masking (`apply_for_references`) possible.
  *
  * All expressions here compose Spark built-ins only (md5 / conv /
  * substring / arithmetic), so they stay inside whole-stage codegen and
  * are trivially vectorizable — no UDFs, no codegen barriers. Each
  * fragment has a byte-identical DuckDB rendering in [[OracleGen]].
  */
object Gen {

  /** Global salt — analog of GREENMASK_GLOBAL_SALT
    * (reference `internal/db/postgres/context/context.go:204-215`). */
  val DefaultSalt = "graft-v1"

  private val U60Max = (1L << 60) // 16^15

  /** Uniform deterministic non-negative Long in [0, 2^60) derived from the
    * canonical string of `input` plus `salt` and a per-transformer `tweak`
    * (so two transformers on the same column don't correlate). */
  def u60(input: Column, tweak: String, salt: String = DefaultSalt): Column =
    conv(
      substring(md5(concat(lit(salt + "/" + tweak + "|"), input.cast("string"))), 1, 15),
      16, 10
    ).cast("long")

  /** Second independent stream (different tweak suffix). */
  def u60b(input: Column, tweak: String, salt: String = DefaultSalt): Column =
    u60(input, tweak + "#b", salt)

  // ---------------------------------------------------------------------
  // Limiters — map u60 into target domains. Pure, overflow-safe arithmetic.
  // ---------------------------------------------------------------------

  /** Long in [min, max] inclusive. Requires max-min < 2^60 (always true for
    * practical ranges). Mirrors Int64Limiter (`random_int64.go:31-37`). */
  def longBetween(h: Column, min: Long, max: Long): Column =
    lit(min) + (h % lit(max - min + 1L))

  /** Double in [min, max] with `decimals` fractional digits. Uses integer
    * modulo then a single exact division so Spark and DuckDB produce the
    * same IEEE-754 double. */
  def doubleBetween(h: Column, min: Double, max: Double, decimals: Int): Column = {
    val scale = math.pow(10, decimals).toLong
    val steps = math.round((max - min) * scale)
    lit(min) + (h % lit(steps + 1L)).cast("double") / lit(scale).cast("double")
  }

  /** Multiplicative noise ratio in [-maxRatio, +maxRatio] with 4 decimal
    * digits of resolution — NoiseInt/NoiseFloat core
    * (`noise_int64.go:19-37`). */
  def noiseRatio(h: Column, maxRatio: Double): Column = {
    val steps = math.round(maxRatio * 10000).toInt
    (h % lit(2L * steps + 1L) - lit(steps.toLong)).cast("double") / lit(10000.0)
  }

  /** Timestamp (second resolution) in [minEpoch, maxEpoch]. */
  def timestampBetween(h: Column, minEpoch: Long, maxEpoch: Long): Column =
    timestamp_seconds(longBetween(h, minEpoch, maxEpoch))

  /** Pick index in [1, n] for 1-based element_at / list indexing. */
  def pick(h: Column, n: Int): Column = (h % lit(n.toLong)).cast("int") + lit(1)

  /** Deterministic hex string of length `len` (1..32) — charset [0-9a-f].
    * StringLimiter analog. */
  def hexString(input: Column, tweak: String, len: Column): Column =
    substring(md5(concat(lit(DefaultSalt + "/" + tweak + "|"), input.cast("string"))), 1, 32)
      .substr(lit(1), len)

  /** Deterministic UUIDv4-shaped string from the input (hash engine
    * RandomUuid, reference `random_uuid.go:29`). */
  def uuidFrom(input: Column, tweak: String): Column = {
    val h = md5(concat(lit(DefaultSalt + "/" + tweak + "|"), input.cast("string")))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit("4"), substring(h, 14, 3)),
      concat(lit("8"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** IPv4 inside a /16 subnet `a.b.0.0` (RandomIp, `random_ip.go`). */
  def ipv4InSubnet16(h: Column, a: Int, b: Int): Column =
    concat_ws(".", lit(a), lit(b),
      ((h % lit(65536L)) / lit(256L)).cast("long"),
      h % lit(256L))

  /** MAC address from 6 hashed bytes, locally-administered unicast prefix
    * kept fixed (RandomMac, `random_mac.go:44`). */
  def macFrom(input: Column, tweak: String): Column = {
    val h = md5(concat(lit(DefaultSalt + "/" + tweak + "|"), input.cast("string")))
    concat_ws(":", lit("02"),
      substring(h, 1, 2), substring(h, 3, 2), substring(h, 5, 2),
      substring(h, 7, 2), substring(h, 9, 2))
  }
}
