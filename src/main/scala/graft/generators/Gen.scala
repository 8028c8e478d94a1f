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
  * fragment has a value-identical DuckDB rendering in [[OracleGen]]
  * (cross-engine parity is exercised by the driver's oracle compare).
  *
  * Misconfigured limits fail fast at plan-build time via `require` —
  * mirroring the reference's ErrWrongLimits (`random_int64.go:20-23`) —
  * instead of silently yielding NULL through `% 0` under non-ANSI mode.
  */
object Gen {

  /** Global salt — analog of GREENMASK_GLOBAL_SALT
    * (reference `internal/db/postgres/context/context.go:204-215`).
    * Env-sourced so masked output is not re-derivable from a public
    * compile-time constant. */
  val Salt: String = sys.env.getOrElse("GRAFT_GLOBAL_SALT", "graft-v1")

  /** Max exclusive bound of the uniform stream: 16^15 = 2^60. */
  val U60Max: Long = 1L << 60

  private def seeded(input: Column, tweak: String, salt: String): Column =
    md5(concat(lit(salt + "/" + tweak + "|"), input.cast("string")))

  /** Uniform deterministic non-negative Long in [0, 2^60) derived from the
    * canonical string of `input` plus `salt` and a per-transformer `tweak`
    * (so two transformers on the same column don't correlate).
    * NULL input propagates to NULL output (keep-null contract is applied
    * by the transformer layer, see `Transformers.keepNull`).
    *
    * Backed by the native [[graft.expressions.U60Hash]] codegen expression
    * (one digest + nibble fold per row); [[u60Composed]] is the
    * value-identical built-in composition kept as the equivalence witness. */
  def u60(input: Column, tweak: String, salt: String = Salt): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.U60Hash(
        org.apache.spark.sql.GraftBridge.expression(input.cast("string")),
        salt + "/" + tweak + "|"))

  /** The built-ins-only u60 rendering (md5 -> hex slice -> conv). */
  def u60Composed(input: Column, tweak: String, salt: String = Salt): Column =
    conv(substring(seeded(input, tweak, salt), 1, 15), 16, 10).cast("long")

  /** Second independent stream (different tweak suffix). */
  def u60b(input: Column, tweak: String, salt: String = Salt): Column =
    u60(input, tweak + "#b", salt)

  // ---------------------------------------------------------------------
  // Limiters — map u60 into target domains. Pure, overflow-safe arithmetic.
  // ---------------------------------------------------------------------

  /** Long in [min, max] inclusive. Mirrors Int64Limiter
    * (`random_int64.go:31-37`), with the inclusive-range choice pinned by
    * GenSpec. Range width must stay below 2^60 so the modulus is uniform
    * and `max - min + 1` cannot overflow. */
  def longBetween(h: Column, min: Long, max: Long): Column = {
    require(min <= max, s"longBetween: min ($min) must be <= max ($max)")
    require(max - min >= 0 && max - min < U60Max - 1,
      s"longBetween: range [$min,$max] wider than 2^60 is not supported")
    lit(min) + (h % lit(max - min + 1L))
  }

  /** Long in [min, max] where bounds are column-valued (dynamic parameters,
    * reference `pkg/toolkit/dynamic_parameter.go:97-132`). Caller is
    * responsible for min <= max in the data. */
  def longBetweenDyn(h: Column, min: Column, max: Column): Column =
    min + (h % (max - min + lit(1L)))

  /** Double in [min, max] with `decimals` fractional digits. Integer modulo
    * then a single deterministic IEEE-754 division, so Spark and DuckDB
    * produce the same double bit pattern. */
  def doubleBetween(h: Column, min: Double, max: Double, decimals: Int): Column = {
    require(min <= max, s"doubleBetween: min ($min) must be <= max ($max)")
    require(decimals >= 0 && decimals <= 15, "doubleBetween: decimals in [0,15]")
    val scale = math.pow(10, decimals).toLong
    val steps = math.round((max - min) * scale)
    require(steps >= 0 && steps < U60Max - 1, "doubleBetween: range too wide")
    lit(min) + (h % lit(steps + 1L)).cast("double") / lit(scale).cast("double")
  }

  /** Arbitrary-precision-style decimal in [min, max] at `scale` digits,
    * computed on DecimalType(38, scale) — RandomNumeric analog
    * (`random_numeric.go:19`; PG numeric is unbounded, we pin 38 per
    * SURVEY §7.4). */
  def decimalBetween(h: Column, min: BigDecimal, max: BigDecimal, scale: Int): Column = {
    require(min <= max, s"decimalBetween: min must be <= max")
    val steps = ((max - min) * BigDecimal(10).pow(scale)).toLong
    require(steps >= 0 && steps < U60Max - 1, "decimalBetween: range too wide")
    val t = s"decimal(38,$scale)"
    // min + r * 10^-scale, all exact decimal arithmetic (no division, so no
    // engine-specific rounding — the DuckDB rendering is value-identical)
    val step = BigDecimal(1L, scale) // 10^-scale exactly
    (lit(min.underlying).cast(t) +
      (h % lit(steps + 1L)).cast("decimal(19,0)") *
        lit(step.underlying).cast(s"decimal(${scale + 1},$scale)")).cast(t)
  }

  /** Multiplicative noise ratio in [-maxRatio, +maxRatio] with 4 decimal
    * digits of resolution — NoiseInt/NoiseFloat core
    * (`noise_int64.go:19-37`). */
  def noiseRatio(h: Column, maxRatio: Double): Column = {
    require(maxRatio > 0 && maxRatio <= 100, "noiseRatio: maxRatio in (0,100]")
    val steps = math.round(maxRatio * 10000).toInt
    (h % lit(2L * steps + 1L) - lit(steps.toLong)).cast("double") / lit(10000.0)
  }

  /** Timestamp (second resolution) in [minEpoch, maxEpoch]. */
  def timestampBetween(h: Column, minEpoch: Long, maxEpoch: Long): Column =
    timestamp_seconds(longBetween(h, minEpoch, maxEpoch))

  /** Pick index in [1, n] for 1-based element_at / list indexing. */
  def pick(h: Column, n: Int): Column = {
    require(n > 0, "pick: n must be positive")
    (h % lit(n.toLong)).cast("int") + lit(1)
  }

  /** Deterministic hex string of length `len` (1..32) — charset [0-9a-f]. */
  def hexString(input: Column, tweak: String, len: Column, salt: String = Salt): Column =
    substring(seeded(input, tweak, salt), 1, 32).substr(lit(1), len)

  /** Deterministic string over an arbitrary charset with length in
    * [minLen, maxLen] — RandomString analog (`random_string.go:29`).
    * One independent hash stream per character position; stays in codegen. */
  def stringBetween(input: Column, tweak: String, charset: String,
                    minLen: Int, maxLen: Int, salt: String = Salt): Column = {
    require(minLen >= 0 && minLen <= maxLen && maxLen <= 64, "stringBetween: 0<=min<=max<=64")
    require(charset.nonEmpty, "stringBetween: charset must be non-empty")
    val len = longBetween(u60(input, tweak + "len", salt), minLen.toLong, maxLen.toLong)
    val chars = (0 until maxLen).map { i =>
      val idx = pick(u60(input, tweak + "c" + i, salt), charset.length)
      substring(lit(charset), 1, charset.length).substr(idx, lit(1))
    }
    concat(chars: _*).substr(lit(1), len.cast("int"))
  }

  /** Deterministic UUIDv4-shaped string from the input (hash engine
    * RandomUuid, reference `random_uuid.go:29`). */
  def uuidFrom(input: Column, tweak: String, salt: String = Salt): Column = {
    val h = seeded(input, tweak, salt)
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4),
      concat(lit("4"), substring(h, 14, 3)),
      concat(lit("8"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** IPv4 inside an arbitrary CIDR subnet, avoiding the network and
    * broadcast addresses (RandomIp, `random_ip.go`: "avoiding special
    * addresses"). Host part mapped into [1, 2^(32-prefix) - 2]. */
  def ipv4InCidr(h: Column, cidr: String): Column = {
    val Array(ip, preStr) = cidr.split("/")
    val prefix = preStr.toInt
    require(prefix >= 8 && prefix <= 30, s"ipv4InCidr: prefix $prefix outside [8,30]")
    val base = ip.split("\\.").map(_.toLong).reduce(_ * 256 + _) &
      (0xFFFFFFFFL << (32 - prefix))
    val hosts = (1L << (32 - prefix)) - 2L
    val addr = lit(base) + longBetween(h, 1L, hosts)
    concat_ws(".",
      shiftright(addr, 24).bitwiseAND(lit(255L)),
      shiftright(addr, 16).bitwiseAND(lit(255L)),
      shiftright(addr, 8).bitwiseAND(lit(255L)),
      addr.bitwiseAND(lit(255L)))
  }

  /** IPv6 inside a CIDR subnet with a 16-bit-aligned prefix: kept prefix
    * groups rendered from the network address, remaining groups hashed
    * (RandomIp v6 support, `random_ip.go`). Host part never all-zero
    * (subnet-router anycast avoided) because group hashes come from
    * independent non-degenerate streams. */
  def ipv6InCidr(input: Column, tweak: String, cidr: String, salt: String = Salt): Column = {
    val Array(net, preStr) = cidr.split("/")
    val prefix = preStr.toInt
    require(prefix % 16 == 0 && prefix >= 16 && prefix <= 112,
      s"ipv6InCidr: prefix $prefix must be a multiple of 16 in [16,112]")
    val keptGroups = prefix / 16
    // expand '::' shorthand to 8 groups
    val parts = net.split("::", -1) match {
      case Array(a) => a.split(":")
      case Array(a, b) =>
        val l = if (a.isEmpty) Array.empty[String] else a.split(":")
        val r = if (b.isEmpty) Array.empty[String] else b.split(":")
        l ++ Array.fill(8 - l.length - r.length)("0") ++ r
    }
    require(parts.length == 8, s"ipv6InCidr: bad address $net")
    val kept = parts.take(keptGroups).map(g => lit(f"${Integer.parseInt(g, 16)}%x"): Column)
    val h = seeded(input, tweak, salt)
    val hashed = (keptGroups until 8).map { g =>
      val idx = 1 + ((g - keptGroups) * 4) % 28
      // strip leading zeros like canonical ipv6 text form
      regexp_replace(substring(h, idx, 4), "^0{1,3}", "")
    }
    concat_ws(":", (kept ++ hashed): _*)
  }

  /** MAC address from hashed bytes. `keepPrefix` octets of a vendor prefix
    * are preserved (RandomMac management-type options, `random_mac.go:44`);
    * default prefix 02 = locally-administered unicast. */
  def macFrom(input: Column, tweak: String, prefix: Seq[String] = Seq("02"),
              salt: String = Salt): Column = {
    require(prefix.nonEmpty && prefix.size <= 3, "macFrom: 1..3 prefix octets")
    val h = seeded(input, tweak, salt)
    val hashed = (0 until (6 - prefix.size)).map(i => substring(h, 1 + 2 * i, 2))
    concat_ws(":", (prefix.map(lit(_): Column) ++ hashed): _*)
  }
}
