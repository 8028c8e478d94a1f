package graft.generators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---------------------------------------------------------------------
  // Arbitrary-precision decimal ("big numeric", PG numeric beyond
  // DecimalType(38)) — VARCHAR math on BIGINT limbs. Values are carried as
  // FIXED-WIDTH zero-padded digit strings; every arithmetic step is
  // schoolbook limb arithmetic in plain Long columns, so the whole path is
  // Spark built-ins (md5 / substr / lpad / concat / % / CASE), stays in
  // whole-stage codegen, and has a mechanical value-identical DuckDB
  // rendering in [[OracleGen]]. Matches the reference's unbounded-numeric
  // semantics (`random_numeric.go:19`: limiter = min + v mod distance over
  // shopspring arbitrary-precision decimals; size mode
  // `GetMinAndMaxNumericValueBySetting`: ±"9"×digits).
  // ---------------------------------------------------------------------

  /** 10^15 — limb base. a + b + carry < 2*10^15 fits a Long (and 2^53,
    * so even a double round-trip could not corrupt it); carry is therefore
    * always 0 or 1 and computed by COMPARISON, never division. */
  val LimbBase: Long = 1000000000000000L

  private[generators] def nd(x: BigInt): Int = x.abs.toString.length

  /** Geometry shared between the Spark build and the oracle rendering —
    * computed once from the bounds so the two sides can never disagree on
    * a width or chunk count. */
  private[generators] case class BigGeom(minU: BigInt, maxU: BigInt, m: Long, k: Int,
                                         n: Int, wm: Int, wSum: Int, scale: Int) {
    val limbs: Int = wSum / 15
  }

  /** Validates bounds and derives all widths. Limiter-design constraints
    * (each the big-number analog of longBetween's 2^60 width cap):
    *  - min >= 0 (sign is composed separately — [[bigDecimalSigned]]);
    *  - inclusive range width (in scale units) must factor as m * 10^k
    *    with m < 10^8, so every schoolbook mod step fits signed 64-bit
    *    in BOTH engines. */
  private[generators] def bigGeom(min: BigDecimal, max: BigDecimal, scale: Int): BigGeom = {
    require(scale >= 0 && scale <= 15, "bigDecimalBetween: scale in [0,15]")
    def units(v: BigDecimal, what: String): BigInt =
      try v.setScale(scale).underlying.unscaledValue()
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(s"bigDecimalBetween: $what not exact at scale $scale")
      }
    val minU = units(min, "min"); val maxU = units(max, "max")
    require(minU >= 0, "bigDecimalBetween: min must be >= 0 (compose sign via bigDecimalSigned)")
    require(maxU > minU, "bigDecimalBetween: min must be < max")
    var rest = maxU - minU + 1; var k = 0
    while (rest % 10 == 0) { rest /= 10; k += 1 }
    require(rest < 100000000L,
      s"bigDecimalBetween: range width must factor as m*10^k with m < 10^8 (residual $rest)")
    val m = rest.toLong
    // V gets one full slack chunk beyond the width's digits: mod bias
    // <= width/10^15, the same envelope the 60-bit limiters accept
    val n = nd(maxU - minU + 1) + 15
    val wm = math.max(nd(BigInt(m) - 1), 1)
    val wSum = ((math.max(nd(maxU), wm + k) + 14) / 15) * 15
    BigGeom(minU, maxU, m, k, n, wm, wSum, scale)
  }

  /** `n` uniform decimal digits: each u60 draw contributes 15 digits
    * (u60 % 10^15; top-of-range bias ~2^-10, inside the accepted limiter
    * envelope), independent streams per chunk. Fixed width n. */
  def digitStream(input: Column, tweak: String, n: Int, salt: String = Salt): Column = {
    val chunks = (0 until (n + 14) / 15).map { j =>
      lpad((u60(input, tweak + "n" + j, salt) % lit(LimbBase)).cast("string"), 15, "0")
    }
    substring(concat(chunks: _*), 1, n)
  }

  /** (fixed-width digit string) mod m, m < 10^8 — schoolbook fold over
    * 10-digit chunks: r*10^10 + c < 1.1e18 always fits a Long. */
  private def bigModSmall(a: Column, widthA: Int, m: Long): Column = {
    val L = (widthA + 9) / 10
    val padded = if (L * 10 == widthA) a else lpad(a, L * 10, "0")
    (0 until L).foldLeft(lit(0L): Column) { (r, i) =>
      (r * lit(10000000000L) + substring(padded, i * 10 + 1, 10).cast("long")) % lit(m)
    }
  }

  /** Fixed-width sum of a digit string and a constant: 15-digit limbs.
    * Carries are computed FLAT, not as a chain — the addend is constant,
    * so carry into limb i is exactly [low-15i-digit suffix of the value
    * >= 10^(15i) - (c mod 10^(15i))], an equal-width string comparison
    * against a constant threshold. A chained carry would nest each limb's
    * expression inside the next and blow the Catalyst tree up
    * combinatorially. Caller guarantees the sum fits `width15` digits
    * (a multiple of 15). Output width = width15. */
  /** Low limb `i` (i = 0 lowest) of `padded + c`, where `padded` is
    * already width15 wide. Shared by the fused and staged renderings. */
  private def addLimbLow(padded: Column, width15: Int, c: BigInt, i: Int): Column = {
    val cStr = ("0" * (width15 - nd(c))) + c.toString
    val carryInto: Column = {
      val mod = c.mod(BigInt(10).pow(15 * i))
      if (i == 0 || mod == 0) lit(0L)
      else {
        val thr = BigInt(10).pow(15 * i) - mod
        val thrStr = ("0" * (15 * i - nd(thr))) + thr.toString
        when(substring(padded, width15 - 15 * i + 1, 15 * i) >= thrStr, lit(1L)).otherwise(lit(0L))
      }
    }
    val aL = cStr.substring(width15 - 15 * (i + 1), width15 - 15 * i).toLong
    val s = (lit(aL) + substring(padded, width15 - 15 * (i + 1) + 1, 15).cast("long") +
      carryInto) % lit(LimbBase)
    lpad(s.cast("string"), 15, "0")
  }

  private def bigAddConst(units: Column, width15: Int, c: BigInt): Column = {
    require(width15 % 15 == 0 && c >= 0 && nd(c) <= width15)
    val padded = lpad(units, width15, "0")
    concat((0 until width15 / 15).reverse.map(i => addLimbLow(padded, width15, c, i)): _*)
  }

  /** Canonical decimal text of a fixed-width units string: leading zeros
    * stripped from the integer part (empty -> "0"), '.' inserted at
    * `scale` digits from the right. */
  private def bigFormat(units: Column, width: Int, scale: Int): Column = {
    val trimmed = ltrim(substring(units, 1, width - scale), "0")
    val intStr = when(trimmed === "", lit("0")).otherwise(trimmed)
    if (scale == 0) intStr
    else concat(intStr, lit("."), substring(units, width - scale + 1, scale))
  }

  /** Uniform decimal in [min, max] (inclusive, scale-unit grid) as
    * canonical decimal TEXT — arbitrary precision (50-digit bounds and
    * beyond). result = min + V mod width, exactly the reference's
    * RandomNumericLimiter.Limit shape. See [[bigGeom]] for the accepted
    * bound shapes. */
  def bigDecimalBetween(input: Column, tweak: String, min: BigDecimal, max: BigDecimal,
                        scale: Int, salt: String = Salt): Column = {
    val g = bigGeom(min, max, scale)
    val v = digitStream(input, tweak, g.n, salt)
    val amod =
      if (g.m == 1) lit("0")
      else lpad(bigModSmall(substring(v, 1, g.n - g.k), g.n - g.k, g.m).cast("string"), g.wm, "0")
    val r = if (g.k > 0) concat(amod, substring(v, g.n - g.k + 1, g.k)) else amod
    bigFormat(bigAddConst(r, g.wSum, g.minU), g.wSum, scale)
  }

  /** ARBITRARY-bounds variant of [[bigDecimalBetween]]: any width (no
    * m * 10^k factorization requirement) and negative minimums, via the
    * native [[graft.expressions.BigUniformMod]] expression — one exact
    * BigInteger modulo per row over the same digit stream, so the two
    * paths are value-identical wherever both apply. Use the constructive
    * path when bounds permit (pure built-ins, constructive DuckDB
    * oracle); this one for bound shapes it cannot reach (oracle via
    * pinned witness values). */
  def bigDecimalBetweenAny(input: Column, tweak: String, min: BigDecimal, max: BigDecimal,
                           scale: Int, salt: String = Salt): Column = {
    require(scale >= 0 && scale <= 15, "bigDecimalBetweenAny: scale in [0,15]")
    def units(v: BigDecimal, what: String): BigInt =
      try BigInt(v.setScale(scale).underlying.unscaledValue())
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(s"bigDecimalBetweenAny: $what not exact at scale $scale")
      }
    val minU = units(min, "min"); val maxU = units(max, "max")
    require(maxU > minU, "bigDecimalBetweenAny: min must be < max")
    val width = maxU - minU + 1
    val digits = digitStream(input, tweak, nd(width) + 15, salt)
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.BigUniformMod(
        org.apache.spark.sql.GraftBridge.expression(digits),
        width.toString, minU.toString, scale))
  }

  /** Size-mode big numeric (ref `GetMinAndMaxNumericValueBySetting`):
    * uniform sign × uniform magnitude in [0, 10^digits) at `scale` —
    * i.e. the reference's ±999…9 limiter for `digits` integer digits.
    * "-0.00" is canonicalized to "0.00". */
  def bigDecimalSigned(input: Column, tweak: String, digits: Int, scale: Int,
                       salt: String = Salt): Column = {
    require(digits >= 1 && digits <= 120, "bigDecimalSigned: digits in [1,120]")
    val mag = bigDecimalBetween(input, tweak + "mag", BigDecimal(0),
      BigDecimal(BigInt(10).pow(digits + scale) - 1, scale), scale, salt)
    val zero = if (scale == 0) "0" else "0." + ("0" * scale)
    when(u60(input, tweak + "sign", salt) % 2 === 1 && mag =!= zero,
      concat(lit("-"), mag)).otherwise(mag)
  }

  /** Geometry for [[bigNoise]]: input units width (fixed), 11-digit limb
    * count for the multiply (limb*factor + carry < 2.2e15 fits Long), raw
    * product width, and the 15-aligned post-rounding width. */
  private[generators] case class NoiseGeom(w0: Int, lm: Int, wp: Int, wp2: Int)
  private[generators] def bigNoiseGeom(maxIntDigits: Int, scale: Int): NoiseGeom = {
    require(maxIntDigits >= 1 && maxIntDigits <= 90, "bigNoise: maxIntDigits in [1,90]")
    require(scale >= 0 && scale <= 15, "bigNoise: scale in [0,15]")
    val w0 = maxIntDigits + scale
    val lm = (w0 + 10) / 11
    val wp = 5 + lm * 11 // final multiply carry < 2.1e4 -> 5 digits
    NoiseGeom(w0, lm, wp, ((wp + 14) / 15) * 15)
  }

  /** Multiplicative noise on an arbitrary-precision NON-NEGATIVE decimal
    * TEXT value at fixed `scale`: v' = round_half_up(v * (10^4 + k) / 10^4)
    * with k uniform in [-steps, +steps] (steps = maxRatio*10^4), optionally
    * clamped to [minV, maxV] — NoiseNumeric beyond DecimalType(38)
    * (ref `noise_numeric.go:38-49` over shopspring decimals). The multiply
    * is schoolbook 11-digit limbs × small factor; rounding is +5000 then
    * drop-4-digits, half-away-from-zero == half-up on the non-negative
    * domain. Values with more than `maxIntDigits` integer digits (or a
    * sign) surface as NULL rather than silently truncating. */
  def bigNoise(input: Column, tweak: String, maxRatio: Double, scale: Int,
               maxIntDigits: Int = 60, minV: Option[BigDecimal] = None,
               maxV: Option[BigDecimal] = None, salt: String = Salt): Column = {
    require(maxRatio > 0 && maxRatio <= 1, "bigNoise: maxRatio in (0,1]")
    val g = bigNoiseGeom(maxIntDigits, scale)
    val steps = math.round(maxRatio * 10000).toInt
    val f = lit(10000L) + u60(input, tweak, salt) % lit(2L * steps + 1L) - lit(steps.toLong)
    val raw = regexp_replace(input, "\\.", "")
    // pad to a full limb multiple — padding only to w0 would make the top
    // limb's substring start negative (which counts from the string END)
    val w11 = g.lm * 11
    val padded = lpad(raw, w11, "0")
    // carry chain references each product ONCE (floor-div, exact: p and the
    // quotient are < 2^53 and the fraction granularity 1e-11 dwarfs double
    // error ~4e-12) — a (p - p%L)/L form would reference p twice per limb
    // and grow the expression tree exponentially in limb count
    var carry: Column = lit(0L)
    val lows = (0 until g.lm).map { i => // i = 0 is the LOWEST limb
      val p = substring(padded, w11 - 11 * (i + 1) + 1, 11).cast("long") * f + carry
      carry = floor(p / lit(100000000000L)).cast("long")
      lpad((p % lit(100000000000L)).cast("string"), 11, "0")
    }
    val product = concat((lpad(carry.cast("string"), 5, "0") +: lows.reverse): _*)
    // +5000 then drop the 4 ratio digits = round half-up at scale
    val noised = substring(bigAddConst(product, g.wp2, BigInt(5000)), 1, g.wp2 - 4)
    def unitsStr(v: BigDecimal): String = noiseClampUnits(v, g, scale)
    // equal-width zero-padded non-negative digit strings compare correctly
    // as plain strings, so the clamp is lexicographic least/greatest
    val lo = minV.fold(noised)(v => greatest(noised, lit(unitsStr(v))))
    val clamped = maxV.fold(lo)(v => least(lo, lit(unitsStr(v))))
    when(input.isNull, lit(null).cast("string"))
      .when(substring(input, 1, 1) === "-" || length(raw) > g.w0, lit(null).cast("string"))
      .otherwise(bigFormat(clamped, g.wp2 - 4, scale))
  }

  /** Clamp bound rendered as a (wp2-4)-wide units string for the
    * lexicographic clamp compare. */
  private def noiseClampUnits(v: BigDecimal, g: NoiseGeom, scale: Int): String = {
    val u = BigInt(v.setScale(scale).underlying.unscaledValue())
    require(u.signum >= 0 && nd(u) <= g.wp2 - 4, "bigNoise: clamp bound out of range")
    ("0" * (g.wp2 - 4 - nd(u))) + u.toString
  }

  // ---------------------------------------------------------------------
  // Staged (multi-projection) renderings. A single fused big-numeric
  // expression compiles to ONE whole-stage-codegen method that overruns
  // the JVM's 64KB method limit and silently falls back to interpreted
  // execution; staging each dependency level into a named column keeps
  // the pipeline fused while codegen emits one small method per Project.
  // Values are identical to the fused renderings (same sub-expressions,
  // same geometry). Temp columns are dropped; only `out` is added.
  // ---------------------------------------------------------------------

  /** Staged [[bigDecimalBetween]]. */
  def bigDecimalBetweenStaged(df: DataFrame, input: Column, tweak: String,
      min: BigDecimal, max: BigDecimal, scale: Int, out: String,
      salt: String = Salt): DataFrame = {
    val g = bigGeom(min, max, scale)
    val p = s"__${out}_"
    def rOf(v: Column): Column = {
      val amod =
        if (g.m == 1) lit("0")
        else lpad(bigModSmall(substring(v, 1, g.n - g.k), g.n - g.k, g.m).cast("string"), g.wm, "0")
      if (g.k > 0) concat(amod, substring(v, g.n - g.k + 1, g.k)) else amod
    }
    val staged = df
      .withColumn(p + "v", digitStream(input, tweak, g.n, salt))
      .withColumn(p + "r", lpad(rOf(col(p + "v")), g.wSum, "0"))
    val lows = (0 until g.limbs).map(i =>
      addLimbLow(col(p + "r"), g.wSum, g.minU, i).as(s"${p}low$i"))
    staged.select(staged.columns.map(col) ++ lows: _*)
      .withColumn(p + "u", concat((0 until g.limbs).reverse.map(i => col(s"${p}low$i")): _*))
      .withColumn(out, bigFormat(col(p + "u"), g.wSum, scale))
      .drop(Seq(p + "v", p + "r", p + "u") ++ (0 until g.limbs).map(i => s"${p}low$i"): _*)
  }

  /** Staged [[bigDecimalSigned]]. */
  def bigDecimalSignedStaged(df: DataFrame, input: Column, tweak: String,
      digits: Int, scale: Int, out: String, salt: String = Salt): DataFrame = {
    require(digits >= 1 && digits <= 120, "bigDecimalSigned: digits in [1,120]")
    val magC = s"__${out}_mag"
    val zero = if (scale == 0) "0" else "0." + ("0" * scale)
    bigDecimalBetweenStaged(df, input, tweak + "mag", BigDecimal(0),
        BigDecimal(BigInt(10).pow(digits + scale) - 1, scale), scale, magC, salt)
      .withColumn(out, when(u60(input, tweak + "sign", salt) % 2 === 1 && col(magC) =!= zero,
        concat(lit("-"), col(magC))).otherwise(col(magC)))
      .drop(magC)
  }

  /** Staged [[bigNoise]]. */
  def bigNoiseStaged(df: DataFrame, input: Column, tweak: String, maxRatio: Double,
      scale: Int, out: String, maxIntDigits: Int = 60,
      minV: Option[BigDecimal] = None, maxV: Option[BigDecimal] = None,
      salt: String = Salt): DataFrame = {
    require(maxRatio > 0 && maxRatio <= 1, "bigNoise: maxRatio in (0,1]")
    val g = bigNoiseGeom(maxIntDigits, scale)
    val steps = math.round(maxRatio * 10000).toInt
    val p = s"__${out}_"
    val w11 = g.lm * 11
    var staged = df
      .withColumn(p + "f",
        lit(10000L) + u60(input, tweak, salt) % lit(2L * steps + 1L) - lit(steps.toLong))
      .withColumn(p + "raw", regexp_replace(input, "\\.", ""))
      .withColumn(p + "pad", lpad(col(p + "raw"), w11, "0"))
    for (i <- 0 until g.lm) { // sequential carry chain, one column per limb
      val carryIn =
        if (i == 0) lit(0L)
        else floor(col(s"${p}mp${i - 1}") / lit(100000000000L)).cast("long")
      staged = staged.withColumn(s"${p}mp$i",
        substring(col(p + "pad"), w11 - 11 * (i + 1) + 1, 11).cast("long") * col(p + "f") + carryIn)
    }
    val prodParts =
      lpad(floor(col(s"${p}mp${g.lm - 1}") / lit(100000000000L)).cast("long").cast("string"), 5, "0") +:
        (0 until g.lm).reverse.map(i => lpad((col(s"${p}mp$i") % lit(100000000000L)).cast("string"), 11, "0"))
    staged = staged
      .withColumn(p + "prod", concat(prodParts: _*))
      .withColumn(p + "ap", lpad(col(p + "prod"), g.wp2, "0"))
    val lows = (0 until g.wp2 / 15).map(i =>
      addLimbLow(col(p + "ap"), g.wp2, BigInt(5000), i).as(s"${p}alow$i"))
    staged = staged.select(staged.columns.map(col) ++ lows: _*)
      .withColumn(p + "n",
        substring(concat((0 until g.wp2 / 15).reverse.map(i => col(s"${p}alow$i")): _*), 1, g.wp2 - 4))
    val lo = minV.fold(col(p + "n"))(v => greatest(col(p + "n"), lit(noiseClampUnits(v, g, scale))))
    val clamped = maxV.fold(lo)(v => least(lo, lit(noiseClampUnits(v, g, scale))))
    staged
      .withColumn(out,
        when(input.isNull, lit(null).cast("string"))
          .when(substring(input, 1, 1) === "-" || length(col(p + "raw")) > g.w0, lit(null).cast("string"))
          .otherwise(bigFormat(clamped, g.wp2 - 4, scale)))
      .drop(Seq(p + "f", p + "raw", p + "pad", p + "prod", p + "ap", p + "n") ++
        (0 until g.lm).map(i => s"${p}mp$i") ++ (0 until g.wp2 / 15).map(i => s"${p}alow$i"): _*)
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
