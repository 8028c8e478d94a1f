package graft

import org.apache.spark.sql.functions._
import graft.generators.Gen

/** Unbounded-numeric (>38 digits) witness spec: the Spark VARCHAR-math
  * limb pipeline (Gen.bigDecimalBetween / bigDecimalSigned / bigNoise) is
  * compared against an INDEPENDENT plain-BigInt reimplementation of the
  * same spec (direct `min + V mod width` — no limb decomposition, its own
  * MD5/u60), so a limb/width/carry bug on the Spark side cannot cancel
  * out. Mirrors the reference's arbitrary-precision tests
  * (`internal/generators/transformers/random_numeric_test.go`).
  */
class BigNumericSpec extends SparkSpec {
  import spark.implicits._

  private val BigMin = BigDecimal(BigInt("31415926535897932384626433832795028841971693993751"), 4)
  private val BigMax = BigDecimal(
    BigInt("31415926535897932384626433832795028841971693993751") +
      BigInt(73) * BigInt(10).pow(48) - 1, 4)

  // ----- independent reference implementation (no Gen internals) -----

  private def u60Ref(input: String, tweak: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((Gen.Salt + "/" + tweak + "|" + input).getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def digitsRef(input: String, tweak: String, n: Int): String =
    (0 until (n + 14) / 15).map { j =>
      f"${u60Ref(input, tweak + "n" + j) % 1000000000000000L}%015d"
    }.mkString.take(n)

  private def fmtRef(units: BigInt, scale: Int): String = {
    val neg = units < 0
    val s = units.abs.toString
    val padded = if (s.length <= scale) ("0" * (scale - s.length + 1)) + s else s
    val body = if (scale == 0) padded else padded.dropRight(scale) + "." + padded.takeRight(scale)
    if (neg) "-" + body else body
  }

  private def betweenRef(input: String, tweak: String,
                         min: BigDecimal, max: BigDecimal, scale: Int): String = {
    val minU = BigInt(min.setScale(scale).underlying.unscaledValue())
    val maxU = BigInt(max.setScale(scale).underlying.unscaledValue())
    val width = maxU - minU + 1
    val v = BigInt(digitsRef(input, tweak, width.toString.length + 15))
    fmtRef(minU + (v % width), scale)
  }

  private def signedRef(input: String, tweak: String, digits: Int, scale: Int): String = {
    val mag = betweenRef(input, tweak + "mag", BigDecimal(0),
      BigDecimal(BigInt(10).pow(digits + scale) - 1, scale), scale)
    val zero = if (scale == 0) "0" else "0." + ("0" * scale)
    if (u60Ref(input, tweak + "sign") % 2 == 1 && mag != zero) "-" + mag else mag
  }

  private def noiseRef(vText: String, tweak: String, maxRatio: Double, scale: Int,
                       minV: Option[BigDecimal], maxV: Option[BigDecimal]): String = {
    val steps = math.round(maxRatio * 10000).toInt
    val k = u60Ref(vText, tweak) % (2 * steps + 1) - steps
    val prod = BigInt(vText.replace(".", "")) * (10000 + k)
    var r = (prod + 5000) / 10000
    def units(v: BigDecimal) = BigInt(v.setScale(scale).underlying.unscaledValue())
    minV.foreach(v => r = r.max(units(v)))
    maxV.foreach(v => r = r.min(units(v)))
    fmtRef(r, scale)
  }

  private def keys(n: Int = 300) = (1 to n).map(_.toLong).toDF("x")

  // ----- cases -----

  test("bigDecimalBetween matches the independent BigInt witness and stays in bounds") {
    val got = keys().select(col("x"),
      Gen.bigDecimalBetween(col("x"), "numbig", BigMin, BigMax, 4).as("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    got.foreach { case (k, v) =>
      assert(v == betweenRef(k.toString, "numbig", BigMin, BigMax, 4), s"key $k")
      val d = BigDecimal(v)
      assert(d >= BigMin && d <= BigMax, s"key $k out of bounds: $v")
      assert(v.length >= 40, s"key $k suspiciously narrow: $v") // genuinely >38 digits
    }
    assert(got.map(_._2).distinct.length > 290) // uniform-ish, no collapse
  }

  test("bigDecimalBetween is partition-count invariant") {
    def run(parts: Int) = keys().repartition(parts)
      .select(col("x"), Gen.bigDecimalBetween(col("x"), "numbig", BigMin, BigMax, 4))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(8))
  }

  test("bigDecimalSigned matches the witness; -0 is canonicalized; both signs occur") {
    val got = keys().select(col("x"),
      Gen.bigDecimalSigned(col("x"), "numbigsz", 45, 3).as("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    got.foreach { case (k, v) =>
      assert(v == signedRef(k.toString, "numbigsz", 45, 3), s"key $k")
      assert(v != "-0.000", s"key $k emitted negative zero")
    }
    assert(got.exists(_._2.startsWith("-")) && got.exists(!_._2.startsWith("-")))
  }

  test("bigNoise over a generated 50-digit value matches the witness; clamp bites both ends") {
    val lo = BigDecimal(BigInt(33) * BigInt(10).pow(48), 4)
    val hi = BigDecimal(BigInt(104) * BigInt(10).pow(48), 4)
    val got = keys(500)
      .select(col("x"), Gen.bigDecimalBetween(col("x"), "numbig", BigMin, BigMax, 4).as("g"))
      .select(col("x"), col("g"),
        Gen.bigNoise(col("g"), "noisenb", 0.07, 4, maxIntDigits = 55,
          minV = Some(lo), maxV = Some(hi)).as("v"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    got.foreach { case (k, g, v) =>
      assert(v == noiseRef(g, "noisenb", 0.07, 4, Some(lo), Some(hi)), s"key $k (input $g)")
    }
    val vals = got.map(t => BigDecimal(t._3))
    assert(vals.contains(lo) && vals.contains(hi), "clamp never engaged on either end")
    assert(vals.exists(v => v > lo && v < hi))
  }

  test("bigNoise carry edges: all-9s, zero, and single-unit inputs match the witness") {
    // all-9s maximizes every multiply limb and forces the +5000 rounding
    // carry to cascade through the full limb chain; zero and 1-unit pin
    // the low-end formatting paths
    val edges = Seq("9" * 51 + "." + "9999", "0.0000", "0.0001", "1" * 55 + ".0000",
      ("9" * 55) + ".9999")
    val df = edges.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val got = df.select(col("i"), col("v"),
      Gen.bigNoise(col("v"), "edge", 0.99, 4, maxIntDigits = 60).as("out"))
      .as[(Long, String, String)].collect()
    got.foreach { case (i, v, out) =>
      assert(out == noiseRef(v, "edge", 0.99, 4, None, None), s"edge case $i ($v)")
    }
  }

  test("bigNoise guards: sign and over-width inputs surface as NULL, null stays null") {
    val df = Seq(Some("-1.0000"), Some("1" + "0" * 60 + ".0000"), Some("42.0000"), None)
      .toDF("v")
    val out = df.select(Gen.bigNoise(col("v"), "nz", 0.1, 4, maxIntDigits = 55))
      .as[Option[String]].collect()
    assert(out(0).isEmpty && out(1).isEmpty && out(3).isEmpty)
    assert(out(2).nonEmpty)
  }

  test("staged renderings are value-identical to the fused ones") {
    val lo = BigDecimal(BigInt(33) * BigInt(10).pow(48), 4)
    val hi = BigDecimal(BigInt(104) * BigInt(10).pow(48), 4)
    val base = keys(200)
    val fused = base
      .select(col("x"), Gen.bigDecimalBetween(col("x"), "numbig", BigMin, BigMax, 4).as("g"),
        Gen.bigDecimalSigned(col("x"), "numbigsz", 45, 3).as("sg"))
      .select(col("x"), col("g"), col("sg"),
        Gen.bigNoise(col("g"), "noisenb", 0.07, 4, maxIntDigits = 55,
          minV = Some(lo), maxV = Some(hi)).as("nz"))
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    val stagedDf = Gen.bigNoiseStaged(
      Gen.bigDecimalSignedStaged(
        Gen.bigDecimalBetweenStaged(base, col("x"), "numbig", BigMin, BigMax, 4, "g"),
        col("x"), "numbigsz", 45, 3, "sg"),
      col("g"), "noisenb", 0.07, 4, "nz", maxIntDigits = 55,
      minV = Some(lo), maxV = Some(hi))
    val staged = stagedDf.select(col("x"), col("g"), col("sg"), col("nz"))
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
    assert(staged == fused)
  }

  test("bigDecimalBetweenAny: negative min, odd (unfactorizable) width, witness parity") {
    val anyMin = BigDecimal(BigInt("-27182818284590452353602874713526624977572470936999"), 3)
    val anyMax = BigDecimal(BigInt("31415926535897932384626433832795028841971693993751"), 3)
    // the constructive path must REJECT this width...
    intercept[IllegalArgumentException] {
      Gen.bigDecimalBetween(col("x"), "numany", BigDecimal(0),
        anyMax - anyMin, 3)
    }
    // ...while the expression path handles it, matching the witness
    val got = keys(200).select(col("x"),
      Gen.bigDecimalBetweenAny(col("x"), "numany", anyMin, anyMax, 3).as("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    got.foreach { case (k, v) =>
      assert(v == betweenRef(k.toString, "numany", anyMin, anyMax, 3), s"key $k")
      val d = BigDecimal(v)
      assert(d >= anyMin && d <= anyMax, s"key $k out of bounds: $v")
    }
    assert(got.exists(_._2.startsWith("-")) && got.exists(!_._2.startsWith("-")))
  }

  test("expression path agrees with the constructive path on factorizable bounds") {
    val pairs = keys(200).select(
      Gen.bigDecimalBetween(col("x"), "numbig", BigMin, BigMax, 4).as("c"),
      Gen.bigDecimalBetweenAny(col("x"), "numbig", BigMin, BigMax, 4).as("e"))
      .as[(String, String)].collect()
    pairs.foreach { case (c, e) => assert(c == e) }
  }

  test("salt is injectable (no fixed-salt re-derivation)") {
    val df = keys(50)
    def vals(c: org.apache.spark.sql.Column) = df.select(c.as("v")).as[String].collect().toSeq
    assert(vals(Gen.bigDecimalBetween(col("x"), "t", BigMin, BigMax, 4, salt = "saltA")) !=
      vals(Gen.bigDecimalBetween(col("x"), "t", BigMin, BigMax, 4, salt = "saltB")))
    assert(vals(Gen.bigDecimalSigned(col("x"), "t", 45, 3, salt = "saltA")) !=
      vals(Gen.bigDecimalSigned(col("x"), "t", 45, 3, salt = "saltB")))
  }

  test("bigGeom rejects malformed bounds fast") {
    intercept[IllegalArgumentException] { // negative min
      Gen.bigDecimalBetween(col("x"), "t", BigDecimal(-1), BigDecimal(10).pow(45), 0)
    }
    intercept[IllegalArgumentException] { // width residual too wide (10^45-13 is not m*10^k, m<1e8)
      Gen.bigDecimalBetween(col("x"), "t", BigDecimal(12), BigDecimal(BigInt(10).pow(45) - 2), 0)
    }
    intercept[IllegalArgumentException] { // min not exact at scale
      Gen.bigDecimalBetween(col("x"), "t", BigDecimal("0.123"), BigDecimal(10).pow(45), 2)
    }
  }
}
