package graft.generators

/** DuckDB SQL rendering of every [[Gen]] fragment — value-identical by
  * construction, so oracle SQL for any hash-engine transformer is purely
  * mechanical. Each function mirrors the [[Gen]] function of the same name;
  * arguments are SQL expression strings, the result is a SQL expression
  * string.
  *
  * Parity notes (verified against DuckDB 1.0):
  *  - Spark `conv(substring(md5(x),1,15),16,10)` ==
  *    DuckDB `('0x' || substr(md5(x),1,15))::BIGINT` (60-bit value, no
  *    overflow, both parse the same 15 hex chars).
  *  - Spark `%` and DuckDB `%` agree on non-negative operands (u60 >= 0).
  *  - Both engines perform the same single IEEE-754 double division in
  *    `doubleBetween`, so double outputs are bit-identical.
  */
object OracleGen {

  def seeded(input: String, tweak: String, salt: String = Gen.Salt): String =
    s"md5('${salt}/${tweak}|' || (${input})::VARCHAR)"

  def u60(input: String, tweak: String, salt: String = Gen.Salt): String =
    s"('0x' || substr(${seeded(input, tweak, salt)},1,15))::BIGINT"

  def u60b(input: String, tweak: String, salt: String = Gen.Salt): String =
    u60(input, tweak + "#b", salt)

  def longBetween(h: String, min: Long, max: Long): String =
    s"(${min} + (${h}) % ${max - min + 1L})"

  def longBetweenDyn(h: String, min: String, max: String): String =
    s"((${min}) + (${h}) % ((${max}) - (${min}) + 1))"

  def doubleBetween(h: String, min: Double, max: Double, decimals: Int): String = {
    val scale = math.pow(10, decimals).toLong
    val steps = math.round((max - min) * scale)
    s"(${min} + ((${h}) % ${steps + 1L})::DOUBLE / ${scale}::DOUBLE)"
  }

  def decimalBetween(h: String, min: BigDecimal, max: BigDecimal, scale: Int): String = {
    val steps = ((max - min) * BigDecimal(10).pow(scale)).toLong
    val t = s"DECIMAL(38,$scale)"
    val step = BigDecimal(1L, scale)
    s"(((${min})::$t + ((${h}) % ${steps + 1L})::DECIMAL(19,0) * (${step})::DECIMAL(${scale + 1},$scale))::$t)"
  }

  def noiseRatio(h: String, maxRatio: Double): String = {
    val steps = math.round(maxRatio * 10000).toInt
    s"(((${h}) % ${2L * steps + 1L} - ${steps})::DOUBLE / 10000.0)"
  }

  /** Epoch seconds variant — oracle queries compare epoch longs, not
    * timestamp values, to avoid tz-rendering differences between engines. */
  def epochBetween(h: String, minEpoch: Long, maxEpoch: Long): String =
    longBetween(h, minEpoch, maxEpoch)

  def pick(h: String, n: Int): String = s"(((${h}) % ${n})::INT + 1)"

  def hexString(input: String, tweak: String, len: String, salt: String = Gen.Salt): String =
    s"substr(substr(${seeded(input, tweak, salt)},1,32), 1, (${len})::INT)"

  def stringBetween(input: String, tweak: String, charset: String,
                    minLen: Int, maxLen: Int, salt: String = Gen.Salt): String = {
    val len = longBetween(u60(input, tweak + "len", salt), minLen.toLong, maxLen.toLong)
    val cs = charset.replace("'", "''")
    val chars = (0 until maxLen).map { i =>
      val idx = pick(u60(input, tweak + "c" + i, salt), charset.length)
      s"substr('${cs}', ${idx}, 1)"
    }
    s"substr(${chars.mkString(" || ")}, 1, (${len})::INT)"
  }

  def uuidFrom(input: String, tweak: String, salt: String = Gen.Salt): String = {
    val h = seeded(input, tweak, salt)
    s"(substr(${h},1,8) || '-' || substr(${h},9,4) || '-4' || substr(${h},14,3) || " +
      s"'-8' || substr(${h},18,3) || '-' || substr(${h},21,12))"
  }

  def ipv4InCidr(h: String, cidr: String): String = {
    val Array(ip, preStr) = cidr.split("/")
    val prefix = preStr.toInt
    val base = ip.split("\\.").map(_.toLong).reduce(_ * 256 + _) &
      (0xFFFFFFFFL << (32 - prefix))
    val hosts = (1L << (32 - prefix)) - 2L
    val addr = s"(${base} + ${longBetween(h, 1L, hosts)})"
    s"(((${addr} >> 24) & 255)::VARCHAR || '.' || ((${addr} >> 16) & 255)::VARCHAR || " +
      s"'.' || ((${addr} >> 8) & 255)::VARCHAR || '.' || (${addr} & 255)::VARCHAR)"
  }

  def ipv6InCidr(input: String, tweak: String, cidr: String, salt: String = Gen.Salt): String = {
    val Array(net, preStr) = cidr.split("/")
    val prefix = preStr.toInt
    val keptGroups = prefix / 16
    val parts = net.split("::", -1) match {
      case Array(a) => a.split(":")
      case Array(a, b) =>
        val l = if (a.isEmpty) Array.empty[String] else a.split(":")
        val r = if (b.isEmpty) Array.empty[String] else b.split(":")
        l ++ Array.fill(8 - l.length - r.length)("0") ++ r
    }
    val kept = parts.take(keptGroups).map(g => s"'${Integer.parseInt(g, 16).toHexString}'")
    val h = seeded(input, tweak, salt)
    val hashed = (keptGroups until 8).map { g =>
      val idx = 1 + ((g - keptGroups) * 4) % 28
      s"regexp_replace(substr(${h}, ${idx}, 4), '^0{1,3}', '')"
    }
    (kept ++ hashed).mkString("concat_ws(':', ", ", ", ")")
  }

  def macFrom(input: String, tweak: String, prefix: Seq[String] = Seq("02"),
              salt: String = Gen.Salt): String = {
    val h = seeded(input, tweak, salt)
    val hashed = (0 until (6 - prefix.size)).map(i => s"substr(${h},${1 + 2 * i},2)")
    (prefix.map(p => s"'$p'") ++ hashed).mkString("(", " || ':' || ", ")")
  }
}
