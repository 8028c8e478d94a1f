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

  // ---------------------------------------------------------------------
  // Big numeric (arbitrary precision, VARCHAR math) — mirrors
  // Gen.bigDecimalBetween / bigDecimalSigned / bigNoise limb for limb.
  // All widths come from the SAME Gen.bigGeom / Gen.bigNoiseGeom the Spark
  // side used, so the two renderings cannot disagree on geometry. Rendered
  // as layered subqueries (each level may reference aliases of the level
  // below exactly once) so the SQL stays linear in limb count.
  // ---------------------------------------------------------------------

  private val LB = "1000000000000000" // 10^15, Gen.LimbBase

  /** SELECT {id}, {finalExpr} AS {out} FROM (layered levels over {table})
    * ORDER BY {id} — each level is `SELECT *, expr AS alias, ...`. */
  def layeredSelect(table: String, id: String, levels: Seq[Seq[(String, String)]],
                    finalExpr: String, out: String): String = {
    val src = levels.foldLeft(table) { (prev, lvl) =>
      s"(SELECT *, ${lvl.map { case (a, e) => s"$e AS $a" }.mkString(", ")} FROM $prev)"
    }
    s"SELECT $id, $finalExpr AS $out FROM $src ORDER BY $id"
  }

  def digitStream(input: String, tweak: String, n: Int, salt: String = Gen.Salt): String = {
    val chunks = (0 until (n + 14) / 15).map { j =>
      s"lpad(((${u60(input, tweak + "n" + j, salt)}) % $LB)::VARCHAR, 15, '0')"
    }
    s"substr(${chunks.mkString(" || ")}, 1, $n)"
  }

  private def bigModSmall(a: String, widthA: Int, m: Long): String = {
    val L = (widthA + 9) / 10
    val padded = if (L * 10 == widthA) a else s"lpad($a, ${L * 10}, '0')"
    (0 until L).foldLeft("0") { (r, i) =>
      s"((($r) * 10000000000 + substr($padded, ${i * 10 + 1}, 10)::BIGINT) % $m)"
    }
  }

  /** Schoolbook `units + c` levels at fixed width15 (multiple of 15);
    * returns (levels, alias of the width15 result string). `p` is a
    * per-use alias prefix so two additions can coexist in one query. */
  private def addConstLevels(src: String, width15: Int, c: BigInt,
                             p: String): (Vector[Seq[(String, String)]], String) = {
    val cStr = ("0" * (width15 - Gen.nd(c))) + c.toString
    var levels = Vector[Seq[(String, String)]](Seq(s"${p}r" -> s"lpad($src, $width15, '0')"))
    for (i <- 0 until width15 / 15) {
      val aL = cStr.substring(width15 - 15 * (i + 1), width15 - 15 * i).toLong
      val carryIn = if (i == 0) "0" else s"${p}c${i - 1}"
      levels :+= Seq(s"${p}s$i" ->
        s"($aL + substr(${p}r, ${width15 - 15 * (i + 1) + 1}, 15)::BIGINT + $carryIn)")
      levels :+= Seq(
        s"${p}c$i" -> s"(CASE WHEN ${p}s$i >= $LB THEN 1 ELSE 0 END)",
        s"${p}low$i" ->
          s"lpad((${p}s$i - (CASE WHEN ${p}s$i >= $LB THEN 1 ELSE 0 END) * $LB)::VARCHAR, 15, '0')")
    }
    levels :+= Seq(s"${p}u" ->
      (0 until width15 / 15).reverse.map(i => s"${p}low$i").mkString("(", " || ", ")"))
    (levels, s"${p}u")
  }

  private def bigFormat(units: String, width: Int, scale: Int): String = {
    val trimmed = s"ltrim(substr($units, 1, ${width - scale}), '0')"
    val intStr = s"(CASE WHEN $trimmed = '' THEN '0' ELSE $trimmed END)"
    if (scale == 0) intStr
    else s"($intStr || '.' || substr($units, ${width - scale + 1}, $scale))"
  }

  /** Levels + final-expression for Gen.bigDecimalBetween over `input`.
    * `p` prefixes every alias. */
  def bigBetweenLevels(input: String, min: BigDecimal, max: BigDecimal, scale: Int,
                       tweak: String, p: String = "__g",
                       salt: String = Gen.Salt): (Vector[Seq[(String, String)]], String) = {
    val g = Gen.bigGeom(min, max, scale)
    val amod =
      if (g.m == 1) "'0'"
      else s"lpad((${bigModSmall(s"substr(${p}v, 1, ${g.n - g.k})", g.n - g.k, g.m)})::VARCHAR, ${g.wm}, '0')"
    val rExpr = if (g.k > 0) s"($amod || substr(${p}v, ${g.n - g.k + 1}, ${g.k}))" else amod
    val vLevel = Vector[Seq[(String, String)]](Seq(s"${p}v" -> digitStream(input, tweak, g.n, salt)))
    val (addLevels, uAlias) = addConstLevels(rExpr, g.wSum, g.minU, p)
    (vLevel ++ addLevels, bigFormat(uAlias, g.wSum, scale))
  }

  /** Full oracle SELECT for Gen.bigDecimalBetween. */
  def bigDecimalBetweenSelect(table: String, id: String, input: String,
                              min: BigDecimal, max: BigDecimal, scale: Int, tweak: String,
                              out: String, salt: String = Gen.Salt): String = {
    val (levels, fmt) = bigBetweenLevels(input, min, max, scale, tweak, "__g", salt)
    layeredSelect(table, id, levels, fmt, out)
  }

  /** Levels + final-expression for Gen.bigDecimalSigned. */
  def bigSignedLevels(input: String, digits: Int, scale: Int, tweak: String,
                      p: String = "__g", salt: String = Gen.Salt): (Vector[Seq[(String, String)]], String) = {
    val (levels, fmt) = bigBetweenLevels(input, BigDecimal(0),
      BigDecimal(BigInt(10).pow(digits + scale) - 1, scale), scale, tweak + "mag", p, salt)
    val zero = if (scale == 0) "0" else "0." + ("0" * scale)
    val withMag = levels :+ Seq(s"${p}mag" -> fmt)
    val fin = s"(CASE WHEN ((${u60(input, tweak + "sign", salt)}) % 2 = 1 AND ${p}mag <> '$zero') " +
      s"THEN '-' || ${p}mag ELSE ${p}mag END)"
    (withMag, fin)
  }

  def bigDecimalSignedSelect(table: String, id: String, input: String, digits: Int,
                             scale: Int, tweak: String, out: String,
                             salt: String = Gen.Salt): String = {
    val (levels, fin) = bigSignedLevels(input, digits, scale, tweak, "__g", salt)
    layeredSelect(table, id, levels, fin, out)
  }

  /** Levels + final-expression for Gen.bigNoise over the value produced by
    * alias/expr `input` (must itself be addressable at every level, i.e. an
    * alias from an earlier level or a base column). */
  def bigNoiseLevels(input: String, maxRatio: Double, scale: Int, maxIntDigits: Int,
                     minV: Option[BigDecimal], maxV: Option[BigDecimal], tweak: String,
                     p: String = "__nz", salt: String = Gen.Salt): (Vector[Seq[(String, String)]], String) = {
    val g = Gen.bigNoiseGeom(maxIntDigits, scale)
    val steps = math.round(maxRatio * 10000).toInt
    var levels = Vector[Seq[(String, String)]](
      Seq(s"${p}f" -> s"(10000 + (${u60(input, tweak, salt)}) % ${2L * steps + 1L} - $steps)",
          s"${p}raw" -> s"replace($input, '.', '')"))
    val w11 = g.lm * 11 // full limb multiple: a w0 pad would index negative
    levels :+= Seq(s"${p}pad" -> s"lpad(${p}raw, $w11, '0')")
    for (i <- 0 until g.lm) {
      val carryIn = if (i == 0) "0" else s"${p}mc${i - 1}"
      levels :+= Seq(s"${p}mp$i" ->
        s"(substr(${p}pad, ${w11 - 11 * (i + 1) + 1}, 11)::BIGINT * ${p}f + $carryIn)")
      levels :+= Seq(
        s"${p}mlow$i" -> s"lpad((${p}mp$i % 100000000000)::VARCHAR, 11, '0')",
        s"${p}mc$i" -> s"((${p}mp$i - (${p}mp$i % 100000000000)) // 100000000000)")
    }
    levels :+= Seq(s"${p}prod" ->
      (s"lpad(${p}mc${g.lm - 1}::VARCHAR, 5, '0')" +:
        (0 until g.lm).reverse.map(i => s"${p}mlow$i")).mkString("(", " || ", ")"))
    val (addLevels, uAlias) = addConstLevels(s"${p}prod", g.wp2, BigInt(5000), p + "a")
    levels ++= addLevels
    levels :+= Seq(s"${p}n" -> s"substr($uAlias, 1, ${g.wp2 - 4})")
    def unitsStr(v: BigDecimal): String = {
      val u = BigInt(v.setScale(scale).underlying.unscaledValue())
      ("0" * (g.wp2 - 4 - Gen.nd(u))) + u.toString
    }
    val lo = minV.fold(s"${p}n")(v => s"greatest(${p}n, '${unitsStr(v)}')")
    val clamped = maxV.fold(lo)(v => s"least($lo, '${unitsStr(v)}')")
    val fin = s"(CASE WHEN $input IS NULL THEN NULL " +
      s"WHEN substr($input, 1, 1) = '-' OR length(${p}raw) > ${g.w0} THEN NULL " +
      s"ELSE ${bigFormat(clamped, g.wp2 - 4, scale)} END)"
    (levels, fin)
  }

  def macFrom(input: String, tweak: String, prefix: Seq[String] = Seq("02"),
              salt: String = Gen.Salt): String = {
    val h = seeded(input, tweak, salt)
    val hashed = (0 until (6 - prefix.size)).map(i => s"substr(${h},${1 + 2 * i},2)")
    (prefix.map(p => s"'$p'") ++ hashed).mkString("(", " || ':' || ", ")")
  }
}
