package graft.transformers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.generators.{Gen, OracleGen}

/** A scalar column transformer: one masked/generated value per input value.
  * Carries BOTH the Spark `Column` rendering and (when SQL-expressible) the
  * DuckDB oracle rendering, so every operator ships with its correctness
  * check. Mirrors the reference transformer instance interface
  * (`internal/db/postgres/transformers/utils/transformer.go:23-30`) minus
  * the row-at-a-time mutation — here a transformer IS an expression.
  */
trait ScalarTransformer {
  /** Transformed value as a Catalyst expression (codegen-friendly). */
  def column(input: Column): Column
  /** DuckDB SQL producing the identical value; None = not SQL-expressible
    * (driver records a weaker rows-only check). */
  def oracle(input: String): Option[String]
  /** keep_null contract (reference transformers' `keep_null` param):
    * true => NULL input stays NULL. */
  def keepNull: Boolean = true
  /** Allowed input type names (Spark `DataType.typeName`); None = any.
    * Mirrors the reference's SetAllowedColumnTypes column property
    * (`masking.go:60-63` etc.) — Planner.validate warns on mismatch. */
  def allowedInputTypes: Option[Set[String]] = None

  final def applied(input: Column): Column =
    if (keepNull) when(input.isNull, lit(null)).otherwise(column(input))
    else column(input)
  final def appliedSql(input: String): Option[String] =
    if (keepNull) oracle(input).map(o => s"CASE WHEN (${input}) IS NULL THEN NULL ELSE ${o} END")
    else oracle(input)
}

/** A transformer that rewrites the RECORD rather than one scalar
  * expression — the escape hatch for semantics a Catalyst `Column`
  * cannot express (an external process, a multi-column rewrite).
  * `Planner.plan` intercepts these BEFORE building the single-select
  * projection and applies `transform` to the table plan instead;
  * `column` is therefore never invoked (it throws to keep the contract
  * loud). `when` gating still works: the planner splits the plan on the
  * predicate, transforms the matching rows, and unions the rest back
  * untouched — the same keep-untransformed semantics the projection
  * path compiles into a CASE. */
trait RecordTransformer extends ScalarTransformer {
  def transform(df: org.apache.spark.sql.DataFrame, column: String): org.apache.spark.sql.DataFrame
  final def column(input: Column): Column =
    throw new UnsupportedOperationException(
      s"$toString is record-level: apply it through Planner.plan, not as a Column")
  def oracle(input: String): Option[String] = None
}

/** `Cmd` — the reference's external-command row transformer
  * (ref `transformers/cmd.go`, wire formats `json_api.go` /
  * `text_api.go`), realized over [[graft.ops.Pipe]]: the affected
  * column's rows stream through `command` (one line per row, csv /
  * json / jsonrecord / text codec — a script written against the
  * reference's json driver runs unchanged), and every column comes back
  * CAST to its original type (the pipe wire format is text, the same
  * string round-trip contract the reference's drivers have).
  * `command` is whitespace-split into argv (no shell). */
case class CmdTransformer(command: Seq[String], codec: String = "csv",
                          timeoutSec: Int = 0) extends RecordTransformer {
  override def keepNull: Boolean = false
  def transform(df: org.apache.spark.sql.DataFrame, column: String): org.apache.spark.sql.DataFrame = {
    val schema = df.schema
    val piped = graft.ops.Pipe.through(df, command, codec,
      graft.ops.PipeOptions(timeoutSec = timeoutSec, affectedColumns = Seq(column)))
    piped.select(schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }
}

/** RandomInt — uniform integer in [min,max], hash engine
  * (ref `transformers/random_int.go:35-76`, limiter `random_int64.go:14-37`). */
case class RandomInt(min: Long, max: Long, tweak: String = "int") extends ScalarTransformer {
  def column(in: Column) = Gen.longBetween(Gen.u60(in, tweak), min, max)
  def oracle(in: String) = Some(OracleGen.longBetween(OracleGen.u60(in, tweak), min, max))
}

/** RandomInt with column-valued (dynamic) bounds
  * (ref `pkg/toolkit/dynamic_parameter.go:97-132`). */
case class RandomIntDyn(minCol: Column, maxCol: Column, minSql: String, maxSql: String,
                        tweak: String = "intdyn") extends ScalarTransformer {
  def column(in: Column) = Gen.longBetweenDyn(Gen.u60(in, tweak), minCol, maxCol)
  def oracle(in: String) = Some(OracleGen.longBetweenDyn(OracleGen.u60(in, tweak), minSql, maxSql))
}

/** RandomFloat (ref `random_float.go:35`). */
case class RandomFloat(min: Double, max: Double, decimals: Int = 4,
                       tweak: String = "float") extends ScalarTransformer {
  def column(in: Column) = Gen.doubleBetween(Gen.u60(in, tweak), min, max, decimals)
  def oracle(in: String) = Some(OracleGen.doubleBetween(OracleGen.u60(in, tweak), min, max, decimals))
}

/** RandomNumeric — DecimalType(38,scale) (ref `random_numeric.go:19`). */
case class RandomNumeric(min: BigDecimal, max: BigDecimal, scale: Int = 4,
                         tweak: String = "num") extends ScalarTransformer {
  def column(in: Column) = Gen.decimalBetween(Gen.u60(in, tweak), min, max, scale)
  def oracle(in: String) = Some(OracleGen.decimalBetween(OracleGen.u60(in, tweak), min, max, scale))
}

/** RandomNumeric beyond DecimalType(38) — arbitrary-precision uniform
  * decimal in [min, max] emitted as canonical decimal TEXT (PG `numeric`
  * is unbounded; ref `random_numeric.go:19` over shopspring decimals —
  * closes SURVEY §7.4's 38-digit pin). The oracle rendering needs a
  * layered SELECT ([[graft.generators.OracleGen.bigDecimalBetweenSelect]]),
  * so the registered query builds it directly instead of via scalar(). */
case class RandomNumericBig(min: BigDecimal, max: BigDecimal, scale: Int = 0,
                            tweak: String = "numbig") extends ScalarTransformer {
  def column(in: Column) = Gen.bigDecimalBetween(in, tweak, min, max, scale)
  def oracle(in: String) = None
}

/** Arbitrary-bounds big numeric — any range width and negative minimums,
  * via the native BigUniformMod expression (the bound shapes
  * [[RandomNumericBig]]'s constructive VARCHAR-math path cannot reach).
  * Full parity with the reference's unconstrained decimal limits. */
case class RandomNumericAny(min: BigDecimal, max: BigDecimal, scale: Int = 0,
                            tweak: String = "numany") extends ScalarTransformer {
  def column(in: Column) = Gen.bigDecimalBetweenAny(in, tweak, min, max, scale)
  def oracle(in: String) = None
}

/** Size-mode big numeric: ±(up to `digits` integer digits), the
  * reference's `GetMinAndMaxNumericValueBySetting` limiter
  * (`random_numeric.go:34-46`). */
case class RandomNumericBigSize(digits: Int, scale: Int = 0, tweak: String = "numbigsz")
  extends ScalarTransformer {
  def column(in: Column) = Gen.bigDecimalSigned(in, tweak, digits, scale)
  def oracle(in: String) = None
}

/** NoiseNumeric beyond DecimalType(38): multiplicative ratio noise with
  * optional clamp over arbitrary-precision non-negative decimal TEXT
  * (ref `noise_numeric.go:38-49`). */
case class NoiseNumericBig(maxRatio: Double, scale: Int, maxIntDigits: Int = 60,
                           minV: Option[BigDecimal] = None, maxV: Option[BigDecimal] = None,
                           tweak: String = "noisenb") extends ScalarTransformer {
  override def allowedInputTypes: Option[Set[String]] = Some(Set("string"))
  def column(in: Column) = Gen.bigNoise(in, tweak, maxRatio, scale, maxIntDigits, minV, maxV)
  def oracle(in: String) = None
}

/** RandomBool (ref `random_bool.go:30`). */
case class RandomBool(tweak: String = "bool") extends ScalarTransformer {
  def column(in: Column) = Gen.u60(in, tweak) % 2 === 0
  def oracle(in: String) = Some(s"((${OracleGen.u60(in, tweak)}) % 2 = 0)")
}

/** RandomDate — timestamp in [min,max] epoch seconds with optional
  * truncation part (ref `random_date.go:43`, engine `random_timestamp.go`).
  * Emits a TimestampType column. */
case class RandomDate(minEpoch: Long, maxEpoch: Long, truncate: Option[String] = None,
                      tweak: String = "date") extends ScalarTransformer {
  def column(in: Column) = {
    val ts = Gen.timestampBetween(Gen.u60(in, tweak), minEpoch, maxEpoch)
    truncate.fold(ts)(p => date_trunc(p, ts))
  }
  // Oracle compares epoch seconds (tz-neutral); Verify queries should
  // project unix_timestamp(...) — see epochColumn/epochOracle.
  def oracle(in: String) = Some {
    val e = OracleGen.epochBetween(OracleGen.u60(in, tweak), minEpoch, maxEpoch)
    truncate.fold(e)(p => s"epoch(date_trunc('$p', make_timestamp((${e})::BIGINT * 1000000)))::BIGINT")
  }
  /** Epoch-seconds projection of the same value (for oracle-safe output). */
  def epochColumn(in: Column): Column = unix_timestamp(column(in))
}

/** RandomUnixTimestamp — integer epoch in [min,max] at a unit
  * (ref `random_unix_timestamp.go:28-75`). */
case class RandomUnixTimestamp(minEpoch: Long, maxEpoch: Long, unit: String = "sec",
                               tweak: String = "unixts") extends ScalarTransformer {
  private val mult: Long = unit match {
    case "sec" => 1L; case "ms" => 1000L; case "us" => 1000000L; case "ns" => 1000000000L
    case other => throw new IllegalArgumentException(s"RandomUnixTimestamp: bad unit $other")
  }
  def column(in: Column) = Gen.longBetween(Gen.u60(in, tweak), minEpoch, maxEpoch) * mult
  def oracle(in: String) =
    Some(s"(${OracleGen.longBetween(OracleGen.u60(in, tweak), minEpoch, maxEpoch)} * ${mult})")
}

/** RandomString over an arbitrary charset (ref `random_string.go:29`). */
case class RandomString(minLen: Int, maxLen: Int,
                        charset: String = "abcdefghijklmnopqrstuvwxyz",
                        tweak: String = "str") extends ScalarTransformer {
  def column(in: Column) = Gen.stringBetween(in, tweak, charset, minLen, maxLen)
  def oracle(in: String) = Some(OracleGen.stringBetween(in, tweak, charset, minLen, maxLen))
}

/** RandomUuid (ref `random_uuid.go:29`). */
case class RandomUuid(tweak: String = "uuid") extends ScalarTransformer {
  def column(in: Column) = Gen.uuidFrom(in, tweak)
  def oracle(in: String) = Some(OracleGen.uuidFrom(in, tweak))
}

/** RandomChoice — pick from a value list (ref `random_choice.go:31`). */
case class RandomChoice(values: Seq[String], tweak: String = "choice") extends ScalarTransformer {
  require(values.nonEmpty, "RandomChoice: empty value list")
  def column(in: Column) =
    element_at(array(values.map(lit): _*), Gen.pick(Gen.u60(in, tweak), values.size))
  def oracle(in: String) = Some {
    val list = values.map(v => s"'${v.replace("'", "''")}'").mkString("[", ",", "]")
    s"${list}[${OracleGen.pick(OracleGen.u60(in, tweak), values.size)}]"
  }
}

/** RandomIp in arbitrary v4 CIDR, avoiding network/broadcast
  * (ref `random_ip.go:30`). */
case class RandomIp(cidr: String, tweak: String = "ip") extends ScalarTransformer {
  def column(in: Column) = Gen.ipv4InCidr(Gen.u60(in, tweak), cidr)
  def oracle(in: String) = Some(OracleGen.ipv4InCidr(OracleGen.u60(in, tweak), cidr))
}

/** RandomIp for IPv6 CIDRs (16-bit-aligned prefixes; ref `random_ip.go`
  * v6 path). */
case class RandomIpV6(cidr: String, tweak: String = "ip6") extends ScalarTransformer {
  def column(in: Column) = Gen.ipv6InCidr(in, tweak, cidr)
  def oracle(in: String) = Some(OracleGen.ipv6InCidr(in, tweak, cidr))
}

/** RandomMac with kept vendor prefix (ref `random_mac.go:44`). */
case class RandomMac(prefix: Seq[String] = Seq("02"), tweak: String = "mac") extends ScalarTransformer {
  def column(in: Column) = Gen.macFrom(in, tweak, prefix)
  def oracle(in: String) = Some(OracleGen.macFrom(in, tweak, prefix))
}

/** NoiseInt — v' = clamp(v * (1 + r), min, max), r in [-ratio, +ratio]
  * (ref `noise_int.go:29`, math `noise_int64.go:19-37`). */
case class NoiseInt(maxRatio: Double, minV: Option[Long] = None, maxV: Option[Long] = None,
                    tweak: String = "noisei") extends ScalarTransformer {
  override def allowedInputTypes: Option[Set[String]] = Some(Set("byte", "short", "integer", "long"))
  def column(in: Column) = {
    val noised = round(in.cast("double") * (lit(1.0) + Gen.noiseRatio(Gen.u60(in, tweak), maxRatio)))
      .cast("long")
    val lo = minV.fold(noised)(m => greatest(noised, lit(m)))
    maxV.fold(lo)(m => least(lo, lit(m)))
  }
  def oracle(in: String) = Some {
    val noised = s"round((${in})::DOUBLE * (1.0 + ${OracleGen.noiseRatio(OracleGen.u60(in, tweak), maxRatio)}))::BIGINT"
    val lo = minV.fold(noised)(m => s"greatest(${noised}, ${m})")
    maxV.fold(lo)(m => s"least(${lo}, ${m})")
  }
}

/** NoiseFloat (ref `noise_float.go:29`).
  *
  * Rounding-tie note: the exact rational product lands on a half-way
  * value ~1e-4 of rows; Spark rounds it via the double's shortest decimal
  * repr (HALF_UP) while DuckDB scales and std::rounds — both resolve away
  * from zero, verified on all ties at sf0.1. For strictly-constructive
  * parity semantics use [[NoiseNumeric]] (pure integer arithmetic). */
case class NoiseFloat(maxRatio: Double, decimals: Int = 4,
                      minV: Option[Double] = None, maxV: Option[Double] = None,
                      tweak: String = "noisef") extends ScalarTransformer {
  def column(in: Column) = {
    val noised = round(in.cast("double") * (lit(1.0) + Gen.noiseRatio(Gen.u60(in, tweak), maxRatio)), decimals)
    val lo = minV.fold(noised)(m => greatest(noised, lit(m)))
    maxV.fold(lo)(m => least(lo, lit(m)))
  }
  def oracle(in: String) = Some {
    val noised = s"round((${in})::DOUBLE * (1.0 + ${OracleGen.noiseRatio(OracleGen.u60(in, tweak), maxRatio)}), ${decimals})"
    val lo = minV.fold(noised)(m => s"greatest(${noised}, ${m}::DOUBLE)")
    maxV.fold(lo)(m => s"least(${lo}, ${m}::DOUBLE)")
  }
}

/** NoiseNumeric on DecimalType (ref `noise_numeric.go:31`).
  *
  * Computed entirely in exact integer arithmetic — value at `scale` as
  * integer units times the exact ratio numerator (10000 + k), rounded
  * half-away-from-zero by explicit +5000/div — because engine decimal
  * casts disagree on rounding ties (Spark HALF_UP vs DuckDB), which a
  * float path hits ~1/10^4 rows at scale. Exact while
  * |v|·10^scale·2·10^4 < 2^53 (plenty for money-like columns). */
case class NoiseNumeric(maxRatio: Double, scale: Int = 2,
                        minV: Option[BigDecimal] = None, maxV: Option[BigDecimal] = None,
                        tweak: String = "noisen") extends ScalarTransformer {
  require(maxRatio > 0 && maxRatio <= 1, "NoiseNumeric: maxRatio in (0,1]")
  private val t = s"decimal(38,$scale)"
  private val steps = math.round(maxRatio * 10000).toInt
  private val unit = BigDecimal(1L, scale) // 10^-scale exactly
  def column(in: Column) = {
    val k = Gen.u60(in, tweak) % (2 * steps + 1) - steps
    val vUnits = (in.cast(s"decimal(20,$scale)") * math.pow(10, scale).toLong).cast("long")
    val prod = vUnits * (lit(10000L) + k)
    val sgn = when(prod < 0, lit(-1L)).otherwise(lit(1L))
    // integer half-away-from-zero rounding, matching the oracle's exact
    // `//`: the quotient (abs+5000)/10000 has <= 4 fractional digits, so
    // the decimal division (result scale 6) is exact — no double rounding
    // that could cross an integer boundary near the 2^53 envelope
    val rounded = sgn * floor((abs(prod).cast("decimal(38,0)") + lit(5000L)) / lit(10000L)).cast("long")
    val noised = (rounded.cast("decimal(19,0)") *
      lit(unit.underlying).cast(s"decimal(${scale + 1},$scale)")).cast(t)
    val lo = minV.fold(noised)(m => greatest(noised, lit(m.underlying).cast(t)))
    maxV.fold(lo)(m => least(lo, lit(m.underlying).cast(t)))
  }
  def oracle(in: String) = Some {
    val st = s"DECIMAL(38,$scale)"
    val k = s"((${OracleGen.u60(in, tweak)}) % ${2 * steps + 1} - ${steps})"
    val vUnits = s"((${in})::DECIMAL(20,$scale) * ${math.pow(10, scale).toLong})::BIGINT"
    val prod = s"(${vUnits} * (10000 + ${k}))"
    val rounded = s"((CASE WHEN ${prod} < 0 THEN -1 ELSE 1 END) * ((abs(${prod}) + 5000) // 10000))"
    val noised = s"((${rounded})::DECIMAL(19,0) * (${unit})::DECIMAL(${scale + 1},$scale))::${st}"
    val lo = minV.fold(noised)(m => s"greatest(${noised}, (${m})::${st})")
    maxV.fold(lo)(m => s"least(${lo}, (${m})::${st})")
  }
}

/** NoiseDate — shift timestamp by up to ±maxDays, truncate part optional
  * (ref `noise_date.go:34`, `noise_timestamp.go`). Works on epoch seconds. */
case class NoiseDate(maxShiftDays: Int, truncate: Option[String] = None,
                     tweak: String = "noised") extends ScalarTransformer {
  private val maxShiftSec = maxShiftDays * 86400L
  /** input must be epoch seconds (LongType); use epoch projections at call site. */
  def column(in: Column) = {
    val shift = Gen.longBetween(Gen.u60(in, tweak), -maxShiftSec, maxShiftSec)
    val ts = timestamp_seconds(in + shift)
    unix_timestamp(truncate.fold(ts)(p => date_trunc(p, ts)))
  }
  def oracle(in: String) = Some {
    val shift = OracleGen.longBetween(OracleGen.u60(in, tweak), -maxShiftSec, maxShiftSec)
    val e = s"((${in}) + ${shift})"
    truncate.fold(e)(p => s"epoch(date_trunc('$p', make_timestamp((${e})::BIGINT * 1000000)))::BIGINT")
  }
}

/** Hash — salted digest, optional truncation (ref `hash.go:35-80`).
  * Algorithms: md5, sha1, sha256, sha512 via Spark built-ins;
  * sha3-224/256/384/512 via the native [[graft.expressions.DigestHex]]
  * codegen expression over JDK 17's SHA3 `MessageDigest` (full parity
  * with the reference's algorithm list). */
case class HashText(algo: String = "sha256", maxLength: Int = 0, salt: String = Gen.Salt)
  extends ScalarTransformer {
  override def keepNull: Boolean = false
  def column(in: Column) = {
    val salted = concat(lit(salt), in.cast("string"))
    val digest = algo match {
      case "md5" => md5(salted)
      case "sha1" => sha1(salted)
      case "sha256" => sha2(salted, 256)
      case "sha512" => sha2(salted, 512)
      case "sha3-224" | "sha3-256" | "sha3-384" | "sha3-512" =>
        org.apache.spark.sql.GraftBridge.column(graft.expressions.DigestHex(
          org.apache.spark.sql.GraftBridge.expression(salted),
          "SHA3-" + algo.stripPrefix("sha3-")))
      case other => throw new IllegalArgumentException(s"Hash: unsupported algo $other")
    }
    if (maxLength > 0) substring(digest, 1, maxLength) else digest
  }
  def oracle(in: String) = {
    val salted = s"'${salt}' || (${in})::VARCHAR"
    val d = algo match {
      case "md5" => Some(s"md5(${salted})")
      case "sha256" => Some(s"sha256(${salted})")
      case _ => None // sha1/sha512/sha3-* not built into DuckDB 1.0 core
    }
    d.map(x => if (maxLength > 0) s"substr(${x},1,${maxLength})" else x)
  }
}

/** Masking — fixed-shape redaction styles (ref `masking.go:43-130` +
  * go-masker v1.1.0 semantics; `default`/`postcode` are greenmask's own,
  * `masking.go:171-180`). All styles are pure string expressions (RE2-safe
  * so the oracle renders in DuckDB). */
case class Masking(style: String = "default") extends ScalarTransformer {
  override def keepNull: Boolean = true
  override def allowedInputTypes: Option[Set[String]] = Some(Set("string"))
  def column(in: Column) = style match {
    // '*' per char via RE2-safe regexp (identical rendering in DuckDB;
    // avoids repeat()-with-column-length portability concerns)
    case "default" | "password" => regexp_replace(in, ".", "*")
    case "name" => concat(substring(in, 1, 1), lit("**"))
    case "addr" => concat(substring(in, 1, 6), lit("******"))
    case "email" =>
      concat(substring(substring_index(in, "@", 1), 1, 3), lit("****"),
        when(in.contains("@"), concat(lit("@"), substring_index(in, "@", -1))).otherwise(lit("")))
    case "mobile" => concat(substring(in, 1, 4), lit("***"), substring(in, -3, 3))
    case "tel" => concat(in.substr(lit(1), greatest(length(in) - 4, lit(0))), lit("****"))
    case "id" => concat(substring(in, 1, 6), lit("****"))
    case "credit_card" => concat(substring(in, 1, 6), lit("******"), substring(in, -4, 4))
    case "url" => regexp_replace(in, "://([^:/@]+):([^@/]+)@", "://$1:xxxxx@")
    case "postcode" =>
      when(length(in) <= 2, in)
        .otherwise(concat(substring(in, 1, 2), regexp_replace(in.substr(lit(3), length(in)), ".", "*")))
    case other => throw new IllegalArgumentException(s"Masking: unknown style $other")
  }
  def oracle(in: String) = Some(style match {
    case "default" | "password" => s"regexp_replace(${in}, '.', '*', 'g')"
    case "name" => s"(substr(${in},1,1) || '**')"
    case "addr" => s"(substr(${in},1,6) || '******')"
    case "email" =>
      s"(substr(split_part(${in},'@',1),1,3) || '****' || " +
        s"CASE WHEN contains(${in},'@') THEN '@' || split_part(${in},'@',2) ELSE '' END)"
    case "mobile" => s"(substr(${in},1,4) || '***' || substr(${in}, length(${in})-2, 3))"
    case "tel" => s"(substr(${in},1,greatest(length(${in})-4,0)) || '****')"
    case "id" => s"(substr(${in},1,6) || '****')"
    case "credit_card" => s"(substr(${in},1,6) || '******' || substr(${in}, length(${in})-3, 4))"
    case "url" => s"regexp_replace(${in}, '://([^:/@]+):([^@/]+)@', '://\\1:xxxxx@')"
    case "postcode" =>
      s"CASE WHEN length(${in}) <= 2 THEN ${in} ELSE substr(${in},1,2) || regexp_replace(substr(${in},3), '.', '*', 'g') END"
  })
}

/** RegexpReplace (ref `regexp_replace.go:26`). Pattern must be RE2-safe for
  * the oracle rendering; Spark accepts the superset. */
case class RegexpReplaceT(pattern: String, replacement: String) extends ScalarTransformer {
  override def keepNull: Boolean = false
  override def allowedInputTypes: Option[Set[String]] = Some(Set("string"))
  def column(in: Column) = regexp_replace(in, pattern, replacement)
  def oracle(in: String) = {
    val ddbRepl = replacement.replaceAll("\\$(\\d)", "\\\\$1").replace("'", "''")
    Some(s"regexp_replace(${in}, '${pattern.replace("'", "''")}', '${ddbRepl}', 'g')")
  }
}

/** Replace — constant value; `keepNull` mirrors the reference's keep_null
  * param (default true: NULL stays NULL; ref `replace.go:25`). */
case class Replace(value: String, override val keepNull: Boolean = true)
  extends ScalarTransformer {
  def column(in: Column) = lit(value)
  def oracle(in: String) = Some(s"'${value.replace("'", "''")}'")
}

/** SetNull (ref `set_null.go:25`). */
case class SetNull() extends ScalarTransformer {
  override def keepNull: Boolean = false
  def column(in: Column) = lit(null).cast("string")
  def oracle(in: String) = Some("NULL::VARCHAR")
}

/** Dict — exact-match remap with default / fail-on-miss
  * (ref `dict.go:27-66`). The reference's `\N` sentinel carries NULL
  * through the dictionary (`defaultNullSeq`, `dict.go:24`): a `\N` KEY
  * matches NULL input, and a `\N` VALUE (or default) produces NULL — so
  * NULL participates in matching like any other value rather than being
  * short-circuited by keep_null. Implemented as a chained CASE (a literal
  * map lookup that stays in codegen; for big dictionaries use a broadcast
  * join via Planner.dictJoin instead). */
case class Dict(mapping: Map[String, String], default: Option[String],
                failNotMatched: Boolean = false) extends ScalarTransformer {
  require(mapping.nonEmpty, "Dict: empty mapping")
  import Dict.NullSeq
  // NULL routes through the dictionary itself (matched by a \N key, or
  // falling to default / fail-not-matched), per the reference
  override def keepNull: Boolean = false
  private val pairs = mapping.toSeq.sortBy(_._1) // determinism of the expr tree
  private def out(v: String): Column =
    if (v == NullSeq) lit(null).cast("string") else lit(v)
  def column(in: Column) = {
    val matched = pairs.foldLeft(when(lit(false), lit(null).cast("string"))) {
      case (acc, (k, v)) =>
        if (k == NullSeq) acc.when(in.isNull, out(v))
        else acc.when(in === lit(k), out(v))
    }
    default match {
      case Some(d) => matched.otherwise(out(d))
      case None if failNotMatched => matched.otherwise(
        raise_error(concat(lit("Dict: unmatched "), coalesce(in, lit(NullSeq)))))
      case None => matched.otherwise(in)
    }
  }
  def oracle(in: String) = Some {
    def q(s: String) = s"'${s.replace("'", "''")}'"
    def vout(v: String) = if (v == NullSeq) "NULL" else q(v)
    val cases = pairs.map { case (k, v) =>
      if (k == NullSeq) s"WHEN (${in}) IS NULL THEN ${vout(v)}"
      else s"WHEN (${in}) = ${q(k)} THEN ${vout(v)}"
    }.mkString(" ")
    val els = default.map(vout).getOrElse(in)
    s"CASE ${cases} ELSE ${els} END"
  }
}

object Dict {
  /** The reference's NULL sentinel in keys/values/default (`dict.go:24`). */
  val NullSeq = "\\N"
}

/** PiiScrub — regex redaction of emails/IPs/phone runs (the training-data
  * scrub stage as a config-registrable column transformer; patterns in
  * [[graft.llm.TextOps.PiiPatterns]]). */
case class PiiScrub() extends ScalarTransformer {
  override def allowedInputTypes: Option[Set[String]] = Some(Set("string"))
  def column(in: Column) = graft.llm.TextOps.piiScrub(in)
  def oracle(in: String) = Some(graft.llm.TextOps.piiScrubSql(in))
}

/** TextNormalize — canonical lowercase/strip/collapse normalization as a
  * column transformer ([[graft.llm.TextOps.normalize]]). */
case class TextNormalize() extends ScalarTransformer {
  override def allowedInputTypes: Option[Set[String]] = Some(Set("string"))
  def column(in: Column) = graft.llm.TextOps.normalize(in)
  def oracle(in: String) = Some(graft.llm.TextOps.normalizeSql(in))
}

/** RandomEmail — hashed local part, kept or generated domain
  * (ref `email.go:25-77`). */
case class RandomEmail(keepOriginalDomain: Boolean = false,
                       domains: Seq[String] = Seq("example.com", "example.org", "mail.test"),
                       localLen: Int = 12, tweak: String = "email") extends ScalarTransformer {
  def column(in: Column) = {
    val local = Gen.hexString(in, tweak, lit(localLen))
    val domain =
      if (keepOriginalDomain)
        when(in.contains("@"), substring_index(in, "@", -1))
          .otherwise(element_at(array(domains.map(lit): _*), Gen.pick(Gen.u60b(in, tweak), domains.size)))
      else element_at(array(domains.map(lit): _*), Gen.pick(Gen.u60b(in, tweak), domains.size))
    concat(local, lit("@"), domain)
  }
  def oracle(in: String) = Some {
    val local = OracleGen.hexString(in, tweak, localLen.toString)
    val list = domains.map(d => s"'$d'").mkString("[", ",", "]")
    val gen = s"${list}[${OracleGen.pick(OracleGen.u60b(in, tweak), domains.size)}]"
    val domain =
      if (keepOriginalDomain)
        s"CASE WHEN contains(${in},'@') THEN split_part(${in},'@',2) ELSE ${gen} END"
      else gen
    s"(${local} || '@' || ${domain})"
  }
}
