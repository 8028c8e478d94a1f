package graft.transformers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.generators.{Gen, RandomEngine}
import graft.llm.TextOps

/** The template-function surface (§2.7): greenmask's go-template FuncMap
  * (`pkg/toolkit/template_functions.go:71-199`, ~70 funcs) re-scoped to
  * the Spark SQL expression dialect. Parity is FUNCTION COVERAGE, not
  * template syntax (SURVEY §2.7 decision): each FuncMap name maps to a
  * Column builder — most are builtins, the rest reuse the §2.6
  * expression kernel. `TemplateExpr` configs reference these through
  * plain Spark SQL; this object is the documented coverage ledger and the
  * programmatic surface.
  */
object TemplateFunctions {

  /** Null handling — FuncMap `null,isNull,isNotNull,sqlCoalesce`. */
  def nullLit: Column = lit(null)
  def isNullF(c: Column): Column = c.isNull
  def isNotNullF(c: Column): Column = c.isNotNull
  def sqlCoalesce(cs: Column*): Column = coalesce(cs: _*)

  /** JSON — FuncMap `jsonGet/Set/Delete/Validate/Exists` (gjson paths →
    * dotted get_json_object paths + JsonTransform ops). */
  def jsonGet(doc: Column, path: String): Column = JsonFuncs.jsonGet(doc, path)
  def jsonExists(doc: Column, path: String): Column = JsonFuncs.jsonExists(doc, path)
  def jsonValidate(doc: Column): Column = JsonFuncs.jsonValidate(doc)
  def jsonSet(doc: Column, key: String, v: Column): Column =
    JsonTransform(Seq(JsonSet(key, v))).column(doc)
  def jsonDelete(doc: Column, key: String): Column =
    JsonTransform(Seq(JsonDelete(key))).column(doc)

  /** Type predicates — `isInt,isFloat,isNil,isString,isBool` (dynamic-typed
    * template values → SQL try-cast probes). */
  def isInt(c: Column): Column = try_cast_ok(c, "bigint")
  def isFloat(c: Column): Column = try_cast_ok(c, "double")
  def isBool(c: Column): Column = try_cast_ok(c, "boolean")
  def isNil(c: Column): Column = c.isNull
  private def try_cast_ok(c: Column, t: String): Column =
    c.isNotNull && c.cast("string").try_cast(t).isNotNull

  /** Masking — `masking(type, v)`. */
  def masking(style: String, v: Column): Column = Masking(style).column(v)

  /** Date — `truncateDate,tsModify,noiseDatePgInterval`. */
  def truncateDate(part: String, ts: Column): Column = date_trunc(part, ts)
  def tsModify(ts: Column, seconds: Long): Column =
    timestamp_seconds(unix_timestamp(ts) + seconds)
  def noiseDate(ts: Column, maxShiftDays: Int): Column =
    timestamp_seconds(NoiseDate(maxShiftDays).column(unix_timestamp(ts)))

  /** Noise / random scalars — `noiseFloat,noiseInt,randomBool,randomDate,
    * randomFloat,randomInt,randomString,roundFloat`. Deterministic (hash)
    * variants take the driving column; random variants use the PRNG. */
  def noiseInt(v: Column, ratio: Double): Column = NoiseInt(ratio).column(v)
  def noiseFloat(v: Column, ratio: Double, decimals: Int): Column =
    NoiseFloat(ratio, decimals).column(v)
  def randomBool(): Column = RandomEngine.bool()
  def randomInt(min: Long, max: Long): Column = RandomEngine.longBetween(min, max)
  def randomFloat(min: Double, max: Double): Column = RandomEngine.doubleBetween(min, max, 4)
  def randomDate(minEpoch: Long, maxEpoch: Long): Column =
    RandomEngine.timestampBetween(minEpoch, maxEpoch)
  def randomString(seed: Column, minLen: Int, maxLen: Int): Column =
    Gen.stringBetween(seed, "tfn-str", "abcdefghijklmnopqrstuvwxyz", minLen, maxLen)
  def roundFloat(v: Column, decimals: Int): Column = round(v, decimals)

  /** Faker family (~35 funcs in the FuncMap) — backed by §2.6 Faker. */
  def fakerFirstName(seed: Column): Column = MultiCol.person(seed).toMap.apply("first_name")
  def fakerLastName(seed: Column): Column = MultiCol.person(seed).toMap.apply("last_name")
  def fakerEmail(seed: Column): Column = RandomEmail().column(seed)
  def faker(name: String, seed: Column): Column = Faker.all(name).column(seed)

  /** Text/statistics extras exposed to templates (engine addition). */
  def tokenCount(c: Column): Column = TextOps.tokenCount(c)
  def fingerprint(c: Column): Column = TextOps.fingerprint(c)

  /** Record-context accessors (`.GetColumnValue/.SetColumnValue`,
    * `template_record_context.go`) are subsumed by column references in
    * the SQL dialect: `expr("other_col")` IS GetColumnValue; a
    * TemplateRecord config (multi-column exprs) IS SetColumnValue. */
  def getColumnValue(name: String): Column = col(name)

  /** Sprig-standard string helpers used by reference configs (sprig is
    * imported wholesale in `template.go`): upper/lower/trim/substr/repeat/
    * trunc/replace — all Spark builtins; listed for the coverage ledger. */
  val sprigEquivalents: Map[String, String] = Map(
    "upper" -> "upper", "lower" -> "lower", "title" -> "initcap",
    "trim" -> "trim", "trimAll" -> "trim", "substr" -> "substring",
    "repeat" -> "repeat", "trunc" -> "left", "replace" -> "replace",
    "contains" -> "contains", "hasPrefix" -> "startswith",
    "hasSuffix" -> "endswith", "cat" -> "concat_ws", "b64enc" -> "base64",
    "b64dec" -> "unbase64", "sha256sum" -> "sha2", "quote" -> "quote",
    "default" -> "coalesce", "ternary" -> "if", "add" -> "+", "sub" -> "-",
    "mul" -> "*", "div" -> "/", "mod" -> "pmod", "max" -> "greatest",
    "min" -> "least", "floor" -> "floor", "ceil" -> "ceil",
    "round" -> "round", "toString" -> "cast", "atoi" -> "cast",
    "split" -> "split", "join" -> "array_join", "uuidv4" -> "uuid",
    "now" -> "current_timestamp", "date" -> "date_format",
    "dateModify" -> "timestampadd", "ago" -> "datediff")
}
