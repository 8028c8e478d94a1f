package graft.pipeline

import org.apache.spark.sql.types._

/** PostgreSQL type-name → Spark DataType mapping — the `Driver` type
  * codec of the reference (`pkg/toolkit/driver.go:29-44` over pgx's
  * `pgtype.Map`; supported-type inventory per SURVEY §1.2). Unknown types
  * degrade to StringType passthrough, mirroring the reference's
  * raw-passthrough for unsupported types (`driver.go:124-127`). */
object PgTypes {

  def toSpark(pgType: String): DataType = normalize(pgType) match {
    case "int2" | "smallint" => ShortType
    case "int4" | "integer" | "int" | "serial" => IntegerType
    case "int8" | "bigint" | "bigserial" | "oid" => LongType
    case "float4" | "real" => FloatType
    case "float8" | "double precision" => DoubleType
    case "numeric" | "decimal" => DecimalType(38, 18) // PG numeric is unbounded; 38 cap (SURVEY §7.4)
    case "bool" | "boolean" => BooleanType
    case "text" | "varchar" | "char" | "bpchar" | "citext" | "name" => StringType
    case "date" => DateType
    case "timestamp" | "timestamptz" | "timestamp with time zone" |
         "timestamp without time zone" => TimestampType
    case "time" | "timetz" | "interval" => StringType // no direct Spark scalar; textual
    case "uuid" | "inet" | "cidr" | "macaddr" | "macaddr8" => StringType
    case "json" | "jsonb" | "xml" => StringType
    case "bytea" => BinaryType
    case "money" => DecimalType(19, 2)
    case t if t.endsWith("[]") => ArrayType(toSpark(t.dropRight(2)))
    case _ => StringType // unsupported => raw passthrough
  }

  /** Precision-preserving variant for archive DDL: `numeric(p,s)` keeps
    * its declared precision instead of the 38,18 cap, and NAIVE
    * timestamps map to TimestampNTZType (a `timestamp without time zone`
    * value is not an instant — reading it as session-zoned TimestampType
    * would shift it by the loader's timezone). Everything else delegates
    * to [[toSpark]]. */
  def toSparkPrecise(pgType: String): DataType = {
    val NumP = """(?i)\s*(?:numeric|decimal)\s*\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\)\s*""".r
    pgType.trim match {
      case NumP(p, s) => DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
      case t => normalize(t) match {
        case "timestamp" | "timestamp without time zone" => TimestampNTZType
        case _ => toSpark(t)
      }
    }
  }

  /** Whether the type is "supported" (typed round-trip) vs passthrough. */
  def isSupported(pgType: String): Boolean =
    toSpark(pgType) != StringType || Set("text", "varchar", "char", "bpchar",
      "citext", "name", "uuid", "inet", "cidr", "macaddr", "macaddr8",
      "json", "jsonb", "time", "timetz", "interval", "xml")(normalize(pgType))

  private def normalize(t: String): String = {
    val lower = t.trim.toLowerCase
    // strip length/precision qualifiers: varchar(255), numeric(10,2)
    val base = lower.indexOf('(') match {
      case -1 => lower
      case i => lower.substring(0, i) + lower.substring(lower.indexOf(')', i) + 1)
    }
    base.trim
  }
}
