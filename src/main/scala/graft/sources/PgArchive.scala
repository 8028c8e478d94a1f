package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.PgToc

/** Consume a PostgreSQL directory archive (pg_dump -Fd, or a
  * reference-produced dump) INTO Spark: parse `toc.dat`
  * ([[PgToc.read]]), then read each TABLE DATA payload through the
  * COPY-text codec ([[CopyText.read]]) with the column list taken from
  * the entry's own COPY statement. Gzipped payloads (`<id>.dat.gz`,
  * pg_dump's default) decompress transparently through Spark's codec
  * lookup; the TOC always records the bare `.dat` name, so the loader
  * probes both. The inverse of [[graft.pipeline.PgToc.dumpArchive]] —
  * together they make reference archives a first-class interchange
  * format on both sides of the engine.
  */
object PgArchive {

  // table part may itself be a quoted identifier with spaces — match
  // lazily up to the column-list paren rather than assuming \S+
  private val CopyCols = """(?s)COPY\s+.+?\(([^)]*)\)\s+FROM\s+stdin""".r

  /** Split a COPY column list honoring pg_dump's identifier quoting:
    * commas inside double quotes don't split, surrounding quotes strip,
    * doubled quotes un-double — so `("userId", "a,b")` yields exactly
    * `userId` and `a,b`. */
  def splitIdentList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < s.length && s.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result().trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  /** Column names from a TOC entry's COPY statement (pg_dump always
    * emits an explicit column list). */
  def columnsOf(e: PgToc.Entry): Seq[String] =
    e.copyStmt.flatMap(CopyCols.findFirstMatchIn)
      .map(m => splitIdentList(m.group(1)))
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"PgArchive: entry ${e.tag.getOrElse("?")} has no parsable COPY column list"))

  /** PostgreSQL column type -> Spark cast target (inverse of
    * `PgToc.pgType`; unmapped types stay string). */
  def sparkType(pg: String): Option[String] = pg.trim.toLowerCase match {
    case "bigint" | "int8" => Some("long")
    case "integer" | "int" | "int4" => Some("int")
    case "smallint" | "int2" => Some("short")
    case "double precision" | "float8" => Some("double")
    case "real" | "float4" => Some("float")
    case "boolean" | "bool" => Some("boolean")
    case "date" => Some("date")
    case t if t.startsWith("numeric") =>
      Some(t.replace("numeric", "decimal"))
    case t if t.startsWith("timestamp") => Some("timestamp")
    case "bytea" => Some("binary")
    case _ => None // text & friends stay string
  }

  private val DdlCol = """^\s*("(?:[^"]|"")+"|\S+)\s+(.+?),?\s*$""".r

  /** Column -> declared pg type from a TABLE entry's CREATE TABLE defn
    * (one column per line, the shape both pg_dump and
    * [[PgToc.dumpArchive]] emit). */
  def ddlTypes(defn: String): Map[String, String] =
    defn.linesIterator
      .dropWhile(!_.contains("(")).drop(1)
      .takeWhile(l => !l.trim.startsWith(")"))
      .flatMap {
        case DdlCol(rawName, tpe) =>
          val name =
            if (rawName.startsWith("\""))
              rawName.stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")
            else rawName
          Some(name -> tpe.trim.stripSuffix(","))
        case _ => None
      }.toMap

  /** Like [[load]], but when the archive carries TABLE schema entries
    * (pg_dump or `dumpArchive(includeSchema = true)`), cast each column
    * to the Spark type its CREATE TABLE DDL declares — so a
    * dumpArchive -> loadTyped round-trip preserves long/int/double/
    * decimal/bool/date/timestamp columns instead of flattening to
    * strings. Tables without a schema entry load string-typed. */
  def loadTyped(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.functions.col
    val toc = PgToc.readFile(s"$dir/toc.dat")
    val ddl = toc.entries
      .filter(e => e.desc.contains("TABLE") && e.defn.exists(_.contains("CREATE TABLE")))
      .flatMap(e => e.tag.map(_ -> ddlTypes(e.defn.get))).toMap
    load(spark, dir).map { case (table, df) =>
      ddl.get(table) match {
        case None => table -> df
        case Some(types) =>
          table -> df.select(df.columns.map { c =>
            types.get(c).flatMap(sparkType) match {
              case Some(t) => col(c).cast(t).as(c)
              case None => col(c)
            }
          }: _*)
      }
    }
  }

  /** Load every TABLE DATA payload: (table tag, string-typed DataFrame).
    * Entries come back in TOC order; restore ordering (dependencies) is
    * on the TOC if the caller needs it. */
  def load(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val toc = PgToc.readFile(s"$dir/toc.dat")
    toc.entries.filter(_.desc.contains("TABLE DATA")).map { e =>
      val table = e.tag.getOrElse(
        throw new IllegalArgumentException("PgArchive: TABLE DATA entry without a tag"))
      val base = e.fileName.filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException(s"PgArchive: $table has no data file"))
      val plain = new java.io.File(dir, base)
      val gz = new java.io.File(dir, base + ".gz")
      val file =
        if (plain.exists()) plain.getPath
        else if (gz.exists()) gz.getPath
        else throw new IllegalArgumentException(
          s"PgArchive: data file $base(.gz) missing for $table")
      table -> CopyText.read(spark, file, columnsOf(e))
    }
  }
}
