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

  /** The column-list parenthesis group of a COPY statement, located by a
    * QUOTE-AWARE scan (not a regex): a '(' inside a quoted table
    * identifier (`COPY public."a(b" (id) FROM stdin`) does not start the
    * list, and a ')' or ',' inside a quoted column name does not end or
    * split it. Doubled quotes toggle in/out of quoting twice — a no-op
    * for scanning purposes. Returns the raw text between the list's
    * parens, verified to be followed by `FROM stdin`. */
  private def copyColumnGroup(stmt: String): Option[String] = {
    val at = stmt.indexOf("COPY")
    if (at < 0) return None
    var i = at + 4
    var inQ = false
    var start = -1
    while (i < stmt.length && start < 0) {
      val c = stmt.charAt(i)
      if (inQ) { if (c == '"') inQ = false }
      else if (c == '"') inQ = true
      else if (c == '(') start = i + 1
      i += 1
    }
    if (start < 0) return None
    var j = start
    inQ = false
    while (j < stmt.length) {
      val c = stmt.charAt(j)
      if (inQ) { if (c == '"') inQ = false }
      else if (c == '"') inQ = true
      else if (c == ')') {
        return if (stmt.substring(j + 1).matches("(?is)\\s+FROM\\s+stdin.*"))
          Some(stmt.substring(start, j))
        else None
      }
      j += 1
    }
    None
  }

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
    e.copyStmt.flatMap(copyColumnGroup)
      .map(splitIdentList)
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"PgArchive: entry ${e.tag.getOrElse("?")} has no parsable COPY column list"))

  private val DdlCol = """^\s*("(?:[^"]|"")+"|\S+)\s+(.+?),?\s*$""".r

  // column-level constraint/option suffixes real pg_dump appends after
  // the type ('o_totalprice numeric(15,2) NOT NULL,') — strip before the
  // type lookup or the cast target would be garbage
  private val DdlSuffix =
    """(?i)\s+(not\s+null|null|default\s.*|generated\s.*|primary\s+key.*|unique.*|references\s.*|check\s*\(.*|collate\s.*|constraint\s.*)$""".r

  /** Column -> declared pg type from a TABLE entry's CREATE TABLE defn
    * (one column per line, the shape both pg_dump and
    * [[PgToc.dumpArchive]] emit); trailing column constraints strip. */
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
          // CONSTRAINT-only lines have no column; skip table-level rows
          if (Set("constraint", "primary", "unique", "foreign", "check")
              .contains(name.toLowerCase)) None
          else {
            var t = tpe.trim.stripSuffix(",")
            var changed = true
            while (changed) DdlSuffix.findFirstMatchIn(t) match {
              case Some(m) => t = t.substring(0, m.start).trim
              case None => changed = false
            }
            Some(name -> t)
          }
        case _ => None
      }.toMap

  /** Like [[load]], but when the archive carries TABLE schema entries
    * (pg_dump or `dumpArchive(includeSchema = true)`), cast each column
    * to the Spark type its CREATE TABLE DDL declares, via the central
    * [[graft.pipeline.PgTypes]] mapping (precision-aware decimals, NTZ
    * naive timestamps) — so a dump -> loadTyped round-trip preserves the
    * schema instead of flattening to strings. `bytea` columns decode
    * from their COPY hex form (`\x...`) to real bytes. Tables without a
    * schema entry, and columns whose pg type has no faithful Spark
    * scalar (arrays, json, uuid...), stay string-typed. */
  def loadTyped(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val toc = PgToc.readFile(s"$dir/toc.dat")
    val ddl = toc.entries
      .filter(e => e.desc.contains("TABLE") && e.defn.exists(_.contains("CREATE TABLE")))
      .flatMap(e => e.tag.map(_ -> ddlTypes(e.defn.get))).toMap
    loadFrom(spark, dir, toc).map { case (table, df) =>
      ddl.get(table) match {
        case None => table -> df
        case Some(types) =>
          table -> df.select(df.columns.map { c =>
            types.get(c).map(graft.pipeline.PgTypes.toSparkPrecise) match {
              case Some(BinaryType) =>
                // COPY text renders bytea as \x<hex>; unhex the payload
                // (a straight string->binary cast would keep the "\x.."
                // TEXT's utf-8 bytes — silent corruption)
                when(col(c).isNull, lit(null).cast(BinaryType))
                  .otherwise(unhex(regexp_replace(col(c), "^\\\\x", ""))).as(c)
              case Some(t: DecimalType) => col(c).cast(t).as(c)
              case Some(t @ (LongType | IntegerType | ShortType | DoubleType |
                             FloatType | BooleanType | DateType |
                             TimestampType | TimestampNTZType)) =>
                col(c).cast(t).as(c)
              case _ => col(c) // string family / arrays / unknown: as-is
            }
          }: _*)
      }
    }
  }

  /** Load every TABLE DATA payload: (table tag, string-typed DataFrame).
    * Entries come back in TOC order; restore ordering (dependencies) is
    * on the TOC if the caller needs it. */
  def load(spark: SparkSession, dir: String): Seq[(String, DataFrame)] =
    loadFrom(spark, dir, PgToc.readFile(s"$dir/toc.dat"))

  /** Large objects from a directory archive as (lo_oid: long, data:
    * binary) — `blobs.toc` maps each oid to a `blob_<oid>.dat[.gz]` file
    * whose payload is the RAW object bytes (not COPY text; verified
    * against real pg_dump output). Empty result when the archive holds
    * no large objects. Reads distribute one task per object; gzipped
    * payloads decompress inline. This is the ingest side of the
    * reference's LO support (`dumpers/large_object.go`); the write side
    * is [[graft.pipeline.PgToc.writeBlobFiles]] + `blobTocEntries` (the
    * `largeObjects` parameter of the archive dumpers), so blobs
    * round-trip in both directions. */
  def loadLargeObjects(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toc = new java.io.File(dir, "blobs.toc")
    val entries: Seq[(Long, String)] =
      if (!toc.exists()) Nil
      else java.nio.file.Files.readAllLines(toc.toPath).toArray(Array[String]())
        .toSeq.map(_.trim).filter(_.nonEmpty).map { line =>
          val Array(oid, f) = line.split("\\s+", 2)
          oid.toLong -> f.trim
        }
    entries.toDF("lo_oid", "f").as[(Long, String)].map { case (oid, f) =>
      val file = Compress.probeFile(dir, f).getOrElse(
        throw new IllegalArgumentException(
          s"PgArchive: blob payload $f(.gz/.lz4/.zst) missing"))
      val in = Compress.input(Compress.algoOfFile(file.getName),
        new java.io.FileInputStream(file))
      val bytes = try in.readAllBytes() finally in.close()
      (oid, bytes)
    }.toDF("lo_oid", "data")
  }

  private def loadFrom(spark: SparkSession, dir: String,
                       toc: PgToc.Toc): Seq[(String, DataFrame)] = {
    toc.entries.filter(_.desc.contains("TABLE DATA")).map { e =>
      val table = e.tag.getOrElse(
        throw new IllegalArgumentException("PgArchive: TABLE DATA entry without a tag"))
      val base = e.fileName.filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException(s"PgArchive: $table has no data file"))
      // the TOC records the bare .dat name for every compression
      // algorithm; probe plain/.gz/.lz4/.zst — CopyText.read picks the
      // codec from the suffix it finds
      val file = Compress.probeFile(dir, base).getOrElse(
        throw new IllegalArgumentException(
          s"PgArchive: data file $base(.gz/.lz4/.zst) missing for $table")).getPath
      table -> CopyText.read(spark, file, columnsOf(e))
    }
  }
}
