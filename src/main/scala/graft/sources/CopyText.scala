package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** PostgreSQL COPY text-format codec — the Spark edition of the
  * reference's zero-copy row codec (`internal/db/postgres/pgcopy/`:
  * delimiters `common.go:17-20` — `\t` field sep, `\N` null, `\.`
  * terminator; escape tables `encoder.go:24`, octal/hex decode
  * `decoder.go:54`).
  *
  * In the reference this format IS the wire protocol; here it is an
  * interchange format so greenmask-produced `.dat` payloads (gunzipped)
  * round-trip through the Spark engine. Values travel as strings (the
  * reference is text-first too, SURVEY §1.2); callers cast to typed
  * columns after reading.
  */
object CopyText {

  /** Escape one field per `encoder.go` rules. */
  def encodeField(v: String): String =
    if (v == null) "\\N"
    else {
      val sb = new StringBuilder(v.length + 8)
      v.foreach {
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case 0x0B => sb.append("\\v")
        case c => sb.append(c)
      }
      sb.toString
    }

  /** Decode one field: named escapes + octal (`\123`) + hex (`\x4E`)
    * (`decoder.go:54`). `\N` null is handled at line level.
    *
    * Escapes produce raw BYTES, not UTF-16 chars: octal values are masked
    * to a byte (decoder.go masks with 0377) and consecutive escaped bytes
    * decode together as UTF-8 — so `\xC3\xA9` yields "é", exactly like
    * the reference's byte-oriented decoder. */
  def decodeField(s: String): String = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'v' => out.write(0x0B); i += 2
          case '\\' => out.write('\\'); i += 2
          case 'x' if i + 2 < s.length && isHex(s.charAt(i + 2)) =>
            val len = if (i + 3 < s.length && isHex(s.charAt(i + 3))) 2 else 1
            out.write(Integer.parseInt(s.substring(i + 2, i + 2 + len), 16) & 0xFF)
            i += 2 + len
          case d if d >= '0' && d <= '7' =>
            var len = 1
            while (len < 3 && i + 1 + len < s.length &&
              s.charAt(i + 1 + len) >= '0' && s.charAt(i + 1 + len) <= '7') len += 1
            // & 0xFF: octal escapes above \377 wrap to a byte (decoder.go)
            out.write(Integer.parseInt(s.substring(i + 1, i + 1 + len), 8) & 0xFF)
            i += 1 + len
          case other => out.write(other.toString.getBytes(utf8)); i += 2
        }
      } else {
        var j = i
        while (j < s.length && s.charAt(j) != '\\') j += 1
        out.write(s.substring(i, j).getBytes(utf8))
        i = j
      }
    }
    new String(out.toByteArray, utf8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Encode a DataFrame (stringified columns) as COPY text lines. One
    * output line per row; distributed text write (optionally gzip via
    * codec option, matching the reference's `.dat.gz`). */
  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val cols = df.columns
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.mapPartitions { rows =>
      rows.map { r =>
        (0 until cols.length).map { i =>
          if (r.isNullAt(i)) "\\N" else encodeField(String.valueOf(r.get(i)))
        }.mkString("\t")
      }
    }(Encoders.STRING)
    val w = compression.foldLeft(lines.write)((w, c) => w.option("compression", c))
    w.mode("overwrite").text(path)
  }

  /** Render one SINGLE `.dat` data file (the pg_restore directory-archive
    * per-table payload): distributed COPY-text encode into a scratch dir,
    * then a driver-side ordered stream-concat of the part files plus the
    * `\.` terminator line. One table = one COPY stream is pg_restore's
    * own contract, so the final single-stream hop is inherent to the
    * format, not a scale bug — the encode itself stays distributed. */
  /** With `gzip = true` the payload is written as CONCATENATED gzip
    * members (one per part + one for the terminator) — the gzip format
    * makes member concatenation a valid stream, so the distributed
    * encode parallelism survives compression, and zlib-based readers
    * (pg_restore included) decode it transparently. */
  def writeDatFile(df: DataFrame, file: String, gzip: Boolean = false): Unit = {
    val tmp = file + ".tmpdir"
    val dir = new java.io.File(tmp)
    try {
      write(df, tmp, compression = if (gzip) Some("gzip") else None)
      // the concat step requires a DRIVER-LOCAL scratch dir (this method
      // targets local directory archives; on a cluster, point `file` at
      // local disk or concat on the storage layer) — fail with a
      // diagnostic, not an NPE, if the write landed elsewhere
      val listed = Option(dir.listFiles()).getOrElse(
        throw new IllegalStateException(
          s"CopyText.writeDatFile: scratch dir $tmp is not on the driver-local " +
            "filesystem (spark default FS must be local for single-file rendering)"))
      val parts = listed.filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file))
      try {
        parts.foreach(p => java.nio.file.Files.copy(p.toPath, out))
        if (gzip) {
          // close() (not just finish()) releases the Deflater's native
          // zlib buffers immediately; it also closes `out`, which is
          // idempotent under the finally below
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write("\\.\n".getBytes("UTF-8")); gz.close()
        } else out.write("\\.\n".getBytes("UTF-8"))
      } finally out.close()
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
      dir.delete()
    }
  }

  /** Read COPY text lines back into a string-typed DataFrame. */
  def read(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType, nullable = true)))
    val enc = Encoders.row(schema)
    import spark.implicits._
    // Real pg_dump payloads end with the `\.` terminator followed by TWO
    // blank lines. "Everything after the terminator is not data" needs
    // line POSITIONS, so the lines are indexed (zipWithIndex preserves
    // file order: splits enumerate by offset) and the stream is cut at
    // the first terminator. Legitimate empty lines BEFORE it — a
    // one-column table's empty-string rows — survive; a literal "\\."
    // row is never ambiguous because COPY escapes its backslash.
    val indexed = spark.read.textFile(path).rdd.zipWithIndex()
    val termIdx = indexed.filter(_._1 == "\\.").map(_._2)
      .takeOrdered(1).headOption.getOrElse(Long.MaxValue)
    val lineDs = spark.createDataset(
      indexed.filter { case (_, i) => i < termIdx }.map(_._1))(Encoders.STRING)
    lineDs
      .mapPartitions { lines =>
        lines.map { l =>
          val fields = l.split("\t", -1).map {
            case "\\N" => null
            case f => decodeField(f)
          }
          Row.fromSeq(fields.padTo(columns.size, null).take(columns.size).toIndexedSeq)
        }
      }(enc)
  }
}
