package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PgToc
import graft.pipeline.PgToc.{Compression, Crtm, Entry, Header, Toc}
import graft.sources.CopyText

/** Property fuzz for the two interop codecs — the layers where one byte
  * of drift corrupts a user's restore. ScalaCheck generators drive a
  * deterministic seed ladder (no scalatestplus bridge in the offline
  * cache, so sampling is explicit): every sample is reproducible from
  * its printed seed index.
  *
  * The binary-TOC property is IDEMPOTENCE, not naive equality: version
  * gates legitimately drop fields (tableam < 1.14, relkind < 1.16,
  * section < 1.11) and two fields canonicalize NULL -> "" by design
  * (desc/fileName — real pg_restore segfaults on NULL there), so the
  * first write->read normalizes; the law is that a SECOND round trip is
  * exact, at every version in [1.10, 1.16]. At 1.16 (everything
  * serialized) equality-after-normalization is asserted directly.
  */
class PgTocPropertySpec extends AnyFunSuite {

  private val Rounds = 300

  /** Pull `n` deterministic samples from a Gen via a seed ladder. */
  private def samples[A](g: Gen[A], n: Int): Seq[(Int, A)] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i))
      .map(i -> _))

  // --------------------------------------------------------- generators

  /** Valid-UTF-8 strings (arbitrary Unicode minus lone surrogates, which
    * cannot survive any byte-oriented codec). */
  private val utf8String: Gen[String] = {
    val ch = Gen.frequency(
      4 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\t', '\n', '\r', '\\', '\b', '\f', 0x0B.toChar),
      2 -> Gen.oneOf("éüßж中🦆".toList),
      1 -> Gen.choose(1.toChar, 0x7F.toChar))
    Gen.listOf(ch).map(_.mkString)
      .suchThat(s => new String(
        s.getBytes("UTF-8"), "UTF-8") == s)
  }

  private val optStr: Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None),
    1 -> Gen.const(Some("")),
    5 -> utf8String.map(Some(_)))

  private val entryGen: Gen[Entry] = for {
    dumpId <- Gen.choose(1, 1000000)
    hadDumper <- Gen.oneOf(0, 1)
    tableOid <- Gen.choose(0L, Long.MaxValue)
    oid <- Gen.choose(0L, Long.MaxValue)
    tag <- optStr; desc <- optStr
    section <- Gen.oneOf(PgToc.SectionNone, PgToc.SectionPreData,
      PgToc.SectionData, PgToc.SectionPostData)
    defn <- optStr; dropStmt <- optStr; copyStmt <- optStr
    namespace <- optStr; tablespace <- optStr; tableam <- optStr
    relkind <- Gen.oneOf('r', 'S', 'v', 0.toChar).map(_.toByte)
    owner <- optStr
    deps <- Gen.listOf(Gen.choose(1, 1000000))
    fileName <- optStr
  } yield Entry(dumpId, hadDumper, tableOid, oid, tag, desc, section, defn,
    dropStmt, copyStmt, namespace, tablespace, tableam, relkind, owner,
    deps, fileName)

  private def headerGen(minor: Int): Gen[Header] = for {
    // v1.15+ records the algorithm byte, so lz4 (2) and zstd (3) fuzz
    // there; older headers can only express none/gzip via the level int
    algo <- if (minor >= 15) Gen.oneOf(0, 1, 2, 3) else Gen.oneOf(0, 1)
    level <- Gen.choose(0, 9)
    sec <- Gen.choose(0, 59); min <- Gen.choose(0, 59); hour <- Gen.choose(0, 23)
    mday <- Gen.choose(1, 28); mon <- Gen.choose(0, 11)
    year <- Gen.choose(70, 200); dbName <- optStr
    remote <- optStr; dumpV <- optStr
  } yield Header(1, minor, 0,
    compression =
      if (minor >= 15) Compression(algorithm = algo)
      else Compression(algorithm = if (level != 0) 1 else 0, level = level),
    crtm = Crtm(sec, min, hour, mday, mon, year, 0),
    dbName = dbName, remoteVersion = remote, dumpVersion = dumpV)

  private def tocGen(minor: Int): Gen[Toc] = for {
    h <- headerGen(minor)
    es <- Gen.listOfN(3, entryGen)
  } yield Toc(h, es)

  private def roundTrip(t: Toc): Toc =
    PgToc.read(new java.io.ByteArrayInputStream(PgToc.writeBytes(t)))

  // --------------------------------------------------------- properties

  test("binary TOC: read∘write is idempotent at EVERY supported version") {
    (10 to 16).foreach { minor =>
      samples(tocGen(minor), Rounds / 7 + 1).foreach { case (i, toc) =>
        val once = roundTrip(toc)
        val twice = roundTrip(once)
        assert(twice == once, s"v1.$minor seed=$i: second round trip drifted")
      }
    }
  }

  test("binary TOC v1.16: one round trip is exact up to the documented canonicalizations") {
    samples(tocGen(16), Rounds).foreach { case (i, toc) =>
      val expected = toc.copy(entries = toc.entries.map(e =>
        e.copy(desc = Some(e.desc.getOrElse("")),
          fileName = Some(e.fileName.getOrElse("")))))
      assert(roundTrip(toc) == expected, s"seed=$i: v1.16 round trip diverged")
    }
  }

  test("binary TOC: version gates drop exactly their own fields (1.10 parses clean)") {
    samples(tocGen(10), Rounds / 3).foreach { case (i, toc) =>
      val back = roundTrip(toc) // ungated section write would desync HERE
      back.entries.zip(toc.entries).foreach { case (b, e) =>
        assert(b.dumpId == e.dumpId && b.tag == e.tag &&
          b.dependencies == e.dependencies && b.owner == e.owner,
          s"seed=$i: pre-gate fields corrupted at v1.10")
        assert(b.section == PgToc.SectionNone && b.tableam.isEmpty &&
          b.relkind == 0.toByte, s"seed=$i: gated fields leaked at v1.10")
      }
    }
  }

  test("COPY field codec: decode∘encode is identity for arbitrary UTF-8") {
    samples(utf8String, Rounds).foreach { case (i, s) =>
      assert(CopyText.decodeField(CopyText.encodeField(s)) == s, s"seed=$i")
    }
  }

  test("COPY line codec: tab-joined rows round-trip with NULLs (the read() path)") {
    val fieldOrNull: Gen[String] = Gen.frequency(
      1 -> Gen.const(null: String), 6 -> utf8String)
    val rowGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, fieldOrNull))
    samples(rowGen, Rounds).foreach { case (i, fields) =>
      val line = fields.map(f =>
        if (f == null) "\\N" else CopyText.encodeField(f)).mkString("\t")
      val back = line.split("\t", -1).map {
        case "\\N" => null
        case f => CopyText.decodeField(f)
      }
      assert(back.toSeq == fields, s"seed=$i: line round trip diverged")
      // encoded lines never contain raw control bytes that would split rows
      assert(!line.exists(c => c == '\n' || c == '\r'), s"seed=$i: raw EOL leaked")
    }
  }

  test("bytea hex form survives the field codec and re-parses to the same bytes") {
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    samples(bytesGen, Rounds).foreach { case (i, bs) =>
      val hex = CopyText.byteaHex(bs)
      val decoded = CopyText.decodeField(CopyText.encodeField(hex))
      assert(decoded == hex, s"seed=$i: hex text mangled")
      val parsed = decoded.drop(2).grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      assert(parsed.sameElements(bs), s"seed=$i: bytes diverged")
    }
  }

  test("decodeField never throws and never loses bytes on ARBITRARY input (pg-ingest hardening)") {
    // arbitrary third-party archives reach this decoder via pg-ingest:
    // any input must terminate (the round-8 lone-backslash hang) and
    // non-escape text must pass through verbatim
    val junk = Gen.listOf(Gen.frequency(
      3 -> Gen.oneOf('\\', 'x', '0', '7', '9', 'n', 'q'),
      2 -> Gen.alphaNumChar)).map(_.mkString)
    samples(junk, Rounds).foreach { case (i, s) =>
      val out = CopyText.decodeField(s) // must not hang or throw
      if (!s.contains('\\')) assert(out == s, s"seed=$i: plain text altered")
    }
  }
}
