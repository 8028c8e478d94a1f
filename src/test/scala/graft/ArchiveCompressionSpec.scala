package graft

import java.nio.file.Files

import graft.pipeline.PgToc
import graft.sources.{Compress, PgArchive}

/** lz4/zstd directory archives end-to-end (reference `--compress=lz4|zstd`,
  * PG16+): dumpArchive emits `.dat.lz4`/`.dat.zst` payloads + a 1.15
  * header recording the algorithm, loadTyped round-trips them with types
  * intact, blobs compress/decompress per algorithm, and an unknown
  * `--compress=` spec fails loudly. The LIVE restore path (our pg-restore
  * CLI feeding psql through the same decompressors) is covered in
  * PgInteropSpec; the native pg_restore cross-check is gzip-only because
  * the container ships PostgreSQL 15 tooling (lz4/zstd archives are a
  * PG16 format — documented floor, not a gap in our codec). */
class ArchiveCompressionSpec extends SparkSpec {
  import spark.implicits._

  test("dumpArchive lz4/zstd: payload extensions, 1.15 header, typed round-trip") {
    for (spec <- Seq("lz4", "zstd")) {
      val base = Files.createTempDirectory(s"arch_$spec").toString
      val users = Seq((1L, "ann", Array[Byte](1, 2, 3)),
        (2L, "bob\tb", null.asInstanceOf[Array[Byte]]))
        .toDF("id", "name", "avatar").repartition(3)
      val blobs = Seq((9001L, Array[Byte](7, 0, 9))).toDF("lo_oid", "data")
      val toc = PgToc.dumpArchive(Seq("users" -> users), s"$base/arch", "cdb",
        includeSchema = true, compress = spec, largeObjects = Some(blobs))
      val ext = Compress.extension(Compress.parse(spec))
      val files = new java.io.File(s"$base/arch").listFiles().map(_.getName).toSet
      assert(files.exists(_.endsWith(".dat" + ext)), s"$spec: payload suffix missing in $files")
      assert(files.contains(s"blob_9001.dat$ext"), s"$spec: blob payload suffix")
      // lz4/zstd are only expressible from archive version 1.15
      assert(toc.header.versionMinor == 15 && toc.header.versionRev == 0)
      assert(toc.header.compression.algorithm == Compress.parse(spec))
      val readBack = PgToc.readFile(s"$base/arch/toc.dat")
      assert(readBack.header.compression.algorithm == Compress.parse(spec))
      // typed load: schema from the archive's own DDL, bytea decoded
      val loaded = PgArchive.loadTyped(spark, s"$base/arch").toMap
      val rows = loaded("users").orderBy("id")
        .as[(Long, String, Array[Byte])].collect()
      assert(rows.map(r => (r._1, r._2)).toSeq == Seq(1L -> "ann", 2L -> "bob\tb"))
      assert(rows(0)._3.toSeq == Seq[Byte](1, 2, 3) && rows(1)._3 == null, spec)
      val lo = PgArchive.loadLargeObjects(spark, s"$base/arch").collect()
      assert(lo.map(_.getLong(0)).toSeq == Seq(9001L))
      assert(lo(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](7, 0, 9), spec)
    }
  }

  test("unknown --compress spec fails loudly before any file is written") {
    val base = Files.createTempDirectory("arch_bad").toString
    val df = Seq((1, "x")).toDF("id", "v")
    val ex = intercept[IllegalArgumentException](
      PgToc.dumpArchive(Seq("t" -> df), s"$base/arch", "db", compress = "snappy"))
    assert(ex.getMessage.contains("snappy") && ex.getMessage.contains("zstd"))
  }

  test("--compress grammar matches native pg_dump: bare int = gzip LEVEL, method:level accepted") {
    // pg_dump treats a plain integer as a gzip level (0=none, 1-9=gzip)
    // — never an algorithm byte; '--compress=2' must NOT mean lz4
    assert(Compress.parse("0") == Compress.None)
    for (lvl <- 1 to 9) assert(Compress.parse(lvl.toString) == Compress.Gzip)
    // method:level (pg_dump 16 grammar): level validated per codec, algo wins
    assert(Compress.parse("gzip:6") == Compress.Gzip)
    assert(Compress.parse("lz4:9") == Compress.Lz4)
    assert(Compress.parse("zstd:3") == Compress.Zstd)
    assert(Compress.parse("none") == Compress.None)
    // out-of-range levels and level'd bare ints fail loudly
    intercept[IllegalArgumentException](Compress.parse("10"))
    intercept[IllegalArgumentException](Compress.parse("gzip:10"))
    intercept[IllegalArgumentException](Compress.parse("zstd:99"))
    intercept[IllegalArgumentException](Compress.parse("lz4:x"))
    intercept[IllegalArgumentException](Compress.parse("2:3"))
  }
}
