package graft.sources

import java.io.{InputStream, OutputStream}

/** pg_dump compression-member codec, shared by the archive writer
  * ([[CopyText.writeDatFile]], [[graft.pipeline.PgToc]] blob files), the
  * archive loaders ([[CopyText.read]], [[PgArchive]]) and the restore
  * CLI ([[PgRestore]]).
  *
  * Algorithm numbering follows the archive header's compression byte
  * (reference `internal/db/postgres/toc/` and PostgreSQL
  * pg_backup_archiver: 0=none 1=gzip 2=lz4 3=zstd); file extensions
  * follow pg_dump's directory format (`.gz` / `.lz4` / `.zst`, TOC
  * records the bare `.dat` name for all of them). lz4 members are LZ4
  * FRAME format (what `pg_dump --compress=lz4` and the `lz4` CLI write —
  * NOT Hadoop's incompatible block codec, which is why the lz4/zstd
  * part-encode cannot ride Spark's text-writer compression option);
  * zstd members are standard zstd frames. Both formats define
  * concatenated frames as one valid stream, the property the
  * parallel member encode/decode relies on (same as gzip members).
  * Streams come from the lz4-java and zstd-jni libraries Spark itself
  * bundles — no new dependency.
  */
object Compress {

  val None = 0
  val Gzip = 1
  val Lz4 = 2
  val Zstd = 3

  /** Parse a user-facing spec (`--compress=` value): name or algorithm
    * number; unknown values fail loudly with the supported list. */
  def parse(spec: String): Int = spec.trim.toLowerCase match {
    case "" | "none" | "0" => None
    case "gzip" | "1"      => Gzip
    case "lz4" | "2"       => Lz4
    case "zstd" | "3"      => Zstd
    case other => throw new IllegalArgumentException(
      s"unknown compression '$other' (supported: none, gzip, lz4, zstd)")
  }

  def name(algo: Int): String = algo match {
    case None => "none"
    case Gzip => "gzip"
    case Lz4  => "lz4"
    case Zstd => "zstd"
    case other => throw new IllegalArgumentException(
      s"unknown compression algorithm byte $other (supported: 0=none, " +
        "1=gzip, 2=lz4, 3=zstd — a newer pg_dump format?)")
  }

  /** pg_dump's payload suffix for the algorithm ("" for none). */
  def extension(algo: Int): String = algo match {
    case None => ""
    case Gzip => ".gz"
    case Lz4  => ".lz4"
    case Zstd => ".zst"
    case other => throw new IllegalArgumentException(
      s"unknown compression algorithm byte $other")
  }

  /** Algorithm from a payload file name (by suffix). */
  def algoOfFile(fileName: String): Int =
    if (fileName.endsWith(".gz")) Gzip
    else if (fileName.endsWith(".lz4")) Lz4
    else if (fileName.endsWith(".zst")) Zstd
    else None

  /** Wrap `raw` for writing one compressed member (caller closes). */
  def output(algo: Int, raw: OutputStream): OutputStream = algo match {
    case None => raw
    case Gzip => new java.util.zip.GZIPOutputStream(raw)
    case Lz4  => new net.jpountz.lz4.LZ4FrameOutputStream(raw)
    case Zstd => new com.github.luben.zstd.ZstdOutputStream(raw)
    case other => throw new IllegalArgumentException(
      s"unknown compression algorithm byte $other")
  }

  /** Wrap `raw` for reading member(s); all three codecs decode
    * concatenated members/frames until EOF. */
  def input(algo: Int, raw: InputStream): InputStream = algo match {
    case None => raw
    case Gzip => new java.util.zip.GZIPInputStream(raw)
    // readSingleFrame = false: a payload may hold one frame per encoded
    // part file, and all of them are one logical stream
    case Lz4  => new net.jpountz.lz4.LZ4FrameInputStream(raw, false)
    case Zstd => new com.github.luben.zstd.ZstdInputStream(raw)
    case other => throw new IllegalArgumentException(
      s"unknown compression algorithm byte $other")
  }

  /** Probe `base`, then `base.gz` / `base.lz4` / `base.zst` in `dir` —
    * the TOC records the bare name for every algorithm. */
  def probeFile(dir: String, base: String): Option[java.io.File] =
    ("" +: Seq(Gzip, Lz4, Zstd).map(extension))
      .map(e => new java.io.File(dir, base + e)).find(_.exists())
}
