package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.pipeline.{ColumnTransform, Planner, TableConfig}
import graft.transformers.{HashText, Masking}

/** Dump-side determinism battery (round-13 verdict #7): Verify proves
  * QUERY results byte-identical across partition counts; this spec
  * extends the contract to ARCHIVE ARTIFACTS.
  *
  * The contract, as shipped:
  *  - same config + salt + parallelism ⇒ the member payload BYTES are
  *    identical run to run, at every compression algorithm
  *    (RoundRobinPartitioning local-sorts before exchanging, the scan
  *    order of a fixed file set is stable, and the hash engine is
  *    input-deterministic);
  *  - across DIFFERENT parallelism the canonicalization boundary is the
  *    member structure: member count tracks the encode parallelism
  *    (pg_dump's own -Fd shape has the same property — payload bytes
  *    are not canonical across -j), so bytes legitimately differ, while
  *    the DECODED ROW MULTISET and every masked value are invariant. */
class DumpDeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def sha(path: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
    d.digest(Files.readAllBytes(Paths.get(path))).map("%02x".format(_)).mkString
  }

  private val cfg = TableConfig("customer", transforms = Seq(
    ColumnTransform("c_name", Masking("name")),
    ColumnTransform("c_mktsegment", HashText())))

  private def masked() = Planner.plan(
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet"), cfg)

  test("same config+salt+parallelism: member payload bytes identical run-to-run at every algorithm") {
    val dir = Files.createTempDirectory("graft_dumpdet").toString
    for (algo <- Seq("none", "gzip", "lz4", "zstd")) {
      val a = graft.sources.Compress.parse(algo)
      val ext = graft.sources.Compress.extension(a)
      val f1 = s"$dir/run1_$algo.dat$ext"; val f2 = s"$dir/run2_$algo.dat$ext"
      graft.sources.CopyText.writeDatFile(masked(), f1, a)
      graft.sources.CopyText.writeDatFile(masked(), f2, a)
      assert(sha(f1) == sha(f2), s"$algo payload bytes diverged run-to-run")
      // the sidecar (member offsets) is part of the artifact contract
      assert(sha(f1 + ".idx") == sha(f2 + ".idx"), s"$algo sidecar diverged")
    }
  }

  test("across parallelism: member structure differs (documented boundary), decoded rows and masked values invariant") {
    val dir = Files.createTempDirectory("graft_dumpdet_par").toString
    val f2 = s"$dir/p2.dat.gz"; val f8 = s"$dir/p8.dat.gz"
    graft.sources.CopyText.writeDatFile(masked().repartition(2), f2,
      graft.sources.Compress.Gzip)
    graft.sources.CopyText.writeDatFile(masked().repartition(8), f8,
      graft.sources.Compress.Gzip)
    // the boundary: member count tracks encode parallelism
    def memberCount(f: String): Int =
      Files.readAllLines(Paths.get(f + ".idx")).size - 1
    assert(memberCount(f2) < memberCount(f8),
      s"expected fewer members at lower parallelism: ${memberCount(f2)} vs ${memberCount(f8)}")
    // the invariant: identical decoded row multiset, value for value
    val cols = masked().columns.toSeq
    def decoded(f: String): Map[Seq[String], Long] =
      graft.sources.CopyText.read(spark, f, cols).collect()
        .map(r => cols.indices.map(i => if (r.isNullAt(i)) null else r.getString(i)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(decoded(f2) == decoded(f8),
      "decoded row multiset must be invariant across encode parallelism")
  }
}
