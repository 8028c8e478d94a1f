package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Morton interleaving: exact bit semantics plus the measurable layout
  * claim — z-clustered files cover compact rectangles in BOTH dimensions. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves exactly and round-trips through compactBits") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (12345L, 67890L),
      ((1L << 31) - 1, (1L << 31) - 1), (0x55555555L, 0x2AAAAAAAL))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got).foreach { case ((a, b), z) =>
      // reference semantics: bit i of a lands on bit 2i, b on 2i+1
      val expect = (0 until 31).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
      assert(z == expect, s"z($a,$b)")
      assert(ZOrder.compactBits(z) == a && ZOrder.compactBits(z >> 1) == b)
      assert(z >= 0)
    }
  }

  test("z-ordering is monotone on each axis when the other is fixed") {
    val z1 = ZOrder.compactBits _
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val b = rnd.nextInt(1 << 20).toLong
      val a1 = rnd.nextInt(1 << 20).toLong
      val a2 = a1 + 1 + rnd.nextInt(100)
      val (lo, hi) = (Seq((a1, b), (a2, b)).map { case (x, y) =>
        (0 until 31).foldLeft(0L)((acc, i) =>
          acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
      } match { case Seq(l, h) => (l, h) })
      assert(lo < hi)
      assert(z1(lo) == a1 && z1(hi) == a2)
    }
  }

  test("z-clustered files cover compact boxes in BOTH dims; a 1-D sort does not") {
    // uniform 2-D grid: 64x64 points
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = "/tmp/zorder_layout"
    val xDir = "/tmp/xsort_layout"
    ZOrder.writeZOrdered(grid, "x", "y", zDir, files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    def meanYRange(dir: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val ranges = files.map { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      ranges.sum / ranges.length
    }
    val zY = meanYRange(zDir)
    val xY = meanYRange(xDir)
    // x-sorted files span the full y range (~63); z-clustered files cover
    // compact rectangles — the min/max pruning win for y-predicates
    assert(xY > 50.0, s"x-sorted layout unexpectedly tight in y: $xY")
    assert(zY <= xY / 2.0, s"z layout not tighter: z=$zY vs x-sort=$xY")
  }
}
