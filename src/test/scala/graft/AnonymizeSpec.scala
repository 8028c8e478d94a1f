package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Anonymize
import graft.pipeline.Anonymize.QiLadder

/** Privacy enforcement: k-anonymity global recoding + deterministic
  * Laplace count release. */
class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  private def customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

  private val ladders = Seq(
    QiLadder("nat", Seq(col("c_nationkey").cast("long"),
      expr("c_nationkey div 5").cast("long"), lit(0L))),
    QiLadder("bal", Seq(round(col("c_acctbal"), -2),
      round(col("c_acctbal"), -3), lit(0.0d))))

  test("kAnonymize: non-suppressed classes all reach k; level is minimal") {
    val k = 5L
    val out = Anonymize.kAnonymize(customer, "c_custkey", ladders, k)
    val lvl = out.select("gen_level").head().getInt(0)
    val classes = out.filter(!col("suppressed"))
      .groupBy("nat", "bal").agg(count(lit(1)).as("n"))
    assert(classes.filter(col("n") < k).count() == 0)
    // minimality: every finer level must have at least one class < k
    (0 until lvl).foreach { finer =>
      val minSize = customer
        .groupBy(ladders.map(q => q.levels(finer).as(q.out)): _*)
        .agg(count(lit(1)).as("n")).agg(min("n")).head().getLong(0)
      assert(minSize < k, s"level $finer already satisfied k — $lvl not minimal")
    }
    assert(out.count() == customer.count()) // recoding drops nothing
  }

  test("kAnonymize: unreachable k suppresses stragglers at the coarsest level") {
    // two distinct rows, k=3: even the constant level has classes of 1
    val tiny = Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("id", "q", "v")
    val out = Anonymize.kAnonymize(tiny, "id",
      Seq(QiLadder("g", Seq(col("q"), lit(0L)))), k = 3L)
      .orderBy("id").collect()
    assert(out.forall(_.getInt(2) == 1))     // coarsest level chosen
    assert(out.forall(_.getBoolean(3)))      // both rows suppressed (class of 2 < 3)
  }

  test("dpNoisyCounts: deterministic, partition-invariant, eps-scaled exactly") {
    val a = Anonymize.dpNoisyCounts(customer.repartition(1), "c_mktsegment")
      .orderBy("grp").collect().toSeq
    val b = Anonymize.dpNoisyCounts(customer.repartition(7), "c_mktsegment")
      .orderBy("grp").collect().toSeq
    assert(a == b)
    // noisy = 1e9 * count + noise, and halving eps doubles the magnitude
    a.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 1000000000L + r.getLong(2))
    }
    val half = Anonymize.dpNoisyCounts(customer, "c_mktsegment",
        epsNum = 1L, epsDen = 2L).orderBy("grp").collect().toSeq
    a.zip(half).foreach { case (e1, e2) =>
      assert(e2.getLong(2) == e1.getLong(2) * 2L,
        s"${e1.getString(0)}: eps=1 noise ${e1.getLong(2)} vs eps=1/2 ${e2.getLong(2)}")
    }
    // noise is bounded by the inverse CDF's tail at 2^-53
    assert(a.forall(r => math.abs(r.getLong(2)) <= (Anonymize.Ln2p53Nano + 1)))
  }
}
