package graft

import org.apache.spark.sql.functions._

import graft.llm.{Sketches, TextOps}
import graft.ops.Funnel

/** Mergeable sketches (HLL registers, count-min) and event-sequence
  * analytics (funnel, cohort retention). */
class SketchFunnelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsTokens = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))

  test("hllDistinct estimates per-source distinct tokens within 25%") {
    val est = Sketches.hllDistinct(docsTokens, "source", "tok")
      .collect().map(r => r.getString(0) -> r.getLong(3) / 1000.0).toMap
    val exact = docsTokens.groupBy("source")
      .agg(countDistinct("tok").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactUnion = docsTokens.select("tok").distinct().count()
    assert(est.keySet == exact.keySet + "__union__")
    exact.foreach { case (srcName, n) =>
      val e = est(srcName)
      assert(math.abs(e - n) / n < 0.25, s"$srcName: est $e vs exact $n")
    }
    // m=64 registers -> ~13% standard error; 25% is a 2-sigma bound
    assert(math.abs(est("__union__") - exactUnion) / exactUnion < 0.25)
  }

  test("hllDistinct union row equals the sketch of the ungrouped stream") {
    // mergeability: element-wise max of per-source registers == one pass
    // over the whole stream with a single group
    val merged = Sketches.hllDistinct(docsTokens, "source", "tok")
      .filter(col("grp") === "__union__").select("hll_regsum")
      .collect().head.getLong(0)
    val single = Sketches.hllDistinct(
        docsTokens.withColumn("source", lit("all")), "source", "tok")
      .filter(col("grp") === "all").select("hll_regsum")
      .collect().head.getLong(0)
    assert(merged == single)
  }

  test("hllDistinct is partition-invariant") {
    val a = Sketches.hllDistinct(docsTokens.repartition(1), "source", "tok")
      .orderBy("grp").collect().toSeq
    val b = Sketches.hllDistinct(docsTokens.repartition(7), "source", "tok")
      .orderBy("grp").collect().toSeq
    assert(a == b)
  }

  test("cmsEstimate dominates the exact count and hits zero for absent probes") {
    val toks = docsTokens.select("tok")
    val out = Sketches.cmsEstimate(toks, "tok", SparkEntry.cmsProbeTokens)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == SparkEntry.cmsProbeTokens.toSet)
    out.foreach { case (p, est, exact) =>
      assert(est >= exact, s"$p: CMS $est under exact $exact")
    }
    val absent = out.find(_._1 == "zz_absent_probe").get
    assert(absent._3 == 0L)
    // the present probes are real corpus tokens
    assert(out.filter(_._1 != "zz_absent_probe").forall(_._3 > 0L))
  }

  test("sampleQuantiles: k-bounded sample, merge property, estimates near exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sketches.sampleQuantiles(docs, "source", "doc_id", "n_chars", k = 64)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // sample size caps at k (or the group size)
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, _, _, n) =>
      assert(n == math.min(64L, sizes(src)), s"$src sample_n $n")
    }
    // median estimate within 35% of the exact median (k=64 sample)
    val exact = graft.llm.Corpus.groupQuantiles(
        docs.select(col("source"), col("n_chars")), "source", "n_chars", Seq(50))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    out.filter(_._2 == 50).foreach { case (src, _, est, _) =>
      val e = exact(src).toDouble
      assert(math.abs(est - e) / e < 0.35, s"$src: est $est exact $e")
    }
    // mergeability: re-sampling the UNION OF SHARD SAMPLES reproduces the
    // whole-table sample exactly (bottom-k of parts' bottom-k's)
    def bk(df: org.apache.spark.sql.DataFrame, v: String) =
      Sketches.bottomKSample(df, "source", "doc_id", v, k = 64)
    val s1 = bk(docs.filter(col("doc_id") % 2 === 0), "n_chars")
    val s2 = bk(docs.filter(col("doc_id") % 2 =!= 0), "n_chars")
    val merged = bk(s1.union(s2), "v")
      .orderBy("source", "doc_id").collect().toSeq
    val whole = bk(docs, "n_chars").orderBy("source", "doc_id").collect().toSeq
    assert(merged == whole)
  }

  test("hllOverlap estimates the distinct-key intersection within sketch error") {
    import spark.implicits._
    // |A| = 1000, |B| = 600, |A∩B| = 300 exactly
    val a = (1 to 1000).map(_.toLong).toDF("k")
    val b = (701 to 1300).map(_.toLong).toDF("k")
    val r = Sketches.hllOverlap(a, "k", b, "k").head()
    val (ea, eb, eu, eo) = (r.getLong(0) / 1000.0, r.getLong(1) / 1000.0,
      r.getLong(2) / 1000.0, r.getLong(3) / 1000.0)
    assert(math.abs(ea - 1000) / 1000.0 < 0.3)
    assert(math.abs(eb - 600) / 600.0 < 0.3)
    assert(math.abs(eu - 1300) / 1300.0 < 0.3)
    // overlap inherits the union's error additively: wide but useful bound
    assert(eo > 0 && math.abs(eo - 300) < 300,
      s"overlap est $eo vs exact 300 (a=$ea b=$eb u=$eu)")
  }

  test("profile: null accounting, string-form ranges, distinct sketch present") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), 5), (2L, None, 5), (3L, Some("y"), 7))
      .toDF("id", "s", "n")
    val out = graft.pipeline.Profile.profile(df, Seq("id", "s", "n"))
      .orderBy("col").collect()
    val byCol = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4), r.getLong(6))).toMap
    assert(byCol("id") == ((3L, 0L, "1", "3", byCol("id")._5)))
    assert(byCol("s")._1 == 2L && byCol("s")._2 == 1L)
    assert(byCol("n")._3 == "5" && byCol("n")._4 == "7")
    // tiny cardinalities -> linear counting is near-exact
    assert(byCol("id")._5 / 1000.0 > 2.0 && byCol("id")._5 / 1000.0 < 4.5)
    assert(byCol("n")._5 / 1000.0 > 1.5 && byCol("n")._5 / 1000.0 < 2.5)
  }

  test("profile: an all-null column still appears, with the empty sketch") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "dead")
    val out = graft.pipeline.Profile.profile(df, Seq("id", "dead"))
      .orderBy("col").collect()
    assert(out.length == 2, "all-null column must not drop from the report")
    val dead = out.find(_.getString(0) == "dead").get
    assert(dead.getLong(1) == 0L && dead.getLong(2) == 2L)
    assert(dead.isNullAt(3) && dead.isNullAt(4))
    // empty sketch: 64 zero registers -> regsum 64*2^55, estimate 0
    assert(dead.getLong(5) == (64L << 55) && dead.getLong(6) == 0L)
  }

  test("weightedTopK: exact k per group, weight-biased, partition-invariant") {
    import graft.llm.Sampling
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.weightedTopK(docs, "source", "doc_id", col("n_chars"), k = 8)
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(got(src) == math.min(8L, n), s"$src sample size")
    }
    // inclusion proportional to weight: sampled docs should skew longer
    // than the corpus median length (8 of ~170 per source, char-weighted)
    val medAll = docs.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    val medSamp = out.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    assert(medSamp > medAll, s"sample median $medSamp not above corpus $medAll")
    val a = Sampling.weightedTopK(docs.repartition(1), "source", "doc_id",
      col("n_chars"), 8).orderBy("doc_id").collect().toSeq
    val b = Sampling.weightedTopK(docs.repartition(7), "source", "doc_id",
      col("n_chars"), 8).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("funnel steps match a brute-force per-user fold") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
    val got = Funnel.steps(ev, "user_id", col("tsu"), "event_type",
        SparkEntry.funnelStepTypes)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val brute = ev.select("user_id", "tsu", "event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (u, evs) =>
        var done = 0; var last = Long.MinValue
        evs.sortBy(e => (e._2, e._3)).foreach { e =>
          if (done < SparkEntry.funnelStepTypes.size &&
              e._3 == SparkEntry.funnelStepTypes(done) && e._2 > last) {
            done += 1; last = e._2
          }
        }
        u -> done
      }
    assert(got.keySet == brute.keySet)
    brute.foreach { case (u, done) =>
      assert(got(u) == ((done, done == SparkEntry.funnelStepTypes.size)),
        s"user $u: got ${got(u)} brute $done")
    }
  }

  test("funnel is partition-invariant and strict-after on ties") {
    import spark.implicits._
    // same-ts step-2 event must NOT advance past step 1
    val rows = Seq((1L, 10L, "signup"), (1L, 10L, "view"), (1L, 20L, "view"),
      (2L, 5L, "view"), (2L, 6L, "signup"))
    val df = rows.toDF("user_id", "tsu", "event_type")
    val out = Funnel.steps(df, "user_id", col("tsu"), "event_type",
      Seq("signup", "view")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 2), (2L, 1))) // u1 advances via ts=20; u2 has no view AFTER signup
    val big = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
    val a = Funnel.steps(big.repartition(1), "user_id", col("tsu"), "event_type",
      SparkEntry.funnelStepTypes).orderBy("user_id").collect().toSeq
    val b = Funnel.steps(big.repartition(5), "user_id", col("tsu"), "event_type",
      SparkEntry.funnelStepTypes).orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("funnel maxEventsPerUser: truncated-history semantics, WindowGroupLimit in plan") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
    val cap = 20
    val capped = Funnel.steps(ev, "user_id", col("tsu"), "event_type",
      SparkEntry.funnelStepTypes, maxEventsPerUser = cap)
    // semantics: equals the uncapped funnel over each user's first cap
    // events by (ts, type)
    val got = capped.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val brute = ev.select("user_id", "tsu", "event_type")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (u, evs) =>
        var done = 0; var last = Long.MinValue
        evs.sortBy(e => (e._2, e._3)).take(cap).foreach { e =>
          if (done < SparkEntry.funnelStepTypes.size &&
              e._3 == SparkEntry.funnelStepTypes(done) && e._2 > last) {
            done += 1; last = e._2
          }
        }
        u -> done
      }
    assert(got.keySet == brute.keySet)
    brute.foreach { case (u, done) =>
      assert(got(u)._1 == done, s"user $u: got ${got(u)} brute $done")
    }
    // the cap actually bit (users carry ~50-90 events at this sf)…
    val uncapped = Funnel.steps(ev, "user_id", col("tsu"), "event_type",
        SparkEntry.funnelStepTypes)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.exists { case (u, (d, _)) => d != uncapped(u) },
      "cap=20 changed no user — fixture no longer exercises truncation")
    // …and via the rank-limit pushdown, not a full-history shuffle
    capped.collect()
    assert(capped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "row_number cap did not push down to a WindowGroupLimit")
  }

  test("stepTimes agrees with steps and yields strictly increasing times") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
    val steps = SparkEntry.funnelStepTypes
    val times = graft.ops.Funnel.stepTimes(ev, "user_id", col("tsu"),
        "event_type", steps)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val done = graft.ops.Funnel.steps(ev, "user_id", col("tsu"), "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // one time row per completed step, per user
    val perUser = times.groupBy(_._1)
    done.foreach { case (u, d) =>
      assert(perUser.get(u).map(_.length).getOrElse(0) == d, s"user $u")
    }
    // steps are 1..d with strictly increasing times (strict-after rule)
    perUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 > a._3, s"user $u times not increasing")
        case _ => ()
      }
    }
  }

  test("cohort retention: offsets non-negative, offset-0 counts cohort sizes") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
    val ret = Funnel.cohortRetention(ev, "user_id", col("tsu")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ret.forall(_._2 >= 0))
    // every user appears in their own cohort at offset 0
    val cohortSizes = ret.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    val users = ev.select("user_id").distinct().count()
    assert(cohortSizes.values.sum == users)
    // retention at offset k never exceeds the cohort size
    ret.foreach { case (c, k, n) =>
      assert(n <= cohortSizes(c), s"cohort $c offset $k: $n > ${cohortSizes(c)}")
    }
  }
}
