package graft

import org.apache.spark.sql.functions._
import graft.llm.{Corpus, TextOps}

/** Corpus-level ops (vocabulary top-k, contamination) + the new per-row
  * text stages (PII scrub, Gopher-style quality flags). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "cat cat cat"),
    (4L, "")).toDF("doc_id", "text")

  test("tokenTopK counts across the corpus with deterministic tie-break") {
    val top = Corpus.tokenTopK(docs, "text", 3).as[(String, Long)].collect()
    // the:4 cat:4 sat:2 on:2 ... — contract is (n desc, token asc)
    assert(top.toSeq == Seq(("cat", 4L), ("the", 4L), ("on", 2L)))
  }

  test("tokenTopK plan has map-side partial aggregation and TakeOrdered") {
    val plan = Corpus.tokenTopK(docs, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // partial HashAggregate below the exchange = map-side combine
    assert(plan.indexOf("HashAggregate") < plan.lastIndexOf("HashAggregate"), plan)
  }

  test("contaminatedIds finds trigram overlap, misses non-overlap") {
    val probe = Corpus.probeShingles("the cat sat on the mat")
    assert(probe == Seq("the cat sat", "cat sat on", "sat on the", "on the mat"))
    val hit = Corpus.contaminatedIds(docs, "doc_id", "text", probe)
      .as[Long].collect().toSet
    // doc 1 is the probe itself; doc 2 shares the trigram "sat on the";
    // doc 3 ("cat cat cat") and the empty doc share none
    assert(hit == Set(1L, 2L))
  }

  test("removeBoilerplateLines drops corpus-frequent lines, keeps order and empties") {
    // footer shared by 3 docs (>= minDocs 3); body lines unique per doc;
    // doc 4 is ALL boilerplate; empty lines are never counted, and pass
    // through; within-line order must be preserved
    val d = Seq(
      (1L, "intro one\nfooter line\nbody one"),
      (2L, "body two\n\nfooter line"),
      (3L, "footer line\nbody three\nbody three b"),
      (4L, "footer line"),
      (5L, "solo doc\nno footer")).toDF("doc_id", "text")
    val out = Corpus.removeBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      1L -> "intro one\nbody one",
      2L -> "body two\n",
      3L -> "body three\nbody three b",
      4L -> "",
      5L -> "solo doc\nno footer"))
  }

  test("removeBoilerplateLines counts DISTINCT docs (within-doc repeats don't qualify)") {
    val d = Seq(
      (1L, "x\nx\nx\nx"), // 4 repeats, but one doc
      (2L, "y"), (3L, "y"), (4L, "y\nkeep me")).toDF("doc_id", "text")
    val out = Corpus.removeBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(1L -> "x\nx\nx\nx", 2L -> "", 3L -> "", 4L -> "keep me"))
  }

  test("dedupLines keeps first occurrence of each line, including empties") {
    val d = Seq(
      "a\nb\na\nb\nc",
      "a\n\nb\n\na",
      "single",
      "").toDF("text")
    val out = d.select(TextOps.dedupLines(col("text"))).as[String].collect().toSeq
    assert(out == Seq("a\nb\nc", "a\n\nb", "single", ""))
  }

  test("unigramStats: integer corpus-frequency projection per doc") {
    val d = Seq(
      (1L, "the cat"), (2L, "the the dog"), (3L, "")).toDF("doc_id", "text")
    // corpus freqs: the=3, cat=1, dog=1
    val out = Corpus.unigramStats(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, 2L, Some(4L), Some(1L)),   // the(3) + cat(1)
      (2L, 3L, Some(7L), Some(1L)),   // the(3)*2 + dog(1)
      (3L, 0L, None, None)))           // token-less doc
  }

  test("bigramNovelty: distinct bigrams, novel iff in no other doc") {
    val d = Seq(
      (1L, "the cat sat here"),   // bigrams: "the cat", "cat sat", "sat here"
      (2L, "the cat ran off"),    // shares "the cat" with doc 1
      (3L, "x")).toDF("doc_id", "text") // < 2 tokens -> no bigrams
    val out = Corpus.bigramNovelty(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L), (2L, 3L, 2L), (3L, 0L, 0L)))
  }

  test("lengthOutliers: rank cutoffs per group, deterministic tie order") {
    // group a: 10 docs lengths 1..10 -> lo cut = 10*20//100 = 2 (ranks 1,2),
    // hi cut = 10*80//100 = 8 (ranks 9,10); group b: 1 doc, cuts 0 and 0 ->
    // rank 1 > 0 = outlier high
    val d = ((1L to 10L).map(i => (i, "a", i * 10)) :+ ((99L, "b", 5L)))
      .map { case (id, g, len) => (id.toLong, g, len.toLong) }.toDF("id", "grp", "len")
    val out = Corpus.lengthOutliers(d, "id", "grp", "len", loPct = 20, hiPct = 80)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert((1L to 10L).filter(out) == Seq(1L, 2L, 9L, 10L))
    assert(out(99L)) // single-doc group: rank 1 > 1*80//100 = 0
  }

  test("mixByGroup: per-group rates, isolation across groups, determinism") {
    import graft.llm.Sampling
    val d = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "grp")
    def keptWith(pA: Double) = Sampling.mixByGroup(d, "id", "grp",
      Map("a" -> pA, "b" -> 0.5)).select("id").as[Long].collect().toSet
    val k1 = keptWith(0.3)
    val k2 = keptWith(0.3)
    assert(k1 == k2) // deterministic
    // rates roughly honored per group (hash-uniform; wide tolerance)
    val aKept = k1.count(_ % 2 == 0); val bKept = k1.count(_ % 2 == 1)
    assert(aKept > 20 && aKept < 100, s"a kept $aKept of 200 at p=0.3")
    assert(bKept > 60 && bKept < 140, s"b kept $bKept of 200 at p=0.5")
    // re-weighting group a never disturbs group b's sample
    val k3 = keptWith(0.9)
    assert(k1.filter(_ % 2 == 1) == k3.filter(_ % 2 == 1))
    // monotone: raising a group's rate only ADDS rows
    assert(k1.filter(_ % 2 == 0).subsetOf(k3.filter(_ % 2 == 0)))
    // zero default drops unlisted groups
    val none = Sampling.mixByGroup(d.withColumn("grp", lit("zz")), "id", "grp",
      Map("a" -> 1.0)).count()
    assert(none == 0)
  }

  test("tokenBudgetPerGroup: budget binds per group, crossing row kept, deterministic") {
    import graft.llm.Sampling
    val d = (1L to 50L).map(i => (i, if (i <= 25) "a" else "b", 10L)).toDF("id", "grp", "toks")
    val out = Sampling.tokenBudgetPerGroup(d, "id", "grp", "toks", budget = 95L)
      .select("id", "grp").as[(Long, String)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    // 10 tokens each, budget 95 -> 10 docs per group (10th row crosses)
    assert(byGrp == Map("a" -> 10, "b" -> 10))
    // oversized first doc still ships (crossing row kept)
    val big = Seq((1L, "a", 1000L), (2L, "a", 1000L)).toDF("id", "grp", "toks")
    val kept = Sampling.tokenBudgetPerGroup(big, "id", "grp", "toks", budget = 5L).count()
    assert(kept == 1)
    // deterministic across runs
    val again = Sampling.tokenBudgetPerGroup(d, "id", "grp", "toks", budget = 95L)
      .select("id", "grp").as[(Long, String)].collect()
    assert(out.toSet == again.toSet)
  }

  test("contaminatedIds is a broadcast semi-join on exploded shingles") {
    val probe = Corpus.probeShingles("the cat sat on the mat")
    val plan = Corpus.contaminatedIds(docs, "doc_id", "text", probe)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("minhashLshClusters matches brute-force union-find over band edges") {
    import graft.llm.{Dedup, TextOps}
    // word soup with planted chains: docs 10/11 share text, 11/12 share
    // text, 10 and 12 do not — transitive closure must still merge them
    val rnd = new scala.util.Random(7L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 10L).map(i => (i, soup(12)))
    // near-dup chain: 20 shared tokens, single-token edits at opposite
    // ends -> J(10,11)=J(11,12)=0.8 (banding collides), J(10,12)~0.64
    val core = (1 to 19).map(i => s"w$i").mkString(" ")
    val chain = Seq(
      (10L, s"$core endx"),
      (11L, s"$core endy"),
      (12L, s"starty ${core.split(" ").drop(1).mkString(" ")} endy"))
    val docs = (base ++ chain).toDF("doc_id", "text")

    val got = Dedup.minhashLshClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap

    // brute-force union-find over the same band keys, computed via Spark
    // expressions for identical hashing
    val bandsOf = docs.select(col("doc_id"),
        TextOps.minhashSignatureFromText(col("text"), 3, 4).as("mh"))
      .select(col("doc_id"), array((0 until 4).map(b =>
        TextOps.bandHashFrom((0 until 8).map(i => element_at(col("mh"), i + 1)), b * 2, 2)): _*).as("bands"))
      .as[(Long, Seq[String])].collect()
    val parent = scala.collection.mutable.Map((base ++ chain).map(_._1).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val byBand = bandsOf.flatMap { case (id, bs) => bs.filter(_ != null).map(_ -> id) }
      .groupBy(_._1).values
    byBand.foreach { grp => grp.map(_._2).reduceOption((a, b) => { union(a, b); math.min(a, b) }) }
    val expected = (base ++ chain).map(_._1).map(i => i -> find(i)).toMap

    assert(got == expected)
    // the planted chain actually merged transitively
    assert(got(10L) == got(12L))
  }

  test("minhashLshClusters bounds storage and fails loudly on non-convergence") {
    import graft.llm.Dedup
    val core = (1 to 19).map(i => s"w$i").mkString(" ")
    val chain = Seq(
      (10L, s"$core endx"),
      (11L, s"$core endy"),
      (12L, s"starty ${core.split(" ").drop(1).mkString(" ")} endy"))
    val docs = chain.toDF("doc_id", "text")
    // the 10-11-12 chain needs >1 label-propagation hop: maxIter=1 must
    // throw rather than return wrong (unconverged) cluster labels
    intercept[IllegalStateException] {
      Dedup.minhashLshClusters(docs, "doc_id", "text", maxIter = 1).collect()
    }
    // a converging run unpersists superseded label checkpoints + band
    // edges: storage growth is bounded by the final labels checkpoint
    val before = spark.sparkContext.getRDDStorageInfo.length
    val out = Dedup.minhashLshClusters(docs, "doc_id", "text")
    assert(out.as[(Long, Long)].collect().toMap.values.toSet.size == 1)
    val after = spark.sparkContext.getRDDStorageInfo.length
    assert(after - before <= 2,
      s"leaked checkpoint blocks: $before -> $after RDDs in storage")
  }

  test("topTermsPerDoc ranks by tf desc then corpus rarity") {
    import graft.llm.Corpus
    val d = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val top = Corpus.topTermsPerDoc(d, "doc_id", "text", 2)
      .as[(Long, String, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(t => (t._2, t._3, t._4)).toSeq).toMap
    // doc 1: apple tf=2 first; then banana/cherry tf=1 — banana df=2 <
    // cherry df=3, so the rarer banana ranks second
    assert(top(1L) == Seq(("apple", 2L, 1L), ("banana", 1L, 2L)))
    assert(top(2L).head == ("banana", 2L, 2L))
    // doc 3: date (df=1) beats cherry (df=3) at equal tf
    assert(top(3L) == Seq(("date", 1L, 1L), ("cherry", 1L, 3L)))
  }

  test("KMV sketch estimates distinct counts within tolerance; exact below k") {
    import graft.llm.Corpus
    // 10k distinct values, k=256 -> relative error ~ 1/sqrt(k-2) ~ 6%
    val big = (1L to 30000L).map(i => i % 10000).toDF("v")
    val est = Corpus.kmvDistinct(big, "v", 256).select("est").as[Double].collect().head
    assert(math.abs(est - 10000) / 10000.0 < 0.2, s"estimate $est too far from 10000")
    // below k the count is exact
    val small = (1L to 50L).toDF("v")
    val exact = Corpus.kmvDistinct(small, "v", 256).select("est").as[Double].collect().head
    assert(exact == 50.0)
    // deterministic across partitionings (mergeable min-set)
    val a = Corpus.kmvDistinct(big.repartition(3), "v", 256).collect().head
    val b = Corpus.kmvDistinct(big.repartition(17), "v", 256).collect().head
    assert(a == b)
  }

  test("piiScrub redacts emails, IPs, and phone numbers, in order") {
    val out = Seq("mail a.user+x@corp.example.org from 192.168.0.1 or +44 20 7946 0958 now")
      .toDF("t").select(TextOps.piiScrub(col("t"))).as[String].collect().head
    assert(out == "mail <EMAIL> from <IP> or <PHONE> now")
    val clean = Seq("no pii here").toDF("t")
      .select(TextOps.piiScrub(col("t"))).as[String].collect().head
    assert(clean == "no pii here")
  }

  test("repetitionFrac measures duplicate trigram positions") {
    val out = Seq(
      (1L, "a b c a b c a b c"),  // 7 trigram positions, 3 distinct -> 4/7
      (2L, "all words unique here now"),
      (3L, "x y"))                 // shorter than n -> 0.0
      .toDF("id", "text")
      .select(col("id"), TextOps.repetitionFrac(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
  }

  test("weighted sampling: edge weights, monotonicity, determinism") {
    import graft.llm.Sampling
    val df = (1L to 2000L).toDF("id")
    assert(Sampling.weighted(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weighted(df, "id", lit(1.0)).count() == 2000)
    val low = Sampling.weighted(df, "id", lit(0.3)).as[Long].collect().toSet
    val high = Sampling.weighted(df, "id", lit(0.6)).as[Long].collect().toSet
    assert(low.subsetOf(high)) // same hash draw, higher bar keeps supersets
    assert(math.abs(low.size / 2000.0 - 0.3) < 0.05) // ~rate
    assert(Sampling.weighted(df.repartition(7), "id", lit(0.3))
      .as[Long].collect().toSet == low) // partition-invariant
  }

  test("sequence packing respects the budget, covers every doc, is deterministic") {
    import graft.llm.Sampling
    val rnd = new scala.util.Random(99L)
    val docs2 = (1L to 500L).map(i => (i, 1L + rnd.nextInt(300))).toDF("doc_id", "n_tok")
    val packed = Sampling.packSequences(docs2, "doc_id", "n_tok", budget = 512)
      .as[(Long, Long, Long)].collect()
    // every doc exactly once
    assert(packed.map(_._2).sorted.toSeq == (1L to 500L))
    // no multi-doc pack exceeds the budget; oversized singletons allowed
    packed.groupBy(_._1).foreach { case (_, grp) =>
      if (grp.length > 1) assert(grp.map(_._3).sum <= 512)
    }
    // deterministic across partitioning of the INPUT (hash routing fixes it)
    val packed2 = Sampling.packSequences(docs2.repartition(3), "doc_id", "n_tok", 512)
      .as[(Long, Long, Long)].collect()
    assert(packed2.toSet == packed.toSet)
    // deterministic across PHYSICAL parallelism: pack ids derive from the
    // data-routed bucket, not the partition id, so the same corpus packs
    // identically whether the bucket shuffle lands on 2 or 16 partitions
    // (the local[2]-vs-local[16] property every other operator has)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val at2 = Sampling.packSequences(docs2, "doc_id", "n_tok", 512)
        .as[(Long, Long, Long)].collect().toSet
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val at16 = Sampling.packSequences(docs2, "doc_id", "n_tok", 512)
        .as[(Long, Long, Long)].collect().toSet
      assert(at2 == packed.toSet)
      assert(at16 == packed.toSet)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // packs are reasonably full (greedy, not one-per-doc)
    assert(packed.map(_._1).distinct.length < 220)
  }

  test("gopherKeep flags short and letterless docs") {
    val flags = Seq(
      (1L, "the cat sat on the mat and it is a fine day for all of us"),
      (2L, "x y"),                        // too short
      (3L, "1 2 3 4 5 6 7 8 9 0 1 2"))    // no alpha tokens
      .toDF("id", "text")
      .select(col("id"), TextOps.gopherKeep(col("text")).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(flags(1L))
    assert(!flags(2L))
    assert(!flags(3L))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val a = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val b = Seq((1L, "alpha"), (2L, "bravo v2"), (4L, "delta"), (5L, "echo"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val diff = Corpus.snapshotDiff(a, b, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    // doc 6 (NULL text on both sides) is unchanged — the digest sentinel
    // keeps a present row from reading as added/removed
    assert(diff == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // digests present on the populated side only
    val row5 = Corpus.snapshotDiff(a, b, "doc_id", "text")
      .filter(col("doc_id") === 5L).head()
    assert(row5.isNullAt(row5.fieldIndex("old_digest")))
    assert(!row5.isNullAt(row5.fieldIndex("new_digest")))
  }

  test("heavyHittersPerGroup matches per-group brute counts with tie-break") {
    val df = Seq(
      ("s1", "a a b c"), ("s1", "b a"), ("s2", "z z y"), ("s2", "y z x"))
      .toDF("source", "text")
    val got = Corpus.heavyHittersPerGroup(df, "source", "text", 2)
      .as[(String, String, Long, Int)].collect().toSet
    // s1: a:3 b:2; s2: z:3 y:2
    assert(got == Set(("s1", "a", 3L, 1), ("s1", "b", 2L, 2),
      ("s2", "z", 3L, 1), ("s2", "y", 2L, 2)))
  }

  test("groupQuantiles: exact rank-based values, per-group isolation, tie-stable") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 3L), ("a", 3L), ("a", 9L),
      ("b", 100L), ("b", 200L)).toDF("g", "v")
    val got = Corpus.groupQuantiles(df, "g", "v", Seq(10, 50, 100))
      .as[(String, Int, Long)].collect().toSet
    // a sorted: 1,3,3,5,9 (n=5): p10 -> rank ceil(0.5)=1 -> 1; p50 -> rank 3 -> 3;
    // p100 -> rank 5 -> 9. b sorted: 100,200: p10 -> 100; p50 -> 100; p100 -> 200
    assert(got == Set(("a", 10, 1L), ("a", 50, 3L), ("a", 100, 9L),
      ("b", 10, 100L), ("b", 50, 100L), ("b", 100, 200L)))
  }

  test("groupQuantiles/sampleQuantiles: adversarial column names (n, rk, vrk) are not captured") {
    // the alias-capture class: a caller column literally named after a
    // window internal must not be overwritten by the rank/count
    val df = Seq(("a", 5L), ("a", 1L), ("a", 3L), ("a", 3L), ("a", 9L),
      ("b", 100L), ("b", 200L)).toDF("g", "n")
    val got = Corpus.groupQuantiles(df, "g", "n", Seq(10, 50, 100))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 10, 1L), ("a", 50, 3L), ("a", 100, 9L),
      ("b", 10, 100L), ("b", 50, 100L), ("b", 100, 200L)))

    val df2 = Seq(("a", 5L), ("a", 1L), ("a", 3L), ("a", 3L), ("a", 9L),
      ("b", 100L), ("b", 200L)).toDF("rk", "n")
    val got2 = Corpus.groupQuantiles(df2, "rk", "n", Seq(50))
      .as[(String, Int, Long)].collect().toSet
    assert(got2 == Set(("a", 50, 3L), ("b", 50, 100L)))

    // sampleQuantiles with id column named "n" and group named "vrk":
    // k >= group size means the sample is the whole group -> exact values
    val df3 = Seq(("a", 1L, 5L), ("a", 2L, 1L), ("a", 3L, 3L), ("a", 4L, 3L),
      ("a", 5L, 9L), ("b", 6L, 100L), ("b", 7L, 200L)).toDF("vrk", "n", "val")
    val got3 = graft.llm.Sketches.sampleQuantiles(df3, "vrk", "n", "val",
        k = 100, pcts = Seq(50, 100))
      .selectExpr("grp", "pct", "est_value", "sample_n")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got3 == Set(("a", 50, 3L, 5L), ("a", 100, 9L, 5L),
      ("b", 50, 100L, 2L), ("b", 100, 200L, 2L)))
  }

  test("pmiCollocations matches an exact in-JVM model; collocation outranks chance pair") {
    def lnNano(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    // "new york" always together; "the"/"cat" frequent but independent
    val df = Seq(
      "new york is big", "new york is old", "i like new york",
      "the cat sat", "the dog sat", "cat and dog", "the end")
      .toDF("text")
    val got = Corpus.pmiCollocations(df, "text", minCount = 2, k = 10)
      .as[(String, Long, Long)].collect()
    // independent witness
    val texts = df.as[String].collect().map(_.split(" ").filter(_.nonEmpty).toSeq)
    val fu = texts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = texts.flatMap(ts => ts.zip(ts.drop(1)).map(p => p._1 + " " + p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tu = fu.values.sum
    val tb = fb.values.sum
    val expect = fb.collect { case (bg, f) if f >= 2 =>
      val Array(a, b) = bg.split(" ")
      (bg, f, lnNano(f) - lnNano(tb) + 2 * lnNano(tu) - lnNano(fu(a)) - lnNano(fu(b)))
    }.toSeq.sortBy { case (bg, _, p) => (-p, bg) }.take(10)
    assert(got.toSeq == expect)
    // the true collocation outscores the frequent-but-chance pair
    val pmi = got.map(r => r._1 -> r._3).toMap
    assert(pmi("new york") > pmi.getOrElse("the cat", Long.MinValue))
  }

  test("pmi nano-nat inputs clear the flooring boundary on the fixture domain") {
    // pmi's ln inputs beyond CurationSpec's pinned domain: the bigram
    // total T2 and the unigram total at sf0.01 and sf0.1
    val domain = Seq("0.01", "0.1").flatMap { sf =>
      val d = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val uni = d.select(explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0).count()
      val bi = d.select(explode(TextOps.shingles(col("text"), 2)).as("b")).count()
      Seq(uni, bi)
    }
    domain.foreach { v =>
      val x = math.log(v.toDouble) * 1e9 + 0.5
      assert(math.abs(x - math.rint(x)) > 1e-4,
        s"ln($v)*1e9 too close to a flooring boundary: $x")
    }
  }

  test("incrementalMinhashIndex equals a full rebuild of the new snapshot") {
    import graft.llm.Dedup
    val a = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the log"),
      (3L, "cat cat cat cat"), (4L, "over the lazy dog today"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "the cat sat on the mat"),       // unchanged -> reused
      (2L, "the dog slept on the log"),               // changed -> recomputed
      (5L, "a brand new document arrives"))           // added -> recomputed
      .toDF("doc_id", "text")                         // 3,4 removed
    val inc = Dedup.incrementalMinhashIndex(a, b, "doc_id", "text")
      .orderBy("doc_id").collect()
    val full = Dedup.incrementalMinhashIndex(b.limit(0), b, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    assert(inc.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
  }

  test("heavyHittersPerGroup plans WindowGroupLimit, snapshotDiff plans one join") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hh = Corpus.heavyHittersPerGroup(d, "source", "text", 5)
    hh.collect()
    assert(hh.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val diff = Corpus.snapshotDiff(d, d.limit(100), "doc_id", "text")
    diff.collect()
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
