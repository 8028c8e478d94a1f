package graft

import org.apache.spark.sql.functions._
import graft.llm.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("hashedLinearScore: exact sum of per-token hashed weights (explode witness)") {
    val df = docs(1L -> "alpha beta gamma", 2L -> "alpha alpha", 3L -> "")
    val got = QualityClassifier.hashedLinearScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // independent recompute: explode + groupBy over the same weight expr
    val w = graft.generators.Gen.u60(col("token"), "qlin") % lit(2001L) - lit(1000L)
    val witness = df.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id").agg(sum(w).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val (s, n) = witness.getOrElse(id, (0L, 0L))
      assert(r.getLong(1) == n, s"n_tokens for $id")
      assert(r.getLong(2) == s, s"score for $id")
      assert(r.getInt(3) == (if (s >= 0) 1 else 0), s"pred for $id")
    }
    // duplicate tokens weigh twice
    assert(got(1).getLong(1) == 2)
    // empty text: zero tokens, zero score, pred = 1 (score 0 >= 0)
    assert(got(2).getLong(1) == 0 && got(2).getLong(2) == 0 && got(2).getInt(3) == 1)
  }

  test("hashedLinearScore: zero-shuffle plan (no exchange, one scan)") {
    val df = docs(1L -> "a b c", 2L -> "d e")
    val out = QualityClassifier.hashedLinearScore(df, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"per-row scorer must not shuffle:\n$plan")
  }

  test("nbQuality: seed labels, prediction direction, empty docs survive") {
    // 4 stopword-heavy (positive seed) docs sharing 'the', 3 negatives
    // sharing 'zzz', one empty doc
    val df = docs(
      1L -> "the the the quick", 2L -> "the of and it",
      3L -> "the a an of", 4L -> "the to in on",
      5L -> "zzz qqq www", 6L -> "zzz kkk jjj", 7L -> "zzz mmm nnn",
      8L -> "")
    val out = QualityClassifier.nbQuality(df, "doc_id", "text", topV = 100)
      .orderBy("doc_id").collect()
    assert(out.length == 8)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // seed labels: >= 20% stopwords
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(byId(id).getInt(1) == 1, s"seed $id"))
    Seq(5L, 6L, 7L, 8L).foreach(id => assert(byId(id).getInt(1) == 0, s"seed $id"))
    // the trained model separates the classes it was seeded with
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(byId(id).getLong(3) > 0, s"pos doc $id should score > 0"))
    Seq(5L, 6L, 7L).foreach(id =>
      assert(byId(id).getLong(3) < 0, s"neg doc $id should score < 0"))
    // empty doc: nothing scored, score = prior alone
    assert(byId(8L).getLong(2) == 0)
    out.foreach(r =>
      assert(r.getInt(4) == (if (r.getLong(3) >= 0) 1 else 0), "pred = score>=0"))
  }

  test("nbQuality: top-V cap silences out-of-vocabulary tokens") {
    // 'the' appears 6x (top-1 by frequency); rare tokens fall outside
    // topV=1 and must contribute nothing: two docs whose texts differ
    // only in rare tokens score identically
    val df = docs(
      1L -> "the the the", 2L -> "the the the",
      3L -> "the rare1 rare2", 4L -> "the other5 other6",
      5L -> "nostop nostop")
    val out = QualityClassifier.nbQuality(df, "doc_id", "text", topV = 1)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getLong(3) == byId(4L).getLong(3),
      "docs differing only in out-of-vocab tokens must score identically")
    // in-vocab count reflects only 'the'
    assert(byId(3L).getLong(2) == 1 && byId(4L).getLong(2) == 1)
    assert(byId(1L).getLong(2) == 3)
  }

  test("nbQuality: scoring join broadcasts the weight table") {
    val df = docs(1L -> "the the a", 2L -> "zzz qqq")
    val out = QualityClassifier.nbQuality(df, "doc_id", "text", topV = 16)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast onto the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus token stream must not sort-merge:\n$plan")
  }

  test("nbTrain + scoreWith reproduce nbQuality's scores exactly (model-artifact path)") {
    val df = docs(
      1L -> "the the the quick", 2L -> "the of and it",
      3L -> "zzz qqq www", 4L -> "zzz kkk jjj", 5L -> "")
    val model = QualityClassifier.nbTrain(df, "text", topV = 64)
    val viaModel = df.select(col("doc_id"),
      QualityClassifier.scoreWith(col("text"), model).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPlan = QualityClassifier.nbQuality(df, "doc_id", "text", topV = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(viaModel == viaPlan,
      "collected-model scoring must equal the in-plan join scoring")
    // top-V prune carries into the artifact
    val m1 = QualityClassifier.nbTrain(df, "text", topV = 1)
    assert(m1.weights.size == 1 && m1.weights.contains("the"))
  }

  test("classifierScoreStream: stateless stream scoring matches batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = docs(
      1L -> "the the the quick", 2L -> "the of and it",
      3L -> "zzz qqq www", 4L -> "zzz kkk jjj")
    val model = QualityClassifier.nbTrain(train, "text", topV = 64)
    val input = MemoryStream[(Long, String)]
    val scored = graft.streaming.StreamingMask.classifierScoreStream(
      input.toDF().toDF("doc_id", "text"), "text", model)
    val q = scored.writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      input.addData(10L -> "the of the", 11L -> "zzz unknowntoken", 12L -> "")
      q.processAllAvailable()
      val got = spark.table("clf_out")
        .select("doc_id", "score_nanonats", "pred")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      val batch = docs(10L -> "the of the", 11L -> "zzz unknowntoken", 12L -> "")
        .select(col("doc_id"), QualityClassifier.scoreWith(col("text"), model).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.view.mapValues(_._1).toMap == batch, "stream == batch scores")
      got.foreach { case (id, (s, p)) =>
        assert(p == (if (s >= 0) 1 else 0), s"pred for $id") }
      assert(got(10L)._2 == 1 && got(11L)._2 == 0,
        "stopword-heavy doc keeps, junk doc drops")
    } finally q.stop()
  }

  test("classifierEval: AUC fraction matches the brute-force pair count, ties averaged") {
    import spark.implicits._
    // planted (label, score) set with ties within AND across classes
    val rows = Seq(
      (1L, 90L), (1L, 50L), (1L, 50L), (1L, -10L),
      (0L, 70L), (0L, 50L), (0L, -10L), (0L, -40L), (0L, -40L))
    val df = rows.toDF("y", "s")
    // brute force: U = #(pos > neg) + 0.5 #(pos == neg); AUC = U/(n1 n0)
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum // doubled U
    val got = QualityClassifier.classifierEval(df, "y", "s", quantize = 1)
      .collect().head
    assert(got.getAs[Long]("auc_num") == wins, "doubled-U numerator")
    assert(got.getAs[Long]("auc_den") == 2L * pos.size * neg.size)
    assert(got.getAs[Long]("n_pos") == 4 && got.getAs[Long]("n_neg") == 5)
    // confusion at threshold 0 (score >= 0 predicts positive)
    assert(got.getAs[Long]("tp") == 3 && got.getAs[Long]("fn") == 1)
    assert(got.getAs[Long]("fp") == 2 && got.getAs[Long]("tn") == 3)
    // quantization: bucketing 50/70/90 together changes ties, never the
    // denominator; negative scores floor-divide toward -inf identically
    val q100 = QualityClassifier.classifierEval(df, "y", "s", quantize = 100)
      .collect().head
    assert(q100.getAs[Long]("auc_den") == 2L * pos.size * neg.size)
    val bpos = pos.map(v => Math.floorDiv(v, 100L))
    val bneg = neg.map(v => Math.floorDiv(v, 100L))
    val bwins = (for (p <- bpos; n <- bneg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(q100.getAs[Long]("auc_num") == bwins, "quantized doubled-U")
  }

  test("classifierPrCurve: cumulative tp/fp per threshold bucket match a hand fold") {
    import spark.implicits._
    val rows = Seq((1L, 250L), (1L, 150L), (0L, 150L), (0L, 50L), (1L, -50L))
    val got = QualityClassifier.classifierPrCurve(rows.toDF("y", "s"), "y", "s",
      quantize = 100)
      .orderBy(org.apache.spark.sql.functions.col("bucket").desc)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // buckets: 2 (250), 1 (150,150), 0 (50), -1 (-50); thresholds from top:
    assert(got == Seq(
      (2L, 1L, 0L, 3L),   // score>=200: tp=1 fp=0
      (1L, 2L, 1L, 3L),   // score>=100: tp=2 fp=1
      (0L, 2L, 2L, 3L),   // score>=0:   tp=2 fp=2
      (-1L, 3L, 2L, 3L))) // all:        tp=3 fp=2
  }

  test("nbQuality: partition-count invariant (exact integer arithmetic)") {
    val base = (1L to 60L).map(i =>
      i -> (if (i % 3 == 0) "the of and extra" + i else "w" + i + " x" + i))
    val df1 = docs(base: _*).repartition(1)
    val df8 = docs(base: _*).repartition(8)
    val a = QualityClassifier.nbQuality(df1, "doc_id", "text", topV = 32)
      .orderBy("doc_id").collect().map(_.toString)
    val b = QualityClassifier.nbQuality(df8, "doc_id", "text", topV = 32)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq, "nano-nat integer sums must be partition-invariant")
  }
}
