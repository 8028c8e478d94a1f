package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.generators.{Gen, OracleGen}

/** Deterministic sampling for training-data pipelines. Hash-based (never
  * rand()): the sample is stable across runs, partitionings, and engines —
  * the property that makes dataset versions reproducible and lets a 100 TB
  * corpus be re-sampled incrementally (new rows join the sample iff their
  * key hashes in; old decisions never flip). */
object Sampling {

  /** Fixed-size token chunking with overlap — the complement of
    * [[packSequences]]: long documents split into `chunkTokens`-token
    * windows advancing by `chunkTokens - overlap`, the standard
    * pre-training / retrieval prep for documents longer than the model
    * context. A window starts at position s iff s == 1 or
    * s <= n - overlap; since step + overlap = chunkTokens, the first
    * start that rule skips is already covered by its predecessor, so
    * every token lands in >= 1 chunk and no chunk is a strict suffix of
    * the previous one. Pure per-row HOFs (sequence/filter/slice) — zero
    * shuffles, trivially codegen'd; NULL text yields zero chunks on both
    * engines. Output: (id, chunk_id 0-based, chunk_text, n_chunk_tokens). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "chunkDocuments: need chunkTokens >= 1 and 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val n = size(col("__toks"))
    val starts = filter(sequence(lit(1), n, lit(step)),
      s => s === 1 || s <= n - overlap)
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), posexplode(starts).as(Seq("chunk_id", "__s")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens), size(col("__toks")) - col("__s") + 1).as("n_chunk_tokens"))
  }

  /** DuckDB rendering of [[chunkDocuments]]. */
  def chunkDocumentsSql(table: String, idCol: String, textCol: String,
                        chunkTokens: Int, overlap: Int = 0): String = {
    val step = chunkTokens - overlap
    val toks = TextOps.tokensSql(textCol)
    s"WITH d0 AS (SELECT $idCol AS id, $toks AS toks FROM $table), " +
      s"st AS (SELECT id, toks, list_filter(generate_series(1, len(toks), $step), " +
      s"s -> s = 1 OR s <= len(toks) - $overlap) AS starts FROM d0) " +
      s"SELECT id AS $idCol, (generate_subscripts(starts, 1) - 1)::INT AS chunk_id, " +
      s"array_to_string(toks[unnest(starts):unnest(starts)+${chunkTokens - 1}], ' ') AS chunk_text, " +
      s"least($chunkTokens, len(toks) - unnest(starts) + 1)::INT AS n_chunk_tokens " +
      "FROM st"
  }

  /** Keep ~1/`rate` of rows, decided by the key's u60 hash. */
  def hashSample(df: DataFrame, keyCol: String, rate: Int,
                 tweak: String = "sample"): DataFrame = {
    require(rate >= 2, "hashSample: rate must be >= 2")
    df.filter(Gen.u60(col(keyCol), tweak) % rate === 0)
  }
  def hashSampleSql(keyCol: String, rate: Int, tweak: String = "sample"): String =
    s"(${OracleGen.u60(keyCol, tweak)}) % ${rate} = 0"

  /** Stratified quota sample: at most `quota` rows per stratum, chosen by
    * hash rank (deterministic, engine-portable — no sampleBy randomness). */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
                      quota: Int, tweak: String = "strat"): DataFrame = {
    require(quota >= 1, "stratifiedQuota: quota must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(Gen.u60(col(keyCol), tweak), col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }
  def stratifiedQuotaSql(table: String, stratumCol: String, keyCol: String,
                         quota: Int, selectCols: String, tweak: String = "strat"): String =
    s"""SELECT ${selectCols} FROM (
          SELECT *, row_number() OVER (PARTITION BY ${stratumCol}
            ORDER BY ${OracleGen.u60(keyCol, tweak)}, ${keyCol}) AS rnk
          FROM ${table})
        WHERE rnk <= ${quota}"""

  /** Weighted deterministic sampling: keep a row with probability equal to
    * its weight expression (clamped to [0,1]) — quality-proportional
    * data mixing without rand(). Decision = u60(key)/2^60 < weight, so it
    * is stable across runs/partitionings and re-weighting only flips the
    * rows whose weight crossed their fixed hash draw (incremental-safe).
    * u60→double rounds identically on both engines (IEEE nearest). */
  def weighted(df: DataFrame, keyCol: String, weight: Column,
               tweak: String = "wsample"): DataFrame = {
    val draw = Gen.u60(col(keyCol), tweak).cast("double") / lit(Gen.U60Max.toDouble)
    df.filter(draw < least(greatest(weight, lit(0.0)), lit(1.0)))
  }
  def weightedSql(keyCol: String, weightSql: String, tweak: String = "wsample"): String =
    s"((${OracleGen.u60(keyCol, tweak)})::DOUBLE / ${Gen.U60Max.toDouble} < " +
      s"least(greatest(${weightSql}, 0.0), 1.0))"

  /** Exact-k weighted sample WITHOUT replacement per group —
    * Efraimidis–Spirakis: keep the k rows with the largest u^(1/w),
    * equivalently the k SMALLEST (ln 2^53 − ln u)/w with u the row's
    * fixed 53-bit hash draw (in [1, 2^53], never 0). The complement of
    * [[weighted]] (Bernoulli thinning): here group sample sizes are
    * exact, inclusion probability is proportional to weight, and the
    * decision is still a pure function of (key, weight) — deterministic
    * across runs/partitionings/engines.
    *
    * Float parity: ln runs on the INTEGER draw ([[Curation.lnNano]]);
    * the ES key is ONE division of two exact integers — bit-identical
    * both engines — and ties break on the key column. Scale shape: the
    * rank filter is a WindowGroupLimit (per-partition top-k heaps below
    * the exchange). Rows with weight <= 0 are excluded (can never win). */
  def weightedTopK(df: DataFrame, groupCol: String, keyCol: String,
                   weight: Column, k: Int, tweak: String = "eswr"): DataFrame = {
    require(k >= 1, "weightedTopK: k must be >= 1")
    val u = Gen.u60(col(keyCol), tweak) % lit(1L << 53) + lit(1L)
    val esKey = (lit(graft.pipeline.Anonymize.Ln2p53Nano) - Curation.lnNano(u))
      .cast("double") / weight.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__es"), col(keyCol))
    df.filter(weight > 0)
      .withColumn("__es", esKey)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__es", "__rk")
  }

  def weightedTopKSql(table: String, groupCol: String, keyCol: String,
                      weightSql: String, k: Int, selectCols: String,
                      tweak: String = "eswr"): String = {
    val u = s"((${OracleGen.u60(keyCol, tweak)}) % ${1L << 53} + 1)"
    val esKey = s"((${graft.pipeline.Anonymize.Ln2p53Nano} - ${Curation.lnNanoSql(u)})::DOUBLE" +
      s" / (${weightSql})::DOUBLE)"
    s"""SELECT ${selectCols} FROM (
          SELECT *, row_number() OVER (PARTITION BY ${groupCol}
            ORDER BY ${esKey}, ${keyCol}) AS __rk
          FROM ${table} WHERE (${weightSql}) > 0)
        WHERE __rk <= ${k}"""
  }

  /** Deterministic global corpus shuffle: order by the key's salted u60
    * hash — the "shuffle the corpus before training" step, reproducible
    * across runs/engines and re-derivable for any subset (a doc's position
    * key never changes). At scale this is one range-partitioned sort —
    * exactly what a random shuffle costs, without the irreproducibility.
    * The hash is emitted as `shuffle_key` so downstream (and the oracle)
    * can verify the order from the values alone. */
  def shuffleDeterministic(df: DataFrame, keyCol: String,
                           tweak: String = "shuffle"): DataFrame =
    df.withColumn("shuffle_key", Gen.u60(col(keyCol), tweak))
      .orderBy(col("shuffle_key"), col(keyCol))
  def shuffleDeterministicSql(keyCol: String, tweak: String = "shuffle"): String =
    s"(${OracleGen.u60(keyCol, tweak)}) AS shuffle_key"

  /** Deterministic data mixing: per-group keep probabilities (the
    * Pile/LLaMA-style source-mix primitive). Each row's decision is its
    * fixed hash draw against ITS group's proportion — so re-weighting one
    * source never disturbs another's sample, and the mix is reproducible
    * across runs, partitionings, and engines. Groups absent from the map
    * fall back to `default`. Pure per-row filter: no shuffle at all. */
  def mixByGroup(df: DataFrame, keyCol: String, groupCol: String,
                 proportions: Map[String, Double], default: Double = 0.0,
                 tweak: String = "mix"): DataFrame = {
    val draw = Gen.u60(col(keyCol), tweak).cast("double") / lit(Gen.U60Max.toDouble)
    val prop = proportions.foldLeft(lit(default)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    df.filter(draw < prop)
  }
  def mixByGroupSql(keyCol: String, groupCol: String,
                    proportions: Map[String, Double], default: Double = 0.0,
                    tweak: String = "mix"): String = {
    val cases = proportions.map { case (g, p) =>
      s"WHEN ${groupCol} = '${g.replace("'", "''")}' THEN ${p}"
    }.mkString(" ")
    s"((${OracleGen.u60(keyCol, tweak)})::DOUBLE / ${Gen.U60Max.toDouble} < " +
      s"(CASE $cases ELSE ${default} END))"
  }

  /** Token-budget cap per group: keep documents, in deterministic
    * hash-shuffled order, until each group's cumulative token count
    * reaches `budget` ("sample ~10B tokens per domain"). The row that
    * crosses the budget is the last one kept, so every non-empty group
    * ships at least one doc and the overshoot is < one doc. One window
    * shuffle on the group key; a giant group streams through its sorted
    * window. Integer cumulative sums — exact in any engine. */
  def tokenBudgetPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                          tokenCol: String, budget: Long,
                          tweak: String = "budget"): DataFrame = {
    require(budget > 0, "tokenBudgetPerGroup: budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(Gen.u60(col(keyCol), tweak), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("__cum") - col(tokenCol).cast("long") < budget)
      .drop("__cum")
  }
  def tokenBudgetPerGroupSql(table: String, keyCol: String, groupCol: String,
                             tokenCol: String, budget: Long, selectCols: String,
                             tweak: String = "budget"): String =
    s"""SELECT ${selectCols} FROM (
          SELECT *, sum(${tokenCol}) OVER (PARTITION BY ${groupCol}
            ORDER BY ${OracleGen.u60(keyCol, tweak)}, ${keyCol}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM ${table})
        WHERE cum - ${tokenCol} < ${budget}"""

  /** Sequence packing: greedily group documents into token-budget-bounded
    * packs (the batching step before tokenized training sequences). Fully
    * deterministic ANYWHERE: docs route to `buckets` logical buckets by
    * key hash — a pure function of the data, independent of cluster size
    * or partition count — each bucket is folded greedily in key order, and
    * `pack_id = bucket * 2^32 + index within bucket`. (Round 5 derived the
    * fold unit from the physical partition id, so the same corpus packed
    * differently at different parallelism — the one operator that broke
    * the engine-wide local[2]==local[16] determinism property.) A doc
    * larger than the budget gets its own pack. Per-bucket sequential scan
    * is the right scale shape: packing is order-dependent, so the only
    * global alternative is a single-node sort — instead each of `buckets`
    * independent folds packs its own key range; the shuffle places whole
    * buckets, never splits one. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    require(buckets >= 1 && buckets <= (1 << 20), "packSequences: buckets must be in [1, 2^20]")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("n_tokens"),
        pmod(Gen.u60(col(idCol), "pack"), lit(buckets.toLong)).as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .mapPartitions { rows =>
        // a physical partition holds >= 1 whole buckets, contiguous after
        // the sort — reset the fold at each bucket boundary
        var curBucket = -1L
        var packLocal = 0L
        var used = 0L
        rows.map { r =>
          val (id, n, b) = (r.getLong(0), r.getLong(1), r.getLong(2))
          if (b != curBucket) { curBucket = b; packLocal = 0L; used = 0L }
          else if (used + n > budget) { packLocal += 1; used = 0L }
          used += n
          (b * (1L << 32) + packLocal, id, n)
        }
      }.toDF("pack_id", "doc_id", "n_tokens")
  }

  /** Epoch-repeat mixing: materialize each group at a TARGET token budget
    * by repeating (or thinning) its documents — "2.3 epochs of source X",
    * the up-sampling complement of [[mixByGroup]]/[[tokenBudgetPerGroup]].
    * With A_g = the group's actual tokens and T_g its target, every doc
    * gets floor(T_g/A_g) copies, and the docs FIRST in the group's
    * deterministic hash-shuffled order absorb the remainder (T_g mod A_g)
    * one extra copy each until the remainder budget is crossed — so the
    * emitted token total lands within one document of T_g, every decision
    * is a pure function of the data (reproducible anywhere, incremental-
    * safe), and base = 0 degrades gracefully to deterministic
    * down-sampling. One shuffle on the group key; both the group total and
    * the cumulative sum ride the same partitioning. Emits n_copies >= 1
    * rows only (zero-copy docs are dropped). */
  def epochRepeat(df: DataFrame, keyCol: String, groupCol: String,
                  tokenCol: String, targets: Map[String, Long],
                  default: Long = 0L, tweak: String = "epoch"): DataFrame = {
    require(targets.values.forall(_ >= 0) && default >= 0,
      "epochRepeat: targets must be non-negative")
    val W = org.apache.spark.sql.expressions.Window
    val grpW = W.partitionBy(groupCol)
    val cumW = W.partitionBy(groupCol)
      .orderBy(Gen.u60(col(keyCol), tweak), col(keyCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val target = targets.foldLeft(lit(default)) { case (acc, (g, t)) =>
      when(col(groupCol) === g, lit(t)).otherwise(acc)
    }.cast("long")
    val tok = col(tokenCol).cast("long")
    df.withColumn("__a", sum(tok).over(grpW))
      .withColumn("__cum", sum(tok).over(cumW))
      .withColumn("__t", target)
      .withColumn("n_copies",
        expr("__t div __a") + // integral divide — `/` on longs is float division
          when(col("__cum") - tok < col("__t") % col("__a"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .drop("__a", "__cum", "__t")
  }

  /** DuckDB rendering of [[epochRepeat]]. `selectCols` must include
    * `n_copies`. */
  def epochRepeatSql(table: String, keyCol: String, groupCol: String,
                     tokenCol: String, targets: Map[String, Long],
                     default: Long = 0L, selectCols: String = "*",
                     tweak: String = "epoch"): String = {
    val cases = targets.map { case (g, t) =>
      s"WHEN ${groupCol} = '${g.replace("'", "''")}' THEN ${t}"
    }.mkString(" ")
    s"""SELECT ${selectCols} FROM (
          SELECT *,
            ((CASE $cases ELSE ${default} END) // a)
              + (CASE WHEN cum - ${tokenCol} < (CASE $cases ELSE ${default} END) % a
                 THEN 1 ELSE 0 END) AS n_copies
          FROM (
            SELECT *,
              sum(${tokenCol}) OVER (PARTITION BY ${groupCol}) AS a,
              sum(${tokenCol}) OVER (PARTITION BY ${groupCol}
                ORDER BY ${OracleGen.u60(keyCol, tweak)}, ${keyCol}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM ${table}))
        WHERE n_copies > 0"""
  }
}
