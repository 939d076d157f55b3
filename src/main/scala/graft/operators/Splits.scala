package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting — the last step of a
  * training-data pipeline. The split is a pure function of the row id
  * (md5 of its string form compared against lexicographic hex
  * thresholds), so it is:
  *  - stable across runs, partitionings, and cluster sizes (no rand());
  *  - reproducible by ANY engine that has md5 (the DuckDB oracle mirrors
  *    it exactly — no engine-specific hash);
  *  - uniform, since md5 hex prefixes are uniform over [0, 16^k).
  *
  * `fractions` are cumulative 2-hex-digit thresholds out of 256: e.g.
  * (204, 230) → md5 < "cc" ⇒ train (~79.7%), < "e6" ⇒ val (~10.2%),
  * else test (~10.1%).
  */
object Splits {

  private def hex2(n: Int): String = f"$n%02x"

  /** Split label column derived from the id. */
  def splitCol(id: Column, trainUpper: Int = 204, valUpper: Int = 230): Column = {
    require(0 < trainUpper && trainUpper < valUpper && valUpper < 256,
      "thresholds must satisfy 0 < trainUpper < valUpper < 256 (test = remainder)")
    val h = md5(id.cast("string"))
    when(h < hex2(trainUpper), "train")
      .when(h < hex2(valUpper), "val")
      .otherwise("test")
  }

  /** Leakage-safe split: assign train/val/test by NEAR-DUP CLUSTER, not by
    * row, so two near-duplicate documents can never land in different
    * splits — the contamination mode that silently inflates eval numbers
    * when a test doc's twin sits in train. Clusters come from
    * [[graft.dedup.Dedup.dedupClusters]] (token-shingle Jaccard ≥ threshold
    * → connected components); every member inherits the split of its
    * cluster representative `rep = min doc id in the component` (docs in no
    * cluster are their own rep), hashed through the same md5 thresholds as
    * [[splitCol]].
    *
    * Scale shape: the cluster frame is |near-dup docs|-sized (typically a
    * few % of the corpus), joined back on the id key; the split itself is a
    * row-local hash. One extra join over plain [[assignSplit]].
    * Returns `(idCol, rep, split)`.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, blockCols: Seq[String] = Nil,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame = {
    val clusters = graft.dedup.Dedup
      .dedupClusters(docs, idCol, textCol, n, threshold, blockCols)
      .withColumnRenamed("cluster_rep", "__rep")
    docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__rep"), col(idCol)).as("rep"))
      .withColumn("split", splitCol(col("rep"), trainUpper, valUpper))
  }

  /** Curriculum interleave: order the corpus best-first WITHIN each
    * stratum (language, domain, source …) and weave the strata together
    * round-robin — rank-1 docs of every stratum first, then rank-2, … —
    * the standard way to turn per-group quality scores into a single
    * training order that preserves the group mix at every prefix.
    *
    * The global position is NOT computed with a global window (a
    * single-reducer sort at scale). Because `(rank, stratum)` is unique,
    * `pos` is a closed-form function of the row's own rank and the tiny
    * per-stratum count vector:
    * {{{ pos = Σ_s min(n_s, rank−1)                    // earlier rounds
    *         + Σ_{s < stratum} [n_s ≥ rank] + 1       // this round }}}
    * so after the per-stratum rank (a keyed window; one shuffle on the
    * stratum key) the interleave is a ROW-LOCAL fold over a broadcast
    * |strata|-row array. For few massive strata, substitute the
    * range-partitioned ordered-pass rank; the fold is unchanged.
    *
    * Returns `(idCol, strataCol, scoreCol, pos)` with `pos` the 1-based
    * global curriculum position. */
  def curriculumInterleave(df: DataFrame, idCol: String, strataCol: String,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    val ranked = df.select(col(idCol), col(strataCol), col(scoreCol))
      .withColumn("__rn", row_number().over(w).cast("long"))
    val counts = ranked.groupBy(strataCol).agg(count(lit(1)).as("n"))
      .agg(array_sort(collect_list(struct(col(strataCol).as("s"), col("n"))))
        .as("__cnts"))
    ranked.crossJoin(broadcast(counts))
      .withColumn("pos",
        aggregate(col("__cnts"), lit(0L), (acc, c) =>
          acc + least(c.getField("n"), col("__rn") - 1)
            + when(c.getField("s") < col(strataCol)
                && c.getField("n") >= col("__rn"), 1L).otherwise(0L))
          + 1)
      .select(col(idCol), col(strataCol), col(scoreCol), col("pos"))
  }

  /** Attach a `split` column. */
  def assignSplit(df: DataFrame, idCol: String,
      trainUpper: Int = 204, valUpper: Int = 230): DataFrame =
    df.withColumn("split", splitCol(col(idCol), trainUpper, valUpper))

  /** Deterministic stratified sampling: keep a row iff
    * `md5(id) < threshold(stratum)`, with per-stratum 2-hex-digit
    * thresholds out of 256 (e.g. 51 ≈ 20 %). Same md5-threshold trick as
    * [[splitCol]], so the sample is stable across runs/partitionings and
    * reproducible by any engine with md5. Strata absent from `thresholds`
    * keep `defaultUpper` (0 = drop). A pure row-local filter — no shuffle,
    * no per-stratum pass, pushed to the scan — unlike `df.stat.sampleBy`,
    * whose rand() draw is neither deterministic under re-partitioning nor
    * oracle-reproducible. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      thresholds: Map[String, Int], defaultUpper: Int = 0): DataFrame = {
    require((thresholds.values ++ Seq(defaultUpper)).forall(v => v >= 0 && v <= 256),
      "thresholds must be in [0, 256]")
    def hexOr256(n: Int): String = if (n >= 256) "zz" else hex2(n) // "zz" > any md5 hex
    val thr = thresholds.foldLeft(lit(hexOr256(defaultUpper))) { case (acc, (k, v)) =>
      when(col(strataCol) === k, hexOr256(v)).otherwise(acc)
    }
    df.filter(md5(col(idCol).cast("string")) < thr)
  }

  /** Static corpus-mixing plan (the Pile/DoReMi-style "sample each source
    * toward target weights" step a training pipeline runs before any data
    * moves): from per-source TOKEN totals and target mixture weights,
    * compute the largest token budget no source can oversample
    * (`budget = min_s n_s / w_s` over weighted sources), each source's
    * sampling rate `w_s · budget / n_s` (exactly 1 for the binding
    * source), and the quantized 0..256 threshold [[stratifiedSample]]
    * applies (`floor(rate·256)` — the md5 sampler's resolution; the
    * REALIZED mixture therefore deviates from the target by ≤ 1/256 per
    * source, the documented quantization bound). ONE map-side-combined
    * aggregation + a one-row broadcast: the plan frame is a pure function
    * of the data, no sampling, no clock. Sources absent from `weights`
    * get rate 0 (dropped — the "not in the mixture" contract).
    *
    * Output: `(source, n_tokens, weight, rate, threshold_256)`. */
  def mixturePlan(df: DataFrame, sourceCol: String, tokenCount: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w > 0),
      "mixturePlan: weights must be a non-empty map of positive targets")
    val wlit = array(weights.toSeq.sortBy(_._1).map { case (s, w) =>
      struct(lit(s).as("s"), lit(w).as("w"))
    }: _*)
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(tokenCount).as("n_tokens"))
      .withColumn("__w",
        try_element_at(filter(wlit, e => e.getField("s") === col("source")), lit(1))
          .getField("w"))
    val budget = per.filter(col("__w").isNotNull)
      .agg(min(col("n_tokens").cast("double") / col("__w")).as("__budget"))
    per.crossJoin(broadcast(budget))
      .withColumn("rate", when(col("__w").isNotNull,
        least(lit(1.0), col("__w") * col("__budget") / col("n_tokens")))
        .otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"),
        coalesce(col("__w"), lit(0.0)).as("weight"),
        col("rate"),
        floor(col("rate") * 256).cast("int").as("threshold_256"))
  }

  /** Up-sampling epoch plan — [[mixturePlan]]'s complement for the
    * LLaMA-style recipe where LOW-resource sources REPEAT (epochs > 1) up
    * to a cap instead of high-resource sources being cut: the budget is
    * the largest total such that no source repeats more than `maxRepeat`
    * times (`budget = min_s maxRepeat · n_s / w_s`), and each source's
    * repeat factor is `w_s · budget / n_s ∈ (0, maxRepeat]` (the binding
    * source sits exactly at the cap). `planned_tokens = w_s · budget`
    * realizes the target mixture exactly. Same shape as the mixture
    * plan: one map-side-combined aggregation + a one-row broadcast.
    * Unweighted sources plan zero. Output: `(source, n_tokens, weight,
    * repeat_factor, planned_tokens)`. */
  def epochPlan(df: DataFrame, sourceCol: String, tokenCount: Column,
      weights: Map[String, Double], maxRepeat: Double = 4.0): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w > 0),
      "epochPlan: weights must be a non-empty map of positive targets")
    require(maxRepeat >= 1.0, s"epochPlan: maxRepeat=$maxRepeat must be >= 1")
    val wlit = array(weights.toSeq.sortBy(_._1).map { case (s, w) =>
      struct(lit(s).as("s"), lit(w).as("w"))
    }: _*)
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(tokenCount).as("n_tokens"))
      .withColumn("__w",
        try_element_at(filter(wlit, e => e.getField("s") === col("source")), lit(1))
          .getField("w"))
    val budget = per.filter(col("__w").isNotNull)
      .agg(min(lit(maxRepeat) * col("n_tokens").cast("double") / col("__w"))
        .as("__budget"))
    per.crossJoin(broadcast(budget))
      .withColumn("repeat_factor", when(col("__w").isNotNull,
        col("__w") * col("__budget") / col("n_tokens")).otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"),
        coalesce(col("__w"), lit(0.0)).as("weight"),
        col("repeat_factor"),
        when(col("__w").isNotNull, col("__w") * col("__budget"))
          .otherwise(lit(0.0)).as("planned_tokens"))
  }

  /** Deterministic corpus shuffle: a pure ORDER BY on
    * `md5(seed ':' id)` — reproducible across runs, partitionings, and
    * engines (any SQL engine derives the identical order), unlike
    * `orderBy(rand())`. The sort is range-partitioned (Spark's
    * distributed sort) — no single-partition stage; the seed rotates the
    * order between training runs. Returns the frame sorted with the sort
    * key exposed as `shuffle_key`. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .orderBy("shuffle_key")

  /** Shuffle-shard MANIFEST — the file layout a shuffled training epoch
    * actually ships as: documents ordered by the [[deterministicShuffle]]
    * key (`md5(seed:id)` — reproducible, partition-independent,
    * engine-replayable), cut into ~`targetBytes` files by the running
    * byte total, one row per planned file with its key range (the range
    * a reader seeks by). The running total is the two-sweep distributed
    * prefix scan ([[graft.operators.Prefix.cumSumLongs]]) — no
    * single-partition window, so the plan survives a 100 TB epoch.
    * Returns `(file_idx, n_docs, file_bytes, first_key, last_key)`. */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      bytesCol: Column,
      seed: String,
      targetBytes: Long
  ): DataFrame = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes")
    val keyed = df.select(
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("shuffle_key"),
        bytesCol.cast("long").as("__b"))
      .filter(col("__b") > 0)
    graft.operators.Prefix.cumSumLongs(keyed, "shuffle_key", Seq("__b"), Seq("__cum"))
      .withColumn("file_idx", expr(s"(__cum - __b) div ${targetBytes}L"))
      .groupBy("file_idx")
      .agg(count(lit(1)).as("n_docs"), sum("__b").as("file_bytes"),
        min("shuffle_key").as("first_key"), max("shuffle_key").as("last_key"))
  }

  /** Apply a [[mixturePlan]]: the plan's per-source thresholds (a
    * #sources-bounded collect) drive the row-local md5
    * [[stratifiedSample]] — deterministic, partition-stable, pushed to
    * the scan. The composition a mixing job actually ships. */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      tokenCount: Column, weights: Map[String, Double]): DataFrame = {
    val plan = mixturePlan(df, sourceCol, tokenCount, weights)
      .select("source", "threshold_256")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    stratifiedSample(df, sourceCol, idCol, plan, defaultUpper = 0)
  }

  /** Horvitz–Thompson stratified totals from the DETERMINISTIC
    * [[stratifiedSample]]: each stratum's sampled `valueCol` sum is
    * inflated by its known inclusion probability `threshold/256`,
    * estimating the full-corpus total from the sample alone — the
    * survey-sampling workhorse for "estimate corpus token counts without
    * scanning everything". Because the md5 sample is a pure row-local
    * filter, the whole estimator is one scan of the SAMPLE plus one tiny
    * keyed agg; probabilities are exact binary fractions (k/256), so the
    * estimate is bit-deterministic and engine-reproducible. Only strata
    * present in `thresholds` (p > 0) are estimable and emitted. */
  def htEstimate(df: DataFrame, strataCol: String, idCol: String,
      valueCol: String, thresholds: Map[String, Int]): DataFrame = {
    val positive = thresholds.filter(_._2 > 0)
    require(positive.nonEmpty, "need at least one stratum with threshold > 0")
    val p = positive.foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(math.min(v, 256) / 256.0)).otherwise(acc)
    }
    stratifiedSample(df, strataCol, idCol, positive)
      .withColumn("__p", p)
      .groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("n_sampled"),
        (sum(col(valueCol)).cast("double") / max(col("__p"))).as("est_total"))
  }

  /** Per-group *weight* budget (e.g. token budget per source/domain): keep
    * rows in deterministic `md5(id)` order while the running weight total
    * (including the current row) stays within `budget`. The standard
    * "N tokens per domain" corpus-mixing step. Same plan shape as
    * [[quotaCap]] — one hash exchange on the group key + per-group sorted
    * cumulative window, streaming per group. */
  def weightBudgetCap(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, budget: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__graft_cum", sum(weightCol.cast("double")).over(w))
      .filter(col("__graft_cum") <= budget)
      .drop("__graft_cum")
  }

  /** Sequence packing ("concatenate and chop"): lay each group's documents
    * end-to-end in deterministic `md5(id)` order and chop the token stream
    * into fixed `contextLen` windows — the standard way training examples
    * are packed from variable-length documents. Emits each document's
    * half-open token span `[start_off, end_off)` in its group's stream plus
    * the first/last pack (context window) it lands in; a document spans
    * `last_pack - first_pack + 1` windows. One hash exchange on the group
    * + a streaming cumulative window per group — no driver-side state, and
    * group streams pack independently (= shard-parallel at 100 TB). */
  def packOffsets(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, contextLen: Long): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__w", weightCol.cast("long"))
      .withColumn("end_off", sum(col("__w")).over(w))
      .withColumn("start_off", col("end_off") - col("__w"))
      .filter(col("__w") > 0)
      .withColumn("first_pack", expr(s"start_off div $contextLen"))
      .withColumn("last_pack", expr(s"(end_off - 1) div $contextLen"))
      .drop("__w")
  }

  /** Per-group quota cap for corpus balancing: keep at most `cap` rows per
    * group, chosen in deterministic `md5(id)` order (a stable uniform
    * shuffle — no rand()), ties broken by id. One hash exchange on the
    * group key + per-group sort; at scale the row_number window streams
    * each group, no global sort. */
  def quotaCap(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= cap)
      .drop("__graft_rn")
  }

  /** Temperature-weighted corpus mixing (the multilingual-pretraining
    * sampler, Conneau & Lample-style): group g is sampled in proportion to
    * `n_g^alpha` — `alpha = 1` keeps natural proportions, `alpha → 0`
    * flattens toward uniform, lifting low-resource groups. Expected output
    * size ≈ `targetRows` (groups whose computed rate exceeds 1 emit all
    * their rows — no oversampling).
    *
    * Determinism: per-group keep rates are quantized to a 4-hex-digit md5
    * threshold (65536 buckets) and each row keeps iff
    * `md5(id) < threshold(group)` — the same engine-independent
    * hash-threshold trick as [[splitCol]]/[[stratifiedSample]], so the
    * exact selected set is reproducible anywhere md5 exists. Group weights
    * `sqrt/pow(n_g)` are summed as DECIMAL so the normalizing constant is
    * partition-order independent.
    *
    * Scale: one count aggregation (bounded by the number of groups), a
    * broadcast join of the per-group thresholds back onto the rows, and a
    * scan-local filter — the corpus itself never shuffles. */
  /** Deterministic weighted sampling WITHOUT replacement, k rows per group
    * (Efraimidis–Spirakis A-ES): rank rows by `-ln(u) / w` ascending where
    * `u` is a uniform deterministic per-row variate and `w = weightCol > 0`,
    * keep the first k per group. Inclusion probability is proportional to
    * weight (the exponential-clocks argument), so e.g. `weight = quality`
    * downsamples a corpus toward its best documents — reproducibly.
    *
    * `u` derives from the first 13 md5 hex digits (52 bits — exact in a
    * double, parseable by any engine), mapped to (0, 1] as
    * `(v + 1) / (16^13 + 1)` so `ln` never sees zero. Same
    * hash-not-rand() determinism contract as [[stratifiedSample]].
    *
    * One hash exchange on the group key; the per-group top-k is a streamed
    * row_number window (ties broken by id), never a global sort. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0)
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10).cast("long")
    val u = (v.cast("double") + 1.0) / 4503599627370497.0 // 16^13 + 1
    val key = -log(u) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    // null ids would yield a null sort key, which Spark orders FIRST
    // (hijacking top-k slots) while SQL engines order last — exclude them
    df.filter(col(weightCol) > 0 && col(idCol).isNotNull)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }

  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha > 0 && targetRows > 0)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // Weights quantize to DECIMAL at 6 dp BEFORE normalizing: pow() is only
    // within-1-ulp (not correctly rounded), so two engines can disagree at
    // ~1e-14 — far inside the 1e-6 grid, so the quantized weight (and hence
    // every downstream threshold) is engine-exact; the decimal sum is also
    // partition-order independent, unlike a double sum.
    val wCol = pow(col("__n").cast("double"), lit(alpha)).cast("decimal(28,6)")
    val wsum = counts.agg(sum(wCol).as("__wsum"))
    val rates = counts.crossJoin(broadcast(wsum))
      .withColumn("__rate",
        least(lit(1.0), lit(targetRows.toDouble) * wCol.cast("double") /
          (col("__wsum").cast("double") * col("__n"))))
      // "zz" sorts after every md5 hex digit -> rate 1.0 keeps ALL rows
      // (a 5-char "10000" prefix would sort before "2"-"f" hashes instead)
      .withColumn("__thr", when(col("__rate") >= 1.0, lit("zz"))
        .otherwise(format_string("%04x", floor(col("__rate") * 65536).cast("int"))))
      .select(col(groupCol), col("__thr"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(md5(col(idCol).cast("string")) < col("__thr"))
      .drop("__thr")
  }

  /** Systematic probability-proportional-to-size sampling (Madow 1949,
    * the classic πps design): lay every item's integer weight end-to-end
    * along a line (ordered by `idCol` — a pinned, documented frame),
    * drop `s` equally-spaced marks, and select each item once per mark
    * inside its segment: `n_inclusions = floor(cum·s/W) −
    * floor((cum−w)·s/W)`. Inclusion probability is exactly `min(1,
    * s·w/W)` per mark position, a whale (w > W/s) is included multiple
    * times (its `n_inclusions` is the replication factor a downstream
    * estimator divides by), and there is NO randomness — the zero-offset
    * grid makes the draw a pure function of the data, like every other
    * sampler in this repo (md5 splits, A-ES weights).
    *
    * Scale shape: the running total comes from
    * [[Prefix.cumSumLongs]] (two-sweep distributed scan — no
    * single-partition window), and everything else is row-local integer
    * math. Domain: `W·s` must fit a long — the operator fails loudly at
    * `W > 2⁶³/s` rather than wrapping. Returns the selected rows as
    * `(id, weight, n_inclusions)`. */
  def ppsSystematicSample(df: DataFrame, idCol: String, weightCol: Column,
      s: Int): DataFrame = {
    require(s >= 1, s"sample size s=$s")
    val base = df.select(col(idCol).as("id"), weightCol.cast("long").as("weight"))
      .filter(col("weight") > 0)
    val withCum = Prefix.cumSumLongs(base, "id", Seq("weight"), Seq("__cum"))
    // W = the LAST cumulative value; one tiny agg, broadcast back
    val tot = withCum.agg(max("__cum").as("__w"))
    val guarded = withCum.crossJoin(broadcast(tot))
      .withColumn("__w", when(col("__w") <= Long.MaxValue / s, col("__w"))
        .otherwise(raise_error(lit(
          s"ppsSystematicSample: total weight exceeds Long.MaxValue/$s"))))
    // integer `div` (not `/`, which is double division and loses exactness
    // past 2^53): all quantities are nonnegative, so div == floor division
    guarded
      .withColumn("n_inclusions",
        expr(s"(__cum * $s) div __w") -
          expr(s"((__cum - weight) * $s) div __w"))
      .filter(col("n_inclusions") >= 1)
      .select(col("id"), col("weight"), col("n_inclusions"))
  }
}
