package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-repair operators — the "fix" half of a data-quality pipeline
  * (the checks find the rows; these produce the corrected dataset).
  *
  * All three are single-pass compositions: group statistics come from an
  * unordered aggregate window over the group (partial aggregation, no
  * sort), global cutoffs from a 1-row aggregate broadcast back over the
  * scan. Nothing here collects to the driver.
  */
object Repair {

  /** Null imputation with the group mean: nulls in `valueCol` are replaced
    * by the mean of the non-null values in the same `groupCol` group
    * (falling back to `default` for all-null groups). The mean uses an
    * exact decimal sum (order-independent) so results are deterministic
    * under any partitioning. */
  def imputeGroupMean(df: DataFrame, groupCol: String, valueCol: String,
      default: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    val mean = sum(col(valueCol).cast("decimal(30,6)")).over(w).cast("double") /
      count(col(valueCol)).over(w)
    df.withColumn(valueCol,
      coalesce(col(valueCol), mean, lit(default)))
  }

  /** Winsorization: clip `valueCol` to its exact [pLo, pHi] percentiles
    * (computed over non-null values). Returns the clipped frame plus a
    * `was_clipped` marker. Exact interpolated percentiles hold to ~10^7
    * distinct values; swap `percentile` for `approx_percentile` beyond
    * that (same shape, sketch mergeable). */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, "need 0 <= pLo < pHi <= 1")
    // distributed-sort exact percentiles (see Profiler.exactPercentiles —
    // the single-reducer `percentile` aggregate dominated this repair at
    // sf0.1); the two cut values then fold into the scan as literals.
    // Empty input -> NaN cuts, harmless: there are no rows to clip.
    val cuts = Profiler.exactPercentiles(df, valueCol, Seq(pLo, pHi))
    val lo = lit(cuts.head); val hi = lit(cuts(1))
    df.withColumn("was_clipped",
        (col(valueCol) < lo || col(valueCol) > hi).cast("int"))
      // nulls stay null (imputation is a separate repair, not clipping)
      .withColumn(valueCol, when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast("double"), lo), hi)))
  }

  /** PER-GROUP winsorization: clip `valueCol` to each group's own
    * `[pLo, pHi]` DISCRETE percentiles — the grouped twin of
    * [[winsorize]], for heterogeneous populations where one global cut
    * either mangles small groups or misses group-local whales.
    *
    * Cuts come from [[Profiler.groupQuantilesDisc]]'s distributed
    * selection (per-(group, value) collapse + key-partitioned cumulative
    * window + conditional-min) — discrete selection picks an actual
    * observed element, so the cut (and the clipped value) is
    * bit-identical in any engine, with no interpolation ulps. The cuts
    * frame is group-cardinality-sized; the join back is AQE-broadcast
    * when groups are few, a plain keyed join otherwise — never a global
    * sort, never a driver collect.
    *
    * Null `valueCol` rows keep a null value and null `was_clipped` (as
    * [[winsorize]]); rows whose group has no cuts (null group, or a
    * group with zero non-null values) pass through unclipped. */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0, "need 0 <= pLo < pHi <= 1")
    val loName = f"q_${(pLo * 100).round}%d"
    val hiName = f"q_${(pHi * 100).round}%d"
    val cuts = Profiler.groupQuantilesDisc(df, groupCol, valueCol, Seq(pLo, pHi))
      .select(col(groupCol), col(loName).as("__lo"), col(hiName).as("__hi"))
    df.join(cuts, Seq(groupCol), "left")
      .withColumn("was_clipped",
        (col(valueCol) < col("__lo") || col(valueCol) > col("__hi")).cast("int"))
      .withColumn(valueCol,
        when(col(valueCol).isNotNull && col("__lo").isNotNull,
          least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
          .otherwise(col(valueCol).cast("double")))
      .drop("__lo", "__hi")
  }

  /** Per-group z-score normalization: `(x - mean) / stddev` within
    * `groupCol` (sample stddev; degenerate groups — stddev 0 or a single
    * row — yield null). Group stats via an unordered aggregate window —
    * one hash exchange on the group, no sort. Mean and sum-of-squares use
    * exact decimal sums so the result is partition-order independent
    * (a plain double `avg`/`stddev` drifts by ~1 ulp across runs, which
    * flips rounded output on boundaries — see BASELINE.md round-1 notes). */
  def zscoreByGroup(groupCol: String, valueCol: String,
      as: String = "zscore"): Column = {
    val w = Window.partitionBy(col(groupCol))
    val x = col(valueCol).cast("double")
    val n = count(col(valueCol)).over(w)
    val m = sum(x.cast("decimal(30,6)")).over(w).cast("double") / n
    val sumsq = sum((x * x).cast("decimal(38,6)")).over(w).cast("double")
    val variance = (sumsq - m * m * n) / (n - 1)
    when(n > 1 && variance > 0, (x - m) / sqrt(variance)).as(as)
  }

  /** Smoothed target (mean) encoding of a categorical column — the
    * standard high-cardinality feature encoder: each category maps to
    * `(Σy_c + m·prior) / (n_c + m)`, the category mean shrunk toward the
    * global prior with pseudo-count `m`, so rare categories don't
    * memorize their few targets. One category-keyed aggregation (partial
    * combine, output bounded by cardinality) plus a broadcast 1-row
    * prior; decimal-exact target sums make the encoding
    * partition-order-independent. Returns the encoding TABLE
    * `(category, n, encoded)` — join it back to rows, or ship it to
    * serving as-is. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      m: Double): DataFrame = {
    val y = col(targetCol).cast("decimal(30,6)")
    val overall = df.agg(count(col(targetCol)).as("__ng"), sum(y).as("__sg"))
    val prior = col("__sg").cast("double") / col("__ng")
    df.groupBy(col(catCol).as("category"))
      .agg(count(col(targetCol)).as("n"), sum(y).as("__sc"))
      .crossJoin(broadcast(overall))
      .select(col("category"), col("n"),
        ((col("__sc").cast("double") + lit(m) * prior) / (col("n") + m)).as("encoded"))
  }

  /** Weight-of-evidence encoding + information value — the standard
    * credit-scoring / feature-screening transform for a categorical
    * feature against a binary outcome:
    * `woe(c) = ln( ((pos_c + 0.5)/pos_tot) / ((neg_c + 0.5)/neg_tot) )`
    * (0.5 = the Laplace half-count that keeps pure categories finite) and
    * `iv_term(c) = (pos_c/pos_tot − neg_c/neg_tot) · woe(c)`; the
    * feature's IV is the sum of the terms. One keyed aggregation plus a
    * broadcast 1-row totals join — map-side combined, category-sized
    * output, no data-sized shuffle. Determinism: counts are exact longs;
    * `woe` is rounded to 6 dp before the IV product, so every double op
    * is a single correctly-rounded IEEE step reproducible in SQL. */
  /** Disparate-impact audit of a keep/drop decision across groups — the
    * four-fifths (80 %) rule applied to a curation filter: per group the
    * selection rate, its ratio to the best group's rate, and the
    * below-four-fifths flag. For corpus curation this is the language /
    * source equity check: a quality filter whose keep-rate for one
    * language is < 0.8× the best language's systematically thins that
    * slice of the corpus. One map-side-combined keyed aggregate plus a
    * broadcast 1-row max — group-sized output, no data-sized shuffle.
    * Rates are rounded to 6 dp BEFORE the ratio (single IEEE division,
    * engine-reproducible); the flag thresholds the rounded ratio. */
  def disparateImpact(df: DataFrame, groupCol: String, keep: Column): DataFrame = {
    val g = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(keep, 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate",
        round(col("n_keep").cast("double") / col("n"), 6))
    val mx = g.agg(max("keep_rate").as("__max"))
    g.crossJoin(broadcast(mx))
      .withColumn("impact_ratio", round(col("keep_rate") / col("__max"), 6))
      .select(col("group"), col("n"), col("n_keep"), col("keep_rate"),
        col("impact_ratio"),
        (col("impact_ratio") < 0.8).as("below_four_fifths"))
  }

  def woeEncode(df: DataFrame, catCol: String, positive: Column): DataFrame = {
    val pos = when(positive, 1L).otherwise(0L)
    val byCat = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(pos).as("__pos"))
      .withColumn("__neg", col("n") - col("__pos"))
    val totals = byCat.agg(sum("__pos").as("__pt"), sum("__neg").as("__nt"))
    val woe = round(log(
      ((col("__pos") + 0.5d) / col("__pt").cast("double")) /
      ((col("__neg") + 0.5d) / col("__nt").cast("double"))), 6)
    byCat.crossJoin(broadcast(totals))
      .withColumn("woe", woe)
      .select(col("category"), col("n"), col("__pos").as("n_pos"),
        col("woe"),
        round((col("__pos").cast("double") / col("__pt") -
               col("__neg").cast("double") / col("__nt")) * col("woe"), 6)
          .as("iv_term"))
  }
}
