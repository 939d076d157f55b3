package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order- and rank-based robust statistics — the nonparametric companions
  * to the engine's moment-based tests (Spearman/Mann-Whitney already live
  * in [[Stats]]): Kendall rank correlation, the Theil-Sen robust slope,
  * permutation (ordinal-pattern) entropy, and the Hill tail-index
  * estimator.
  *
  * Scale contract: every operator here is QUADRATIC IN A BOUNDED AXIS only
  * — a caller-provided top-N frame (Kendall), the distinct time axis
  * (Theil-Sen, permutation entropy: calendar days don't grow with corpus
  * bytes), or a fixed order-statistic window (Hill). The corpus-sized
  * work is always the single upstream aggregation that produced the
  * bounded frame. Determinism: all derived doubles come from exact integer
  * counts/cents via pinned expressions; every logarithm is
  * [[graft.functions.DetMath.lnPosInt]] (bit-identical in Spark and the
  * DuckDB oracles); every order-ambiguous float sum quantizes its summands
  * to exact longs first.
  */
object RankStats {

  /** Kendall rank correlation (tau-a over distinct ranks) between two
    * numeric columns of a BOUNDED frame (e.g. a top-N cut): all `i < j`
    * pairs by `idCol`, concordant minus discordant over n(n-1)/2.
    * Row_number-style distinct values are assumed (ties in x or y count
    * as neither concordant nor discordant — the tau-a convention).
    * Returns one row `(n_items, concordant, discordant, tau)`. */
  def kendallTau(df: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame = {
    val l = df.select(col(idCol).as("__i"), col(xCol).as("__xi"), col(yCol).as("__yi"))
    val r = df.select(col(idCol).as("__j"), col(xCol).as("__xj"), col(yCol).as("__yj"))
    val prod = (col("__xi") - col("__xj")).cast("double") *
      (col("__yi") - col("__yj")).cast("double")
    val pairs = l.join(r, col("__i") < col("__j"))
    pairs.agg(
        sum(when(prod > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(prod < 0, 1L).otherwise(0L)).as("discordant"),
        count(lit(1)).as("__m"))
      .select(
        // n from m = n(n-1)/2 — avoids a second pass over the input
        ((lit(1.0) + sqrt(lit(1.0) + lit(8.0) * col("__m"))) / 2).cast("long").as("n_items"),
        col("concordant"), col("discordant"),
        ((col("concordant") - col("discordant")).cast("double") / col("__m"))
          .as("tau"))
  }

  /** Theil-Sen robust slope: the exact LOWER MEDIAN of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)` over `x_i < x_j` — the classic
    * outlier-resistant trend estimator. `x` must be integer-valued and
    * distinct per row (a daily series), `y` integer-valued (cents), so
    * every slope is one IEEE division of exact integers. Median selection
    * is fully deterministic: slopes order by `(slope, x_i, x_j)` and the
    * k-th element (`k = ceil(m/2)`) is taken via limit-k + max — bounded
    * because the pair count is (time axis)², not corpus-sized.
    * Returns `(n_points, n_pairs, slope)`. */
  def theilSen(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val l = base.select(col("__x").as("__xi"), col("__y").as("__yi"))
    val r = base.select(col("__x").as("__xj"), col("__y").as("__yj"))
    val pairs = l.join(r, col("__xi") < col("__xj"))
      .select(col("__xi"), col("__xj"),
        ((col("__yj") - col("__yi")).cast("double") /
          (col("__xj") - col("__xi")).cast("double")).as("__s"))
    val m = pairs.count()
    require(m > 0, "theilSen needs at least 2 distinct x values")
    val k = (m + 1) / 2
    // limit() takes an Int: past ~65k distinct x values k.toInt would
    // silently wrap negative — fail loudly at the documented boundary
    require(k <= Int.MaxValue,
      s"theilSen median rank k=$k exceeds Int.MaxValue (m=$m pairs); " +
        "thin the time axis before fitting")
    val med = pairs.orderBy(col("__s"), col("__xi"), col("__xj"))
      .limit(k.toInt)
      .agg(max(struct(col("__s"), col("__xi"), col("__xj"))).as("__t"))
      .select(col("__t.__s").as("slope"))
    val n = base.count()
    med.select(lit(n).as("n_points"), lit(m).as("n_pairs"), col("slope"))
  }

  /** Permutation entropy (Bandt-Pohl 2002, order 3): the Shannon entropy
    * of ordinal patterns of consecutive value triples along `orderCol` —
    * the standard model-free "how predictable is this series" measure
    * (0 = monotone, ln 6 = white noise). Ties rank by position (earlier
    * index first), so integer-valued series are fully deterministic. The
    * pattern id is `rank(a)·9 + rank(b)·3 + rank(c)` from pairwise
    * comparisons; entropy uses [[graft.functions.DetMath.lnPosInt]] over
    * exact pattern counts with nano-quantized term sums. The window is
    * single-partition over the BOUNDED time axis. Returns
    * `(n_windows, n_patterns, perm_entropy, normalized)`. */
  def permutationEntropy(df: DataFrame, orderCol: String, valCol: String): DataFrame = {
    import graft.functions.DetMath.lnPosInt
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCol)
    val tri = df
      .select(col(orderCol), col(valCol).cast("long").as("__a"))
      .withColumn("__b", lead(col("__a"), 1).over(w))
      .withColumn("__c", lead(col("__a"), 2).over(w))
      .filter(col("__c").isNotNull)
    val ra = when(col("__b") < col("__a"), 1).otherwise(0) +
      when(col("__c") < col("__a"), 1).otherwise(0)
    val rb = when(col("__a") <= col("__b"), 1).otherwise(0) +
      when(col("__c") < col("__b"), 1).otherwise(0)
    val rc = when(col("__a") <= col("__c"), 1).otherwise(0) +
      when(col("__b") <= col("__c"), 1).otherwise(0)
    val counts = tri.groupBy((ra * 9 + rb * 3 + rc).as("__p"))
      .agg(count(lit(1)).as("__c"))
    val tot = counts.agg(sum("__c").as("__m"), count(lit(1)).as("__k"))
    val term = floor(
      col("__c").cast("double") / col("__m") *
        (lnPosInt(col("__m")) - lnPosInt(col("__c"))) * lit(1e9) + lit(0.5))
    counts.crossJoin(broadcast(tot))
      .agg(max(col("__m")).as("n_windows"), max(col("__k")).as("n_patterns"),
        sum(term).as("__q"))
      .select(col("n_windows"), col("n_patterns").cast("int").as("n_patterns"),
        (col("__q").cast("double") / lit(1e9)).as("perm_entropy"),
        (col("__q").cast("double") / lit(1e9) /
          lit(graft.functions.DetMath.lnPosIntScalar(6L))).as("normalized"))
  }

  /** Mann-Kendall trend test over an integer-valued series: `S = Σ sgn(y_j
    * − y_i)` over `x_i < x_j`, tie-corrected variance
    * `(n(n−1)(2n+5) − Σ t(t−1)(2t+5)) / 18`, and the continuity-corrected
    * normal statistic `z` — the nonparametric "is there a monotone trend"
    * companion to [[theilSen]] (same bounded pair join; the two are the
    * standard pair). All inputs are exact integers; `z` is one pinned
    * division + IEEE sqrt. Returns `(n, s, var_s, z)`. */
  def mannKendall(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val l = base.select(col("__x").as("__xi"), col("__y").as("__yi"))
    val r = base.select(col("__x").as("__xj"), col("__y").as("__yj"))
    val sAgg = l.join(r, col("__xi") < col("__xj"))
      .agg(sum(when(col("__yj") > col("__yi"), 1L)
        .when(col("__yj") < col("__yi"), -1L).otherwise(0L)).as("s"))
    val nAgg = base.agg(count(lit(1)).as("n"))
    val tieAgg = base.groupBy("__y").agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(when(col("__t") > 1,
        col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))), lit(0L)).as("__ties"))
    val varS = (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("__ties"))
      .cast("double") / lit(18.0)
    sAgg.crossJoin(broadcast(nAgg)).crossJoin(broadcast(tieAgg))
      .select(col("n"), col("s"), varS.as("var_s"),
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Seasonal Mann–Kendall trend test (Hirsch & Slack 1984) — the
    * [[mannKendall]] variant that is immune to a periodic signal: S and
    * Var(S) are computed WITHIN each season (pairs never cross seasons,
    * so a weekly/monthly cycle contributes nothing) and summed; the
    * continuity-corrected z closes on the totals. Same day-axis-bounded
    * pairwise-join shape as MK — the corpus collapses to the keyed series
    * first; everything here is exact longs until the final /18 and the
    * correctly-rounded sqrt. Returns
    * `(n_seasons, n, s, var_s, z)`. */
  def seasonalMannKendall(df: DataFrame, seasonCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(seasonCol).cast("long").as("__g"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val l = base.select(col("__g"), col("__x").as("__xi"), col("__y").as("__yi"))
    val r = base.select(col("__g").as("__g2"), col("__x").as("__xj"),
      col("__y").as("__yj"))
    val sAgg = l.join(r, col("__g") === col("__g2") && col("__xi") < col("__xj"))
      .agg(coalesce(sum(when(col("__yj") > col("__yi"), 1L)
        .when(col("__yj") < col("__yi"), -1L).otherwise(0L)), lit(0L)).as("s"))
    val perG = base.groupBy("__g").agg(count(lit(1)).as("__n"))
    val ties = base.groupBy("__g", "__y").agg(count(lit(1)).as("__t"))
      .groupBy("__g").agg(coalesce(sum(when(col("__t") > 1,
        col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))), lit(0L)).as("__tt"))
    val varNum = perG.join(ties, "__g")
      .agg(count(lit(1)).as("n_seasons"), sum("__n").as("n"),
        sum(col("__n") * (col("__n") - 1) * (col("__n") * 2 + 5) - col("__tt"))
          .as("__vn"))
    val varS = col("__vn").cast("double") / lit(18.0)
    sAgg.crossJoin(broadcast(varNum))
      .select(col("n_seasons"), col("n"), col("s"), varS.as("var_s"),
        when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
          .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Hill tail-index estimator over the top-`k` order statistics of an
    * integer-valued (cents) column: `gamma = mean of ln(x_i) − ln(x_k)`
    * over the k largest values (ties at the boundary contribute zero, so
    * the estimate is independent of tie-breaking), `alpha = 1/gamma` — the
    * Pareto exponent of the heavy tail. The corpus-sized work is one
    * top-k (TakeOrderedAndProject — per-partition heaps, only k rows
    * move); the estimator is k-bounded arithmetic with exact-long
    * quantized sums and series-ln. Returns
    * `(k, x_k, gamma, alpha)`. */
  def hillTail(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    import graft.functions.DetMath.lnPosInt
    require(k >= 2, "hillTail needs k >= 2")
    val top = df.select(col(valueCol).cast("long").as("__x"))
      .filter(col("__x") > 0)
      .orderBy(col("__x").desc)
      .limit(k)
    val xk = top.agg(min("__x").as("__xk"))
    val term = floor((lnPosInt(col("__x")) - lnPosInt(col("__xk"))) * lit(1e9) + lit(0.5))
    top.crossJoin(broadcast(xk))
      .agg(count(lit(1)).as("__n"), max(col("__xk")).as("x_k"), sum(term).as("__q"))
      .select(col("__n").cast("int").as("k"), col("x_k"),
        (col("__q").cast("double") / lit(1e9) / (col("__n") - 1)).as("gamma"),
        (lit(1.0) / (col("__q").cast("double") / lit(1e9) / (col("__n") - 1))).as("alpha"))
  }
}
