package graft.operators

/** Tail probabilities for the engine's significance gates — driver-side
  * scalar math on aggregated statistics (never per-row). Both tails
  * derive from the regularized incomplete gamma function, evaluated with
  * the classic series / continued-fraction split (Abramowitz & Stegun
  * 6.5; the standard public-domain numerical treatment): the χ²
  * survival is `Q(df/2, x/2)` and the normal survival is
  * `0.5·Q(1/2, z²/2)` via `erfc(y) = Q(1/2, y²)` — one kernel, no
  * hand-tuned polynomial approximations. Accuracy ~1e-12, far below any
  * gating alpha. */
object Stats {

  /** ln Γ(x) for x > 0 (Lanczos approximation, g = 5, 6-term series). */
  def lnGamma(x: Double): Double = {
    val cof = Array(76.18009172947146, -86.50532032941677, 24.01409824083091,
      -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)
    val xx = x
    var y = x
    val tmp0 = xx + 5.5
    val tmp = tmp0 - (xx + 0.5) * math.log(tmp0)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1.0; ser += cof(j) / y; j += 1 }
    -tmp + math.log(2.5066282746310005 * ser / xx)
  }

  private val Eps = 1e-14
  private val MaxIter = 500

  /** Regularized lower incomplete gamma P(a, x); Q(a, x) = 1 − P(a, x). */
  def gammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammaP domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) gser(a, x)
    else 1.0 - gcf(a, x)
  }

  def gammaQ(a: Double, x: Double): Double = 1.0 - gammaP(a, x)

  // series representation (converges fast for x < a+1)
  private def gser(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < MaxIter && math.abs(del) >= math.abs(sum) * Eps) {
      ap += 1.0; del *= x / ap; sum += del; i += 1
    }
    sum * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  // continued fraction (Lentz), for x >= a+1: returns Q(a, x)
  private def gcf(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (i <= MaxIter && math.abs(del - 1.0) >= Eps)
    math.exp(-x + a * math.log(x) - lnGamma(a)) * h
  }

  /** χ² survival function: P(X > x) for X ~ χ²(df). */
  def chiSquareSf(x: Double, df: Double): Double = {
    require(df > 0)
    if (x <= 0) 1.0 else gammaQ(df / 2.0, x / 2.0)
  }

  /** Standard-normal survival P(Z > z), via erfc(y) = Q(1/2, y²). */
  def normalSf(z: Double): Double =
    if (z >= 0) 0.5 * gammaQ(0.5, z * z / 2.0)
    else 1.0 - 0.5 * gammaQ(0.5, z * z / 2.0)

  /** Pooled two-proportion z (same formula as
    * [[Profiler.twoProportionZ]], scalar form for driver-side gates). */
  /** Laplace-mechanism noisy counts (Dwork et al. 2006, the ε-DP release
    * primitive): per group, `count + Laplace(b)` with `b = Δf/ε = 1/ε` for
    * a unit-sensitivity count. The Laplace draw inverts the CDF at an
    * md5-derived uniform — REPRODUCIBLE noise so the release is
    * oracle-checkable and the mechanism's arithmetic is testable end to
    * end; a production DP release swaps the md5 uniform for fresh entropy
    * (deterministic noise re-used across releases is not DP).
    * One hash aggregation; the noise is a row-local expression on the
    * group key. Returns `(keyCol, n, noise, noisy_n)`. */
  def dpNoisyCounts(df: org.apache.spark.sql.DataFrame, keyCol: String,
      b: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val v = conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (v.cast("double") + 1.0) / 4503599627370497.0 // 16^13 + 1, u ∈ (0,1)
    val x = u - 0.5
    val noise = -lit(b) * signum(x) * log(lit(1.0) - lit(2.0) * abs(x))
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", noise)
      .withColumn("noisy_n", col("n") + col("noise"))
  }

  /** Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg 1995):
    * given one p-value per hypothesis, find the largest rank `r` with
    * `p_(r) ≤ (r/m)·q` and reject every hypothesis ranked ≤ r — the
    * standard correction when a drift/DQ suite tests hundreds of
    * columns/segments at once and per-test α would drown in false alarms.
    *
    * The frame is hypothesis-sized (one row per tested column/segment),
    * never data-sized, so the rank window is bounded by `m`. Ties in `p`
    * break on the key for a deterministic ranking. Returns the input plus
    * `(p_rank, bh_threshold, rejected)`. */
  def bhReject(pvals: org.apache.spark.sql.DataFrame, keyCol: String,
      pCol: String, q: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(q > 0 && q < 1, "FDR level q must be in (0,1)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(pCol).asc, col(keyCol).asc)
    val m = pvals.count()
    val ranked = pvals
      .withColumn("p_rank", row_number().over(w).cast("long"))
      .withColumn("bh_threshold", col("p_rank") * lit(q) / lit(m.toDouble))
    val rmax = ranked.filter(col(pCol) <= col("bh_threshold"))
      .agg(max(col("p_rank")).as("__rmax"))
    ranked.crossJoin(broadcast(rmax))
      .withColumn("rejected",
        col("__rmax").isNotNull && col("p_rank") <= col("__rmax"))
      .drop("__rmax")
  }

  /** Spearman rank correlation of two BOUNDED-DOMAIN columns (tie-averaged
    * ranks — the textbook definition). Ranks are computed per DISTINCT
    * value (`avg_rank = #smaller + (count+1)/2`), so the rank windows run
    * over ≤ |domain| rows and the corpus-sized work is two hash
    * aggregations plus two broadcast joins of the tiny rank maps — for
    * unbounded-domain columns, bucket first. Returns one row `(n, rho)`. */
  def spearman(df: org.apache.spark.sql.DataFrame, colA: String,
      colB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.filter(col(colA).isNotNull && col(colB).isNotNull)
    def rankMap(c: String) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .withColumn("__rank",
          coalesce(sum(col("__n")).over(w), lit(0L)) + (col("__n") + 1) / 2.0)
        .select(col(c), col("__rank"))
    }
    base
      .join(broadcast(rankMap(colA).withColumnRenamed("__rank", "__ra")), colA)
      .join(broadcast(rankMap(colB).withColumnRenamed("__rank", "__rb")), colB)
      .agg(count(lit(1)).as("n"), corr(col("__ra"), col("__rb")).as("rho"))
  }

  def twoProportionZ(sA: Long, nA: Long, sB: Long, nB: Long): Double = {
    require(nA > 0 && nB > 0)
    val pa = sA.toDouble / nA
    val pb = sB.toDouble / nB
    val pool = (sA + sB).toDouble / (nA + nB)
    val se = math.sqrt(pool * (1 - pool) * (1.0 / nA + 1.0 / nB))
    if (se == 0.0) 0.0 else (pa - pb) / se
  }

  /** Difference-in-differences on an integer-valued (cents) metric: the
    * classic two-group, two-period causal contrast
    * `DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)`.
    * ONE conditional aggregation over the fact stream (four cells = four
    * map-side-combined sums/counts — no pivot, no second pass); every mean
    * is one pinned division of exact integers, so the result replays
    * bit-identically in any engine. Returns one row with the four cell
    * means, counts, and `did`. */
  def diffInDiff(df: org.apache.spark.sql.DataFrame,
      treatCol: org.apache.spark.sql.Column,
      postCol: org.apache.spark.sql.Column,
      centsCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def cell(t: Boolean, p: Boolean) = {
      val cond = (if (t) treatCol else !treatCol) && (if (p) postCol else !postCol)
      (sum(when(cond, centsCol).otherwise(lit(0L))),
        sum(when(cond, 1L).otherwise(0L)))
    }
    val (stp, ntp) = cell(t = true, p = true)
    val (str_, ntr) = cell(t = true, p = false)
    val (scp, ncp) = cell(t = false, p = true)
    val (scr, ncr) = cell(t = false, p = false)
    val agg = df.agg(stp.as("__stp"), ntp.as("n_treat_post"),
      str_.as("__str"), ntr.as("n_treat_pre"),
      scp.as("__scp"), ncp.as("n_ctrl_post"),
      scr.as("__scr"), ncr.as("n_ctrl_pre"))
    def mean(s: String, n: String) = col(s).cast("double") / col(n)
    agg.select(
      col("n_treat_pre"), col("n_treat_post"), col("n_ctrl_pre"), col("n_ctrl_post"),
      mean("__str", "n_treat_pre").as("mean_treat_pre"),
      mean("__stp", "n_treat_post").as("mean_treat_post"),
      mean("__scr", "n_ctrl_pre").as("mean_ctrl_pre"),
      mean("__scp", "n_ctrl_post").as("mean_ctrl_post"),
      ((mean("__stp", "n_treat_post") - mean("__str", "n_treat_pre"))
        - (mean("__scp", "n_ctrl_post") - mean("__scr", "n_ctrl_pre"))).as("did"))
  }

  /** CUPED variance reduction (Deng et al. 2013, public method): with a
    * pre-period covariate X and the experiment metric Y per unit (both
    * integer cents), `θ = cov(X,Y)/var(X)` and the adjusted metric
    * `Y − θ(X − X̄)` has variance `var(Y) − cov²/var(X)`. One aggregation
    * of six exact integer sums (n, Σx, Σy, Σxx, Σxy, Σyy — map-side
    * combined, any merge order); every derived double is a pinned
    * left-associated expression over them, so θ and the variance-reduction
    * ratio replay bit-identically. Overflow bound: Σxy stays under 2⁶³ for
    * |cents| ≤ 1e7 up to ~9e4 units per shard at worst-case correlation —
    * shard-and-BigInt-merge past that. Returns one row
    * `(n, theta, mean_y, var_y, var_adj, var_reduction)`. */
  def cuped(df: org.apache.spark.sql.DataFrame, xCol: String, yCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val agg = df.agg(count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"), sum(y * y).as("__syy"))
    val n = col("n").cast("double")
    def m(c: String) = col(c).cast("double") / n
    val covXY = m("__sxy") - (m("__sx")) * (m("__sy"))
    val varX = m("__sxx") - (m("__sx")) * (m("__sx"))
    val varY = m("__syy") - (m("__sy")) * (m("__sy"))
    val varAdj = varY - covXY * covXY / varX
    agg.select(col("n"), (covXY / varX).as("theta"), m("__sy").as("mean_y"),
      varY.as("var_y"), varAdj.as("var_adj"), (varAdj / varY).as("var_reduction"))
  }

  /** One-way ANOVA F over an integer-valued metric: between/within sums of
    * squares from exact per-group integer sums (`Σx`, `Σx²`, n — map-side
    * combined), with the order-ambiguous cross-GROUP sums quantized to
    * exact micro-longs (groups are a bounded dimension; the corpus-sized
    * work is the one keyed aggregation). `F = (SSB/(k−1)) / (SSW/(N−k))`.
    * Returns one row `(k, n, ssb, ssw, f)`. */
  def anovaF(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val x = col(valCol).cast("long")
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"), sum(x).as("__s"), sum(x * x).as("__ss"))
    val tot = g.agg(sum("__n").as("__nt"), sum("__s").as("__st"),
      count(lit(1)).as("k"))
    val m = col("__s").cast("double") / col("__n")
    val mAll = col("__st").cast("double") / col("__nt")
    val ssbQ = floor(col("__n") * (m - mAll) * (m - mAll) * lit(1e6) + lit(0.5))
    val sswQ = floor((col("__ss").cast("double")
      - col("__s").cast("double") * col("__s") / col("__n")) * lit(1e6) + lit(0.5))
    val agg = g.crossJoin(broadcast(tot))
      .agg(max("k").as("k"), max("__nt").as("n"),
        sum(ssbQ).as("__ssbq"), sum(sswQ).as("__sswq"))
    agg.select(col("k"), col("n"),
      (col("__ssbq").cast("double") / lit(1e6)).as("ssb"),
      (col("__sswq").cast("double") / lit(1e6)).as("ssw"),
      ((col("__ssbq").cast("double") / lit(1e6) / (col("k") - 1))
        / (col("__sswq").cast("double") / lit(1e6) / (col("n") - col("k")))).as("f"))
  }

  /** First-order partial correlation — the correlation between `x` and
    * `y` with a confounder `z` held fixed: `r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1 − r_xz²)(1 − r_yz²))` — the "is the x–y link real or just
    * driven by z" readout. Input: one row per key with all three integer
    * values present. ONE aggregation collects the nine exact long sums;
    * each Pearson r and the partial close are pinned double trees (IEEE
    * sqrt). Degenerate variance yields null. Returns
    * `(n, r_xy, r_xz, r_yz, r_xy_z)`. */
  def partialCorr(df: org.apache.spark.sql.DataFrame, xCol: String,
      yCol: String, zCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val z = col(zCol).cast("long")
    val a = df.filter(x.isNotNull && y.isNotNull && z.isNotNull).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(z * z).as("szz"),
      sum(x * y).as("sxy"), sum(x * z).as("sxz"), sum(y * z).as("syz"))
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    // nullif keeps ANSI mode from raising on the degenerate-variance
    // divisor the `ok` guard nulls out anyway
    def r(sab: String, a1: String, b1: String, saa: String, sbb: String) =
      (n * dd(sab) - dd(a1) * dd(b1)) /
        nullif(sqrt(n * dd(saa) - dd(a1) * dd(a1)) *
          sqrt(n * dd(sbb) - dd(b1) * dd(b1)), lit(0.0))
    val rxy = r("sxy", "sx", "sy", "sxx", "syy")
    val rxz = r("sxz", "sx", "sz", "sxx", "szz")
    val ryz = r("syz", "sy", "sz", "syy", "szz")
    val ok = col("n") >= 3 &&
      n * dd("sxx") - dd("sx") * dd("sx") > 0.0 &&
      n * dd("syy") - dd("sy") * dd("sy") > 0.0 &&
      n * dd("szz") - dd("sz") * dd("sz") > 0.0
    a.select(col("n"),
      when(ok, rxy).as("r_xy"), when(ok, rxz).as("r_xz"),
      when(ok, ryz).as("r_yz"),
      when(ok && (lit(1.0) - rxz * rxz) > 0.0 && (lit(1.0) - ryz * ryz) > 0.0,
        (rxy - rxz * ryz) /
          nullif(sqrt(lit(1.0) - rxz * rxz) * sqrt(lit(1.0) - ryz * ryz),
            lit(0.0)))
        .as("r_xy_z"))
  }

  /** Cronbach's alpha — internal-consistency reliability of k "items"
    * scored per subject: `α = k/(k−1)·(1 − Σ var_item / var_total)`
    * (Cronbach 1951). Absent (subject, item) scores are zeros, so sums
    * over observed rows plus the subject count suffice — no
    * densification. Sample variances from exact long sums (one keyed
    * aggregation per axis); the close is one pinned tree. Returns
    * `(k, n_subjects, sum_item_var, total_var, alpha)`; degenerate total
    * variance yields null alpha. */
  def cronbachAlpha(df: org.apache.spark.sql.DataFrame, subjectCol: String,
      itemCol: String, scoreCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.filter(col(subjectCol).isNotNull && col(itemCol).isNotNull &&
      col(scoreCol).isNotNull)
      .groupBy(col(subjectCol).as("__s"), col(itemCol).as("__i"))
      .agg(sum(col(scoreCol).cast("long")).as("__v"))
    val nSub = base.select(countDistinct("__s").as("n_subjects"))
    // per-item exact sums over observed rows (absent subjects contribute 0)
    val perItem = base.groupBy("__i")
      .agg(sum("__v").as("__is"),
        sum(col("__v").cast("decimal(19,0)") * col("__v").cast("decimal(19,0)"))
          .as("__iss"))
    val nD = col("n_subjects").cast("double")
    val itemVarQ = floor((nD * col("__iss").cast("double") -
      col("__is").cast("double") * col("__is").cast("double")) /
      (nD * (nD - lit(1.0))) * lit(1e6) + lit(0.5)).cast("long")
    val items = perItem.crossJoin(broadcast(nSub))
      .agg(count(lit(1)).as("k"), sum(itemVarQ).as("__ivq"))
    val perSub = base.groupBy("__s").agg(sum("__v").as("__t"))
      .agg(sum("__t").as("__ts"),
        sum(col("__t").cast("decimal(19,0)") * col("__t").cast("decimal(19,0)"))
          .as("__tss"))
    val totVar = (nD * col("__tss").cast("double") -
      col("__ts").cast("double") * col("__ts").cast("double")) /
      (nD * (nD - lit(1.0)))
    val sumItemVar = col("__ivq").cast("double") / lit(1e6)
    items.crossJoin(broadcast(nSub)).crossJoin(broadcast(perSub))
      .select(col("k"), col("n_subjects"), sumItemVar.as("sum_item_var"),
        totVar.as("total_var"),
        when(col("n_subjects") >= 2 && col("k") >= 2 && totVar > 0.0,
          col("k").cast("double") / (col("k").cast("double") - lit(1.0)) *
            (lit(1.0) - sumItemVar / totVar)).as("alpha"))
  }

  /** TOST equivalence test (two one-sided tests, Schuirmann 1987) — the
    * flip of the difference test: "are the two groups' means provably
    * WITHIN ±margin of each other?" Both shifted Welch statistics must
    * clear their one-sided threshold for equivalence; reporting both is
    * the honest readout. Unlike the legacy double-avg t-test, everything
    * here is exact: per-group `n, Σx, Σx²` in exact decimals over integer
    * units, variances via `(nΣx² − (Σx)²)/(n(n−1))`, and the Welch SE /
    * df close in one pinned double tree each. One conditional aggregation
    * over one scan. Returns
    * `(n_a, n_b, diff, se, df, t_lower, t_upper)` in input units. */
  def tostEquivalence(df: org.apache.spark.sql.DataFrame, valueCol: String,
      groupCol: String, groupA: String, groupB: String,
      margin: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(margin > 0, "tostEquivalence: margin > 0")
    val x = col(valueCol).cast("long")
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def side(g: String, tag: String) = Seq(
      count(when(col(groupCol) === g, x)).as(s"n_$tag"),
      sum(when(col(groupCol) === g, d(x))).as(s"s_$tag"),
      sum(when(col(groupCol) === g, d(x) * d(x))).as(s"ss_$tag"))
    val aggs = side(groupA, "a") ++ side(groupB, "b")
    val a = df.agg(aggs.head, aggs.tail: _*)
    def m(tag: String) =
      col(s"s_$tag").cast("double") / col(s"n_$tag").cast("double")
    def va(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      (n * col(s"ss_$tag").cast("double") -
        col(s"s_$tag").cast("double") * col(s"s_$tag").cast("double")) /
        (n * (n - lit(1.0)))
    }
    val sea = va("a") / col("n_a").cast("double")
    val seb = va("b") / col("n_b").cast("double")
    val se = sqrt(sea + seb)
    val diff = m("a") - m("b")
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / (col("n_a").cast("double") - lit(1.0)) +
        seb * seb / (col("n_b").cast("double") - lit(1.0)))
    a.filter(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("n_a"), col("n_b"), diff.as("diff"), se.as("se"),
        dfW.as("df"),
        ((diff + lit(margin.toDouble)) / se).as("t_lower"),
        ((diff - lit(margin.toDouble)) / se).as("t_upper"))
  }

  /** Brown–Forsythe variance-homogeneity test — "do the groups have equal
    * SPREAD?", the robust Levene variant: one-way ANOVA on the absolute
    * deviations from each group's MEDIAN (Brown & Forsythe 1974), immune
    * to the heavy tails that wreck the classic F-ratio-of-variances.
    * The median is the discrete lower median from the distributed
    * rank-selection machinery ([[Profiler.groupQuantilesDisc]] — exact
    * value, bit-identical in any engine), deviations are exact integer
    * units, and the F close reuses [[anovaF]]'s quantized group terms.
    * `valCol` must be integer-valued and small enough that `Σz²` fits a
    * long (use coarse units for wide-range values). Returns
    * `(k, n, ssb, ssw, f)`. */
  def brownForsythe(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol), col(valCol).cast("long").as("__x"))
    val med = graft.operators.Profiler
      .groupQuantilesDisc(base, groupCol, "__x", Seq(0.5))
      .select(col(groupCol), col("q_50").as("__med"))
    val z = base.join(med, Seq(groupCol))
      .select(col(groupCol),
        abs(col("__x") - col("__med").cast("long")).as("__z"))
    anovaF(z, groupCol, "__z")
  }

  /** 2×2 odds ratio with a log-space Wald interval, fully deterministic:
    * `OR = ad/bc` (exact integer products), `ln OR` via the engine-pinned
    * [[graft.functions.DetMath.lnPosInt]] series (`ln(ad) − ln(bc)` — no
    * libm), `SE = sqrt(1/a + 1/b + 1/c + 1/d)` in a pinned association,
    * and the 95% bounds reported in LOG space (exponentiating would
    * reintroduce libm). `exposedCol`/`outcomeCol` are boolean columns; one
    * conditional aggregation. Returns
    * `(a, b, c, d, odds_ratio, ln_or, se, ci_lo, ci_hi)`. */
  def oddsRatio(df: org.apache.spark.sql.DataFrame,
      exposedCol: org.apache.spark.sql.Column,
      outcomeCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.DetMath.lnPosInt
    val agg = df.agg(
      sum(when(exposedCol && outcomeCol, 1L).otherwise(0L)).as("a"),
      sum(when(exposedCol && !outcomeCol, 1L).otherwise(0L)).as("b"),
      sum(when(!exposedCol && outcomeCol, 1L).otherwise(0L)).as("c"),
      sum(when(!exposedCol && !outcomeCol, 1L).otherwise(0L)).as("d"))
    // lnPosInt's domain is n >= 1: an empty cell would silently feed it 0
    // (garbage ~-3.4, with se = Infinity) — fail loudly instead, matching
    // the knnClassify convention (continuity-correct upstream if needed)
    val cells = Seq("a", "b", "c", "d").map(col)
    val allPos = cells.map(_ > 0).reduce(_ && _)
    // every downstream expression divides or lns a cell, so each one is
    // guarded (ANSI mode would otherwise raise DIVIDE_BY_ZERO first)
    def guarded(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(allPos, c)
      .otherwise(raise_error(concat(lit("oddsRatio: empty 2x2 cell (a,b,c,d)=("),
        concat_ws(",", cells: _*), lit(")"))))
    val lnor = guarded(
      lnPosInt(col("a") * col("d")) - lnPosInt(col("b") * col("c")))
    val se = guarded(sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
      + lit(1.0) / col("c") + lit(1.0) / col("d")))
    agg.select(col("a"), col("b"), col("c"), col("d"),
      guarded((col("a") * col("d")).cast("double") / (col("b") * col("c")))
        .as("odds_ratio"),
      lnor.as("ln_or"), se.as("se"),
      (lnor - lit(1.96) * se).as("ci_lo"), (lnor + lit(1.96) * se).as("ci_hi"))
  }

  /** Relative risk with a log-space Wald interval — [[oddsRatio]]'s
    * epidemiology companion (risk RATIO of the exposed vs unexposed
    * rows, the number a cohort comparison actually reports): `RR =
    * [a/(a+b)] / [c/(c+d)]`, `ln RR = ln(a(c+d)) − ln(c(a+b))` via the
    * engine-pinned series ln (exact integer products — no libm),
    * `SE = √(1/a − 1/(a+b) + 1/c − 1/(c+d))`, bounds in LOG space.
    * One conditional aggregation; empty exposed/unexposed-outcome cells
    * fail loudly (the oddsRatio convention). Returns
    * `(a, b, c, d, rel_risk, ln_rr, se, ci_lo, ci_hi)`. */
  def relativeRisk(df: org.apache.spark.sql.DataFrame,
      exposedCol: org.apache.spark.sql.Column,
      outcomeCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.DetMath.lnPosInt
    val agg = df.agg(
      sum(when(exposedCol && outcomeCol, 1L).otherwise(0L)).as("a"),
      sum(when(exposedCol && !outcomeCol, 1L).otherwise(0L)).as("b"),
      sum(when(!exposedCol && outcomeCol, 1L).otherwise(0L)).as("c"),
      sum(when(!exposedCol && !outcomeCol, 1L).otherwise(0L)).as("d"))
    val pos = col("a") > 0 && col("c") > 0
    def guarded(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(pos, c).otherwise(raise_error(concat(
        lit("relativeRisk: empty outcome cell (a,c)=("),
        concat_ws(",", col("a"), col("c")), lit(")"))))
    val lnrr = guarded(lnPosInt(col("a") * (col("c") + col("d"))) -
      lnPosInt(col("c") * (col("a") + col("b"))))
    val se = guarded(sqrt(
      lit(1.0) / col("a") - lit(1.0) / (col("a") + col("b")) +
        lit(1.0) / col("c") - lit(1.0) / (col("c") + col("d"))))
    agg.select(col("a"), col("b"), col("c"), col("d"),
      guarded((col("a") * (col("c") + col("d"))).cast("double") /
        (col("c") * (col("a") + col("b")))).as("rel_risk"),
      lnrr.as("ln_rr"), se.as("se"),
      (lnrr - lit(1.96) * se).as("ci_lo"), (lnrr + lit(1.96) * se).as("ci_hi"))
  }

  /** Adjusted Rand index between two labelings of the same rows — the
    * standard pair-counting agreement score for comparing a clustering
    * against a reference partition (Hubert & Arabie 1985).
    *
    * Everything up to the final ratio is EXACT integer arithmetic on
    * doubled pair counts (`Σ n(n−1)` has no ½ to round): with
    * `I2 = Σ_ij n_ij(n_ij−1)`, `A2 = Σ_i a_i(a_i−1)`, `B2 = Σ_j b_j(b_j−1)`,
    * `P2 = n(n−1)`,
    * `ARI = (2·P2·I2 − 2·A2·B2) / (P2·(A2+B2) − 2·A2·B2)` — the ½ and
    * expected-value divisions cancel. Products run in DECIMAL(38,0)
    * (envelope: n ≲ 10⁹ keeps `A2·B2 < 10³⁸`), so both engines form the
    * identical integers and the single final double division cannot
    * disagree. Scale shape: one O(rows) contingency aggregation (cells ≤
    * |A|·|B|), then three one-row frames crossed broadcast-style. */
  def adjustedRandIndex(df: org.apache.spark.sql.DataFrame,
      colA: String, colB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("nij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairs2(c: org.apache.spark.sql.Column) =
      sum((c.cast("decimal(38,0)") * (c - lit(1))).cast("decimal(38,0)"))
    val base = cells.agg(pairs2(col("nij")).as("i2"), sum("nij").as("n"))
    val aSide = cells.groupBy("__a").agg(sum("nij").as("na"))
      .agg(pairs2(col("na")).as("a2"))
    val bSide = cells.groupBy("__b").agg(sum("nij").as("nb"))
      .agg(pairs2(col("nb")).as("b2"))
    val out = base.crossJoin(broadcast(aSide)).crossJoin(broadcast(bSide))
      .withColumn("p2", (col("n").cast("decimal(38,0)") * (col("n") - lit(1)))
        .cast("decimal(38,0)"))
      .select(col("n"),
        (col("i2") / 2).cast("long").as("index_pairs"),
        (col("a2") / 2).cast("long").as("pairs_a"),
        (col("b2") / 2).cast("long").as("pairs_b"),
        ((lit(2) * col("p2") * col("i2") - lit(2) * col("a2") * col("b2"))
          .cast("double")
          / (col("p2") * (col("a2") + col("b2")) - lit(2) * col("a2") * col("b2"))
            .cast("double")).as("ari"))
      .transform(graft.core.Checkpoints.truncate)
    cells.unpersist()
    out
  }

  /** McNemar's test for paired binary classifiers on the same rows: the
    * only information is the discordant counts `b` (first right, second
    * wrong) and `c` (first wrong, second right); the continuity-corrected
    * statistic is `(|b−c|−1)² / (b+c)` — one integer-exact numerator and
    * a single quantized division. One conditional aggregation, no
    * shuffle beyond the one-row agg. */
  def mcnemar(df: org.apache.spark.sql.DataFrame,
      correctA: org.apache.spark.sql.Column,
      correctB: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = df.agg(
      sum(when(correctA && correctB, 1L).otherwise(0L)).as("n_both"),
      sum(when(correctA && !correctB, 1L).otherwise(0L)).as("only_a"),
      sum(when(!correctA && correctB, 1L).otherwise(0L)).as("only_b"),
      sum(when(!correctA && !correctB, 1L).otherwise(0L)).as("n_neither"))
    val num = (abs(col("only_a") - col("only_b")) - lit(1))
    agg.select(col("n_both"), col("only_a"), col("only_b"), col("n_neither"),
      ((num * num).cast("double") / (col("only_a") + col("only_b")))
        .as("chi2"))
  }

  /** Cochran–Armitage trend test: does a binary outcome rate trend
    * monotonically across ordered integer scores? With per-level counts
    * `(n_i, r_i)` at score `s_i`, totals `N, R`:
    * `T = Σ s_i·r_i`, `E[T] = R·Σ s_i n_i / N`,
    * `Var = R(N−R)/(N−1) · (N·Σ s_i² n_i − (Σ s_i n_i)²) / N²` — the
    * statistic `Z = (T − E)/√Var`. All five sums are exact integer
    * aggregates; E, Var and Z are formed in ONE pinned association each
    * and quantized, so engines agree. One keyed aggregation over the
    * score levels (bounded frame), then driver-free scalar math. */
  def cochranArmitage(df: org.apache.spark.sql.DataFrame,
      scoreCol: String,
      outcomeCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val s = col(scoreCol).cast("long")
    val r = when(outcomeCol, 1L).otherwise(0L)
    val agg = df.filter(s.isNotNull).agg(
      count(lit(1)).as("n"), sum(r).as("rr"),
      sum(s * r).as("t"), sum(s).as("sn"), sum(s * s).as("ssn"))
    // E and Var in pinned associations (each written once, no rebalance):
    // Var(T) = R(N−R)/(N−1) · (N·Σs²n − (Σsn)²) / N²  (hypergeometric H0)
    val e = col("rr").cast("double") * col("sn") / col("n")
    val varT = (col("rr").cast("double") * (col("n") - col("rr"))
      / (col("n") - lit(1)))
      .*((col("n").cast("double") * col("ssn") - col("sn").cast("double") * col("sn"))
        / col("n") / col("n"))
    agg.select(col("n"), col("rr").as("r"), col("t"),
      e.as("expected"), varT.as("var_t"),
      ((col("t") - e) / sqrt(varT)).as("z"))
  }

  /** Friedman test (1937) — the rank-based repeated-measures ANOVA: k
    * treatments observed once per block; within each block the
    * treatments are ranked 1..k and
    * `χ²_F = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1)` with `R_j` the rank
    * sum of treatment j. The blocked complement of [[graft.operators
    * .Profiler.kruskalWallis]] (which assumes independent groups).
    *
    * Contract: exactly one value per (block, treatment); blocks missing
    * any treatment are dropped; ranking is by the exact long value with
    * ties broken by treatment id (documented — exact values rarely tie,
    * and the break is deterministic in both engines). Ranks are
    * integers, so every sum is exact; the statistic is pinned double ops
    * on one row. Also emits Kendall's W = χ²_F/(n(k−1)) concordance.
    * Returns `(n_blocks, k, friedman_chi2, kendall_w)`. */
  def friedman(df: org.apache.spark.sql.DataFrame, blockCol: String,
      treatmentCol: String, valCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.select(col(blockCol).as("b"), col(treatmentCol).as("t"),
        col(valCol).cast("long").as("v"))
      .filter(col("b").isNotNull && col("t").isNotNull && col("v").isNotNull)
    val k = base.select("t").distinct().count()
    require(k >= 2 && k <= 1000, s"friedman: k=$k treatments")
    val full = base.groupBy("b").agg(count(lit(1)).as("__kt"))
      .filter(col("__kt") === k).select("b")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("b")
      .orderBy(col("v").asc, col("t").asc)
    val ranked = base.join(full, "b").withColumn("__r", row_number().over(w))
    val perT = ranked.groupBy("t").agg(sum("__r").as("__R"), count(lit(1)).as("__n"))
    val agg = perT.agg(max("__n").as("n_blocks"), count(lit(1)).as("k"),
      sum(col("__R") * col("__R")).as("__sr2"))
    agg.select(col("n_blocks"), col("k"),
      (lit(12.0) / (col("n_blocks").cast("double") * col("k") * (col("k") + 1))
        * col("__sr2").cast("double")
        - lit(3.0) * col("n_blocks").cast("double") * (col("k") + 1))
        .as("friedman_chi2"),
      ((lit(12.0) / (col("n_blocks").cast("double") * col("k") * (col("k") + 1))
        * col("__sr2").cast("double")
        - lit(3.0) * col("n_blocks").cast("double") * (col("k") + 1))
        / (col("n_blocks").cast("double") * (col("k") - 1))).as("kendall_w"))
  }

  /** Wilson score interval per group — the proportion CI that behaves at
    * the boundaries where the Wald interval collapses (k = 0 or k = n):
    * `center = (p̂ + z²/2n)/(1 + z²/n)`, `half = z·√(p̂(1−p̂)/n +
    * z²/4n²)/(1 + z²/n)` (Wilson 1927). One keyed aggregation; counts are
    * exact longs, z is a plan-time literal, and each bound is one pinned
    * double tree (IEEE sqrt). Groups with n = 0 cannot occur (they have
    * no rows). Returns per group `(group, n, k, rate, ci_lo, ci_hi)`. */
  def wilsonCI(df: org.apache.spark.sql.DataFrame, groupCol: String,
      successCol: org.apache.spark.sql.Column,
      z: Double = 1.96): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(z > 0, "wilsonCI: z > 0")
    val g = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("k"))
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / denom
    g.select(col("group"), col("n"), col("k"), p.as("rate"),
      (center - half).as("ci_lo"), (center + half).as("ci_hi"))
  }

  /** Page's L trend test (Page 1963) — the ORDERED-alternative sibling of
    * [[friedman]]: with treatments carrying a natural order (doses, days,
    * model versions), `L = Σ_j j·R_j` weights each treatment's rank sum by
    * its position, so a monotone trend that Friedman's omnibus χ² dilutes
    * shows up directly. Same contract and exact integer rank machinery as
    * Friedman (complete blocks only, deterministic tie-break); treatment
    * order is lexicographic on the treatment id (documented). The normal
    * close `z = (L − n·k(k+1)²/4) / √(n·k²(k+1)²(k−1)/144)` is one pinned
    * tree. Returns `(n_blocks, k, l, z)`. */
  def pageTrend(df: org.apache.spark.sql.DataFrame, blockCol: String,
      treatmentCol: String, valCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.select(col(blockCol).as("b"), col(treatmentCol).as("t"),
        col(valCol).cast("long").as("v"))
      .filter(col("b").isNotNull && col("t").isNotNull && col("v").isNotNull)
    val k = base.select("t").distinct().count()
    require(k >= 3 && k <= 1000, s"pageTrend: k=$k treatments (need >= 3)")
    val full = base.groupBy("b").agg(count(lit(1)).as("__kt"))
      .filter(col("__kt") === k).select("b")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("b")
      .orderBy(col("v").asc, col("t").asc)
    val ranked = base.join(full, "b").withColumn("__r", row_number().over(w))
    val perT = ranked.groupBy("t").agg(sum("__r").as("__R"),
      count(lit(1)).as("__n"))
    // ordered treatment index on the bounded k-row frame
    val wj = org.apache.spark.sql.expressions.Window.orderBy("t")
    val agg = perT.withColumn("__j", row_number().over(wj).cast("long"))
      .agg(max("__n").as("n_blocks"), count(lit(1)).as("k"),
        sum(col("__j") * col("__R")).as("l"))
    val n = col("n_blocks").cast("double")
    val kd = col("k").cast("double")
    val mu = n * kd * (kd + lit(1.0)) * (kd + lit(1.0)) / lit(4.0)
    val va = n * kd * kd * (kd + lit(1.0)) * (kd + lit(1.0)) *
      (kd - lit(1.0)) / lit(144.0)
    agg.select(col("n_blocks"), col("k"), col("l"),
      ((col("l").cast("double") - mu) / sqrt(va)).as("z"))
  }

  /** Wald's sequential probability ratio test (SPRT, 1945) over a
    * period-aggregated Bernoulli stream — the always-valid monitor an
    * experiment platform runs daily instead of a fixed-horizon test:
    * after each period, `LLR_t = k_t·ln(p1/p0) + (n_t−k_t)·ln((1−p1)/
    * (1−p0))` on the cumulative counts; cross `ln((1−β)/α)` → accept H1,
    * cross `ln(β/(1−α))` → accept H0, else keep sampling.
    *
    * The four log constants are evaluated ONCE at plan time and embedded
    * as double literals (the oracle embeds the same 17-significant-digit
    * literals — decimal round-trip is exact, so both engines multiply
    * exact cumulative longs by bit-identical constants). Input is an
    * already-aggregated `(period, n, k)` frame: the cumulative window
    * runs on the calendar axis, bounded regardless of corpus size.
    * Returns `(period, n_cum, k_cum, llr, decision)` per period. */
  def sprt(daily: org.apache.spark.sql.DataFrame, periodCol: String,
      nCol: String, kCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0, s"p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    val l1 = math.log(p1 / p0)
    val l0 = math.log((1 - p1) / (1 - p0))
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    val w = org.apache.spark.sql.expressions.Window.orderBy("__p")
    val base = daily.select(col(periodCol).as("__p"),
      col(nCol).cast("long").as("__n"), col(kCol).cast("long").as("__k"))
    val cum = base
      .withColumn("n_cum", sum("__n").over(w))
      .withColumn("k_cum", sum("__k").over(w))
    val llr = col("k_cum").cast("double") * lit(l1) +
      (col("n_cum") - col("k_cum")).cast("double") * lit(l0)
    cum.select(col("__p").as("period"), col("n_cum"), col("k_cum"),
      llr.as("llr"),
      when(llr >= lit(upper), lit("accept_h1"))
        .when(llr <= lit(lower), lit("accept_h0"))
        .otherwise(lit("continue")).as("decision"))
  }

  /** Empirical-Bayes (beta-binomial) shrinkage of per-group success
    * rates — the method-of-moments prior (Morris 1983 lineage; the
    * standard "add the right pseudo-counts" smoother): fit
    * `α+β = m(1−m)/v − 1` from the mean `m` and variance `v` of the
    * per-group rates, then shrink each group to
    * `(k_i + α)/(n_i + α + β)`. Small-n groups pull hard toward the
    * global mean; large-n groups barely move.
    *
    * Determinism: per-group rates are micro-quantized longs, so the
    * moment sums are exact; `m`, `v`, `α`, `β` are pinned scalar double
    * ops on those exact sums (broadcast back as a one-row frame); the
    * shrunk rate is one pinned expression per group row. Degenerate
    * inputs (zero rate variance, or v ≥ m(1−m) making the implied prior
    * mass non-positive) raise rather than emit garbage. Returns
    * `(group, n, k, rate, shrunk)`. */
  def ebShrinkage(df: org.apache.spark.sql.DataFrame, groupCol: String,
      successCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val g = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("group")).agg(
        count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("k"))
    val pQ = floor(col("k").cast("double") / col("n") * lit(1e6) + lit(0.5))
    val mom = g.agg(count(lit(1)).as("__g"), sum(pQ).as("__sp"),
      sum(pQ * pQ).as("__spp"))
    val m = col("__sp").cast("double") / lit(1e6) / col("__g")
    val v = col("__spp").cast("double") / lit(1e12) / col("__g") - m * m
    val ab = when(v > 0 && m * (lit(1.0) - m) / v - 1 > 0,
      m * (lit(1.0) - m) / v - 1)
      .otherwise(raise_error(lit(
        "ebShrinkage: degenerate rate distribution (v = 0 or implied prior mass <= 0)")))
    val prior = mom.select(m.as("__m"), ab.as("__ab"))
    g.crossJoin(broadcast(prior))
      .select(col("group"), col("n"), col("k"),
        (col("k").cast("double") / col("n")).as("rate"),
        ((col("k").cast("double") + col("__m") * col("__ab"))
          / (col("n").cast("double") + col("__ab"))).as("shrunk"))
  }

  /** Chapman capture–recapture estimator — how many distinct entities
    * exist in total, given two overlapping capture samples? `N̂ =
    * (n_A+1)(n_B+1)/(n_AB+1) − 1` (Chapman 1951, the bias-corrected
    * Lincoln–Petersen). The corpus-health use: mark each vocabulary type
    * (or near-dup cluster, entity, …) by which sample saw it, and the
    * estimator says how much of the population the union still MISSES —
    * a coverage dial no direct count provides.
    *
    * Input: one row per captured entity with two boolean marks. ONE
    * aggregation; all counts exact longs; the estimator and coverage are
    * each one pinned double expression. Empty overlap is fine (the +1
    * correction keeps it finite). Returns one row
    * `(n_a, n_b, n_both, n_seen, chapman, coverage)`. */
  def captureRecapture(df: org.apache.spark.sql.DataFrame, aCol: String,
      bCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    val g = df.filter(a || b).agg(
      sum(when(a, 1L).otherwise(0L)).as("n_a"),
      sum(when(b, 1L).otherwise(0L)).as("n_b"),
      sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
      count(lit(1)).as("n_seen"))
    val chap = ((col("n_a") + 1) * (col("n_b") + 1)).cast("double") /
      (col("n_both") + 1).cast("double") - lit(1.0)
    g.select(col("n_a"), col("n_b"), col("n_both"), col("n_seen"),
      chap.as("chapman"),
      (col("n_seen").cast("double") / chap).as("coverage"))
  }

  /** Cochran's Q test — "do k binary treatments have equal success rates
    * on MATCHED blocks?", the k-treatment generalization of McNemar
    * (which this reduces to at k = 2): `Q = (k−1)·(k·ΣT_j² − N²) /
    * (k·N − Σu_i²)` with `T_j` per-treatment and `u_i` per-block success
    * counts, `N = Σu_i` (Cochran 1950). Absent (block, treatment) pairs
    * are zeros, so blocks need no densification — two keyed aggregations
    * over observed successes only, all statistics exact longs, ONE pinned
    * division. Returns one row `(k, n_blocks, n_success, df, q)`;
    * all-equal-margins degenerate denominators yield null q. */
  def cochranQ(df: org.apache.spark.sql.DataFrame, blockCol: String,
      treatmentCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = df.filter(col(blockCol).isNotNull && col(treatmentCol).isNotNull)
      .select(col(blockCol).as("__b"), col(treatmentCol).as("__t"))
      .distinct()
    val k = cells.select(countDistinct("__t").as("__k"))
    val rows = cells.groupBy("__b").agg(count(lit(1)).as("__u"))
      .agg(count(lit(1)).as("n_blocks"), sum("__u").as("__n"),
        sum(col("__u") * col("__u")).as("__su2"))
    val colsT = cells.groupBy("__t").agg(count(lit(1)).as("__tj"))
      .agg(sum(col("__tj") * col("__tj")).as("__st2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val num = d(col("__k") - 1) * (d(col("__k")) * d(col("__st2")) -
      d(col("__n")) * d(col("__n")))
    val den = d(col("__k")) * d(col("__n")) - d(col("__su2"))
    rows.crossJoin(broadcast(k)).crossJoin(broadcast(colsT))
      .select(col("__k").as("k"), col("n_blocks"),
        col("__n").as("n_success"), (col("__k") - 1).as("df"),
        when(den > 0, num.cast("double") / den.cast("double")).as("q"))
  }

  /** Peaks-over-threshold GPD tail fit by method of moments — the extreme
    * -value readout ("how heavy is the tail beyond u?") behind capacity
    * and risk planning: exceedances `e = value − u` are approximately
    * Generalized-Pareto (Pickands–Balkema–de Haan), and the moment
    * estimators are `ξ̂ = (1 − m²/s²)/2`, `σ̂ = m(1 + m²/s²)/2` (Hosking
    * & Wallis 1987). The threshold is a CONFIGURED constant in cents —
    * deliberately not a percentile, whose interpolated double could flip
    * the exceedance set by one ulp between engines.
    *
    * ONE aggregation over the corpus; exceedances are exact cents longs,
    * their squares exact decimals, and the moment algebra is a pinned
    * double tree. Fewer than 2 exceedances → empty result (fail-visible).
    * Returns one row `(n_exceed, mean_excess, xi, sigma)` in value units. */
  def gpdTail(df: org.apache.spark.sql.DataFrame, valueCol: String,
      thresholdCents: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(thresholdCents >= 0, "gpdTail: thresholdCents >= 0")
    val vc = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val e = df.filter(col(valueCol).isNotNull)
      .select((vc - lit(thresholdCents)).as("__e"))
      .filter(col("__e") > 0)
    val agg = e.agg(count(lit(1)).as("k"), sum("__e").as("__se"),
      sum(col("__e").cast("decimal(19,0)") * col("__e").cast("decimal(19,0)"))
        .as("__se2"))
    val k = col("k").cast("double")
    val m = col("__se").cast("double") / k
    val s2 = (k * col("__se2").cast("double") -
      col("__se").cast("double") * col("__se").cast("double")) /
      (k * (k - lit(1.0)))
    val r = m * m / s2
    agg.filter(col("k") >= 2)
      .select(col("k").as("n_exceed"),
        (m / lit(100.0)).as("mean_excess"),
        (lit(0.5) * (lit(1.0) - r)).as("xi"),
        (lit(0.5) * m * (lit(1.0) + r) / lit(100.0)).as("sigma"))
  }

  /** Binned two-sample Cramér–von Mises drift — the L2 companion to the
    * sup-norm KS statistic (`DriftCheck.ksDf`): where KS sees only the
    * single worst ECDF gap, CvM integrates the squared gap over the whole
    * distribution, so slow full-range drifts that never produce one big
    * gap still register. Discrete form on shared fixed bins:
    * `T = n·m/(n+m)² · Σ_b (c_b + d_b)·(F(b) − G(b))²`.
    *
    * Scale shape: each input collapses to ≤ `nBins` (bin, count) rows in
    * ONE partial+final aggregation; everything after is bounded-frame math
    * (the unpartitioned cumulative window runs on ≤ nBins rows, never the
    * corpus). Determinism: cumulative counts are exact longs, each ECDF is
    * one IEEE long/long division, and the per-bin term is a fixed
    * expression tree — no order-dependent double accumulation; the total
    * is left to the caller as a 6-dp-quantized exact-decimal sum.
    * Returns per-bin `(bin, n_base, n_curr, f_base, f_curr, cvm_term)`
    * with `cvm_term` already carrying the `n·m/(n+m)²` factor.
    *
    * With `adWeighted = true` each term is further divided by
    * `H·(1−H)` (`H` the pooled ECDF) — the Anderson–Darling weighting
    * that amplifies tail gaps the unweighted CvM underplays; bins where
    * `H ∈ {0, 1}` (before any mass / after all of it) contribute 0 by
    * convention, identically in both engines. */
  def cvmBinned(base: org.apache.spark.sql.DataFrame,
      curr: org.apache.spark.sql.DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int,
      adWeighted: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(nBins >= 2, "cvmBinned needs nBins >= 2")
    require(hi > lo, "cvmBinned needs hi > lo")
    val width = (hi - lo) / nBins
    def binned(df: org.apache.spark.sql.DataFrame, name: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)),
          lit(0)), lit(nBins - 1)).cast("long").as("bin"))
        .agg(count(lit(1)).as(name))
    val j = binned(base, "n_base")
      .join(binned(curr, "n_curr"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_curr"))
    val tot = j.agg(sum("n_base").as("__nb"), sum("n_curr").as("__nc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val f1 = col("__cb").cast("double") / col("__nb").cast("double")
    val f2 = col("__cc").cast("double") / col("__nc").cast("double")
    val nm = col("__nb").cast("double") * col("__nc").cast("double")
    val nTot = (col("__nb") + col("__nc")).cast("double")
    val baseTerm = nm / (nTot * nTot) *
      (col("n_base") + col("n_curr")).cast("double") * (f1 - f2) * (f1 - f2)
    val h = (col("__cb") + col("__cc")).cast("double") / nTot
    val term =
      if (!adWeighted) baseTerm
      else when(h > 0.0 && h < 1.0, baseTerm / (h * (lit(1.0) - h)))
        .otherwise(lit(0.0))
    j.withColumn("__cb", sum("n_base").over(w))
      .withColumn("__cc", sum("n_curr").over(w))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_base"), col("n_curr"),
        f1.as("f_base"), f2.as("f_curr"),
        term.as(if (adWeighted) "ad_term" else "cvm_term"))
  }
}
