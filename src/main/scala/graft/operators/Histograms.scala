package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimizer-grade histogram construction. */
object Histograms {

  /** Decision-stump split selection — the single CART step: over equi-width
    * feature bins, find the cut minimizing the weighted Gini impurity of a
    * label column (`G_side = 1 − Σ_c p_c²`, weighted by side mass). The
    * classic "which threshold separates the classes best" readout for
    * feature screening and shallow-tree routing.
    *
    * Scale shape: ONE (bin, label) aggregation over the corpus (labels are
    * a bounded dimension), then all candidate cuts are scored on the
    * bounded bin×label frame via cumulative windows — the corpus is never
    * rescanned per cut. Determinism: side masses and per-class cumulative
    * counts are exact longs; each cut's impurity is micro-quantized to a
    * long before the argmin, which ties to the SMALLER cut bin. Long
    * domain: Σ lc² over labels needs rows ≲ 1.7·10⁹ per class — partition
    * (e.g. per source) before calling at larger scales. Returns
    * one row `(cut_bin, n_left, n_right, gini_split, gini_root)` — split
    * at `bin ≤ cut_bin`. */
  def bestGiniSplit(df: DataFrame, valueCol: String, labelCol: String,
      lo: Double, hi: Double, nFine: Int): DataFrame = {
    require(nFine >= 2 && nFine <= 256, "bestGiniSplit: nFine in [2, 256]")
    require(hi > lo, "bestGiniSplit: hi > lo")
    val width = (hi - lo) / nFine
    val cells = df.filter(col(valueCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)),
        lit(0)), lit(nFine - 1)).cast("int").as("bin"),
        col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("c"))
    // bounded from here: <= nFine x |labels| rows
    val wCum = org.apache.spark.sql.expressions.Window.partitionBy("lbl")
      .orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tots = cells.groupBy("lbl").agg(sum("c").as("tc"))
    val cum = cells.withColumn("lc", sum("c").over(wCum))
      .select(col("lbl").as("__l"), col("bin").as("__b"), col("lc"))
    // candidate cut = every occupied bin except the last (right side
    // always keeps the last bin's rows, so both sides are non-empty);
    // a label absent at the cut bin takes its last cumulative at or
    // below it (0 if none) — densified by the bounded ≤-join
    val maxBin = cells.agg(max("bin").as("__mx"))
    val candidates = cells.select(col("bin").as("cb")).distinct()
      .crossJoin(broadcast(maxBin)).filter(col("cb") < col("__mx"))
      .select("cb")
    val atCut = candidates.crossJoin(tots)
      .join(cum, col("__l") === col("lbl") && col("__b") <= col("cb"), "left")
      .groupBy("cb", "lbl", "tc")
      .agg(coalesce(max("lc"), lit(0L)).as("lc"))
    val perCut = atCut.groupBy("cb")
      .agg(sum("lc").as("n_left"), sum(col("tc") - col("lc")).as("n_right"),
        sum(col("lc") * col("lc")).as("__l2"),
        sum((col("tc") - col("lc")) * (col("tc") - col("lc"))).as("__r2"))
    val nL = col("n_left").cast("double")
    val nR = col("n_right").cast("double")
    val nAll = nL + nR
    val gini = ((nL - col("__l2").cast("double") / nL) +
      (nR - col("__r2").cast("double") / nR)) / nAll
    val root = tots.agg(sum("tc").as("__n"), sum(col("tc") * col("tc")).as("__t2"))
      .select(((col("__n").cast("double") -
        col("__t2").cast("double") / col("__n").cast("double")) /
        col("__n").cast("double")).as("gini_root"))
    perCut
      .withColumn("__gq", floor(gini * lit(1e9) + lit(0.5)).cast("long"))
      .orderBy(col("__gq"), col("cb"))
      .limit(1)
      .crossJoin(broadcast(root))
      .select(col("cb").as("cut_bin"), col("n_left"), col("n_right"),
        (col("__gq").cast("double") / lit(1e9)).as("gini_split"),
        col("gini_root"))
  }

  /** V-optimal histogram boundaries (Jagadish et al., VLDB 1998): partition
    * `nFine` equi-width base bins into `nBuckets` contiguous buckets
    * minimizing the total within-bucket SSE of the frequency vector — the
    * bucketing a cost-based optimizer wants for selectivity estimation,
    * where equi-width over-smooths skew and equi-depth over-spends buckets
    * on flat regions.
    *
    * Scale shape: ONE corpus aggregation into ≤ `nFine` (bin, count) rows;
    * the O(nBuckets·nFine²) dynamic program runs on driver-side exact
    * prefix sums — constant work, never data-sized. Determinism: interval
    * SSEs derive from exact long prefix sums through one pinned double
    * expression micro-quantized to longs; the DP compares longs with
    * smallest-split tie-break, so both engines pick identical boundaries.
    *
    * Returns `nBuckets − 1` rows `(k, boundary_bin, total_sse)`: bucket k
    * ends after base bin `boundary_bin` (1-based); `total_sse` repeats the
    * optimal objective. */
  def vOptimalBoundaries(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, nFine: Int, nBuckets: Int): DataFrame = {
    require(nFine >= 2 && nFine <= 64, "vOptimal: nFine in [2, 64]")
    require(nBuckets >= 2 && nBuckets <= nFine, "vOptimal: 2 <= nBuckets <= nFine")
    require(hi > lo, "vOptimal: hi > lo")
    val spark = df.sparkSession
    import spark.implicits._
    val width = (hi - lo) / nFine
    val counted = df.filter(col(valueCol).isNotNull)
      .groupBy(least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)),
        lit(0)), lit(nFine - 1)).cast("int").as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // bounded from here: exact long prefix sums over nFine bins
    val v = Array.tabulate(nFine)(i => counted.getOrElse(i, 0L))
    val p = new Array[Long](nFine + 1)
    val q = new Array[Long](nFine + 1)
    var i0 = 1
    while (i0 <= nFine) {
      p(i0) = p(i0 - 1) + v(i0 - 1)
      q(i0) = q(i0 - 1) + v(i0 - 1) * v(i0 - 1)
      i0 += 1
    }
    // micro-quantized SSE of base bins a..b (1-based, inclusive)
    def costQ(a: Int, b: Int): Long = {
      val s = (p(b) - p(a - 1)).toDouble
      val ss = (q(b) - q(a - 1)).toDouble
      val len = (b - a + 1).toDouble
      math.floor((ss - s * s / len) * 1e6 + 0.5).toLong
    }
    val e = Array.fill(nBuckets + 1, nFine + 1)(Long.MaxValue)
    val arg = Array.fill(nBuckets + 1, nFine + 1)(-1)
    for (i <- 1 to nFine) e(1)(i) = costQ(1, i)
    for (k <- 2 to nBuckets; i <- k to nFine) {
      var best = Long.MaxValue
      var bj = -1
      var j = k - 1
      while (j < i) {
        val c = e(k - 1)(j) + costQ(j + 1, i)
        if (c < best) { best = c; bj = j } // ascending j: ties keep smallest
        j += 1
      }
      e(k)(i) = best
      arg(k)(i) = bj
    }
    val bounds = new Array[Int](nBuckets - 1)
    var bi = nFine
    var bk = nBuckets
    while (bk >= 2) {
      val j = arg(bk)(bi)
      bounds(bk - 2) = j
      bi = j
      bk -= 1
    }
    val total = e(nBuckets)(nFine).toDouble / 1e6
    bounds.zipWithIndex
      .map { case (b, idx) => (idx + 1, b, total) }
      .toSeq.toDF("k", "boundary_bin", "total_sse")
  }
}
