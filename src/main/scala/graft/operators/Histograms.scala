package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimizer-grade histogram construction. */
object Histograms {

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
