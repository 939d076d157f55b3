package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction (Vovk et al.; Papadopoulos et al. 2002 —
  * the distribution-free way to turn any point predictor into a
  * coverage-guaranteed interval): take the nonconformity scores
  * (|y − ŷ| residuals) of a held-out CALIBRATION split, set
  * `q̂ = r_(k)` with `k = ⌈(n_cal + 1)(1 − α)⌉`, and predict
  * `ŷ ± q̂` — on exchangeable data the test-set coverage is ≥ 1 − α by
  * construction, whatever the model. */
object Conformal {

  /** One-row conformal audit `(n_cal, n_test, qhat, coverage)`:
    * the conformal quantile from the `isCalib` slice and the achieved
    * coverage `P[resid ≤ q̂]` on the rest.
    *
    * Scale shape: `q̂` is a single exact order statistic — distributed
    * sort + rank selection on the calibration slice (the
    * [[Profiler.exactPercentiles]] shape: only the one boundary row
    * leaves the executors, never the data); the coverage pass is one
    * map-side-combined aggregate. Determinism: `q̂` is a selected data
    * value (no interpolation), so the DuckDB oracle's
    * `ORDER BY … LIMIT 1 OFFSET k−1` reproduces it exactly. */
  def splitConformal(df: DataFrame, residCol: String, isCalib: Column,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val r = df.select(col(residCol).cast("double").as("__r"),
        isCalib.cast("boolean").as("__cal"))
      .filter(col("__r").isNotNull && col("__cal").isNotNull)
    val cal = r.filter(col("__cal")).select("__r")
    val nCal = cal.count()
    require(nCal > 0, "empty calibration split")
    val k = math.min(nCal, math.ceil((nCal + 1) * (1.0 - alpha)).toLong)
    val qhat = cal.orderBy("__r").queryExecution.toRdd
      .map(_.getDouble(0)).zipWithIndex()
      .filter { case (_, i) => i == k - 1 }
      .map(_._1).first()
    r.filter(!col("__cal"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= qhat, 1L).otherwise(0L)).as("__cov"))
      .select(lit(nCal).as("n_cal"), col("n_test"),
        round(lit(qhat), 6).as("qhat"),
        round(col("__cov").cast("double") / col("n_test"), 6).as("coverage"))
  }
}
