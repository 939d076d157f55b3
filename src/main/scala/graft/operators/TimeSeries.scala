package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an event-keyed frame into a dense,
  * fixed-step series — the resample step every downstream forecast/anomaly
  * model assumes.
  *
  * The dense axis is built from the observed [min, max] period bounds (one
  * tiny aggregate + `sequence` explode — no driver round-trip, no
  * `generate_series` table function), so the plan stays a pure DataFrame
  * graph. The fill is last-observation-carried-forward via
  * `last(ignoreNulls)` over a running frame — one window pass, no
  * self-joins, and per-key ordering means the window streams each key's
  * rows once.
  */
object TimeSeries {

  /** Dense per-period frame over `[min(periodCol), max(periodCol)]` with
    * step 1, left-joined with the observed rows; missing periods carry
    * null `valueCols`. Input must have ≤1 row per period (aggregate
    * first). */
  def densify(df: DataFrame, periodCol: String): DataFrame = {
    val bounds = df.agg(min(col(periodCol)).as("__lo"), max(col(periodCol)).as("__hi"))
    val axis = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as(periodCol))
    axis.join(df, Seq(periodCol), "left")
  }

  /** [[densify]] + LOCF: gaps are filled with the most recent observed
    * value of each `valueCols` entry, and `filled` flags synthesized rows.
    * Leading gaps (before the first observation) stay null. */
  def resampleLocf(df: DataFrame, periodCol: String,
      valueCols: Seq[String]): DataFrame = {
    val dense = densify(df, periodCol)
      .withColumn("filled", col(valueCols.head).isNull)
    val w = Window.orderBy(periodCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(dense) { (d, v) =>
      d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }

  /** Per-key variant of [[resampleLocf]]: the dense axis spans each key's
    * own observed bounds, and the LOCF window is partitioned by key (the
    * scale shape — one keyed shuffle, each key's series streamed once). */
  def resampleLocfByKey(df: DataFrame, keyCol: String, periodCol: String,
      valueCols: Seq[String]): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(periodCol)).as("__lo"), max(col(periodCol)).as("__hi"))
    val axis = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(periodCol))
    val dense = axis.join(df, Seq(keyCol, periodCol), "left")
      .withColumn("filled", col(valueCols.head).isNull)
    val w = Window.partitionBy(keyCol).orderBy(periodCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(dense) { (d, v) =>
      d.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }
}
