package graft.checks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core._

/** Cross-dataset referential-consistency check: every scoped row's key must
  * exist in a reference dataset (FK ⊆ PK).
  *
  * Completes the reference's promised-but-unwritten consistency dimension
  * (`/root/reference/src/pyspark_data_quality/core/_enums.py:14`,
  * `README.md:194`).
  *
  * `valid` = left-semi join against the reference keys; `invalid` = left-anti
  * join (orphans); metric = orphan ratio — all schema-preserving, so the
  * manager's fold still works.
  *
  * Scale: the joins shuffle on the key unless the distinct reference-key set
  * is small — it is projected to key columns + `distinct()` first, so AQE
  * converts to broadcast whenever the dim fits; for a genuinely large
  * reference, both sides hash-partition on the key (co-partitioned, no
  * nested loop). Metrics can't be expressed as a row-local aggregate, so
  * this check is NOT fused ([[metricAggs]] empty) and runs one join job.
  */
final class ConsistencyCheck(
    dataset: String,
    runId: String,
    severityLevel: SeverityLevel,
    metricName: String,
    /** FK columns in the checked dataset */
    inputAttributes: Seq[String],
    /** reference (dimension) dataset */
    val refDf: DataFrame,
    /** PK columns in `refDf`, positionally matched to `inputAttributes` */
    val refCols: Seq[String],
    /** max allowed orphan ratio (0.0 = strict FK) */
    threshold: Double = 0.0,
    scope: Scope = NoScope
) extends BaseCheck(dataset, runId, severityLevel, metricName, inputAttributes, threshold, scope) {

  require(inputAttributes.nonEmpty && inputAttributes.length == refCols.length,
    "inputAttributes and refCols must be non-empty and same length")

  val checkType: String = "consistency"
  val dimension: Dimension = Dimension.Consistency

  /** Distinct reference keys renamed to the FK names — small, broadcastable. */
  private def refKeys: DataFrame =
    refDf.select(refCols.zip(inputAttributes).map { case (r, f) => col(r).as(f) }: _*).distinct()

  override def valid(d: DataFrame, cols: Seq[String]): DataFrame = {
    preCheck(d)
    d.filter(scopeCol(d)).join(refKeys, inputAttributes, "left_semi")
  }

  override def invalid(d: DataFrame, cols: Seq[String]): DataFrame = {
    preCheck(d)
    d.filter(scopeCol(d)).join(refKeys, inputAttributes, "left_anti")
  }

  override def metricAggs(d: DataFrame): Seq[Column] = Seq.empty

  override def metricsFromRow(row: Row): Seq[MetricResult] = Seq.empty

  /** One job: anti-join count + scoped count via a single pass over a
    * left-outer membership flag. */
  override def metricResults(d: DataFrame): Seq[MetricResult] = {
    preCheck(d)
    val marked = d.filter(scopeCol(d))
      .join(refKeys.withColumn("__graft_ref_hit", lit(1)), inputAttributes, "left_outer")
    val row = marked.agg(
      count(lit(1)).as("total"),
      count(when(col("__graft_ref_hit").isNull, 1)).as("orphans")
    ).head()
    val total = row.getAs[Long]("total")
    val orphans = row.getAs[Long]("orphans")
    val ratio = if (total == 0) 0.0 else orphans.toDouble / total.toDouble
    val ok = ratio <= threshold
    val msg =
      if (ok) s"${inputAttributes.mkString(",")} orphan ratio ${pct(ratio)} <= ${pct(threshold)}"
      else s"${inputAttributes.mkString(",")} orphan ratio ${pct(ratio)} > ${pct(threshold)}"
    Seq(mkMetric(
      column = inputAttributes.mkString(","),
      value = Some(ratio),
      message = msg,
      thresholdResult = ratio,
      extra = Map("orphan_count" -> orphans.toString, "total_count" -> total.toString)
    ))
  }
}
