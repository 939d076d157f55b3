package graft.checks

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Row}
import graft.core._

/** Check contract + memoizing base class.
  *
  * Mirrors the reference's `AbstractCheck`/`BaseCheck`
  * (`/root/reference/src/pyspark_data_quality/checks/base_check.py:10-120`):
  * `valid`/`invalid` row splits, memoized `get_valid_df`/`get_invalid_df`,
  * cached whole-table `df_count`, and eager `metric_results`.
  *
  * Spark-native improvement over the reference (SURVEY.md §4 O1): every check
  * exposes its metric computation as a list of **aggregate Columns**
  * ([[metricAggs]]) plus a row decoder ([[metricsFromRow]]). This lets
  * [[graft.ResultObj]] fuse all checks' metrics into a SINGLE aggregation job
  * (one scan instead of one-job-per-check), or ride them along the
  * `valid_df` materialization via `df.observe(...)` (`CollectMetrics`) so one
  * scan yields both the row split and the metrics. The reference runs one or
  * more full-scan jobs per check (`completeness_col_ratio_check.py:110`,
  * `completeness_raw_check.py:95-96`).
  *
  * Scope semantics: the user-supplied [[graft.core.Scope]] predicate is ANDed
  * into every computation; inside aggregates it becomes
  * `agg(when(scope, expr))` so the fused job needs no pre-filter — Catalyst
  * still collapses and pushes plain filters when the per-check job path is
  * used.
  */
abstract class BaseCheck(
    val dataset: String,
    val runId: String,
    val severityLevel: SeverityLevel,
    val metricName: String,
    val inputAttributes: Seq[String],
    val threshold: Double,
    val scope: Scope
) extends Serializable {

  /** D4: evaluated per instance at construction (reference bug B6 evaluates a
    * shared default at import time, `completeness_col_ratio_check.py:46`). */
  val runTs: Timestamp = new Timestamp(System.currentTimeMillis())

  def checkType: String
  def dimension: Dimension

  // --- cache wiring (injected by DQManager.addCheck, `dq_manager.py:28-30`) ---
  private var _cache: Option[CacheObject] = None
  def cacheObj: CacheObject =
    _cache.getOrElse(throw new IllegalStateException("Cache object is not set"))
  def cacheObj_=(c: CacheObject): Unit = _cache = Some(c)

  // --- df + memoization (mirrors base_check.py:43-120) ---
  private var _df: Option[DataFrame] = None
  private var _validDf: Option[DataFrame] = None
  private var _invalidDf: Option[DataFrame] = None

  def df: DataFrame =
    _df.getOrElse(throw new IllegalStateException("DataFrame is not set"))
  def df_=(d: DataFrame): Unit = _df = Some(d)

  /** Cached whole-table count, shared across checks of one manager via the
    * per-manager cache (key `"df_count"`, `base_check.py:62-68`; D3). */
  def dfCount: Long =
    cacheObj.getOrElseUpdate("df_count", df.count()).asInstanceOf[Long]

  def getValidDf(d: DataFrame): DataFrame = {
    _df = Some(d)
    _validDf match {
      case Some(v) => v
      case None =>
        val v = valid(d, inputAttributes)
        _validDf = Some(v); v
    }
  }

  def getInvalidDf(d: DataFrame): DataFrame = {
    _df = Some(d)
    _invalidDf match {
      case Some(v) => v
      case None =>
        val v = invalid(d, inputAttributes)
        _invalidDf = Some(v); v
    }
  }

  // --- column validation (`_pre_check`) ---
  protected def preCheck(d: DataFrame, cols: Seq[String] = inputAttributes): Unit = {
    val missing = cols.filterNot(d.columns.contains)
    if (missing.nonEmpty)
      throw new ColumnNotFoundException(s"Columns not found: ${missing.mkString("[", ", ", "]")}")
  }

  protected def scopeCol(d: DataFrame): Column = scope.toColumn(d)

  // --- the check surface ---
  def valid(d: DataFrame, cols: Seq[String]): DataFrame
  def invalid(d: DataFrame, cols: Seq[String]): DataFrame
  def valid(d: DataFrame): DataFrame = valid(d, inputAttributes)
  def invalid(d: DataFrame): DataFrame = invalid(d, inputAttributes)

  // --- metrics ---
  /** Aggregate expressions (uniquely aliased with [[aggAlias]]) whose single
    * output row, decoded by [[metricsFromRow]], yields this check's metrics.
    * Empty ⇒ the check computes metrics its own way (override
    * [[metricResults]]); such checks are skipped by the fused path and run
    * standalone. */
  def metricAggs(d: DataFrame): Seq[Column]

  /** Variant safe for `df.observe`/`CollectMetrics` (no distinct aggregates
    * allowed there); defaults to [[metricAggs]]. */
  def observableAggs(d: DataFrame): Seq[Column] = metricAggs(d)

  def metricsFromRow(row: Row): Seq[MetricResult]

  protected def aggAlias(suffix: String): String = s"${metricName}__$suffix"

  /** Eager per-check metrics job (reference shape, one aggregation pass). */
  def metricResults(d: DataFrame): Seq[MetricResult] = {
    preCheck(d)
    val aggs = metricAggs(d)
    if (aggs.isEmpty) Seq.empty
    else metricsFromRow(d.agg(aggs.head, aggs.tail: _*).head())
  }

  def metricResults(): Seq[MetricResult] = metricResults(df)

  // --- shared helpers for metric-row assembly ---
  protected def statusOf(ok: Boolean): CheckStatus =
    if (ok) CheckStatus.Success else CheckStatus.Failure

  protected def pct(v: Double): String = f"${v * 100}%.2f%%"

  protected def baseExtra: Map[String, String] =
    Map("condition" -> scope.describe)

  protected def mkMetric(
      column: String,
      value: Option[Double],
      message: String,
      thresholdResult: Double,
      extra: Map[String, String] = Map.empty
  ): MetricResult = {
    val now = new Timestamp(System.currentTimeMillis())
    MetricResult(
      dataset = dataset,
      runId = runId,
      runTs = now,
      metricName = metricName,
      column = column,
      dimension = dimension.value,
      severityLevel = severityLevel.value,
      thresholdResult = Some(thresholdResult),
      thresholdRange = None,
      threshold = Some(threshold),
      valueDouble = value,
      valueString = Some(message),
      ingestDatetime = now,
      extraInfo = baseExtra ++ extra
    )
  }
}
