package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import graft.checks.BaseCheck
import graft.core.{CacheObject, MetricResult}

/** Orchestrator — parity target `DQManager`
  * (`/root/reference/src/pyspark_data_quality/dq_manager.py:20-50`).
  *
  * Deviation D3: the cache is per-manager (the reference's process-wide
  * singleton leaks `"df_count"` and the cached DataFrames across managers —
  * bug B7).
  */
final class DQManager(val spark: SparkSession, val dataset: String = "") {
  val cacheObj: CacheObject = new CacheObject
  private val checks = ArrayBuffer.empty[BaseCheck]
  private var originalDf: Option[DataFrame] = None

  def addCheck(check: BaseCheck): this.type = {
    check.cacheObj = cacheObj // injection, `dq_manager.py:28-30`
    checks += check
    this
  }

  def setData(df: DataFrame): this.type = { originalDf = Some(df); this }

  /** Identity hook for future pre-check transforms (`dq_manager.py:33`). */
  protected def transform(df: DataFrame): DataFrame = df

  /** Purely lazy — no Spark action (`dq_manager.py:32-47`). */
  def run(): ResultObj = {
    val orig = originalDf.getOrElse(throw new IllegalStateException("data not set"))
    val transformed = transform(orig)
    cacheObj.set("dq_manager_original_df", orig)
    cacheObj.set("dq_manager_transformed_df", transformed)
    new ResultObj(checks.toList, transformed, spark)
  }
}

/** Result facade — parity target `ResultObj` (`result_obj.py:32-70`).
  *
  * Spark-native improvement (SURVEY.md §4 O1): [[getMetricResults]] fuses
  * every fusable check's aggregate expressions into ONE job (one scan of the
  * input), instead of the reference's one-or-more jobs per check; and
  * [[observedValidDf]] attaches the same aggregates as observed metrics
  * (`CollectMetrics`) so the job that materializes `valid_df` ALSO yields the
  * metrics — zero extra scans.
  */
final class ResultObj(
    val checks: List[BaseCheck],
    val df: DataFrame,
    val spark: SparkSession
) {

  /** Fold of all checks' valid filters — intersection (AND) semantics
    * (`result_obj.py:44-50`). */
  def getValidDf: DataFrame =
    checks.foldLeft(df)((d, c) => c.getValidDf(d))

  /** Fold of all checks' invalid filters (`result_obj.py:52-58`). Works
    * across checks because every default `invalid` here is schema-preserving
    * (deviation D2 fixes reference bug B4). */
  def getInvalidDf: DataFrame =
    checks.foldLeft(df)((d, c) => c.getInvalidDf(d))

  /** Per-check invalid rows as ONE schema-preserving union, each row tagged
    * with the failing check's metric name (`__graft_failed_check`). This is
    * the D2 companion to the fold: the fold composes filters (rows invalid
    * under check 1 never reach check 2's invalid set), while this union
    * attributes every row to every check it violates — the shape a
    * quarantine/repair pipeline wants. One scan per check; Catalyst merges
    * the scans when the source supports it. */
  def getInvalidUnionDf(tagCol: String = "__graft_failed_check"): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val tagged = checks.map(c => c.invalid(df).withColumn(tagCol, lit(c.metricName)))
    tagged.reduceLeft(_.unionByName(_))
  }

  /** All checks' metric rows. Checks whose metrics are plain aggregates are
    * fused into a single aggregation job over one scan; checks needing their
    * own plan (e.g. cross-dataset joins) run standalone. */
  def metricRows: Seq[MetricResult] = {
    val (fusable, standalone) = checks.partition(_.metricAggs(df).nonEmpty)
    val fused: Seq[MetricResult] =
      if (fusable.isEmpty) Seq.empty
      else {
        val aggs = fusable.flatMap(_.metricAggs(df))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        fusable.flatMap(_.metricsFromRow(row))
      }
    fused ++ standalone.flatMap(_.metricResults(df))
  }

  /** Reference-shaped path: one (or more) jobs per check. Kept for parity
    * comparison and benchmarking against the fused path. */
  def metricRowsPerCheck: Seq[MetricResult] =
    checks.flatMap(_.metricResults(df))

  /** Metrics as a DataFrame with the exact reference schema
    * (`result_obj.py:60-70`); empty input → empty DF with same schema. */
  def getMetricResults: DataFrame = MetricResult.toDF(spark, metricRows)

  /** Zero-extra-scan path: returns the folded valid DataFrame with all
    * fusable checks' metrics attached as observed metrics, plus a decoder to
    * call AFTER the caller runs an action on the returned frame. The single
    * job that writes/collects `valid_df` then also produces the metrics
    * (idiomatic Catalyst `CollectMetrics`; uses HLL++ for distinct counts
    * since observe forbids distinct aggregates). */
  def observedValidDf(name: String = "graft_dq"): (DataFrame, () => Seq[MetricResult]) = {
    val fusable = checks.filter(_.observableAggs(df).nonEmpty)
    if (fusable.isEmpty) (getValidDf, () => Seq.empty)
    else {
      val obs = Observation(name)
      val aggs = fusable.flatMap(_.observableAggs(df))
      val observed = df.observe(obs, aggs.head, aggs.tail: _*)
      val validDf = checks.foldLeft(observed)((d, c) => c.valid(d))
      (validDf, () => {
        val m = obs.get
        val keys = m.keys.toSeq
        val schema = org.apache.spark.sql.types.StructType(
          keys.map(k =>
            org.apache.spark.sql.types.StructField(k, org.apache.spark.sql.types.NullType)))
        val r = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          keys.map(m(_).asInstanceOf[Any]).toArray, schema)
        fusable.flatMap(_.metricsFromRow(r))
      })
    }
  }
}
