package graft.core

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One data-quality metric row.
  *
  * Mirrors the reference's pydantic `MetricResult`
  * (`/root/reference/src/pyspark_data_quality/core/models.py:6-20`) and the
  * fixed output `StructType` (`result_obj.py:15-30`). Field order and
  * nullability of [[MetricResult.schema]] are kept identical to the reference
  * so downstream consumers see the exact same metrics table.
  */
final case class MetricResult(
    dataset: String,
    runId: String,
    runTs: Timestamp,
    metricName: String,
    column: String,
    dimension: String,
    severityLevel: String,
    thresholdResult: Option[Double] = Some(0.0),
    thresholdRange: Option[Double] = None,
    threshold: Option[Double] = None,
    valueDouble: Option[Double] = None,
    valueString: Option[String] = None,
    ingestDatetime: Timestamp = new Timestamp(System.currentTimeMillis()),
    extraInfo: Map[String, String] = Map.empty
) {
  /** Row in the exact field order of [[MetricResult.schema]]. */
  def toRow: Row = Row(
    dataset,
    runId,
    runTs,
    metricName,
    column,
    dimension,
    severityLevel,
    thresholdResult.map(Double.box).orNull,
    thresholdRange.map(Double.box).orNull,
    threshold.map(Double.box).orNull,
    valueDouble.map(Double.box).orNull,
    valueString.orNull,
    ingestDatetime,
    if (extraInfo == null) null else extraInfo
  )
}

object MetricResult {
  /** Exact twin of the reference schema (`result_obj.py:15-30`). */
  val schema: StructType = StructType(Seq(
    StructField("dataset", StringType, nullable = false),
    StructField("run_id", StringType, nullable = false),
    StructField("run_ts", TimestampType, nullable = false),
    StructField("metric_name", StringType, nullable = false),
    StructField("column", StringType, nullable = false),
    StructField("dimension", StringType, nullable = false),
    StructField("severity_level", StringType, nullable = false),
    StructField("threshold_result", DoubleType, nullable = true),
    StructField("threshold_range", DoubleType, nullable = true),
    StructField("threshold", DoubleType, nullable = true),
    StructField("value_double", DoubleType, nullable = true),
    StructField("value_string", StringType, nullable = true),
    StructField("ingest_datetime", TimestampType, nullable = false),
    StructField("extra_info", MapType(StringType, StringType), nullable = true)
  ))

  /** Materialize metric rows as a DataFrame with the fixed schema; the empty
    * case mirrors the reference's `emptyRDD` + schema path
    * (`result_obj.py:69-70`).
    */
  def toDF(spark: SparkSession, rows: Seq[MetricResult]): DataFrame =
    spark.createDataFrame(rows.map(_.toRow).asJava, schema)
}
