package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the benchmark tables (TESTDATA.md layout): one parquet
  * per table under a scale-factor directory.
  *
  * Centralizes the two real-world source gotchas:
  *  - `events.ts` has shipped as BOTH INT64 TIMESTAMP(NANOS) (early fixture
  *    vintages; Spark 4 refuses it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, set by [[withGraftConf]],
  *    after which it surfaces as bigint nanos) and TIMESTAMP(MICROS)
  *    (current vintage; surfaces as TIMESTAMP_NTZ). The library's contract
  *    is BIGINT EPOCH NANOS — [[load]] normalizes whichever vintage is on
  *    disk to that, so every downstream operator and every DuckDB oracle
  *    (which reads the same instants via `epoch_ns(ts)`) sees identical
  *    values. The NTZ wall time is interpreted in UTC (the session timezone
  *    [[withGraftConf]] pins), matching DuckDB's timezone-naive read.
  *  - a single compacted parquet file reads as ONE partition; CPU-heavy
  *    consumers should repartition (the dedup/similarity operators do this
  *    themselves).
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTsNanos(df) else df
  }

  /** `ts` → bigint epoch nanos regardless of the on-disk vintage. */
  private def normalizeTsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // nanosAsLong vintage: already bigint nanos
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Events with an optional decoded `ts_ts` timestamp column next to the
    * raw bigint nanos `ts`. */
  def events(spark: SparkSession, dir: String, decodeTs: Boolean = false): DataFrame = {
    val df = load(spark, dir, "events")
    if (decodeTs) df.withColumn("ts_ts", graft.streaming.StreamingDQ.nanosToTs(col("ts")))
    else df
  }

  /** Session configs this library's sources need; apply on the builder. */
  def withGraftConf(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
}
