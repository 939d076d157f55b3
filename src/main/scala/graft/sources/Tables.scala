package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed loaders for the benchmark tables (TESTDATA.md layout): one parquet
  * per table under a scale-factor directory.
  *
  * Centralizes the two real-world source gotchas:
  *  - `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS); Spark 4
  *    refuses it unless `spark.sql.legacy.parquet.nanosAsLong=true` (set by
  *    [[withGraftConf]] / the Verify/Bench/test sessions), after which `ts`
  *    surfaces as bigint nanos — [[events]] can also attach a proper
  *    timestamp column via exact decimal division.
  *  - a single compacted parquet file reads as ONE partition; CPU-heavy
  *    consumers should repartition (the dedup/similarity operators do this
  *    themselves).
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$dir/$name.parquet")
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
