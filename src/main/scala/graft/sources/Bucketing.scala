package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket keys runs with ZERO
  * exchanges (Spark reads each bucket as one partition already hashed by
  * key). This is the canonical way to amortize the biggest shuffle of a
  * 100 TB pipeline across all downstream queries.
  *
  * The reference has no sinks at all (SURVEY.md §2b: results are returned
  * as DataFrames); bucketing is the one write-side feature the engine adds
  * because it changes READ-side plans.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwrites). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket keys — planner emits a
    * SortMergeJoin with NO ShuffleExchange on either side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Write `df` hive-partitioned by `partitionCols` — the layout that turns
    * a partition-key predicate into directory pruning: a filtered read lists
    * only matching directories (`PartitionFilters` in the scan, zero I/O for
    * the rest). Partition by LOW-cardinality, always-filtered columns
    * (date, source, language); high-cardinality keys belong in
    * [[writeBucketed]] instead — millions of tiny directories are their own
    * bottleneck. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
