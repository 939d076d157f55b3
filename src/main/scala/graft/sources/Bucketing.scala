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

  /** 42-bit Morton (Z-order) value of two non-negative int columns: the
    * low 21 bits of each input, bit-interleaved via the classic
    * magic-number spread — pure integer Column arithmetic, runs in the
    * scan's codegen. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def spread(c: org.apache.spark.sql.Column) = {
      // interleave-ready form: insert a 0 bit between every bit of the
      // low-21-bit input (standard Morton bit spreading)
      val x0 = c.cast("long").bitwiseAND(lit(0x1FFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
      x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered write: range-partition + sort by the Morton value of two
    * filter columns, so every output file covers a small RECTANGLE in
    * (colA, colB) space instead of a thin slice of one column. Parquet
    * min/max row-group stats on BOTH columns then prune a two-dimensional
    * box predicate to a handful of files — the data-layout lever (Delta
    * OPTIMIZE ZORDER BY, Iceberg sort orders) for multi-column selective
    * scans at 100 TB, expressed with stock Spark:
    * `repartitionByRange(z) + sortWithinPartitions(z)`. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
