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

  /** Hilbert-curve index of two non-negative int columns on a
    * `2^order × 2^order` grid — the locality-tighter alternative to
    * [[zValue]] for multi-column data layout (consecutive indices are
    * always grid-adjacent, so a file of consecutive indices covers one
    * connected blob instead of Z's jumpy quadrant seams; Delta/Iceberg
    * expose the same choice as OPTIMIZE ZORDER vs Hilbert clustering).
    *
    * Canonical xy→d accumulation with the quadrant rotation unrolled once
    * per order level (Wikipedia "Hilbert curve", public-domain algorithm;
    * the reflection uses the full grid size `n−1` so every intermediate
    * stays in `[0, 2^order)` — no negative bit-ops). Each level is
    * materialized as its own projection (not substituted inline), so the
    * expression stays O(order) and runs in scan codegen. Pure integer
    * arithmetic — bit-identical in any engine.
    *
    * Returns `df` with `out` = the Hilbert distance (a long in
    * `[0, 4^order)`). */
  def withHilbert(df: DataFrame, xCol: String, yCol: String, order: Int,
      out: String): DataFrame = {
    import org.apache.spark.sql.functions._
    require(order >= 1 && order <= 21, "withHilbert: order in [1, 21]")
    val full = 1L << order
    var cur = df
      .withColumn("__hx", col(xCol).cast("long").bitwiseAND(lit(full - 1)))
      .withColumn("__hy", col(yCol).cast("long").bitwiseAND(lit(full - 1)))
      .withColumn("__hd", lit(0L))
    var k = order - 1
    while (k >= 0) {
      val s = 1L << k
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
      cur = cur
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(full - 1) - col("__hy"))
              .otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(full - 1) - col("__hx"))
              .otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
      k -= 1
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** The DuckDB mirror of [[withHilbert]]: chained CTEs `r0/l0 … r{k}/l{k}`
    * replaying the identical per-level integer updates over a relation
    * `inputRel` exposing columns `x` and `y` (plus any carried columns in
    * `carry`). The final CTE is named `hil` and exposes `carry..., hd`. */
  def hilbertSqlCtes(inputRel: String, order: Int, carry: Seq[String]): String = {
    require(order >= 1 && order <= 21, "hilbertSqlCtes: order in [1, 21]")
    val full = 1L << order
    val cols = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    val init = s"""h_init AS (SELECT $cols
                  |    (x::BIGINT & ${full - 1}) AS hx,
                  |    (y::BIGINT & ${full - 1}) AS hy, 0::BIGINT AS hd
                  |  FROM $inputRel)""".stripMargin
    val levels = (order - 1 to 0 by -1).zipWithIndex.map { case (k, idx) =>
      val s = 1L << k
      val prev = if (idx == 0) "h_init" else s"l${idx - 1}"
      s"""r$idx AS (SELECT $cols hx, hy, hd,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry FROM $prev),
         |l$idx AS (SELECT $cols
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${full - 1} - hy ELSE hy END ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${full - 1} - hx ELSE hx END ELSE hy END AS hy,
         |    hd + ${s * s} * xor(3 * rx, ry) AS hd FROM r$idx)""".stripMargin
    }
    val last = s"l${order - 1}"
    (Seq(init) ++ levels :+ s"hil AS (SELECT $cols hd FROM $last)")
      .mkString(",\n")
  }
}
