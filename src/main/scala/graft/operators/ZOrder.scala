package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of two scan dimensions so that sorting by ONE derived key makes
  * file/row-group min-max ranges compact rectangles in BOTH dimensions.
  * A linear sort on x gives perfect pruning on x and ZERO pruning on y;
  * the z-order gives ~sqrt-fraction pruning on each — the difference
  * between scanning 100 TB and scanning ~1 TB for a 1% two-dimensional
  * selection (ZOrderSpec measures exactly this on real file footers).
  *
  * `zValue` is pure bit algebra over builtin codegen expressions
  * (shift/and/sum of 2·bits terms, one whole-stage-codegen projection, no
  * UDF), and is reproduced term-for-term by the `q_zorder` DuckDB oracle.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative longs:
    * bit j of x lands at position 2j, bit j of y at 2j+1. Bijective on
    * `[0,2^bits)²` (bit positions are disjoint), monotone in each
    * argument along grid lines — the property that makes min/max ranges
    * of contiguous z-runs compact in both x and y. `bits <= 31` keeps
    * the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits)
      .map { j =>
        shiftleft(shiftright(xl, j).bitwiseAND(lit(1L)), 2 * j) +
          shiftleft(shiftright(yl, j).bitwiseAND(lit(1L)), 2 * j + 1)
      }
      .reduce(_ + _)
  }

  /** Range-partition and sort `df` by the z-value of `(xCol, yCol)` —
    * the write-side layout step. `numFiles` range partitions give
    * `numFiles` output files whose footer min/max on BOTH columns are
    * compact (each file covers a contiguous z-run = a small rectangle
    * union); readers then skip files/row-groups by min-max on either
    * dimension. One range-exchange (sampled bounds), in-partition sort,
    * no global sort bottleneck — the same shape Spark uses for any
    * `orderBy` write, so it holds at 1000 executors.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
