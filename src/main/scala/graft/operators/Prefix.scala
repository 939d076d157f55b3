package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running (prefix) sums over a totally-ordered axis.
  *
  * `sum(x).over(Window.orderBy(k))` with no partition key collapses the
  * whole relation into ONE task — fine on five rows, a straggler on a
  * 100 TB batch axis. This is the two-sweep partition prefix-scan
  * discipline of [[TimeSeries.resampleLocf]] applied to exact long sums:
  * range-partition + sort once, sweep 1 reduces each partition to its
  * local column sums (#partitions rows to the driver — bounded by the
  * shuffle-partition count, NOT the data), the driver prefix-scans those
  * into per-partition carry-in offsets, and sweep 2 streams every
  * partition once, adding its carry. Long addition is associative and
  * exact, so the result is bit-identical to the single-partition window
  * for any range split. The sort shuffle is written once and reused by
  * both sweeps (same lineage).
  */
object Prefix {

  /** Appends running-total columns `outNames` (running sums of the
    * LongType columns `valueCols`, ordered by `orderCol`, current row
    * inclusive). Contract: `orderCol` values are distinct (a grouped
    * axis) and `valueCols` are non-null LongType. */
  def cumSumLongs(df: DataFrame, orderCol: String, valueCols: Seq[String],
      outNames: Seq[String]): DataFrame = {
    require(valueCols.length == outNames.length,
      s"valueCols(${valueCols.length}) != outNames(${outNames.length})")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema
    val vIdx = valueCols.map { c =>
      val i = schema.fieldIndex(c)
      require(schema(i).dataType == LongType,
        s"cumSumLongs needs LongType, got ${schema(i).dataType} for $c")
      i
    }.toArray
    val rdd = sorted.rdd // capture ONCE: both sweeps share the sort shuffle
    // sweep 1: per-partition local sums (one row per partition)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val s = new Array[Long](vIdx.length)
      it.foreach { r =>
        var k = 0
        while (k < vIdx.length) { s(k) += r.getLong(vIdx(k)); k += 1 }
      }
      Iterator.single((i, s))
    }.collect().sortBy(_._1)
    // driver prefix-scan: carry-in for partition p = Σ sums of partitions < p
    val nParts = partSums.length
    val carry = Array.ofDim[Long](math.max(nParts, 1), vIdx.length)
    for (p <- 1 until nParts; k <- vIdx.indices)
      carry(p)(k) = carry(p - 1)(k) + partSums(p - 1)._2(k)
    val outSchema = StructType(schema.fields ++
      outNames.map(n => StructField(n, LongType, nullable = false)))
    // sweep 2: stream each partition once with its carry as initial state
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val run = carry(i).clone()
      it.map { r =>
        var k = 0
        while (k < vIdx.length) { run(k) += r.getLong(vIdx(k)); k += 1 }
        Row.fromSeq(r.toSeq ++ run.toList)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
