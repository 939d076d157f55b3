package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shapley-value marketing attribution over a bounded channel set.
  *
  * The coalition game: each converting user contributes their conversion
  * revenue to `v(S)` iff every channel that ever touched them lies inside
  * the coalition `S` (the standard "removed channels remove the
  * conversion" counterfactual). With `n` channels there are only `2ⁿ`
  * coalitions, so after ONE corpus aggregation into per-user
  * (mask, cents) rows and ONE ≤2ⁿ-row mask rollup, the Shapley sum is
  * exact integer driver arithmetic — the 100 TB cost is two keyed
  * aggregations, never a per-coalition scan.
  *
  * Determinism: revenue is exact cents (`floor(value·100 + 0.5)` longs),
  * coalition values and the factorial-weighted marginal sums are exact
  * Long arithmetic, and the single closing division
  * `num / n! / 100` is one pinned double expression per channel. */
object Shapley {

  /** Per-channel Shapley attribution. Returns one row per channel:
    * `(channel, shapley)` with `shapley` in currency units (dollars). */
  def channelAttribution(events: DataFrame, userCol: String, typeCol: String,
      valueCol: String, channels: Seq[String], conversionType: String): DataFrame = {
    val n = channels.size
    require(n >= 1 && n <= 8,
      "channelAttribution supports 1..8 channels (2^n coalitions)")
    require(channels.distinct.size == n, "duplicate channels")
    require(!channels.contains(conversionType),
      "conversionType cannot also be a channel")
    val spark = events.sparkSession
    import spark.implicits._

    val cents = sum(when(col(typeCol) === conversionType,
      floor(col(valueCol) * 100 + lit(0.5)).cast("long")).otherwise(0L)).as("cents")
    val maskCol = channels.zipWithIndex.map { case (c, i) =>
      max(when(col(typeCol) === c, lit(1L << i)).otherwise(0L))
    }.reduce(_ + _).as("mask")
    // bounded from here: <= 2^n (mask, cents) rows
    val byMask = events.filter(col(userCol).isNotNull)
      .groupBy(col(userCol)).agg(cents, maskCol)
      .filter(col("cents") > 0)
      .groupBy("mask").agg(sum("cents").as("c"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap

    def v(s: Int): Long =
      byMask.iterator.collect { case (m, c) if (m & ~s) == 0 => c }.sum
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)

    val rows = channels.zipWithIndex.map { case (ch, ci) =>
      val bit = 1 << ci
      // BigInt accumulator: with n=8 the weight sum is n! = 40320, so a
      // plain Long would silently wrap once total cents exceed ~2.3e14
      // (driver Scala arithmetic gets no ANSI overflow guard) — the exact
      // value survives any corpus; only the closing division is double.
      var num = BigInt(0)
      val others = (0 until (1 << n)).filter(s => (s & bit) == 0)
      others.foreach { s =>
        val size = Integer.bitCount(s)
        num += BigInt(fact(size)) * fact(n - 1 - size) * (v(s | bit) - v(s))
      }
      // close mirrors the oracle's `num::DOUBLE / n! / 100` division order
      (ch, num.toDouble / fact(n).toDouble / 100.0)
    }
    rows.toDF("channel", "shapley")
  }
}
