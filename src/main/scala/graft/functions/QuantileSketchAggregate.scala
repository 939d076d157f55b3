package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial-mergeable quantile sketch as a typed `Aggregator` — the
  * "custom sketch → Aggregator" slot of SURVEY §2c. The sketch is a
  * DDSketch (Masson/Rim/Lee, VLDB 2019): fixed log-γ buckets with
  * `γ = (1+α)/(1−α)`, so any stored value's bucket midpoint is within
  * relative error α of the value itself, and the p-quantile read off the
  * cumulated bucket counts is within α·|q| of the true (discrete)
  * quantile `q`.
  *
  * Chosen over KLL/t-digest deliberately: those compact by random
  * sampling / order-dependent centroid merging, so shard merge order
  * changes the result. DDSketch's merge is BUCKET-COUNT ADDITION —
  * commutative, associative, deterministic — which means
  * `merge(shard sketches) ≡ single-pass sketch` EXACTLY (spec-asserted,
  * not within-eps), and results are bit-stable under any partitioning:
  * the property every other exact-deterministic operator in this engine
  * holds. Buckets are NOT collapsed: the map size is bounded by
  * `log_γ(maxAbs/minAbs)` (≈2100 buckets for α=0.01 over 18 decades),
  * not by corpus size, and collapsing would reintroduce order
  * sensitivity.
  *
  * Aggregation state is three bucket-count maps (negative mirror, zero,
  * positive); `finish` walks them in value order and returns the
  * estimates for `probs` at rank `ceil(p·n)` (DuckDB's `quantile_disc`
  * convention, so oracles can mirror rank selection). Null inputs are
  * ignored (SQL aggregate semantics); NaN inputs are ignored too (they
  * have no place on a quantile axis). Empty input → empty result array.
  */
final case class DDSketchBuf(neg: Map[Int, Long], zero: Long, pos: Map[Int, Long])

class DDSketchQuantiles(alpha: Double, probs: Seq[Double])
    extends Aggregator[Option[Double], DDSketchBuf, Seq[Double]] {
  require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
  require(probs.forall(p => p >= 0 && p <= 1), "probs must be in [0,1]")

  override def zero: DDSketchBuf = DDSketchBuf(Map.empty, 0L, Map.empty)

  private val lnGamma = math.log(DdSketchAlgebra.gammaOf(alpha))

  override def reduce(b: DDSketchBuf, in: Option[Double]): DDSketchBuf = in match {
    case Some(x) => DdSketchAlgebra.update(b, x, lnGamma)
    case _ => b
  }

  override def merge(a: DDSketchBuf, b: DDSketchBuf): DDSketchBuf =
    DdSketchAlgebra.merge(a, b)

  override def finish(b: DDSketchBuf): Seq[Double] =
    DdSketchAlgebra.quantiles(b, probs, alpha)

  override def bufferEncoder: Encoder[DDSketchBuf] = Encoders.product[DDSketchBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** The bucket-count algebra shared by [[DDSketchQuantiles]] and the
  * streaming processor
  * ([[graft.streaming.StreamingQuantiles.runningGroupQuantilesDD]]).
  * Because DDSketch merge is plain bucket-count addition, a sketch built
  * from any micro-batch split of a stream equals the single-pass batch
  * sketch EXACTLY — batch and streaming quantile reads are bit-identical
  * doubles (spec-asserted), unlike the order-dependent GK path. */
object DdSketchAlgebra {
  def gammaOf(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  private def bucketOf(x: Double, lnGamma: Double): Int =
    math.ceil(math.log(x) / lnGamma).toInt

  private def midpoint(i: Int, gamma: Double): Double =
    2.0 * math.pow(gamma, i) / (gamma + 1)

  /** one observation; NaN ignored (no place on a quantile axis).
    * `lnGamma` = `math.log(gammaOf(alpha))`, hoisted by callers out of
    * their per-row loop. */
  def update(b: DDSketchBuf, x: Double, lnGamma: Double): DDSketchBuf = {
    if (x.isNaN) return b
    if (x > 0) {
      val i = bucketOf(x, lnGamma)
      b.copy(pos = b.pos.updated(i, b.pos.getOrElse(i, 0L) + 1))
    } else if (x < 0) {
      val i = bucketOf(-x, lnGamma)
      b.copy(neg = b.neg.updated(i, b.neg.getOrElse(i, 0L) + 1))
    } else b.copy(zero = b.zero + 1)
  }

  /** bucket-count addition — commutative, associative, deterministic */
  def merge(a: DDSketchBuf, b: DDSketchBuf): DDSketchBuf = {
    def add(x: Map[Int, Long], y: Map[Int, Long]): Map[Int, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    DDSketchBuf(add(a.neg, b.neg), a.zero + b.zero, add(a.pos, b.pos))
  }

  def totalCount(b: DDSketchBuf): Long =
    b.neg.valuesIterator.sum + b.zero + b.pos.valuesIterator.sum

  /** estimates for `probs` at rank `ceil(p·n)` (`quantile_disc` rank
    * convention); empty sketch → empty result */
  def quantiles(b: DDSketchBuf, probs: Seq[Double], alpha: Double): Seq[Double] = {
    val gamma = gammaOf(alpha)
    val n = totalCount(b)
    if (n == 0L) return Seq.empty
    // ascending value order: most-negative first (neg buckets by DESC
    // index), then zero, then positives by ASC index
    val ordered: Iterator[(Double, Long)] =
      b.neg.toSeq.sortBy(-_._1).iterator.map { case (i, c) => (-midpoint(i, gamma), c) } ++
        (if (b.zero > 0) Iterator((0.0, b.zero)) else Iterator.empty) ++
        b.pos.toSeq.sortBy(_._1).iterator.map { case (i, c) => (midpoint(i, gamma), c) }
    val cum = ordered.scanLeft((0.0, 0L)) { case ((_, acc), (v, c)) => (v, acc + c) }
      .drop(1).toIndexedSeq
    probs.map { p =>
      val r = math.max(1L, math.ceil(p * n).toLong) // quantile_disc rank
      cum.find(_._2 >= r).map(_._1).getOrElse(cum.last._1)
    }
  }
}

object DDSketchQuantiles {
  /** Column form: `dd_quantiles(x)` → `array<double>` of estimates for
    * `probs`, usable in any `agg`/`groupBy` with map-side partials. */
  def columnFn(alpha: Double, probs: Seq[Double])(x: Column): Column = {
    implicit val inEnc: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
    udaf(new DDSketchQuantiles(alpha, probs)).apply(x)
  }
}
