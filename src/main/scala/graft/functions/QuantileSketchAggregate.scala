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

  private val gamma = (1 + alpha) / (1 - alpha)
  private val lnGamma = math.log(gamma)

  private def bucketOf(x: Double): Int = math.ceil(math.log(x) / lnGamma).toInt
  private def midpoint(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1)

  override def zero: DDSketchBuf = DDSketchBuf(Map.empty, 0L, Map.empty)

  override def reduce(b: DDSketchBuf, in: Option[Double]): DDSketchBuf = in match {
    case Some(x) if !x.isNaN =>
      if (x > 0) {
        val i = bucketOf(x)
        b.copy(pos = b.pos.updated(i, b.pos.getOrElse(i, 0L) + 1))
      } else if (x < 0) {
        val i = bucketOf(-x)
        b.copy(neg = b.neg.updated(i, b.neg.getOrElse(i, 0L) + 1))
      } else b.copy(zero = b.zero + 1)
    case _ => b
  }

  override def merge(a: DDSketchBuf, b: DDSketchBuf): DDSketchBuf = {
    def add(x: Map[Int, Long], y: Map[Int, Long]): Map[Int, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    DDSketchBuf(add(a.neg, b.neg), a.zero + b.zero, add(a.pos, b.pos))
  }

  override def finish(b: DDSketchBuf): Seq[Double] = {
    val n = b.neg.valuesIterator.sum + b.zero + b.pos.valuesIterator.sum
    if (n == 0L) return Seq.empty
    // ascending value order: most-negative first (neg buckets by DESC
    // index), then zero, then positives by ASC index
    val ordered: Iterator[(Double, Long)] =
      b.neg.toSeq.sortBy(-_._1).iterator.map { case (i, c) => (-midpoint(i), c) } ++
        (if (b.zero > 0) Iterator((0.0, b.zero)) else Iterator.empty) ++
        b.pos.toSeq.sortBy(_._1).iterator.map { case (i, c) => (midpoint(i), c) }
    val cum = ordered.scanLeft((0.0, 0L)) { case ((_, acc), (v, c)) => (v, acc + c) }
      .drop(1).toIndexedSeq
    probs.map { p =>
      val r = math.max(1L, math.ceil(p * n).toLong) // quantile_disc rank
      cum.find(_._2 >= r).map(_._1).getOrElse(cum.last._1)
    }
  }

  override def bufferEncoder: Encoder[DDSketchBuf] = Encoders.product[DDSketchBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
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
