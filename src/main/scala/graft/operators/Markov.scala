package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov-chain analytics over keyed event sequences — the
  * journey model behind session analysis (where does a user flow next,
  * what's the steady-state mix, how predictable is the stream).
  *
  * Scale split: the corpus-sized work is ONE keyed lead window plus a
  * (src, dst) pair count — the only shuffles, both key-partitioned. The
  * resulting transition matrix is |states|²-bounded (event vocabularies are
  * small by construction), so it collects to the driver and the power
  * iteration / entropy arithmetic is O(steps·|states|²) driver math — the
  * same bounded-model shape as [[graft.ml.Covariance]]. Determinism: states
  * are sorted, P is derived from exact integer counts, and the fixed-step
  * evolution runs in a pinned loop order an oracle replays as unrolled SQL
  * CTEs (fixed iteration count, no convergence test).
  */
object Markov {

  /** `(src, dst, n)` transition counts of `stateCol` along each key's
    * `orderCols` sequence. Null keys and null states are dropped; the lead
    * window never crosses keys. */
  def transitionCounts(df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df.filter(col(keyCol).isNotNull)
      .withColumn("__nxt", lead(col(stateCol), 1).over(w))
      .filter(col("__nxt").isNotNull && col(stateCol).isNotNull)
      .groupBy(col(stateCol).as("src"), col("__nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** Collect a bounded count frame into `(sorted states, row-stochastic P)`.
    * P(i)(j) = n(i→j) / Σⱼn(i→j); rows with no outgoing mass stay zero
    * (absorbing states leak mass identically in any replaying engine, so no
    * special-casing). Driver bytes are |states|² — never corpus-sized. */
  def collectChain(counts: DataFrame): (Array[String], Array[Array[Double]]) = {
    val pairs = counts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val nOut = pairs.groupBy(_._1).map { case (s0, ps) => s0 -> ps.map(_._3).sum }
    val p = Array.ofDim[Double](states.length, states.length)
    pairs.foreach { case (a, b, n) => p(idx(a))(idx(b)) = n.toDouble / nOut(a) }
    (states, p)
  }

  /** `v₀ = uniform`, exactly `steps` left-multiplications `v ← vP` in pinned
    * loop order — the fixed-step distribution evolution both Markov queries
    * share (and the DuckDB oracles unroll). */
  def evolveUniform(p: Array[Array[Double]], steps: Int): Array[Double] = {
    val n = p.length
    var v = Array.fill(n)(1.0 / n)
    for (_ <- 1 to steps)
      v = Array.tabulate(n) { j =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += v(i) * p(i)(j); i += 1 }
        acc
      }
    v
  }

  /** Entropy rate `Σᵢ v(i)·H(row i)` with `H(row) = Σⱼ −p·ln p` — the
    * predictability of the stream under the `steps`-evolved distribution.
    * Summation order is pinned (ascending state index, matching the
    * oracle's replay). */
  def entropyRate(p: Array[Array[Double]], v: Array[Double]): Double =
    p.indices.map { i =>
      val hi = p.indices.map { j =>
        if (p(i)(j) > 0) -p(i)(j) * math.log(p(i)(j)) else 0.0 }.sum
      v(i) * hi
    }.sum
}
