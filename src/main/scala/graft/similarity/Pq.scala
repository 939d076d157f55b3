package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
  * compressed-vector half of the canonical billion-scale ANN stack
  * (IVF routes, PQ compresses; [[Ivf]] is the routing half).
  *
  * The vector space is split into `m` contiguous subspaces of `dim/m`
  * coordinates; each subspace gets its own `k`-centroid codebook, and a
  * vector's code is the per-subspace nearest centroid — `m·log₂k` bits
  * instead of `dim` floats (64 float dims → 8 nibbles here).
  *
  * Determinism discipline (the [[Ivf.trainCentroidsQuantized]] recipe,
  * with L2 instead of dot): vectors quantize to exact `floor(x·1e6)`
  * longs; training runs on a bounded ordered sample entirely on the
  * driver with integer Lloyd steps (L2 argmin, ties to the smaller code,
  * `floorDiv` centroid means, empty codes keep their centroid), so the
  * codebook is a pure function of the data that plain SQL replays; and
  * assignment is one row-local codegen'd expression per subspace —
  * `argmin_c Σ_d (v_d − c_d)²` over exact longs (≤ 3·10¹³, exact in
  * double too, so engines agree bit-for-bit). Codes scale
  * embarrassingly: no shuffle, no join, the codebook rides the closure.
  */
object Pq {

  /** Train per-subspace codebooks on the first `sampleSize` vectors by
    * id: `codebooks(sub)(code)(d)` quantized longs. */
  def trainCodebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int = 4,
      sampleSize: Int = 512
  ): Array[Array[Array[Long]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val sample: Array[Array[Long]] = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(x => math.floor(x.toDouble * 1e6).toLong))
    require(sample.length >= k, s"sample ${sample.length} < k $k")
    Array.tabulate(m) { sub =>
      val off = sub * subDim
      val sv = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      var centroids =
        Array.tabulate(k)(c => sv((c * sv.length) / k).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Long](subDim))
        val counts = new Array[Int](k)
        sv.foreach { v =>
          var best = 0; var bestDist = Long.MaxValue; var c = 0
          while (c < k) {
            var dist = 0L; var d = 0
            val cv = centroids(c)
            while (d < subDim) {
              val dd = v(d) - cv(d); dist += dd * dd; d += 1
            }
            if (dist < bestDist) { bestDist = dist; best = c } // strict <: first min wins
            c += 1
          }
          counts(best) += 1
          var d = 0
          while (d < subDim) { sums(best)(d) += v(d); d += 1 }
        }
        centroids = Array.tabulate(k) { c =>
          if (counts(c) == 0) centroids(c) // empty code keeps its centroid
          else sums(c).map(s => Math.floorDiv(s, counts(c).toLong))
        }
        it += 1
      }
      centroids
    }
  }

  private def q6(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0)))

  /** Row-local L2² of a quantized subvector against one codebook row. */
  private def subDist(subVec: Column, cv: Array[Long]): Column =
    aggregate(zip_with(subVec, typedLit(cv.toSeq),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)

  /** Assign PQ codes: for each input vector, one row per subspace with
    * the nearest code and its exact squared quantization error.
    * Returns `(id, sub, code, err_q)`. */
  def pqCodes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int = 4,
      sampleSize: Int = 512
  ): DataFrame = {
    val codebooks = trainCodebooks(df, idCol, vecCol, dim, m, k, iters, sampleSize)
    val subDim = dim / m
    val qv = q6(col(vecCol))
    // per subspace: lexicographic struct-min over (dist, code) — the
    // tie-break to the smaller code is part of the total order
    val perSub = codebooks.toIndexedSeq.zipWithIndex.map { case (book, sub) =>
      val sv = slice(qv, sub * subDim + 1, subDim)
      val cands = array(book.toIndexedSeq.zipWithIndex.map { case (cv, c) =>
        struct(subDist(sv, cv).as("d"), lit(c).as("c"))
      }: _*)
      val best = array_min(cands)
      struct(best.getField("c").as("code"), best.getField("d").as("err_q"))
    }
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("id"), posexplode(array(perSub: _*)).as(Seq("sub", "best")))
      .select(col("id"), col("sub"), col("best.code").as("code"),
        col("best.err_q").as("err_q"))
  }
}
