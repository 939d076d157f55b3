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
    // deterministic sample order: numeric ids sort exactly as before (the
    // oracle's ORDER BY id); non-castable ids (try_cast -> null) fall back
    // to string order instead of throwing under ANSI
    val sample: Array[Array[Long]] = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).try_cast("long").as("id"),
        col(idCol).cast("string").as("ids"), col(vecCol).as("v"))
      .orderBy("id", "ids").limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](2).toArray.map(x => math.floor(x.toDouble * 1e6).toLong))
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

  private[similarity] def q6(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0)))

  /** Row-local L2² of a quantized subvector against one codebook row. */
  private def subDist(subVec: Column, cv: Array[Long]): Column =
    aggregate(zip_with(subVec, typedLit(cv.toSeq),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)

  /** Row-local nearest-code assignment against trained codebooks. One
    * row per (vector, subspace): the codebook rides as a single literal
    * nested array and the k-candidate argmin is ONE generated loop
    * (`transform` with index + lexicographic struct-min, ties to the
    * smaller code) — not k·m unrolled expressions, which was measured to
    * blow whole-stage codegen up to 9 s at sf0.1 before this shape. */
  private def assignCodes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      codebooks: Array[Array[Array[Long]]]
  ): DataFrame = {
    val subDim = dim / m
    val qv = q6(col(vecCol))
    val subArrays = array((0 until m).map(sub =>
      slice(qv, sub * subDim + 1, subDim)): _*)
    val books3d = typedLit(codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    val cands = transform(element_at(books3d, col("sub") + 1),
      (cb, c) => struct(
        aggregate(zip_with(col("sv"), cb, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        c.as("c")))
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("id"), posexplode(subArrays).as(Seq("sub", "sv")))
      .withColumn("best", array_min(cands))
      .select(col("id"), col("sub"), col("best.c").as("code"),
        col("best.d").as("err_q"))
  }

  /** WIDE row-local code assignment — the codes a disk index stores: ONE
    * `array<int>` of `m` nearest-code ids per vector, same integer-exact
    * L2 argmin and smaller-code tie rule as [[assignCodes]] (lexicographic
    * struct-min), but with no explode and no shuffle: the codebook rides
    * as one literal nested array and the whole assignment is a single
    * nested-HOF expression in the scan's projection. */
  private[similarity] def codesArray(
      vec: Column,
      dim: Int,
      m: Int,
      codebooks: Array[Array[Array[Long]]]
  ): Column = {
    val subDim = dim / m
    val qv = q6(vec)
    val books3d = typedLit(codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
    zip_with(
      array((0 until m).map(sub => slice(qv, sub * subDim + 1, subDim)): _*),
      sequence(lit(0), lit(m - 1)),
      (sv, sub) => array_min(transform(element_at(books3d, sub + 1),
        (cb, c) => struct(
          aggregate(zip_with(sv, cb, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"),
          c.as("c")))).getField("c").cast("int"))
  }

  /** Per-query ADC lookup table as one array column: `m·k` structs
    * `(sub, code, lut_dist)` of exact subspace L2²s against every
    * codebook entry — explode + join on `(sub, code)` downstream. */
  private[similarity] def lutStructs(
      vec: Column,
      dim: Int,
      m: Int,
      codebooks: Array[Array[Array[Long]]]
  ): Column = {
    val subDim = dim / m
    val qv = q6(vec)
    val entries = (0 until m).flatMap { sub =>
      val sv = slice(qv, sub * subDim + 1, subDim)
      codebooks(sub).toIndexedSeq.zipWithIndex.map { case (cv, c) =>
        struct(lit(sub).as("sub"), lit(c).as("code"), subDist(sv, cv).as("lut_dist"))
      }
    }
    array(entries: _*)
  }

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
    assignCodes(df, idCol, vecCol, dim, m, codebooks)
  }

  /** PQ top-k search with asymmetric distance computation (ADC — Jégou
    * et al. §IV): the corpus is represented ONLY by its `m`-byte codes;
    * each query precomputes an `m×k` lookup table of exact subspace
    * distances to every codebook entry, and a candidate's approximate
    * L2² is the sum of `m` table lookups — the corpus' raw vectors are
    * never read again after encoding. That is the 100 TB contract: at
    * scale you store 8 bytes per vector instead of 256, and search joins
    * the (tiny) LUT frame to the code frame on `(sub, code)` — a
    * broadcast join against O(queries·m·k) rows, followed by one keyed
    * sum per (query, vector). All distances are exact longs (quantized
    * inputs, integer codebooks), so ranking is total-ordered
    * (dist asc, neighbor asc) and fully oracle-replayable.
    *
    * Returns `(query_id, rank, neighbor_id, adc_dist)` with `rank ≤ k`
    * per query. */
  def pqAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      kCodes: Int,
      topK: Int,
      iters: Int = 4,
      sampleSize: Int = 512
  ): DataFrame = {
    val codebooks = trainCodebooks(corpus, idCol, vecCol, dim, m, kCodes,
      iters, sampleSize)
    val subDim = dim / m
    // corpus side: m-byte codes only (the compressed representation);
    // trained ONCE, shared with the query LUT below
    val codes = assignCodes(corpus, idCol, vecCol, dim, m, codebooks)
      .select(col("id").as("neighbor_id"), col("sub"), col("code"))
    // query side: LUT rows (query_id, sub, code, lut_dist) — m·k per query
    val qv = q6(col(vecCol))
    val lutEntries = (0 until m).flatMap { sub =>
      val sv = slice(qv, sub * subDim + 1, subDim)
      codebooks(sub).toIndexedSeq.zipWithIndex.map { case (cv, c) =>
        struct(lit(sub).as("sub"), lit(c).as("code"),
          subDist(sv, cv).as("lut_dist"))
      }
    }
    val lut = queries.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("query_id"), explode(array(lutEntries: _*)).as("e"))
      .select(col("query_id"), col("e.sub").as("sub"), col("e.code").as("code"),
        col("e.lut_dist").as("lut_dist"))
    // ADC: join codes to the broadcast LUT, sum the m lookups per pair
    val dists = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("lut_dist").as("adc_dist"), count(lit(1)).as("__m"))
      .filter(col("__m") === m) // all m subspaces present (self rows dropped)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    dists.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }

  /** IVF-PQ: the full billion-scale ANN stack in one operator (Jégou et
    * al. §V — "IVFADC"). The IVF coarse quantizer ([[Ivf
    * .trainCentroidsQuantized]], integer-exact dot assignment) routes
    * every corpus vector to one of `nLists` inverted lists; queries probe
    * their `nProbe` best lists; and within the probed candidates the
    * ranking is PQ-ADC — m LUT lookups per candidate over the 8-byte
    * codes, never the raw vectors. Cost per query: `nProbe/nLists` of the
    * corpus × m integer adds, plus one m×k LUT build. Both trainers are
    * bounded-sample driver loops and both assignments are row-local, so
    * the whole operator carries a full SQL oracle.
    *
    * Returns `(query_id, rank, neighbor_id, adc_dist)`, `rank ≤ topK`. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nLists: Int = 16,
      nProbe: Int = 6,
      ivfIters: Int = 8,
      m: Int = 8,
      kCodes: Int = 16,
      pqIters: Int = 4,
      topK: Int = 5,
      ivfSample: Int = 2048,
      pqSample: Int = 512
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists)
    val coarse = Ivf.trainCentroidsQuantized(corpus, idCol, vecCol, nLists,
      ivfIters, ivfSample)
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, kCodes,
      pqIters, pqSample)
    val subDim = dim / m
    val scores = Ivf.centroidScoresLong(col("qv6"), coarse)
    // corpus: one list id per vector (integer-exact dot argmax, first max)
    val lists = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .withColumn("qv6", Ivf.q6(col("v")))
      .withColumn("list_id", (array_position(scores, array_max(scores)) - 1).cast("int"))
      .select("neighbor_id", "list_id")
    val codes = assignCodes(corpus, idCol, vecCol, dim, m, books)
      .select(col("id").as("neighbor_id"), col("sub"), col("code"))
      .join(lists, "neighbor_id")
    // queries: nProbe best lists (ties to the HIGHER centroid index, the
    // ivfTopKExact convention) + the ADC LUT
    val probeIdx = slice(
      reverse(array_sort(zip_with(scores,
        sequence(lit(0), lit(nLists - 1)),
        (s, i) => struct(s.as("s"), i.as("i"))))),
      1, nProbe)
    val qBase = queries.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
    val probes = qBase
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qv6", Ivf.q6(col("qv")))
      .withColumn("__p", explode(probeIdx))
      .select(col("query_id"), col("__p.i").cast("int").as("list_id"))
    val qv = q6(col(vecCol))
    val lutEntries = (0 until m).flatMap { sub =>
      val sv = slice(qv, sub * subDim + 1, subDim)
      books(sub).toIndexedSeq.zipWithIndex.map { case (cv, c) =>
        struct(lit(sub).as("sub"), lit(c).as("code"), subDist(sv, cv).as("lut_dist"))
      }
    }
    val lut = qBase
      .select(col(idCol).as("query_id"), explode(array(lutEntries: _*)).as("e"))
      .select(col("query_id"), col("e.sub").as("sub"), col("e.code").as("code"),
        col("e.lut_dist").as("lut_dist"))
    val dists = codes.join(broadcast(probes), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("lut_dist").as("adc_dist"), count(lit(1)).as("__m"))
      .filter(col("__m") === m)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    dists.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
  }

  /** ADC shortlist → EXACT re-rank (Jégou et al. §VI, "IVFADC-R"): the
    * 32-bit codes alone rank coarsely (measured recall@5 = 0.26 at the
    * shipped m=8/k=16 — `RecallFloorSpec`), so production stacks re-rank
    * an ADC SHORTLIST of `shortlist` candidates with exact distances.
    * The raw vectors are read for only |queries|·shortlist rows — the
    * corpus-wide pass still touches codes only, which is the entire point
    * of PQ — and the re-rank join is broadcast-sized by construction.
    * Recall@5 ladder (sf0.01): 0.82 / 0.94 / 0.98 at shortlist
    * 50 / 100 / 150; the shipped query uses 100 (spec floor 0.90).
    *
    * Exact metric: cosine (the [[Similarity.bruteForceTopK]] twin — the
    * corpus embeddings are unit-norm, so L2 and cosine rank identically
    * and the oracle mirrors with `list_cosine_similarity`). Returns
    * `(query_id, rank, neighbor_id, cosine)`, `rank ≤ topK`. */
  /** IVF-PQ → ADC shortlist → EXACT re-rank: the full IVFADC-R stack
    * ([[ivfPqTopK]] routing+compression, [[pqAdcRerankTopK]] re-rank
    * discipline) in one in-memory operator — the verification twin of
    * [[AnnIndex.searchIndex]], which runs the IDENTICAL algebra against
    * an on-disk partitioned code store (equality spec-asserted). Cost per
    * query: nProbe/nLists of the corpus × m LUT adds for the shortlist,
    * then |queries|·shortlist raw-vector reads for the exact pass.
    * Returns `(query_id, rank, neighbor_id, cosine)`, `rank ≤ topK`. */
  def ivfPqRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nLists: Int = 16,
      nProbe: Int = 6,
      ivfIters: Int = 8,
      m: Int = 8,
      kCodes: Int = 16,
      pqIters: Int = 4,
      topK: Int = 5,
      shortlist: Int = 100,
      ivfSample: Int = 2048,
      pqSample: Int = 512
  ): DataFrame = {
    require(shortlist >= topK, s"shortlist=$shortlist < topK=$topK")
    val short = ivfPqTopK(corpus, queries, idCol, vecCol, dim, nLists, nProbe,
        ivfIters, m, kCodes, pqIters, shortlist, ivfSample, pqSample)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val exact = short
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.cosine_sim(col("__qv"), col("__nv")).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("c").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cosine"))
  }

  def pqAdcRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      kCodes: Int,
      topK: Int,
      shortlist: Int = 50,
      iters: Int = 4,
      sampleSize: Int = 512
  ): DataFrame = {
    require(shortlist >= topK, s"shortlist=$shortlist < topK=$topK")
    val short = pqAdcTopK(corpus, queries, idCol, vecCol, dim, m, kCodes,
        shortlist, iters, sampleSize)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val exact = short
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.cosine_sim(col("__qv"), col("__nv")).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("c").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("c"), 6).as("cosine"))
  }
}
