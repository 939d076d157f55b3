package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distributed, oracle-reproducible classical-ML operators for corpus
  * curation: a multinomial Naive Bayes text classifier (the standard cheap
  * language/quality/domain scorer run over every document before training a
  * real model — the fastText-classifier slot of an LLM-data pipeline) and a
  * k-nearest-neighbor majority-vote classifier over the embedding table.
  *
  * Both are pure DataFrame compositions — training IS an aggregation, so the
  * "model" is a small DataFrame joined back against the scoring set. No
  * driver-side learning loop, no mutable state: the shapes that survive
  * 100 TB are (token, label) count tables (bounded by vocabulary, not corpus)
  * and broadcast query sets.
  */
object Classify {

  /** Whitespace tokens, empty-free — the corpus-wide convention shared with
    * [[graft.text.TextAnalysis.tokens]] so DuckDB oracles mirror it with
    * `regexp_extract_all(trim(text), '\S+')`. No case folding: locale-free,
    * byte-exact across engines. */
  private def toks(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Multinomial Naive Bayes with add-one (Laplace) smoothing, trained and
    * scored in one job. Train rows are `filter(isTrain)`, every other row is
    * scored; the label with the highest posterior wins.
    *
    * With α = 1 the per-label score telescopes to
    * {{{ score(d, l) = ln(n_l / n_train)                       // log prior
    *                 + Σ_{t ∈ d, cnt(t,l)>0} c_t · ln(cnt(t,l) + 1)
    *                 - |d| · ln(tot_l + |V|)                   // normalizer }}}
    * because unseen-token contributions `c_t · ln(α) = 0` vanish — so the
    * scoring join touches ONLY (token, label) pairs observed in training.
    *
    * Distributed shape: training is one groupBy((label, token)) count — the
    * model is that count table, bounded by |V|·|labels|, NOT corpus size, so
    * AQE broadcasts it into the scoring join. Scoring is one groupBy on the
    * test tokens plus a labels×docs grid from a broadcast of the (tiny)
    * per-label stats. Two shuffles total, both map-side combinable; nothing
    * driver-side. Argmax ranks on `round(score, 6)` (ties → smaller label)
    * so the winner is reproducible bit-for-bit by any engine that rounds
    * half-up — the same determinism contract the rest of the engine uses.
    *
    * Returns one row per scored doc:
    * `(id, <labelCol> true label, pred label, score rounded 6)`.
    */
  def naiveBayesScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      isTrain: Column
  ): DataFrame = {
    val base = docs.select(
      col(idCol).as("__id"), col(labelCol).as("__lbl"),
      toks(col(textCol)).as("__tk"), isTrain.as("__tr"))
    val train = base.filter(col("__tr"))
    val test = base.filter(!col("__tr"))

    // the model: (label, token) -> count. Reused three times (likelihoods,
    // per-label totals, vocabulary), so persist the one aggregation. The
    // cache is CALLER-OWNED: the returned frame is corpus-sized so it can't
    // be eagerly materialized here; long-lived sessions release it after
    // consuming the result (the Verify/Bench runners clearCache per query).
    val cnt = train
      .select(col("__lbl"), explode(col("__tk")).as("__tok"))
      .groupBy("__lbl", "__tok").agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-label stats frame: one row per label — broadcast-sized by nature.
    // |V| and n_train ride along via one-row broadcast cross joins (the
    // engine's standard scalar-join idiom; no driver round trip).
    val tot = cnt.groupBy("__lbl").agg(sum("__c").as("__tot"))
    val vocab = cnt.agg(countDistinct(col("__tok")).as("__v"))
    val nTrain = train.agg(count(lit(1)).as("__n"))
    val priors = train.groupBy("__lbl").agg(count(lit(1)).as("__nd"))
    val labelStats = priors.join(tot, "__lbl")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nTrain))
      .select(col("__lbl"),
        (log(col("__nd")) - log(col("__n"))).as("__logprior"),
        log(col("__tot") + col("__v")).as("__lognorm"))

    // scoring: per-doc token counts join the model on the token key only —
    // the model side is vocabulary-bounded, so AQE turns this into a
    // broadcast join at any corpus scale.
    val testTok = test
      .select(col("__id"), explode(col("__tk")).as("__tok"))
      .groupBy("__id", "__tok").agg(count(lit(1)).as("__ct"))
    val seen = testTok.join(cnt, "__tok")
      .groupBy("__id", "__lbl")
      .agg(sum(col("__ct") * log(col("__c") + lit(1.0))).as("__sw"))

    val grid = test
      .select(col("__id"), col("__lbl").as("__true"), size(col("__tk")).as("__len"))
      .crossJoin(broadcast(labelStats))
    val scored = grid.join(seen, Seq("__id", "__lbl"), "left")
      .select(col("__id"), col("__true"), col("__lbl"),
        round(col("__logprior") + coalesce(col("__sw"), lit(0.0))
          - col("__len") * col("__lognorm"), 6).as("score"))

    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("__lbl").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__true").as(labelCol),
        col("__lbl").as("pred"), col("score"))
  }

  /** k-nearest-neighbor majority vote over an embedding column: queries are
    * `filter(isQuery)` rows, candidates are the rest; each query takes the
    * labels of its k nearest candidates by exact L2 distance (ties → smaller
    * id — the [[graft.similarity.Similarity.topKByKey]] heap contract) and
    * predicts the majority label (vote ties → smaller label).
    *
    * Scale shape is the proven ANN one: broadcast the query set, scan the
    * candidate corpus once, per-partition heap top-k BEFORE the shuffle so
    * only |queries|·k rows move; the vote is a |queries|·k-sized aggregate.
    *
    * Returns `(query_id, true_label, pred_label, n_votes)`.
    */
  def knnClassify(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      isQuery: Column,
      k: Int
  ): DataFrame = {
    val q = emb.filter(isQuery).select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("true_label"))
    val cand = emb.filter(!isQuery).select(
      col(idCol).as("__nid"), col(vecCol).as("__v"), col(labelCol).as("__nl"))
    val scored = cand
      .join(broadcast(q.select(col("query_id"), col("__qv"))), lit(true))
      .select(col("query_id"),
        // pack the neighbor label into the heap id (id * 2^20 + label) so a
        // single top-k pass carries both; a label outside [0, 2^20) or a
        // negative id would silently corrupt the heap ordering, so the
        // packing fails loudly instead (ADVICE r06)
        (when(col("__nl") >= 0 && col("__nl") < lit(1048576L) && col("__nid") >= 0,
          col("__nid") * lit(1048576L) + col("__nl"))
          .otherwise(raise_error(concat(
            lit("knnClassify packing out of range: id="), col("__nid").cast("string"),
            lit(" label="), col("__nl").cast("string"),
            lit(" (need id >= 0 and 0 <= label < 2^20)"))))).as("__packed"),
        (-graft.functions.l2_distance(col("__qv"), col("__v"))).as("__negd"))
    val topk = graft.similarity.Similarity
      .topKByKey(scored, "query_id", "__negd", "__packed", k)
      .select(col("query_id"),
        (col("__packed") % 1048576L).cast("int").as("__nl"))
    val votes = topk.groupBy("query_id", "__nl").agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("__nl").asc)
    votes.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .join(q.select("query_id", "true_label"), "query_id")
      .select(col("query_id"), col("true_label"),
        col("__nl").as("pred_label"), col("n_votes"))
  }
}

/** Single-pass second-moment accumulator for a fixed-dimension vector
  * column: n, per-dim sums, and the upper-triangular pairwise product sums —
  * everything a covariance / correlation / PCA step needs, in one mergeable
  * buffer of `1 + d + d(d+1)/2` LONGS. Each per-row contribution is
  * nano-quantized BEFORE the order-ambiguous sum —
  * `floor(x · 1e9 + 0.5).toLong` — so partial sums are exact integers and
  * merge order cannot change the result by an ulp (the repo's pinned
  * float-determinism contract; a DuckDB oracle replays the identical
  * quantization with `floor(x * 1e9 + 0.5)::BIGINT`). Merge is elementwise
  * long addition (commutative + associative + EXACT), so map-side partial
  * aggregation applies and the reduce moves ONE buffer per partition
  * regardless of corpus size — the only shape that survives 100 TB of
  * embeddings. Overflow bound: unit-norm embeddings have |xᵢ·xⱼ| ≤ 1, so a
  * cell stays under 2⁶³ up to ~9e9 rows; beyond that, shard by a coarse key
  * and merge the per-shard buffers as BigInt (the quantization stays exact).
  * Rows of the wrong dimension fail fast; null rows are ignored (SQL
  * aggregate semantics). */
class VectorMomentsAgg(d: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Long]] {
  require(d > 0, "dimension must be positive")
  private val len = 1 + d + d * (d + 1) / 2

  @inline private def q9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
    if (a == null) return b
    require(a.length == d, s"expected dimension $d, got ${a.length}")
    b(0) += 1L
    var i = 0
    while (i < d) { b(1 + i) += q9(a(i).toDouble); i += 1 }
    var k = 1 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { b(k) += q9(a(i).toDouble * a(j)); k += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Covariance {

  /** One [[VectorMomentsAgg]] pass → the raw `1 + d + d(d+1)/2` exact-long
    * buffer. O(d²) driver bytes regardless of corpus size. */
  private def momentsBuffer(emb: DataFrame, vecCol: String, d: Int): Array[Long] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(vecCol).cast("array<float>").as("v"))
      .agg(udaf(new VectorMomentsAgg(d)).apply(col("v")).as("m"))
      .as[Array[Long]]
      .head()
  }

  private def upperIdx(d: Int, i: Int, j: Int): Int =
    1 + d + (i * (2 * d - i + 1)) / 2 + (j - i)

  /** `Sᵢ/n/1e9` — the pinned mean derivation. The exact integer sums make
    * the double result identical in any engine that replays the same
    * left-associated expression. */
  @inline private def meanOf(buf: Array[Long], d: Int, i: Int): Double =
    buf(1 + i).toDouble / buf(0).toDouble / 1e9

  /** `Sᵢⱼ/n/1e9 − (Sᵢ/n/1e9)·(Sⱼ/n/1e9)` — the pinned covariance
    * derivation (oracle mirror: `sij / n / 1e9 - (si / n / 1e9) * (sj / n
    * / 1e9)` with all terms cast to DOUBLE). */
  @inline private def covOf(buf: Array[Long], d: Int, i: Int, j: Int): Double = {
    val n = buf(0).toDouble
    buf(upperIdx(d, i, j)).toDouble / n / 1e9 -
      (buf(1 + i).toDouble / n / 1e9) * (buf(1 + j).toDouble / n / 1e9)
  }

  /** Population covariance matrix of a vector column as tidy rows
    * `(i, j, cov)` for `i <= j` — the input a distributed PCA / whitening /
    * Mahalanobis step consumes. One pass over the data (the
    * [[VectorMomentsAgg]] buffer), then an O(d²) driver expansion of the
    * single aggregated buffer into rows — bounded by dimension², never by
    * corpus size. Bit-reproducible: the buffer is exact longs and the
    * derivation is the pinned [[covOf]] expression. */
  def covarianceMatrix(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val buf = momentsBuffer(emb, vecCol, d)
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield (i, j, covOf(buf, d, i, j))
    rows.toDF("i", "j", "cov")
  }

  /** Leading principal component by FIXED-ITERATION power iteration on the
    * covariance matrix — the PCA step a whitening / dim-reduction pipeline
    * runs before projecting a 100 TB embedding table. The data pass is the
    * same single moments aggregation as [[covarianceMatrix]]; the power
    * iteration is O(iters·d²) driver arithmetic on the d×d matrix, which at
    * any corpus scale is noise next to the scan.
    *
    * Determinism contract (every step replayable as unrolled SQL CTEs with
    * bit-identical doubles — no order-ambiguous float sums anywhere):
    * `v₀ = (1/d,…,1/d)` (1/d exact for d a power of two); each of the
    * `iters` mat-vec steps quantizes its summands to exact longs
    * (`uᵢ = Σⱼ floor(c(i,j)·v(j)·1e12 + 0.5)`) and then normalizes by the
    * exact integer `max |uᵢ|` so magnitudes never grow; one further
    * quantized mat-vec feeds the Rayleigh quotient
    * `eig = (A/B)·1000` with `A = Σ floor(vᵢ·uᵢ' + 0.5)`,
    * `B = Σ floor(vᵢ²·1e15 + 0.5)`; final loadings are
    * `vᵢ / sqrt(B/1e15)` with the sign fixed so the largest-|loading|
    * entry is positive (ties → smaller dim).
    *
    * Returns one row per dimension: `(dim, loading, eigval)`. */
  def principalComponent(emb: DataFrame, vecCol: String, d: Int, iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (loadings, eig) = topComponent(emb, vecCol, d, iters)
    loadings.zipWithIndex
      .map { case (l, i) => (i, l, eig) }
      .toSeq.toDF("dim", "loading", "eigval")
  }

  /** The loadings/eigenvalue pair behind [[principalComponent]], for
    * callers that fold the component back into a scan (projection,
    * whitening). Same determinism contract. */
  def topComponent(emb: DataFrame, vecCol: String, d: Int,
      iters: Int = 8): (Array[Double], Double) = {
    val buf = momentsBuffer(emb, vecCol, d)
    val c = Array.tabulate(d, d) { (i, j) =>
      if (i <= j) covOf(buf, d, i, j) else covOf(buf, d, j, i)
    }
    def quantMatVec(v: Array[Double]): Array[Long] =
      Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += math.floor(c(i)(j) * v(j) * 1e12 + 0.5).toLong; j += 1 }
        s
      }
    var v = Array.fill(d)(1.0 / d)
    for (_ <- 1 to iters) {
      val u = quantMatVec(v)
      val mx = u.map(math.abs).max
      require(mx > 0L, "power iteration collapsed to the zero vector")
      v = u.map(_.toDouble / mx.toDouble)
    }
    val u9 = quantMatVec(v)
    var aSum = 0L; var bSum = 0L
    var i = 0
    while (i < d) {
      aSum += math.floor(v(i) * u9(i).toDouble + 0.5).toLong
      bSum += math.floor(v(i) * v(i) * 1e15 + 0.5).toLong
      i += 1
    }
    val eig = aSum.toDouble / bSum.toDouble * 1000.0
    val norm = math.sqrt(bSum.toDouble / 1e15)
    val loadings = v.map(_ / norm)
    val m = loadings.zipWithIndex.maxBy { case (l, idx) => (math.abs(l), -idx) }._2
    val sign = if (loadings(m) < 0) -1.0 else 1.0
    (loadings.map(_ * sign), eig)
  }

  /** Project every vector onto the leading principal component — the 1-D
    * PCA coordinate used for sorting, binning, or coreset selection over
    * an embedding table. The component comes from [[topComponent]] (one
    * bounded stats job); the projection folds the d loadings into the scan
    * as literals, so the corpus pass is row-local with no join — the same
    * shape as [[embeddingOutliers]]. The per-row dot product quantizes each
    * term to an exact long (`floor(xᵢ·lᵢ·1e9 + 0.5)`) so the fold order
    * can't move the result (oracle mirrors the identical quantized sum).
    * Returns `(idCol, proj)`. */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String, d: Int,
      iters: Int = 8): DataFrame = {
    val (loadings, _) = topComponent(emb, vecCol, d, iters)
    val lCol = array(loadings.map(lit).toIndexedSeq: _*)
    val projQ = aggregate(
      zip_with(col(vecCol).cast("array<double>"), lCol,
        (x, l) => floor(x * l * lit(1e9) + lit(0.5))),
      lit(0L), (acc, x) => acc + x)
    emb.select(col(idCol), (projQ.cast("double") / lit(1e9)).as("proj"))
  }

  /** Per-row diagonal-covariance Mahalanobis distance² over a vector
    * column — the cheap embedding-space outlier score (full-covariance
    * Mahalanobis needs a matrix inverse; with per-dim variances it
    * decomposes to `Σ_i (x_i − μ_i)² / σ²_i`, which is row-local once the
    * d per-dim stats are known). One bounded stats job (the same exact-long
    * moments buffer), then a single scan with the stats folded in as
    * literals — no join, no explode, no second shuffle: the 100 TB shape.
    * The per-row sum quantizes each term to an exact long
    * (`floor((xᵢ−μᵢ)²/σᵢ²·1e9 + 0.5)`) — fold-order-free, oracle-mirrored.
    *
    * Returns `(idCol, md2, is_outlier)` with `is_outlier = md2 > 2d`
    * (E[md2] = d for in-distribution rows). */
  def embeddingOutliers(emb: DataFrame, idCol: String, vecCol: String, d: Int): DataFrame = {
    val buf = momentsBuffer(emb, vecCol, d)
    val mu = Array.tabulate(d)(i => meanOf(buf, d, i))
    val s2 = Array.tabulate(d)(i => covOf(buf, d, i, i))
    val muCol = array(mu.map(lit).toIndexedSeq: _*)
    val s2Col = array(s2.map(lit).toIndexedSeq: _*)
    val diffs = zip_with(col(vecCol).cast("array<double>"), muCol, (x, m) => x - m)
    val md2q = aggregate(
      zip_with(diffs, s2Col, (dd, s) => floor(dd * dd / s * lit(1e9) + lit(0.5))),
      lit(0L), (acc, x) => acc + x)
    emb.select(col(idCol), (md2q.cast("double") / lit(1e9)).as("md2"))
      .select(col(idCol), col("md2"), (col("md2") > 2.0 * d).as("is_outlier"))
  }

  /** Two-sample Maximum Mean Discrepancy with the quadratic kernel
    * `k(u,v) = (u·v)²` — the embedding-space drift test. For this kernel
    * the MMD² collapses to moment statistics: `E_{x,x'}[(x·x')²] =
    * ‖E[xxᵀ]‖²_F`, so `MMD² = ‖M_a − M_b‖²_F` with `M = E[vvᵀ]` — NO
    * pairwise join, just one [[VectorMomentsAgg]] pass per sample and an
    * O(d²) driver reduction (Gretton et al., JMLR 2012, §2.2 with an
    * explicit finite feature map).
    *
    * Determinism: each second moment is the pinned exact-long derivation
    * `S_ij/n/1e9`; squared diffs are pico-quantized to longs and summed in
    * exact integer arithmetic (off-diagonals doubled as `2·t_ij`), so the
    * statistic is bit-identical in any engine. Returns one row
    * `(n_a, n_b, mmd2)`. */
  def mmdQuadratic(a: DataFrame, b: DataFrame, vecCol: String,
      d: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val bufA = momentsBuffer(a, vecCol, d)
    val bufB = momentsBuffer(b, vecCol, d)
    require(bufA(0) > 0 && bufB(0) > 0, "mmdQuadratic: empty sample")
    def m(buf: Array[Long], i: Int, j: Int): Double =
      buf(upperIdx(d, i, j)).toDouble / buf(0).toDouble / 1e9
    var sumQ = 0L
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val diff = m(bufA, i, j) - m(bufB, i, j)
        val tq = math.floor(diff * diff * 1e12 + 0.5).toLong
        sumQ += (if (i == j) tq else 2L * tq)
        j += 1
      }
      i += 1
    }
    Seq((bufA(0), bufB(0), sumQ.toDouble / 1e12)).toDF("n_a", "n_b", "mmd2")
  }
}
