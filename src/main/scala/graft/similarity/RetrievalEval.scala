package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation and fusion — the measurement half of the
  * ANN / BM25 retrieval surface ([[Similarity]], `TextAnalysis.bm25`):
  * score a system's ranked lists against a ground-truth ranking
  * (nDCG@k / MRR / recall@k, the standard IR triple), and fuse several
  * rankings into one with reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009 — the de-facto hybrid-search combiner).
  *
  * Both operate on ALREADY-RANKED frames of `queries × k` rows, so every
  * join here is tiny regardless of corpus size — the heavy lifting
  * (scanning 100 TB to produce the rankings) stays in the scale-safe
  * heap-top-k producers; evaluation cost is O(|queries| · k).
  */
object RetrievalEval {

  private def dec6(c: Column): Column = round(c, 6).cast("decimal(18,6)")

  /** Per-query nDCG@k, MRR and recall@k of `retrieved` against `truth`.
    *
    * Inputs are ranked lists `(queryCol, rank, idCol)` with rank 1..k
    * (extra rows beyond `k` are ignored). Relevance is graded from the
    * truth rank: `gain(d) = k + 1 − truth_rank(d)` (top truth item most
    * relevant), so
    * `DCG = Σ_{hits} gain / log2(retr_rank + 1)`,
    * `IDCG = Σ_{i=1..|truth|} (k + 1 − i) / log2(i + 1)`, and
    * `nDCG = DCG / IDCG`. `MRR = 1 / min retrieved-rank among hits`
    * (0 when nothing relevant was retrieved); `recall = hits / |truth|`.
    *
    * Determinism: each DCG/IDCG term is rounded to 6 dp and summed as
    * exact DECIMAL, so the per-query score is independent of join and
    * partition order and bit-reproducible in the DuckDB oracle. */
  def rankedEval(retrieved: DataFrame, truth: DataFrame,
      queryCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tr = truth.filter(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rank").cast("long").as("__trank"))
    val re = retrieved.filter(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rank").cast("long").as("__rrank"))
    val gain = (lit(k + 1) - col("__trank")).cast("double")
    val log2 = (c: Column) => log(c.cast("double")) / log(lit(2.0))
    tr.join(re, Seq(queryCol, idCol), "left")
      .groupBy(col(queryCol))
      .agg(
        count(col("__rrank")).as("n_hits"),
        round(count(col("__rrank")).cast("double") / count(lit(1)), 6).as("recall_at_k"),
        min(col("__rrank")).as("__first"),
        sum(when(col("__rrank").isNotNull,
          dec6(gain / log2(col("__rrank") + 1))).otherwise(lit(0).cast("decimal(18,6)"))).as("__dcg"),
        sum(dec6(gain / log2(col("__trank") + 1))).as("__idcg"))
      .select(col(queryCol), col("n_hits"), col("recall_at_k"),
        when(col("__first").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("__first"), 6)).as("mrr"),
        round(col("__dcg").cast("double") / col("__idcg").cast("double"), 6).as("ndcg"))
  }

  /** Reciprocal-rank fusion of several ranked lists:
    * `rrf(d) = Σ_lists 1 / (kRrf + rank_list(d))` over the lists that
    * contain `d` (missing-from-list contributes nothing — the standard
    * formulation). `kRrf = 60` is the paper's constant.
    *
    * Each term is rounded to 9 dp and summed as exact DECIMAL, so the
    * fused score is list-order and partition-order independent — fusing
    * any number of lists stays deterministic. Returns one row per distinct
    * id: `(idCol, n_lists, best_rank, rrf)`; callers top-k on
    * `(rrf desc, id)` for the fused ranking. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, "kRrf must be >= 1")
    val terms = rankings.map { r =>
      r.select(col(idCol), col("rank").cast("long").as("__rank"),
        round(lit(1.0) / (lit(kRrf) + col("rank").cast("double")), 9)
          .cast("decimal(18,9)").as("__term"))
    }.reduce(_ unionByName _)
    terms.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), min(col("__rank")).as("best_rank"),
        round(sum(col("__term")).cast("double"), 9).as("rrf"))
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) —
    * top-weighted similarity of two ranked lists, the standard answer to
    * "how different is the approximate ranking from the exact one":
    * `RBO@k = (1 − p) · Σ_{d=1..k} p^{d−1} · |A_{1..d} ∩ B_{1..d}| / d`.
    *
    * A document shared by both lists enters every prefix from depth
    * `max(rank_A, rank_B)` on, so the overlap-at-depth table comes from
    * ONE equi-join of the two queries×k frames plus a k-row depth
    * cross-join — no per-depth set intersection. All frames are
    * |queries|·k bounded; the corpus never appears. Inputs are ranked
    * `(queryCol, rank, idCol)` frames; returns `(queryCol, rbo)` with one
    * row per query of `rankingA` (queries with zero overlap score 0). */
  def rbo(rankingA: DataFrame, rankingB: DataFrame, queryCol: String,
      idCol: String, k: Int, p: Double): DataFrame = {
    require(k >= 1 && p > 0 && p < 1)
    val spark = rankingA.sparkSession
    import spark.implicits._
    val a = rankingA.filter(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rank").as("__ra"))
    val b = rankingB.filter(col("rank") <= k)
      .select(col(queryCol), col(idCol), col("rank").as("__rb"))
    val m = a.join(b, Seq(queryCol, idCol))
      .select(col(queryCol), greatest(col("__ra"), col("__rb")).as("__m"))
    val depths = (1 to k).toDF("__d")
    val ov = m.crossJoin(broadcast(depths))
      .filter(col("__m") <= col("__d"))
      .groupBy(queryCol, "__d").agg(count(lit(1)).as("__ov"))
    val terms = ov.select(col(queryCol),
      (pow(lit(p), col("__d") - 1) * col("__ov").cast("double") / col("__d"))
        .as("__t"))
    rankingA.select(col(queryCol)).distinct()
      .join(terms.groupBy(queryCol)
        .agg(((lit(1.0) - lit(p)) * sum(col("__t"))).as("__rbo")), Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("__rbo"), lit(0.0)).as("rbo"))
  }
}
