package graft

import org.apache.spark.sql.functions._
import graft.similarity.RetrievalEval

/** Round-6 continuation: ranked-retrieval evaluation (nDCG/MRR/recall)
  * and reciprocal-rank fusion. */
class Round6cSpec extends SparkSpec {

  private def ranked(rows: Seq[(Long, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("q", "rank", "id")
  }

  test("rankedEval: perfect retrieval scores 1.0 on all three metrics") {
    val truth = ranked(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val r = RetrievalEval.rankedEval(truth, truth, "q", "id", 3).collect()(0)
    assert(r.getAs[Long]("n_hits") === 3L)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Double]("mrr") === 1.0)
    assert(r.getAs[Double]("ndcg") === 1.0)
  }

  test("rankedEval: disjoint retrieval scores 0.0") {
    val truth = ranked(Seq((1L, 1, 10L), (1L, 2, 11L)))
    val retr = ranked(Seq((1L, 1, 98L), (1L, 2, 99L)))
    val r = RetrievalEval.rankedEval(retr, truth, "q", "id", 2).collect()(0)
    assert(r.getAs[Long]("n_hits") === 0L)
    assert(r.getAs[Double]("recall_at_k") === 0.0)
    assert(r.getAs[Double]("mrr") === 0.0)
    assert(r.getAs[Double]("ndcg") === 0.0)
  }

  test("rankedEval: hand-computed partial overlap") {
    // truth top-2: [10, 11]; retrieved: [99, 10] -> one hit at rank 2
    // gains: 10 has gain k+1-1 = 2. DCG = round(2/log2(3), 6) = 1.261860
    // IDCG = round(2/log2(2),6) + round(1/log2(3),6) = 2 + 0.630930
    val truth = ranked(Seq((1L, 1, 10L), (1L, 2, 11L)))
    val retr = ranked(Seq((1L, 1, 99L), (1L, 2, 10L)))
    val r = RetrievalEval.rankedEval(retr, truth, "q", "id", 2).collect()(0)
    assert(r.getAs[Long]("n_hits") === 1L)
    assert(r.getAs[Double]("recall_at_k") === 0.5)
    assert(r.getAs[Double]("mrr") === 0.5)
    val expected = BigDecimal(1.261860 / 2.630930)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg") === expected)
  }

  test("rankedEval: ranks beyond k are ignored") {
    val truth = ranked(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val retr = ranked(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val full = RetrievalEval.rankedEval(retr, truth, "q", "id", 2).collect()(0)
    assert(full.getAs[Long]("n_hits") === 2L) // rank-3 rows dropped both sides
    assert(full.getAs[Double]("ndcg") === 1.0)
  }

  test("rrfFuse: hand-computed two-list fusion; single-list doc gets one term") {
    // doc 1: rank 1 in A, rank 2 in B -> 1/61 + 1/62
    // doc 2: rank 2 in A only        -> 1/62
    val a = ranked(Seq((0L, 1, 1L), (0L, 2, 2L))).select("rank", "id")
    val b = ranked(Seq((0L, 2, 1L))).select("rank", "id")
    val f = RetrievalEval.rrfFuse(Seq(a, b), "id", 60)
      .orderBy("id").collect()
    def t(r: Int) = BigDecimal(1.0 / (60 + r))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(f(0).getAs[Long]("n_lists") === 2L)
    assert(f(0).getAs[Long]("best_rank") === 1L)
    assert(f(0).getAs[Double]("rrf") === (t(1) + t(2)).toDouble)
    assert(f(1).getAs[Long]("n_lists") === 1L)
    assert(f(1).getAs[Double]("rrf") === t(2).toDouble)
  }

  test("rrfFuse is order-independent across input lists") {
    val a = ranked(Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L))).select("rank", "id")
    val b = ranked(Seq((0L, 1, 3L), (0L, 2, 1L))).select("rank", "id")
    val ab = RetrievalEval.rrfFuse(Seq(a, b), "id").orderBy("id").collect()
    val ba = RetrievalEval.rrfFuse(Seq(b, a), "id").orderBy("id").collect()
    assert(ab.map(_.getAs[Double]("rrf")).toSeq ===
      ba.map(_.getAs[Double]("rrf")).toSeq)
  }
}
