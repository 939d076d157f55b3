package graft

import org.apache.spark.sql.functions._
import graft.ml.{Classify, Covariance, VectorMomentsAgg}

/** Round-6 continuation: classical-ML curation operators — Naive Bayes
  * text scoring, kNN majority vote, leakage-safe cluster splits, and the
  * single-pass covariance moments buffer. */
class Round6dSpec extends SparkSpec {

  test("naiveBayesScore: hand-computed two-label corpus") {
    import spark.implicits._
    // train: doc 0/2 label a, doc 4 label b; test: doc 1 ("x x") and 3 ("z")
    val docs = Seq(
      (0L, "x y", "a"), (2L, "x x", "a"), (4L, "z z z", "b"),
      (1L, "x x", "?"), (3L, "z", "?")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayesScore(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L))
    // vocab = {x,y,z} -> |V| = 3; label a: cnt(x)=3, tot=4; label b: cnt(z)=3, tot=3
    // doc 1 ("x x"): score_a = ln(2/3) + 2*ln(4) - 2*ln(7)
    //                score_b = ln(1/3) + 0       - 2*ln(6)
    val s1a = math.log(2.0 / 3) + 2 * math.log(4.0) - 2 * math.log(7.0)
    val s1b = math.log(1.0 / 3) - 2 * math.log(6.0)
    assert(s1a > s1b)
    val r1 = out(0)
    assert(r1.getAs[String]("pred") === "a")
    assert(math.abs(r1.getAs[Double]("score") - s1a) < 1e-6)
    // doc 3 ("z"): score_a = ln(2/3) + 0 - ln(7) ; score_b = ln(1/3) + ln(4) - ln(6)
    val r3 = out(1)
    assert(r3.getAs[String]("pred") === "b")
    assert(math.abs(r3.getAs[Double]("score")
      - (math.log(1.0 / 3) + math.log(4.0) - math.log(6.0))) < 1e-6)
  }

  test("naiveBayesScore: all-unseen tokens fall back to the prior") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x", "a"), (2L, "x", "a"), (4L, "y", "b"),
      (1L, "qqq www", "?")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayesScore(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect()
    assert(out.length === 1)
    // no token joins: score_l = ln(prior) - 2*ln(tot_l + 2); label a has
    // prior 2/3 and the same normalizer (tot=2... a: tot 2, b: tot 1) ->
    // a: ln(2/3)-2*ln(4), b: ln(1/3)-2*ln(3); a wins (-1.18 vs -3.30... )
    assert(out(0).getAs[String]("pred") === "a")
  }

  test("knnClassify: majority vote with tie broken toward the smaller label") {
    import spark.implicits._
    // query 0 at origin; 2 neighbors of label 1 at d=1, 2 of label 2 at
    // d=1.5 -> k=4 votes 2:2, tie -> label 1
    val rows = Seq(
      (0L, Array(0f, 0f), 9),
      (1L, Array(1f, 0f), 1), (2L, Array(0f, 1f), 1),
      (3L, Array(1.5f, 0f), 2), (4L, Array(0f, 1.5f), 2),
      (5L, Array(9f, 9f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Classify.knnClassify(rows, "vec_id", "embedding", "label",
      col("vec_id") === 0, 4).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Int]("pred_label") === 1)
    assert(out(0).getAs[Long]("n_votes") === 2L)
    assert(out(0).getAs[Int]("true_label") === 9)
  }

  test("knnClassify: clear majority") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(0f, 0f), 9),
      (1L, Array(1f, 0f), 7), (2L, Array(0f, 1f), 7),
      (3L, Array(1.1f, 0f), 7), (4L, Array(0f, 1.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Classify.knnClassify(rows, "vec_id", "embedding", "label",
      col("vec_id") === 0, 3).collect()
    assert(out(0).getAs[Int]("pred_label") === 7)
    assert(out(0).getAs[Long]("n_votes") === 3L)
  }

  test("clusterSafeSplit: near-duplicates always share a split") {
    val docs = Tables.docs(spark) // sf0.001 documents fixture
    val out = graft.operators.Splits.clusterSafeSplit(
      docs, "doc_id", "text", n = 1, threshold = 0.9, blockCols = Seq("lang"))
    // every doc exactly once
    assert(out.count() === docs.count())
    // no cluster spans two splits
    val spanning = out.groupBy("rep")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(spanning === 0L)
    // clusters exist in the fixture (the dedup fixtures plant near-dups)
    assert(out.filter(col("rep") =!= col("doc_id")).count() > 0)
  }

  test("covarianceMatrix: matches brute force on a small frame") {
    import spark.implicits._
    val data = Seq(
      Array(1f, 2f, 3f), Array(2f, 4f, 5f), Array(3f, 6f, 8f), Array(4f, 8f, 9f))
    val df = data.map(Tuple1(_)).toDF("embedding")
    val out = Covariance.covarianceMatrix(df, "embedding", 3)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out.size === 6)
    def cov(i: Int, j: Int): Double = {
      val xs = data.map(_(i).toDouble); val ys = data.map(_(j).toDouble)
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / xs.size
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(out((i, j)) - cov(i, j)) < 1e-9, s"cov($i,$j)")
    // dim 0 and 1 are exactly proportional (y = 2x): corr check
    assert(math.abs(out((0, 1)) - 2 * out((0, 0))) < 1e-9)
  }

  test("VectorMomentsAgg: rejects mismatched dimensions") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(1f, 2f))).toDF("v")
    val ex = intercept[Exception] {
      df.agg(udaf(new VectorMomentsAgg(3)).apply(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  private object Tables {
    def docs(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(sfDir + "/documents.parquet")
  }
}
