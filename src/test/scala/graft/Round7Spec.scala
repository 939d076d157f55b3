package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: ADVICE-r06 hardening (short-doc compressibility guard,
  * knn packing guard, pairLift cache release) and the re-contracted
  * quantized moments. */
class Round7Spec extends SparkSpec {

  test("compressibility: docs shorter than the gram length get an empty list") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, ""), (3L, "abc"), (4L, "abcd"), (5L, "abcde"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.compressibility(df, "doc_id", "text", 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 0, 0, 0.0), (2L, 0, 0, 0.0), (3L, 0, 0, 0.0),
      (4L, 1, 1, 1.0), (5L, 2, 2, 1.0)))
  }

  test("compressibility: repeated text drives distinct_ratio down") {
    import spark.implicits._
    val df = Seq((1L, "aaaaaaaa")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.compressibility(df, "doc_id", "text", 4)
      .collect().head
    assert(r.getInt(1) === 5 && r.getInt(2) === 1 && r.getDouble(3) === 0.2)
  }

  test("knnClassify: out-of-range label fails loudly instead of corrupting the heap") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0f, 0f), 1L << 21, false),
      (1L, Array(1f, 1f), 0L, true)
    ).toDF("vec_id", "embedding", "label", "is_q")
    val ex = intercept[Exception] {
      graft.ml.Classify.knnClassify(df, "vec_id", "embedding", "label",
        col("is_q"), 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("pairLift releases its basket cache before returning") {
    import spark.implicits._
    spark.catalog.clearCache()
    val df = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L)).toDF("bk", "item")
    val out = graft.operators.Basket.pairLift(df, "bk", "item", 3)
    assert(out.count() === 1)
    // the MEMORY_AND_DISK baskets block must be gone (localCheckpoint
    // blocks of the k-row result are not `persist`-tracked cache entries)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("VectorMomentsAgg quantization: exact hand-computed long buffer") {
    val agg = new graft.ml.VectorMomentsAgg(2)
    val b = agg.reduce(agg.zero, Array(1.5f, -0.25f))
    // layout: [n, S0, S1, S00, S01, S11] at nano scale
    assert(b.toSeq === Seq(1L, 1500000000L, -250000000L,
      2250000000L, -375000000L, 62500000L))
  }
}
