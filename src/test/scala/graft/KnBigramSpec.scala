package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Interpolated Kneser-Ney bigram LM scorer. */
class KnBigramSpec extends SparkSpec {

  test("knBigramScore matches the hand-computed tiny corpus") {
    import spark.implicits._
    // corpus: "a b a b" + "b a" -> big = {(a,b):2, (b,a):2}
    // c(a.) = c(b.) = 2, N1+(a.) = N1+(b.) = 1, N1+(.a) = N1+(.b) = 1, N1+(..) = 2
    // P(b|a) = (2-0.75)/2 + 0.75*(1/2)*(1/2) = 0.8125 = P(a|b)
    // ln(0.8125) = -0.207639 (6 dp) -> every doc's avg_logp = -0.2076
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x")).toDF("id", "text")
    val r = TextAnalysis.knBigramScore(df, "id", "text")
      .orderBy("id").collect()
    assert(r.length === 2) // doc 3 has no bigrams
    assert(r(0).getLong(0) === 1L && r(0).getLong(1) === 3L)
    assert(r(0).getDouble(2) === -0.2076)
    assert(r(1).getLong(0) === 2L && r(1).getLong(1) === 1L)
    assert(r(1).getDouble(2) === -0.2076)
    // sum-to-one sanity on the same model: P(b|a) + P(a|a) =
    // 0.8125 + (max(0-0.75,0)/2 + 0.75*(1/2)*(1/2)) = 0.8125 + 0.1875 = 1
  }

  test("knBigramScore: KN probabilities sum to 1 over the vocabulary") {
    import spark.implicits._
    // richer corpus; check sum over all w2 in the bigram-type vocab for
    // each seen w1, adding the unseen-bigram backoff mass explicitly
    val df = Seq((1L, "the cat sat on the mat"), (2L, "the cat ran"),
      (3L, "a cat sat")).toDF("id", "text")
    val pairs = df.select(col("id"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .withColumn("nxt", lead("t", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(monotonically_increasing_id())))
    // rebuild the model exactly as the operator defines it, on the driver
    val toks = Seq("the cat sat on the mat", "the cat ran", "a cat sat")
      .flatMap(_.split("\\s+").toSeq.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val big = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = big.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val n1f = big.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val cont = big.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val nbb = big.size.toLong
    val vocabW2 = cont.keySet
    val d = 0.75
    for (w1 <- c1.keySet) {
      val seen = vocabW2.toSeq.map { w2 =>
        val c12 = big.getOrElse((w1, w2), 0L).toDouble
        math.max(c12 - d, 0.0) / c1(w1) +
          d * n1f(w1) / c1(w1) * (cont(w2).toDouble / nbb)
      }.sum
      // continuation distribution covers exactly the observed-w2 vocab,
      // so the full KN mass lands inside it
      assert(math.abs(seen - 1.0) < 1e-12, s"mass for '$w1' = $seen")
    }
    assert(pairs.filter(col("nxt").isNotNull).count() === toks.size)
  }
}
