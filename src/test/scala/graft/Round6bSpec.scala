package graft

import org.apache.spark.sql.functions._
import graft.operators.{Repair, Sketches}
import graft.text.TextAnalysis

/** Round-6 continuation: DSIR importance reweighting, CMS inner-product
  * join-size estimation, and weight-of-evidence encoding. */
class Round6bSpec extends SparkSpec {

  test("dsirWeights separates the target slice from the rest") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 256)
    val byLang = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("avg_llr").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // target (en) docs must score strictly above the source slice —
    // the whole point of the importance weight
    assert(byLang(true) > byLang(false) + 0.005,
      s"no target separation: $byLang")
    // every doc with >= 1 token gets a row
    val nonEmpty = docs
      .filter(size(TextAnalysis.tokens(col("text"))) > 0).count()
    assert(w.count() === nonEmpty)
  }

  test("dsirWeights gram accounting: n tokens -> 2n-1 grams; empty dropped") {
    import spark.implicits._
    val df = Seq((1L, "a b c", true), (2L, "x", false), (3L, "  ", true))
      .toDF("id", "text", "t")
    val w = TextAnalysis.dsirWeights(df, "id", "text", col("t"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w === Map(1L -> 5L, 2L -> 1L)) // 3+2 grams; 1+0; dropped
  }

  test("cmsJoinSize upper-bounds the exact self-join size") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val est = Sketches.cmsJoinSize(ev, "user_id", ev, "user_id",
      depth = 4, width = 1024).collect()(0).getLong(0)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    assert(est >= exact, s"CMS inner product $est below true size $exact")
    assert(est <= 2 * exact, s"estimate $est implausibly loose vs $exact")
  }

  test("cmsJoinSize is exact for a single join key") {
    import spark.implicits._
    // one distinct key: no cross terms in any bucket, every row's inner
    // product is exactly nA * nB regardless of collisions
    val a = Seq.fill(7)("k").toDF("k")
    val b = Seq.fill(5)("k").toDF("k")
    val est = Sketches.cmsJoinSize(a, "k", b, "k", depth = 2, width = 8)
      .collect()(0).getLong(0)
    assert(est === 35L)
  }

  test("woeEncode matches the hand-computed two-category example") {
    import spark.implicits._
    val df = (Seq.fill(3)(("A", 1)) ++ Seq(("A", 0)) ++
      Seq(("B", 1)) ++ Seq.fill(3)(("B", 0))).toDF("cat", "y")
    val r = Repair.woeEncode(df, "cat", col("y") === 1)
      .orderBy("category").collect()
    // pt = nt = 4; woe_A = ln((3.5/4)/(1.5/4)) = ln(7/3) = 0.847298
    assert(r(0).getString(0) === "A" && r(0).getLong(1) === 4L &&
      r(0).getLong(2) === 3L)
    assert(math.abs(r(0).getDouble(3) - 0.847298) < 1e-9)
    assert(math.abs(r(0).getDouble(4) - 0.423649) < 1e-9)
    assert(math.abs(r(1).getDouble(3) + 0.847298) < 1e-9)
    assert(math.abs(r(1).getDouble(4) - 0.423649) < 1e-9)
  }
}
