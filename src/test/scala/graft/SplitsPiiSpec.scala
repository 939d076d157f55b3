package graft

import org.apache.spark.sql.functions._
import graft.operators.Splits
import graft.text.TextAnalysis

class SplitsPiiSpec extends SparkSpec {

  test("assignSplit: deterministic, exhaustive, and near-uniform at the configured fractions") {
    val ids = spark.range(0, 20000).toDF("id")
    val s1 = Splits.assignSplit(ids, "id")
    val s2 = Splits.assignSplit(ids, "id")
    assert(s1.exceptAll(s2).isEmpty) // pure function of the id
    val frac = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 20000.0).toMap
    assert(math.abs(frac("train") - 204.0 / 256) < 0.02)
    assert(math.abs(frac("val") - 26.0 / 256) < 0.02)
    assert(math.abs(frac("test") - 26.0 / 256) < 0.02)
    assert(frac.values.sum === 1.0) // every row labeled
  }

  test("scrubPii: redacts all three kinds and is idempotent") {
    import spark.implicits._
    val df = Seq(
      "mail me at a.b+c@foo-bar.org now",
      "see https://x.io/path?q=1 and http://y.z/2",
      "call 12345678 or 999333444 but not 123456",
      "clean text with no pii at all"
    ).toDF("text")
    val once = df.select(TextAnalysis.scrubPii(col("text")).as("t"))
    val got = once.as[String].collect()
    assert(got(0) === "mail me at <EMAIL> now")
    assert(got(1) === "see <URL> and <URL>")
    assert(got(2) === "call <NUM> or <NUM> but not 123456") // 6 digits: kept
    assert(got(3) === "clean text with no pii at all")
    val twice = once.select(TextAnalysis.scrubPii(col("t")).as("t"))
    assert(once.exceptAll(twice).isEmpty) // idempotent
  }
}
