package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiler, Repair}

/** Feature-engineering operators: hashing trick, target encoding, SRM. */
class FeatureEngSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("featureHash lands each token in its md5 dim with its md5 sign") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha alpha beta"), (2L, "beta")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.featureHash(docs, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def dimOf(t: String): Int = (Integer.parseInt(md5hex(t).substring(0, 4), 16) % 64)
    def signOf(t: String): Long =
      if (Integer.parseInt(md5hex(t).substring(4, 5), 16) % 2 == 0) 1L else -1L
    val da = dimOf("alpha"); val db = dimOf("beta")
    if (da != db) {
      assert(out((1L, da)) == 2 * signOf("alpha"))
      assert(out((1L, db)) == signOf("beta"))
    }
    assert(out((2L, db)) == signOf("beta"))
    // dims stay inside [0, 64)
    assert(out.keys.forall { case (_, d) => d >= 0 && d < 64 })
  }

  test("targetEncode shrinks category means toward the global prior") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)).toDF("cat", "y")
    val out = Repair.targetEncode(df, "cat", "y", m = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val prior = 130.0 / 3
    assert(out("a")._1 == 2L)
    assert(math.abs(out("a")._2 - (30.0 + prior) / 3.0) < 1e-9)
    assert(math.abs(out("b")._2 - (100.0 + prior) / 2.0) < 1e-9)
    // shrinkage direction: a's encoding above its raw mean, b's below
    assert(out("a")._2 > 15.0 && out("b")._2 < 100.0)
    // m -> huge pseudo-count collapses everything onto the prior
    val flat = Repair.targetEncode(df, "cat", "y", m = 1e9)
      .collect().map(_.getDouble(2))
    flat.foreach(e => assert(math.abs(e - prior) < 1e-4))
  }

  test("sampleRatioMismatch: balanced = 0, skew and ghost arms flagged") {
    val s = spark
    import s.implicits._
    val balanced = (1 to 100).map(i => if (i % 2 == 0) "a" else "b").toDF("arm")
    val r0 = Profiler.sampleRatioMismatch(balanced, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .collect().head
    assert(r0.getAs[Double]("chi2") < 1e-6 && r0.getAs[Long]("n") == 100L)
    // 70/30 against 50/50: chi2 = (20^2/50)*2 = 16
    val skew = (Seq.fill(70)("a") ++ Seq.fill(30)("b")).toDF("arm")
    val r1 = Profiler.sampleRatioMismatch(skew, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .collect().head
    assert(math.abs(r1.getAs[Double]("chi2") - 16.0) < 1e-6)
    // an arm nobody designed: eps expectation -> enormous finite chi2
    val ghost = (Seq.fill(50)("a") ++ Seq.fill(45)("b") ++ Seq.fill(5)("zz")).toDF("arm")
    val r2 = Profiler.sampleRatioMismatch(ghost, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .collect().head
    assert(r2.getAs[Long]("n_arms") == 3L && r2.getAs[Double]("chi2") > 1e6)
  }
}
