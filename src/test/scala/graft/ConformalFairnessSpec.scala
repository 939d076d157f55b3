package graft

import org.apache.spark.sql.functions._
import graft.operators.{Conformal, Repair}

/** Split-conformal calibration and the disparate-impact audit. */
class ConformalFairnessSpec extends SparkSpec {

  test("splitConformal: hand-computed quantile and coverage") {
    import spark.implicits._
    // cal residuals 1..10, alpha = 0.2 -> k = ceil(11 * 0.8) = 9 -> qhat = 9
    // test residuals {5, 9.5, 12} -> covered: 5 only? no: 5 <= 9 and 9.5 > 9,
    // 12 > 9 -> coverage 1/3... make it 2/3 with {5, 8.5, 12}
    val df = ((1 to 10).map(i => (i.toDouble, true)) ++
      Seq((5.0, false), (8.5, false), (12.0, false))).toDF("resid", "cal")
    val r = Conformal.splitConformal(df, "resid", col("cal"), alpha = 0.2)
      .collect()(0)
    assert(r.getAs[Long]("n_cal") === 10L)
    assert(r.getAs[Long]("n_test") === 3L)
    assert(r.getAs[Double]("qhat") === 9.0)
    assert(r.getAs[Double]("coverage") === 0.666667)
  }

  test("splitConformal: k clamps to n_cal for tiny alpha") {
    import spark.implicits._
    // alpha = 0.01, n_cal = 5 -> ceil(6 * 0.99) = 6 clamped to 5 -> max resid
    val df = (Seq((3.0, true), (1.0, true), (4.0, true), (2.0, true), (5.0, true)) ++
      Seq((4.5, false), (5.5, false))).toDF("resid", "cal")
    val r = Conformal.splitConformal(df, "resid", col("cal"), alpha = 0.01)
      .collect()(0)
    assert(r.getAs[Double]("qhat") === 5.0)
    assert(r.getAs[Double]("coverage") === 0.5)
  }

  test("splitConformal achieves >= 1 - alpha coverage on exchangeable data") {
    // md5 split of a deterministic synthetic residual column: calibration
    // and test are exchangeable, so the conformal guarantee must hold
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(abs(col("l_extendedprice") - lit(1000.0) * col("l_quantity")).as("resid"),
        (conv(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 4), 16, 10)
          .cast("long") % 2 === 0).as("cal"))
    val r = Conformal.splitConformal(li, "resid", col("cal"), alpha = 0.1)
      .collect()(0)
    assert(r.getAs[Double]("coverage") >= 0.885, // 1 - alpha minus finite-sample slack
      s"coverage ${r.getAs[Double]("coverage")} below guarantee")
  }

  test("disparateImpact: hand-computed rates, ratios and the 80% flag") {
    import spark.implicits._
    // group a: 4/5 kept (0.8); group b: 2/5 kept (0.4) -> ratio 0.5 -> flagged
    val df = (Seq.fill(4)(("a", 1)) ++ Seq(("a", 0)) ++
      Seq.fill(2)(("b", 1)) ++ Seq.fill(3)(("b", 0))).toDF("g", "keep")
    val r = Repair.disparateImpact(df, "g", col("keep") === 1)
      .orderBy("group").collect()
    assert(r(0).getAs[Double]("keep_rate") === 0.8)
    assert(r(0).getAs[Double]("impact_ratio") === 1.0)
    assert(!r(0).getAs[Boolean]("below_four_fifths"))
    assert(r(1).getAs[Double]("keep_rate") === 0.4)
    assert(r(1).getAs[Double]("impact_ratio") === 0.5)
    assert(r(1).getAs[Boolean]("below_four_fifths"))
  }

  test("disparateImpact: best group is never flagged; boundary ratio 0.8 passes") {
    import spark.implicits._
    // rates 0.5 and 0.4 -> ratio exactly 0.8, NOT below the threshold
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 0)) ++
      Seq.fill(4)(("b", 1)) ++ Seq.fill(6)(("b", 0))).toDF("g", "keep")
    val r = Repair.disparateImpact(df, "g", col("keep") === 1)
      .orderBy("group").collect()
    assert(r(1).getAs[Double]("impact_ratio") === 0.8)
    assert(!r(1).getAs[Boolean]("below_four_fifths"))
  }
}
