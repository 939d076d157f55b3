package graft.checks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.SeverityLevel

class RuleCheckSpec extends SparkSpec {

  private def mk(threshold: Double = 0.9) =
    new RuleCheck("t", "r", SeverityLevel.High, "m",
      antecedent = col("a") === "x",
      consequent = col("v") > 0,
      threshold = threshold)

  test("vacuous rows count toward neither violations nor the denominator") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", 5),   // triggered, holds
      (2L, "x", -1),  // triggered, violates
      (3L, "y", -9),  // not triggered: vacuously compliant, excluded
      (4L, "y", 7)
    ).toDF("id", "a", "v")
    val c = mk()
    assert(c.valid(df).select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(c.invalid(df).select("id").collect().map(_.getLong(0)).toSet === Set(2L))
    val Seq(m) = c.metricResults(df)
    assert(m.valueDouble.contains(0.5)) // 1 compliant of 2 triggered
  }

  test("null consequent on a triggered row is a violation; null antecedent is untriggered") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x"), Option.empty[Int]), // triggered, null consequent -> violation
      (2L, None, Some(5)),                // null antecedent -> untriggered
      (3L, Some("x"), Some(3))
    ).toDF("id", "a", "v")
    val c = mk()
    assert(c.invalid(df).select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    val Seq(m) = c.metricResults(df)
    assert(m.valueDouble.contains(0.5))
    assert(m.extraInfo("triggered_count") === "2")
  }

  test("never-triggered rule reports 1.0 (untriggered is not failing)") {
    import spark.implicits._
    val df = Seq((1L, "y", 1)).toDF("id", "a", "v")
    val Seq(m) = mk().metricResults(df)
    assert(m.valueDouble.contains(1.0))
    assert(m.valueString.get.contains(">=")) // success-shaped message
  }
}
