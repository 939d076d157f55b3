package graft.checks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.SeverityLevel

class OutlierCheckSpec extends SparkSpec {

  test("outlier split: known outlier isolated, valid/invalid partition the table") {
    import spark.implicits._
    // 20 values near 10 plus one wild outlier
    val vals = (1 to 20).map(i => 10.0 + (i % 5) * 0.1) :+ 1000.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val c = new OutlierCheck("t", "r", SeverityLevel.High, "x_outlier", "x", zMax = 3.0)
    val inv = c.invalid(df).select("id").collect().map(_.getLong(0)).toSet
    assert(inv === Set(20L))
    assert(c.valid(df).count() + c.invalid(df).count() === df.count())
  }

  test("outlier metric: ratio + stats in extra_info, inverted threshold") {
    import spark.implicits._
    val df = ((1 to 99).map(_ => 5.0) :+ 500.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val cOk = new OutlierCheck("t", "r", SeverityLevel.High, "m", "x",
      zMax = 3.0, threshold = 0.02)
    val Seq(m) = cOk.metricResults(df)
    assert(m.valueDouble.contains(0.01))
    assert(m.valueString.get.contains("<=")) // 1% <= 2% -> success message
    assert(m.extraInfo("outlier_count") === "1")
    assert(m.extraInfo("mean").toDouble > 5.0 && m.extraInfo("stddev").toDouble > 0.0)
    val cFail = new OutlierCheck("t", "r", SeverityLevel.High, "m", "x",
      zMax = 3.0, threshold = 0.001)
    assert(cFail.metricResults(df).head.valueString.get.contains(">"))
  }

  test("outlier check on real lineitem prices is consistent with SQL definition") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val stats = li.agg(avg("l_extendedprice"), stddev_samp("l_extendedprice")).head()
    val (m, sd) = (stats.getDouble(0), stats.getDouble(1))
    val expected = li.filter(abs(col("l_extendedprice") - m) > 3.0 * sd).count()
    val c = new OutlierCheck("lineitem", "r", SeverityLevel.High, "m", "l_extendedprice")
    assert(c.invalid(li).count() === expected)
  }
}
