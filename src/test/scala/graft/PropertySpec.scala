package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.checks._
import graft.core._

/** Property tests of the check algebra over randomized null patterns
  * (SURVEY.md §5 item 2): for every row-preserving check,
  * `valid(df) ∪ invalid(df) ≡ df` and `valid ∩ invalid = ∅`; dedup count ≡
  * countDistinct; the metrics frame always carries the fixed schema; and the
  * sorted-merge intersection kernel agrees with `array_intersect`. */
class PropertySpec extends SparkSpec {

  private def randomDf(seed: Int, rows: Int = 200): DataFrame = {
    val rnd = new Random(seed)
    val data = (0 until rows).map { i =>
      Row(
        if (rnd.nextDouble() < 0.15) null else java.lang.Long.valueOf(rnd.nextInt(20).toLong),
        if (rnd.nextDouble() < 0.15) null else s"v${rnd.nextInt(10)}",
        if (rnd.nextDouble() < 0.15) null else java.lang.Double.valueOf(rnd.nextDouble()))
    }
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 4), schema)
  }

  private def checksFor(seed: Int): Seq[BaseCheck] = Seq(
    new CompletenessColRatioCheck("p", "r", SeverityLevel.Low, s"cr$seed", Seq("k", "s"), 0.5),
    new CompletenessRawRatioCheck("p", "r", SeverityLevel.Low, s"raw$seed", Seq("k", "s", "d"), 0.5),
    new ValidityCheck("p", "r", SeverityLevel.Low, s"v$seed", col("d") < 0.5, 0.5),
    new UniqueCheck("p", "r", SeverityLevel.Low, s"u$seed", Seq("k"))
  )

  test("valid/invalid partition the scoped rows for every row-preserving check") {
    (1 to 5).foreach { seed =>
      val df = randomDf(seed).cache()
      val n = df.count()
      checksFor(seed).foreach { c =>
        val v = c.valid(df).count()
        val iv = c.invalid(df).count()
        c match {
          case _: UniqueCheck =>
            // dedup + dup-rows overlap; instead: dedup count == distinct keys
            val nullAware = df.select(col("k")).distinct().count()
            assert(v == nullAware, s"${c.metricName}: dedup $v != distinct $nullAware")
          case _ =>
            assert(v + iv == n, s"${c.metricName}: $v + $iv != $n")
            // disjoint: re-filtering valid by the invalid predicate is empty
            assert(c.invalid(c.valid(df)).count() == 0)
        }
      }
      df.unpersist()
    }
  }

  test("metrics frame always carries the exact reference schema; values in range") {
    (1 to 3).foreach { seed =>
      val df = randomDf(seed)
      val mgr = new DQManager(spark, "prop")
      mgr.setData(df)
      checksFor(seed).foreach(mgr.addCheck)
      val m = mgr.run().getMetricResults
      assert(m.schema == MetricResult.schema)
      val vals = m.select("value_double").collect().map(_.getAs[java.lang.Double](0))
      vals.filter(_ != null).foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("sorted_intersection_count agrees with array_intersect on random sets") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val rows = (0 until 300).map { i =>
      val a = (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(40)}").distinct.sorted
      val b = (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(40)}").distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
      graft.functions.sorted_intersection_count(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("shingle_hashes cardinality equals distinct string shingles") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val docs = (0 until 100).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(40))).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    }.toDF("id", "text")
    val t = graft.text.TextAnalysis
    val bad = docs.select(
      size(graft.functions.shingle_hashes(t.tokens(col("text")), 3)).as("h"),
      size(t.shingles(col("text"), 3)).as("s"))
      .filter(col("h") =!= col("s")).count()
    assert(bad == 0)
  }
}
