package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiler, Splits}

/** Model-evaluation metrics: exact ROC AUC, calibration bins, Brier
  * score, and the Horvitz–Thompson stratified estimator. */
class EvalMetricsSpec extends SparkSpec {

  test("rocAuc: perfect separation = 1, reversed = 0, ties averaged") {
    val s = spark
    import s.implicits._
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("score", "label")
    assert(Profiler.rocAuc(perfect, "score", "label").collect().head.getAs[Double]("auc") == 1.0)
    val reversed = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("score", "label")
    assert(Profiler.rocAuc(reversed, "score", "label").collect().head.getAs[Double]("auc") == 0.0)
    // all scores tied -> AUC exactly 0.5 regardless of labels
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("score", "label")
    assert(Profiler.rocAuc(tied, "score", "label").collect().head.getAs[Double]("auc") == 0.5)
    // hand case: scores 0.3(+), 0.3(-), 0.7(+): pairs (+,-): (0.3+,0.3-)=0.5,
    // (0.7+,0.3-)=1 -> AUC = 1.5/2 = 0.75
    val hand = Seq((0.3, 1), (0.3, 0), (0.7, 1)).toDF("score", "label")
    assert(Profiler.rocAuc(hand, "score", "label").collect().head.getAs[Double]("auc") == 0.75)
  }

  test("distributed rank sweep equals naive average-rank computation on random tied data") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // half the scores land on a 50-value grid -> heavy tie groups; half
    // continuous -> distinct frame spans all partitions
    val rows = (1 to 4000).map { _ =>
      val s = if (rnd.nextBoolean()) rnd.nextInt(50) / 50.0 else rnd.nextDouble()
      (s, if (rnd.nextDouble() < 0.3 + 0.4 * s) 1 else 0)
    }
    val got = Profiler.rocAuc(rows.toDF("score", "label"), "score", "label").head()
    // naive: average ranks per tie group over the sorted values
    val sorted = rows.sortBy(_._1)
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var idx = 0
    sorted.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      ranks(v) = (idx + 1 + idx + g.size).toDouble / 2 // avg of rank range
      idx += g.size
    }
    val np = rows.count(_._2 == 1).toLong
    val nn = rows.size - np
    val rPos = rows.filter(_._2 == 1).map(r => ranks(r._1)).sum
    val expected = (rPos - np * (np + 1) / 2.0) / (np.toDouble * nn)
    assert(got.getLong(0) == np && got.getLong(1) == nn)
    assert(math.abs(got.getDouble(2) - expected) < 1e-12,
      s"auc ${got.getDouble(2)} vs naive $expected")
    // mann-whitney over the same data viewed as two groups
    val mwRows = rows.map { case (s, y) => (s, if (y == 1) "pos" else "neg") }
    val mw = Profiler.mannWhitneyU(mwRows.toDF("v", "g"), "v", "g", "pos", "neg").head()
    val uA = rPos - np * (np + 1) / 2.0
    assert(mw.getLong(0) == np && mw.getLong(1) == nn)
    assert(math.abs(mw.getDouble(2) - uA) < 1e-6) // u_a rounded to 4 dp
  }

  test("calibrationBins: boundary scores land in the right bins; top bin closed") {
    val s = spark
    import s.implicits._
    val df = Seq((0.0, 0), (0.05, 1), (0.1, 0), (0.95, 1), (1.0, 1))
      .toDF("score", "label")
    val bins = Profiler.calibrationBins(df, "score", "label", 10).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Double]("avg_score"), r.getAs[Double]("pos_rate")))
      .toMap
    assert(bins(0)._1 == 2L)            // 0.0 and 0.05
    assert(bins(1)._1 == 1L)            // 0.1
    assert(bins(9)._1 == 2L)            // 0.95 and 1.0 (1.0 clamps into bin 9)
    assert(bins(0)._2 == 0.025 && bins(0)._3 == 0.5)
    assert(bins(9)._3 == 1.0)
  }

  test("brierScore matches the hand-computed mean squared error") {
    val s = spark
    import s.implicits._
    // (0.25-1)^2 = 0.5625, (0.25-0)^2 = 0.0625, (1-1)^2 = 0 -> mean 0.2083333...
    val df = Seq((0.25, 1), (0.25, 0), (1.0, 1)).toDF("score", "label")
    val r = Profiler.brierScore(df, "score", "label").collect().head
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getAs[Double]("brier") - 0.625 / 3.0) < 1e-8)
  }

  test("htEstimate: a p=1 stratum reproduces its true total exactly; p=0.5 inflates 2x") {
    val s = spark
    import s.implicits._
    val df = (1 to 400).map { i =>
      (i.toLong, if (i % 2 == 0) "full" else "half", 10L)
    }.toDF("id", "grp", "w")
    val est = Splits.htEstimate(df, "grp", "id", "w",
        Map("full" -> 256, "half" -> 128))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("est_total"))).toMap
    assert(est("full")._1 == 200L && est("full")._2 == 2000.0)
    // half stratum: n_sampled * 10 * 2 (p = 0.5)
    assert(est("half")._2 == est("half")._1 * 20.0)
    // md5 threshold '80' keeps roughly half (loose bound, deterministic)
    assert(est("half")._1 > 60 && est("half")._1 < 140)
  }
}
