package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Time-weighted averaging, OHLC bars, and the streaming SRM monitor. */
class TwapOhlcSpec extends SparkSpec {

  test("twap weights by holding duration (chatty periods don't over-count)") {
    val s = spark
    import s.implicits._
    // value 10 held 0..10, then 20 held 10..20 (but sampled 5x in a burst):
    // row-mean of values = (10+20*5+99)/7, TWAP must be 15 exactly
    val obs = Seq(("k", 0L, 10L), ("k", 10L, 20L), ("k", 12L, 20L),
      ("k", 14L, 20L), ("k", 16L, 20L), ("k", 18L, 20L), ("k", 20L, 99L))
      .toDF("k", "ts", "v")
    val r = TimeSeries.twap(obs, "k", "ts", "v").collect().head
    assert(r.getAs[Long]("total_dt") == 20L)
    assert(r.getAs[Double]("twap") == 15.0)
    // single-row key is dropped (no holding period)
    val single = Seq(("s", 5L, 1L)).toDF("k", "ts", "v")
    assert(TimeSeries.twap(single, "k", "ts", "v").isEmpty)
  }

  test("ohlc: open/close by time order, high/low extremes, period bucketing") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      ("k", 101L, 5L), ("k", 105L, 9L), ("k", 103L, 1L), ("k", 109L, 7L), // period 100
      ("k", 112L, 4L),                                                     // period 110
      ("j", 101L, 2L)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.ohlc(obs, "k", "ts", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(("k", 100L)) == (5L, 9L, 1L, 7L, 4L)) // open@101, close@109
    assert(out(("k", 110L)) == (4L, 4L, 4L, 4L, 1L))
    assert(out(("j", 100L)) == (2L, 2L, 2L, 2L, 1L))
  }

  test("streaming SRM monitor fires per batch with the batch's chi2") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = graft.streaming.StreamingDQ.srmMonitor(
      mem.toDF().toDF("arm"), "arm", Map("a" -> 0.5, "b" -> 0.5)) {
      (id, n, chi2) => results.synchronized { results += ((id, n, chi2)) }
    }
    try {
      mem.addData(Seq.fill(50)("a") ++ Seq.fill(50)("b"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(70)("a") ++ Seq.fill(30)("b"): _*)
      q.processAllAvailable()
      val byBatch = results.synchronized { results.toList }.sortBy(_._1)
      assert(byBatch.size == 2)
      assert(byBatch(0)._2 == 100L && byBatch(0)._3 < 1e-6)     // balanced
      assert(math.abs(byBatch(1)._3 - 16.0) < 1e-6)             // 70/30 skew
    } finally q.stop()
  }
}
