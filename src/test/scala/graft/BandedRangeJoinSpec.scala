package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.plans.BandedRangeJoinNative

class BandedRangeJoinSpec extends SparkSpec {

  private val rnd = new scala.util.Random(59)

  test("native rangeJoin == brute-force containment on random points/intervals") {
    import spark.implicits._
    val points = (0 until 800).map(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "p")
    val intervals = (0 until 300).map { i =>
      val lo = rnd.nextDouble() * 1000
      (i.toLong, lo, lo + rnd.nextDouble() * 40) // spans several width-10 bands
    }.toDF("iid", "lo", "hi")
    val got = BandedRangeJoinNative.rangeJoin(points, intervals, "p", "lo", "hi", 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val brute = points.crossJoin(intervals)
      .filter(col("p").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(got.length === brute.length, "pair count (dup or missing pairs)")
    assert(got === brute)
  }

  test("native intervalOverlapJoin == DataFrame twin on random intervals, claimed once") {
    import spark.implicits._
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val lo = rnd.nextDouble() * 500
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF(s"${tag}id", s"${tag}_lo", s"${tag}_hi")
    val a = mk(250, "a"); val b = mk(250, "b")
    val got = BandedRangeJoinNative
      .intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8.0)
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    val twin = Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8.0)
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    assert(got.length === twin.length, "pair count (claim-once violated)")
    assert(got === twin)
  }

  test("edge cases: empty sides, degenerate intervals, nulls, negative positions") {
    import spark.implicits._
    val pts = Seq((1L, Some(-15.0)), (2L, Some(0.0)), (3L, None), (4L, Some(7.5)))
      .toDF("pid", "p")
    val ivs = Seq(
      (10L, Some(-20.0), Some(-10.0)), // negative band range
      (11L, Some(0.0), Some(0.0)),     // degenerate single-point interval
      (12L, Some(5.0), Some(4.0)),     // inverted: dropped
      (13L, None, Some(9.0)),          // null lo: dropped
      (14L, Some(7.5), Some(7.5))      // point-on-point tie
    ).toDF("iid", "lo", "hi")
    val got = BandedRangeJoinNative.rangeJoin(pts, ivs, "p", "lo", "hi", 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 11L), (4L, 14L)))
    // empty sides yield empty output, not a crash
    assert(BandedRangeJoinNative.rangeJoin(pts.limit(0), ivs, "p", "lo", "hi", 10.0).count() === 0)
    assert(BandedRangeJoinNative.rangeJoin(pts, ivs.limit(0), "p", "lo", "hi", 10.0).count() === 0)
  }

  test("plan: BandedIntervalJoinExec with exactly the two keyed exchanges, no stock join") {
    import spark.implicits._
    val pts = (0 until 50).map(i => (i.toLong, i * 3.0)).toDF("pid", "p")
    val ivs = (0 until 20).map(i => (i.toLong, i * 5.0, i * 5.0 + 12.0)).toDF("iid", "lo", "hi")
    val df = BandedRangeJoinNative.rangeJoin(pts, ivs, "p", "lo", "hi", 10.0)
    df.collect() // materialize so AQE finalizes the physical plan
    // the AQE tree renders Final AND Initial plans: count in the final only
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(s.contains("BandedIntervalJoin"), s"native exec missing:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin") &&
      !s.contains("ShuffledHashJoin"), s"stock join leaked into native plan:\n$s")
    // one keyed exchange per side and nothing else
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(nExchanges === 2, s"expected exactly 2 keyed exchanges, got $nExchanges:\n$s")
    assert(s.contains("__graft_band"), s"exchanges not keyed on the band id:\n$s")
  }
}
