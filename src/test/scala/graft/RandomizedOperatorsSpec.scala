package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, Sessionize, SkewAgg}

/** Seeded randomized equivalence tests: each operator vs a naive
  * formulation on adversarial random data (duplicate timestamps, ties,
  * sparse keys) — the shapes hand-built fixtures tend to miss. */
class RandomizedOperatorsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  test("asofJoin equals naive lookup on random data with heavy ts collisions") {
    import spark.implicits._
    // small ts domain (0..49) forces many exact ties across and within keys
    val left = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong)).toDF("id", "k", "ts")
    val right = (1 to 300).map { i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(50).toLong, rnd.nextInt(1000).toDouble)
    }.toDF("k", "rts", "v")
    // dedupe right on (k, rts) so the as-of target is well-defined under ties
    val rightU = right.groupBy("k", "rts").agg(max("v").as("v"))
    val got = Joins.asofJoin(left, rightU, Seq("k"), "ts", "rts", Seq("v"))
    val naive = left.join(rightU, Seq("k"), "left")
      .filter(col("rts").isNull || col("rts") <= col("ts"))
      .groupBy("id").agg(max(struct(col("rts"), col("v"))).getField("v").as("v_naive"))
    val joined = got.join(naive, Seq("id"), "left")
    assert(joined.filter(!(col("v") <=> col("v_naive"))).count() === 0)
    assert(got.count() === left.count())
  }

  test("sessionAgg covers every row exactly once on random bursty timelines") {
    import spark.implicits._
    val rows = (1 to 6).flatMap { u =>
      var t = 0L
      (1 to 100).map { _ =>
        t += (if (rnd.nextBoolean()) rnd.nextInt(5).toLong else 50L + rnd.nextInt(100))
        (s"u$u", t)
      }
    }.toDF("user", "ts")
    val gap = 20L
    val sessions = Sessionize.sessionAgg(rows, "user", "ts", gap)
    assert(sessions.agg(sum("n_events")).head.getLong(0) === rows.count())
    // within a session, span between consecutive events never exceeds gap:
    // (session_end - session_start) <= gap * (n_events - 1) is implied only
    // for evenly spread events, so assert the sharp invariant per row pair
    val withSess = Sessionize.assignSessions(rows, "user", "ts", gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user", "session_idx").orderBy("ts")
    val badIntra = withSess.withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull && col("ts") - col("prev") > gap).count()
    assert(badIntra === 0)
  }

  test("aggBySalt equals plain groupBy on random skewed keys") {
    import spark.implicits._
    // 80% of rows on one whale key
    val df = (1 to 5000).map { _ =>
      val k = if (rnd.nextInt(5) < 4) "whale" else s"k${rnd.nextInt(20)}"
      (k, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble)
    }.toDF("k", "a", "b")
    val salted = SkewAgg.aggBySalt(df, Seq("k"),
      Seq(("count", "*"), ("sum", "a"), ("min", "b"), ("max", "b")), saltFactor = 7)
    val plain = df.groupBy("k").agg(count(lit(1)).as("count_rows"),
      sum("a").as("sum_a"), min("b").as("min_b"), max("b").as("max_b"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("rangeJoinBanded equals brute force on random intervals incl. degenerate/empty") {
    import spark.implicits._
    val points = (1 to 800).map(_ => rnd.nextDouble() * 100).toDF("p")
    val intervals = (1 to 120).map { i =>
      val lo = rnd.nextDouble() * 100
      // mix: proper, point-sized (lo==hi), and inverted (dropped) intervals
      val hi = rnd.nextInt(3) match {
        case 0 => lo + rnd.nextDouble() * 10
        case 1 => lo
        case _ => lo - 1.0
      }
      (i.toLong, lo, hi)
    }.toDF("iid", "lo", "hi")
    val banded = Joins.rangeJoinBanded(points, intervals, "p", "lo", "hi", 3.0)
      .groupBy("iid").count()
    val brute = points.crossJoin(intervals)
      .filter(col("p").between(col("lo"), col("hi")))
      .groupBy("iid").count()
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
  }
}
