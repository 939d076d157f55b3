package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.plans.AsofJoinNative

class AsofNativeSpec extends SparkSpec {

  private def execPlan(df: DataFrame) =
    df.queryExecution.executedPlan

  test("native asof join: backward inclusive match, nulls when no earlier right row") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 350L),
      (4L, "u2", 500L), (5L, "u3", 999L)
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u1", 200L, 2.0), ("u1", 300L, 3.0), ("u1", 400L, 4.0), ("u2", 450L, 45.0)
    ).toDF("k", "rts", "v")
    val got = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(45.0), 5L -> None))
  }

  test("native asof join is planned as AsofJoinExec (no window, no union)") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 50L, 1.0)).toDF("k", "rts", "v")
    val df = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    // AdaptiveSparkPlanExec is a leaf (collect can't descend) -> assert on
    // the rendered tree instead
    val s = execPlan(df).toString
    assert(s.contains("AsofJoin"), s"AsofJoinExec missing from plan:\n$s")
    assert(s.contains("Exchange hashpartitioning"), s"expected co-partitioning exchanges:\n$s")
    assert(!s.contains("Window"), s"window exec leaked into native plan:\n$s")
    assert(!s.contains("Union"), s"union leaked into native plan:\n$s")
  }

  test("native == window-based asofJoin on real events (backward, forward, tolerance)") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("p_ts"))
      .agg(max("value").as("pv"))
    for ((fwd, tol) <- Seq((false, None), (true, None),
        (false, Some(86400000000L)), (true, Some(3600000000L)))) {
      val win = Joins.asofJoin(clicks, purchases,
        Seq("user_id"), "ts_us", "p_ts", Seq("pv"), forward = fwd, tolerance = tol)
        .select("event_id", "pv")
      val nat = AsofJoinNative.asofJoin(clicks, purchases,
        Seq("user_id"), "ts_us", "p_ts", Seq("pv"), forward = fwd, tolerance = tol)
        .select("event_id", "pv")
      assert(nat.count() === clicks.count(), s"fwd=$fwd tol=$tol row count")
      assert(win.exceptAll(nat).isEmpty && nat.exceptAll(win).isEmpty,
        s"fwd=$fwd tol=$tol mismatch vs window formulation")
    }
  }

  test("AsofLimitPushDown: limit lands on the LEFT child only; results correct") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 300L))
      .toDF("id", "k", "ts")
    val right = Seq(("u1", 50L, 1.0)).toDF("k", "rts", "v")
    val df = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v")).limit(2)
    val opt = df.queryExecution.optimizedPlan
    // the pushed LocalLimit must sit inside the join's left subtree
    val pushed = opt.collect {
      case j: graft.plans.AsofJoin
        if j.left.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l }.nonEmpty => j
    }
    assert(pushed.nonEmpty, s"LocalLimit not pushed into AsofJoin left child:\n$opt")
    // right side must NOT be limited
    assert(pushed.head.right.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l }.isEmpty)
    val rows = df.collect()
    assert(rows.length === 2 && rows.forall(_.getDouble(3) === 1.0))
  }

  test("native asof join: null keys and null timestamps match nothing, rows kept") {
    import spark.implicits._
    val left = Seq((1L, Option("u1"), Option(300L)), (2L, None, Option(300L)),
      (3L, Option("u1"), None)).toDF("id", "k", "ts")
    val right = Seq((Option("u1"), Option(100L), 1.0),
      (Option("u1"), Option(null.asInstanceOf[java.lang.Long]).map(_.toLong), 9.0),
      (None, Option(150L), 8.0)
    ).toDF("k", "rts", "v")
    val got = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("native asof join: matched right row's genuine NULL value is preserved") {
    import spark.implicits._
    val left = Seq((1L, "u1", 300L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 100L, Option(5.0)), ("u1", 200L, Option.empty[Double]))
      .toDF("k", "rts", "v")
    // nearest match (ts=200) has v = NULL: must stay null, not fall back to 5.0
    val got = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("v").head()
    assert(got.isNullAt(0))
  }

  test("native asof tolerance: stale match nulls values but keeps the row") {
    import spark.implicits._
    val left = Seq((1L, "u1", 1000L), (2L, "u1", 1050L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 990L, 9.0)).toDF("k", "rts", "v")
    val got = AsofJoinNative.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(20L))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> Some(9.0), 2L -> None))
  }
}
