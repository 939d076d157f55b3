package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {

  test("sessionAgg: exact sessions on a hand-built timeline") {
    import spark.implicits._
    // gap = 10: u1 -> [0,5,14] [30] ; u2 -> [7] [100,105]
    val df = Seq(
      ("u1", 0L, 1.0), ("u1", 5L, 2.0), ("u1", 14L, 3.0), ("u1", 30L, 4.0),
      ("u2", 7L, 5.0), ("u2", 100L, 6.0), ("u2", 105L, 7.0)
    ).toDF("user", "ts", "v")
    val got = Sessionize.sessionAgg(df, "user", "ts", gap = 10L,
      extraAggs = Seq(sum(col("v")).as("sum_v")))
      .orderBy("user", "session_idx")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("u1", 1L, 0L, 14L, 3L, 6.0),
      ("u1", 2L, 30L, 30L, 1L, 4.0),
      ("u2", 1L, 7L, 7L, 1L, 5.0),
      ("u2", 2L, 100L, 105L, 2L, 13.0)))
  }

  test("sessionAgg invariants on real events: coverage + gap bounds") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val gap = 7200L * 1000 * 1000 * 1000
    val sessions = Sessionize.sessionAgg(ev, "user_id", "ts", gap).cache()
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head.getLong(0) === ev.count())
    // sessions of one user never overlap and are separated by > gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_idx")
    val bad = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") - col("prev_end") <= gap)
      .count()
    assert(bad === 0)
    sessions.unpersist()
  }

  test("streaming session_window agrees with batch sessionAgg per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val base = 1700000000000L
    def ts(offsetSec: Long) = new java.sql.Timestamp(base + offsetSec * 1000)
    mem.addData(
      ("a", ts(0)), ("a", ts(30)), ("a", ts(500)), // gap 60s -> 2 sessions
      ("b", ts(10)), ("b", ts(50)))                // 1 session
    val df = mem.toDF().toDF("key", "event_ts")
    val q = Sessionize.sessionAggStreaming(df, "key", "event_ts", "60 seconds", "10 seconds")
      .writeStream.format("memory").queryName("sess_test").outputMode(OutputMode.Append)
      .start()
    try {
      q.processAllAvailable()
      // advance the watermark far past every session end so append emits them
      mem.addData(("c", ts(100000)))
      q.processAllAvailable()
      mem.addData(("c", ts(200000)))
      q.processAllAvailable()
      val got = spark.table("sess_test")
        .filter(col("key").isin("a", "b"))
        .select("key", "n_events").as[(String, Long)].collect().toSet
      assert(got === Set(("a", 2L), ("a", 1L), ("b", 2L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions: closed exactly once when watermark passes gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val base = 1700000000000L
    def ts(offsetSec: Long) = new java.sql.Timestamp(base + offsetSec * 1000)
    mem.addData(
      ("a", ts(0)), ("a", ts(30)), ("a", ts(500)), // in-batch gap: [0,30] closes eagerly
      ("b", ts(10)))
    val df = mem.toDF().toDF("key", "event_ts")
    val sessions = Sessionize.sessionsCustomState(df, "key", "event_ts",
      gapMs = 60000L, watermark = "10 seconds")
    val q = sessions.toDF()
      .writeStream.format("memory").queryName("sess_custom").outputMode(OutputMode.Append)
      .start()
    try {
      q.processAllAvailable()
      mem.addData(("c", ts(100000))) // watermark -> 99990s: a/b sessions time out
      q.processAllAvailable()
      mem.addData(("c", ts(100001)))
      q.processAllAvailable()
      val got = spark.table("sess_custom")
        .filter(col("key").isin("a", "b"))
        .select("key", "startMs", "endMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === Set(
        ("a", base, base + 30000L, 2L),
        ("a", base + 500000L, base + 500000L, 1L),
        ("b", base + 10000L, base + 10000L, 1L)))
    } finally q.stop()
  }

  test("transformWithState sessions (event-time timers) match the legacy twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val base = 1700000000000L
    def ts(offsetSec: Long) = new java.sql.Timestamp(base + offsetSec * 1000)
    mem.addData(
      ("a", ts(0)), ("a", ts(30)), ("a", ts(500)),
      ("b", ts(10)))
    val df = mem.toDF().toDF("key", "event_ts")
    val sessions = Sessionize.sessionsTws(df, "key", "event_ts",
      gapMs = 60000L, watermark = "10 seconds")
    val q = sessions.toDF()
      .writeStream.format("memory").queryName("sess_tws").outputMode(OutputMode.Append)
      .start()
    try {
      q.processAllAvailable()
      mem.addData(("c", ts(100000)))
      q.processAllAvailable()
      mem.addData(("c", ts(100001)))
      q.processAllAvailable()
      val got = spark.table("sess_tws")
        .filter(col("key").isin("a", "b"))
        .select("key", "startMs", "endMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet
      // identical closed-session set to the flatMapGroupsWithState twin
      assert(got === Set(
        ("a", base, base + 30000L, 2L),
        ("a", base + 500000L, base + 500000L, 1L),
        ("b", base + 10000L, base + 10000L, 1L)))
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
