package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingFunnel

class StreamingFunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  private def withRocksDb[T](f: => T): T = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  test("streaming funnel: shuffled cross-batch arrival converges to the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // u1 completes all 3 stages in order; u2 clicks BEFORE viewing (stage
    // stalls at view); u3 views only. Events arrive shuffled across 3
    // batches — including the purchase before its click.
    val events = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u2", "click", 5L), ("u2", "view", 8L), ("u2", "purchase", 50L),
      ("u3", "view", 1L))
    val batches = Seq(
      Seq(("u1", "purchase", 30L), ("u2", "view", 8L)),
      Seq(("u1", "view", 10L), ("u3", "view", 1L), ("u2", "purchase", 50L)),
      Seq(("u1", "click", 20L), ("u2", "click", 5L)))
    withRocksDb {
      val mem = MemoryStream[(String, String, Long)]
      val df = mem.toDF().toDF("user", "event_type", "ts")
      val out = StreamingFunnel.runningFunnel(df, stages)
      val q = out.writeStream.format("memory").queryName("sfunnel")
        .outputMode("update").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // last emitted stage per user (Update mode: latest row wins)
        val last = spark.table("sfunnel").collect()
          .map(r => (r.getString(0), r.getInt(1)))
          .groupBy(_._1).map { case (u, rs) => u -> rs.last._2 }
        // batch-operator truth on the same events
        val ev = events.toDF("user_id", "event_type", "ts")
        val batch = graft.operators.Funnel
          .firstTouch(ev, "user_id", "event_type", "ts", stages)
          .select(col("user_id"),
            when(col("t0").isNotNull && col("t1").isNotNull && col("t2").isNotNull
                && col("t0") <= col("t1") && col("t1") <= col("t2"), 2)
              .when(col("t0").isNotNull && col("t1").isNotNull
                && col("t0") <= col("t1"), 1)
              .when(col("t0").isNotNull, 0)
              .otherwise(-1).as("stage"))
          .collect().map(r => (r.getString(0), r.getInt(1))).toMap
        assert(last === batch)
        assert(last === Map("u1" -> 2, "u2" -> 0, "u3" -> 0))
      } finally q.stop()
    }
  }

  test("streaming funnel: out-of-order within one batch still takes the min first-touch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(String, String, Long)]
      val df = mem.toDF().toDF("user", "event_type", "ts")
      val out = StreamingFunnel.runningFunnel(df, stages)
      val q = out.writeStream.format("memory").queryName("sfunnel2")
        .outputMode("update").start()
      try {
        // a LATER view lands first in the iterator; the min (ts=2) must win,
        // making view(2) <= click(3) a completed stage
        mem.addData(("u", "view", 9L), ("u", "click", 3L), ("u", "view", 2L))
        q.processAllAvailable()
        val last = spark.table("sfunnel2").collect().map(_.getInt(1)).last
        assert(last === 1)
      } finally q.stop()
    }
  }
}
