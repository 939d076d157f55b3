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

  test("conversionGate: planted conversion collapse alarms, baseline-rate batch does not") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[(String, String, Long)]
      val df = mem.toDF().toDF("user", "event_type", "ts")
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double, Boolean)]
      // baseline view->click conversion: 900/1000 = 0.9
      val q = StreamingFunnel.conversionGate(df, stages,
        fromStage = 0, toStage = 1, baselineFrom = 1000L, baselineTo = 900L,
        alpha = 0.01) { (id, nf, nt, z, p, dropped) =>
        results.synchronized { results += ((id, nf, nt, z, p, dropped)) }
      }
      try {
        // batch 1: 50 users at exactly the baseline rate (45 convert)
        val b1 = (0 until 50).flatMap { i =>
          Seq((s"u$i", "view", 10L)) ++
            (if (i < 45) Seq((s"u$i", "click", 20L)) else Nil)
        }
        mem.addData(b1: _*); q.processAllAvailable()
        // batch 2: 200 NEW users who only view — conversion collapses
        val b2 = (0 until 200).map(i => (s"v$i", "view", 30L))
        mem.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      val byBatch = results.sortBy(_._1)
      assert(byBatch.size == 2, s"got $byBatch")
      val (_, nf0, nt0, z0, p0, d0) = byBatch(0)
      assert(nf0 == 50L && nt0 == 45L && math.abs(z0) < 1e-9 && p0 > 0.4 && !d0,
        s"baseline-rate batch must not alarm: $byBatch")
      val (_, nf1, nt1, z1, p1, d1) = byBatch(1)
      assert(nf1 == 200L && nt1 == 0L && z1 < -10 && p1 < 1e-10 && d1,
        s"collapse must alarm: $byBatch")
    }
  }

  test("Stats tails match reference values (chi-square and normal)") {
    import graft.operators.Stats
    // chi2 df=2: SF(x) = exp(-x/2) exactly
    Seq(0.5, 1.0, 5.0, 20.0).foreach { x =>
      assert(math.abs(Stats.chiSquareSf(x, 2) - math.exp(-x / 2)) < 1e-12, s"x=$x")
    }
    // chi2 df=1: SF(x) = 2*normalSf(sqrt(x))
    Seq(1.0, 3.84, 6.63).foreach { x =>
      assert(math.abs(Stats.chiSquareSf(x, 1) - 2 * Stats.normalSf(math.sqrt(x))) < 1e-12)
    }
    // classic normal quantiles
    assert(math.abs(Stats.normalSf(1.6448536269514722) - 0.05) < 1e-9)
    assert(math.abs(Stats.normalSf(2.3263478740408408) - 0.01) < 1e-9)
    assert(math.abs(Stats.normalSf(0.0) - 0.5) < 1e-15)
    assert(math.abs(Stats.normalSf(-1.6448536269514722) - 0.95) < 1e-9)
    // chi2 critical value sanity: P(X > 5.991 | df=2) ~ 0.05
    assert(math.abs(Stats.chiSquareSf(5.991464547107979, 2) - 0.05) < 1e-9)
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
