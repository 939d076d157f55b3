package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.SpaceSaving

class StreamingHeavyHittersSpec extends SparkSpec {

  test("SpaceSaving: count bounds bracket truth; every item above n/k is tracked; O(k) state") {
    val rnd = new scala.util.Random(13)
    val k = 20
    val ss = new SpaceSaving(k)
    // zipf-ish: item i drawn with weight ~ 1/(i+1)
    val items = Array.fill(30000) {
      val u = rnd.nextDouble()
      s"item${math.min((math.exp(u * math.log(500.0)) - 1).toInt, 499)}"
    }
    items.foreach(ss.insert)
    val truth = items.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = items.length.toLong
    val tracked = ss.entries
    assert(tracked.size <= k)
    tracked.foreach { case (item, c, e) =>
      val t = truth(item)
      assert(c - e <= t && t <= c, s"$item: true $t outside [${c - e}, $c]")
    }
    // deterministic guarantee: true frequency > n/k => tracked
    val mustTrack = truth.filter(_._2 > n / k).keySet
    val trackedKeys = tracked.map(_._1).toSet
    assert(mustTrack.nonEmpty && mustTrack.subsetOf(trackedKeys),
      s"missed guaranteed hitters: ${mustTrack -- trackedKeys}")
    // state round-trip
    val rt = SpaceSaving.fromState(k, ss.toState)
    assert(rt.n == n && rt.entries == tracked)
  }

  test("streaming shards accumulate across batches; merged report brackets global truth") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(29)
      val data = Array.fill(8000) {
        val u = rnd.nextDouble()
        s"k${math.min((math.exp(u * math.log(200.0)) - 1).toInt, 199)}"
      }
      val mem = MemoryStream[String]
      val out = StreamingHeavyHitters.runningHeavyHitters(
        mem.toDF().toDF("item"), k = 16, nShards = 4)
      val q = out.writeStream.format("memory").queryName("hh")
        .outputMode("update").start()
      try {
        data.grouped(2000).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
        // latest report per shard = rows carrying that shard's max n
        val maxN = spark.table("hh").groupBy("shard").agg(max("n").as("n"))
          .withColumnRenamed("shard", "s2").withColumnRenamed("n", "n2")
        val latest = spark.table("hh")
          .join(maxN, col("shard") === col("s2") && col("n") === col("n2"))
          .drop("s2", "n2")
        val truth = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
        // every shard processed every one of its events exactly once
        assert(latest.select(sum(lit(1))).head().getLong(0) > 0)
        assert(latest.groupBy().agg(max("n")).head().getLong(0) <= data.length)
        val merged = StreamingHeavyHitters.mergeReports(latest, top = 10).collect()
        assert(merged.length == 10)
        merged.foreach { r =>
          val (item, c, e) = (r.getString(0), r.getLong(1), r.getLong(2))
          val t = truth(item)
          assert(c - e <= t && t <= c, s"$item: true $t outside [${c - e}, $c]")
        }
        // the true top item must surface in the merged top-10
        val trueTop = truth.maxBy(_._2)._1
        assert(merged.map(_.getString(0)).contains(trueTop))
      } finally q.stop()
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
