package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingQuantiles
import graft.streaming.StreamingQuantiles.GKSketch

class StreamingQuantilesSpec extends SparkSpec {

  /** smallest |true rank − target| over the returned value's rank band
    * `[count(<v)+1, count(<=v)]`. */
  private def rankError(sorted: Array[Double], v: Double, target: Long): Long = {
    val lo = sorted.count(_ < v) + 1L
    val hi = sorted.count(_ <= v).toLong
    if (target < lo) lo - target else if (target > hi) target - hi else 0L
  }

  test("GKSketch: eps rank bound and sublinear state over 50k inserts") {
    val rnd = new scala.util.Random(11)
    val eps = 0.01
    val sk = new GKSketch(eps)
    val xs = Array.fill(50000)(rnd.nextGaussian() * 10 + 3)
    xs.foreach(sk.insert)
    val sorted = xs.sorted
    val n = xs.length.toLong
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val err = rankError(sorted, sk.query(p), target)
      assert(err <= math.ceil(eps * n).toLong + 1,
        s"p=$p rank error $err > ${math.ceil(eps * n).toLong}")
    }
    // GK state is O((1/eps) log(eps n)), nowhere near n
    assert(sk.tupleCount < 2000, s"state blew up: ${sk.tupleCount} tuples for $n inserts")
    // state round-trip preserves the summary exactly
    val rt = GKSketch.fromState(eps, sk.toState)
    assert(rt.n == n && Seq(0.1, 0.5, 0.9).forall(p => rt.query(p) == sk.query(p)))
  }

  test("streaming GK quantiles agree with exact ranks and the batch GK within eps across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7)
      val eps = 0.05
      val probs = Seq(0.1, 0.5, 0.9)
      val data = (1 to 3000).map(_ => ("a", rnd.nextGaussian() * 5)) ++
        (1 to 2000).map(_ => ("b", rnd.nextDouble() * 100))
      val mem = MemoryStream[(String, Double)]
      val out = StreamingQuantiles.runningGroupQuantiles(
        mem.toDF().toDF("key", "value"), probs, eps)
      val q = out.writeStream.format("memory").queryName("gkq")
        .outputMode("update").start()
      try {
        // state must survive and accumulate across many micro-batches
        data.grouped(800).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val byKey = data.groupBy(_._1).view.mapValues(_.map(_._2).toArray.sorted).toMap
        val finals = spark.table("gkq")
          .groupBy("key", "prob").agg(max(struct(col("n"), col("value"))).as("s"))
          .select(col("key"), col("prob"), col("s.n").as("n"), col("s.value").as("value"))
          .collect()
        assert(finals.length == probs.size * 2)
        val batch = graft.operators.Profiler.groupQuantilesApprox(
          data.toDF("k", "v"), "k", "v", probs, accuracy = 10000)
          .collect().map { r =>
            val k = r.getString(0)
            k -> probs.zipWithIndex.map { case (p, i) => p -> r.getDouble(2 + i) }.toMap
          }.toMap
        finals.foreach { r =>
          val (k, p) = (r.getString(0), r.getDouble(1))
          val sorted = byKey(k)
          val n = sorted.length.toLong
          assert(r.getLong(2) == n, s"$k saw ${r.getLong(2)} of $n events")
          val target = math.max(1L, math.ceil(p * n).toLong)
          val errStream = rankError(sorted, r.getDouble(3), target)
          assert(errStream <= math.ceil(eps * n).toLong + 1,
            s"stream $k p=$p rank error $errStream")
          // batch/stream agreement: both sketches' answers sit within their
          // combined rank tolerance of each other
          val errBatch = rankError(sorted, batch(k)(p), target)
          assert(errStream + errBatch <= math.ceil((eps + 1e-4) * n).toLong + 2,
            s"batch/stream disagree beyond eps at $k p=$p")
        }
      } finally q.stop()
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
