package graft

import org.apache.spark.sql.functions._
import graft.functions.{CountMinSketchAgg, HllAlgebra, KmvSketchAgg, Md5Hash60}
import graft.operators.Sketches

/** Randomized reference-equality fuzz for the hand-written sketch
  * reduce/merge code: random key multisets, random shard splits and
  * merge orders, every k regime (buffer far below / at / above k) —
  * each sketch must equal a plain-Scala reference computation exactly.
  */
class RandomizedSketchSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  private def randomKeys(n: Int, domain: Int): Seq[String] =
    Seq.fill(n)(s"key${rnd.nextInt(domain)}")

  test("KMV reduce/merge equals reference k-min-of-distinct under random shard splits") {
    for (k <- Seq(2, 3, 17, 64); trial <- 1 to 5) {
      val keys = randomKeys(n = rnd.nextInt(400) + 10, domain = rnd.nextInt(300) + 5)
      val ref = keys.distinct.map(Md5Hash60.hash60).sorted.take(k).toArray
      val agg = new KmvSketchAgg(k)
      // random number of shards, random assignment, random merge order
      val nShards = rnd.nextInt(6) + 1
      val shards = keys.groupBy(_ => rnd.nextInt(nShards)).values.toSeq
      val sketches = rnd.shuffle(shards.map(_.foldLeft(agg.zero) {
        (b, s) => agg.reduce(b, Some(s))
      }))
      val merged = sketches.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq === ref.toSeq, s"k=$k trial=$trial")
    }
  }

  test("CMS counters equal reference counting for every key, any split") {
    val depth = 3; val width = 8
    for (trial <- 1 to 5) {
      val keys = randomKeys(n = rnd.nextInt(300) + 20, domain = 40)
      val agg = new CountMinSketchAgg(depth, width)
      val shards = keys.groupBy(_ => rnd.nextInt(4)).values.toSeq
      val merged = rnd.shuffle(shards.map(sh =>
          agg.reduce(agg.zero, Some(sh))))
        .foldLeft(agg.zero)(agg.merge)
      // reference: count every (row, bucket) hit directly
      val ref = new Array[Long](depth * width)
      keys.foreach { key =>
        (0 until depth).foreach { j =>
          ref(j * width + (Md5Hash60.hash60(s"$j:$key") % width).toInt) += 1
        }
      }
      assert(merged.toSeq === ref.toSeq, s"trial=$trial")
      // point estimates: min over rows >= true count
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (key, t) =>
        val est = (0 until depth).map(j =>
          merged(j * width + (Md5Hash60.hash60(s"$j:$key") % width).toInt)).min
        assert(est >= t)
      }
    }
  }

  test("HLL registers equal reference max-rank per bucket, any split") {
    val p = 8
    for (trial <- 1 to 5) {
      val keys = randomKeys(n = rnd.nextInt(2000) + 100, domain = 3000)
      val shards = keys.groupBy(_ => rnd.nextInt(5)).values.toSeq
      val merged = shards.map { sh =>
        val r = new Array[Byte](1 << p)
        sh.foreach(HllAlgebra.update(r, _, p))
        r
      }.foldLeft(new Array[Byte](1 << p))(HllAlgebra.mergeInto)
      val ref = new Array[Byte](1 << p)
      keys.distinct.foreach { key =>
        val h = Md5Hash60.hash60(key)
        val idx = (h % (1 << p)).toInt
        val w = h >>> p
        val rho = if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > ref(idx)) ref(idx) = rho.toByte
      }
      assert(merged.toSeq === ref.toSeq, s"trial=$trial")
    }
  }

  test("streaming KMV across micro-batches + replay == batch sketch, bit-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val keys = (0 until 2400).map(i => s"user${i % 900}")
      val mem = MemoryStream[String]
      val out = graft.streaming.StreamingDistinct.runningKmv(
        mem.toDF().toDF("key"), k = 64, nShards = 4)
      val q = out.writeStream.format("memory").queryName("skmv")
        .outputMode("update").start()
      try {
        val batches = keys.grouped(800).toSeq
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(batches.last: _*) // at-least-once replay
        q.processAllAvailable()
        val latest = spark.table("skmv").collect()
          .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n"), r.getAs[Seq[Long]]("mins")))
          .groupBy(_._1).values.map(_.maxBy(_._2)._3.toArray).toSeq
        val merged = graft.streaming.StreamingDistinct.mergedKmv(latest, k = 64)
        val ref = keys.distinct.map(Md5Hash60.hash60).sorted.take(64)
        assert(merged.toSeq === ref)
        // and the estimate off it matches the batch column path
        val est = Sketches.kmvDistinct(keys.toDF("key").withColumn("g", lit(1)),
          Seq("g"), "key", k = 64).select("est_distinct").head.getDouble(0)
        val kth = ref.last
        assert(est === 63.0 * Md5Hash60.Range / kth)
      } finally q.stop()
    } finally prevProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
