package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingHeavyHitters, StreamingQuantiles}

/** Batch/streaming sketch-state unification: the streaming processors
  * persist the SAME representations the batch Aggregators aggregate
  * (CMS flat counter array, DDSketch bucket maps), through the shared
  * `CmsAlgebra` / `DdSketchAlgebra`. Both algebras are
  * order-independent, so a stream split into arbitrary micro-batches
  * must reproduce the one-pass batch sketch BIT-FOR-BIT — the same
  * contract `StreamingDistinct` already proves for HLL registers. */
class StreamingSketchUnifySpec extends SparkSpec {

  private val provKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("streaming CMS registers across micro-batches == batch Aggregator, bit-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val (depth, width) = (4, 32)
      val items = (0 until 3000).map(i => s"tok${i % 97}")
      val mem = MemoryStream[String]
      val out = StreamingHeavyHitters.runningCmsRegisters(
        mem.toDF().toDF("item"), depth, width, md5Hash = true, nShards = 4)
      val q = out.writeStream.format("memory").queryName("scms")
        .outputMode("update").start()
      try {
        items.grouped(700).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }

        val latest = spark.table("scms").collect()
          .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n"), r.getAs[Seq[Long]]("regs").toArray))
          .groupBy(_._1).values.map(_.maxBy(_._2)._3).toSeq
        val streamed = StreamingHeavyHitters.mergedCmsRegisters(latest, depth, width)

        // batch: same tokens through the Aggregator (one array per row)
        val batch = items.map(i => Seq(i)).toDF("toks")
          .agg(graft.functions.CountMinSketchAgg.columnFn(depth, width)(col("toks")))
          .head().getSeq[Long](0).toArray
        assert(streamed.sameElements(batch), "shard-summed streaming registers != batch CMS")
        // and the shared estimate reads a true upper bound off them
        val est = graft.functions.CmsAlgebra.estimate(streamed, "tok7", depth, width, md5Hash = true)
        val truth = items.count(_ == "tok7")
        assert(est >= truth && est <= items.size)
      } finally q.stop()
    }
  }

  test("streaming DDSketch quantiles across micro-batches == batch Aggregator, bit-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val rnd = new scala.util.Random(23)
      val probs = Seq(0.1, 0.5, 0.9)
      val alpha = 0.01
      val rows = (0 until 4000).map { i =>
        (if (i % 2 == 0) "a" else "b",
          // mixed-sign + exact-zero values exercise all three bucket maps
          math.round((rnd.nextGaussian() * 10 + 2) * 100) / 100.0 * (if (i % 17 == 0) 0 else 1))
      }
      val mem = MemoryStream[(String, Double)]
      val out = StreamingQuantiles.runningGroupQuantilesDD(
        mem.toDF().toDF("key", "value"), probs, alpha)
      val q = out.writeStream.format("memory").queryName("sdd")
        .outputMode("update").start()
      try {
        rows.grouped(900).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }

        // latest report per (key, prob) = the row carrying that key's max n
        val streamed = spark.table("sdd").collect()
          .map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
            r.getAs[Double]("prob"), r.getAs[Double]("value")))
          .groupBy(t => (t._1, t._3)).map { case (kp, vs) => kp -> vs.maxBy(_._2)._4 }

        val batch = rows.toDF("key", "value")
          .groupBy("key")
          .agg(graft.functions.DDSketchQuantiles.columnFn(alpha, probs)(col("value")).as("qs"))
          .collect()
          .flatMap(r => probs.zip(r.getSeq[Double](1)).map { case (p, v) =>
            (r.getString(0), p) -> v
          }).toMap

        assert(streamed.keySet === batch.keySet)
        // bit-identical doubles — bucket-count addition is exact, so the
        // replayed stream reads the same quantile values as one batch pass
        streamed.foreach { case (kp, v) =>
          assert(v === batch(kp), s"stream/batch mismatch at $kp: $v vs ${batch(kp)}")
        }
      } finally q.stop()
    }
  }
}
