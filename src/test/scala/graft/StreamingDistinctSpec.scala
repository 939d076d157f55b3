package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDistinct

class StreamingDistinctSpec extends SparkSpec {

  test("streaming HLL across micro-batches + replay == batch sketch, bit-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val keys = (0 until 3000).map(i => s"user${i % 1100}") // dups + 1100 distinct
      val mem = MemoryStream[String]
      val out = StreamingDistinct.runningDistinct(mem.toDF().toDF("key"), p = 8, nShards = 4)
      val q = out.writeStream.format("memory").queryName("sd")
        .outputMode("update").start()
      try {
        val batches = keys.grouped(1000).toSeq
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        mem.addData(batches.head: _*) // replay the first batch wholesale
        q.processAllAvailable()

        // latest report per shard = the row carrying that shard's max n
        val latest = spark.table("sd").collect()
          .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n"), r.getAs[Array[Byte]]("regs")))
          .groupBy(_._1).values.map(_.maxBy(_._2)._3).toSeq
        val streamed = StreamingDistinct.mergedEstimate(latest, p = 8)

        val batch = graft.operators.Sketches.hllDistinct(
            keys.toDF("key").withColumn("g", lit(1)), Seq("g"), "key", p = 8)
          .head
        // bit-identical, not within-tolerance: same harmonic sum, same
        // zero count, same (unrounded vs rounded-2dp) estimate
        assert(streamed.harmonicSumScaled === batch.getAs[Long]("harmonic_sum_scaled"))
        assert(streamed.zeros === batch.getAs[Int]("zero_registers"))
        assert(math.abs(streamed.est - batch.getAs[Double]("est_distinct")) < 0.011)
        // and the estimate is in range for 1100 distinct
        assert(math.abs(streamed.est / 1100.0 - 1.0) < 0.2)
      } finally q.stop()
    } finally prevProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
