package graft

import org.apache.spark.sql.functions._
import graft.checks._
import graft.core._
import graft.operators.Profiler
import graft.similarity.Similarity

class OperatorsSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("heap top-k aggregate matches the ranking-window baseline exactly") {
    val queries = embs.filter(col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val heap = key(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 7))
    val window = key(Similarity.bruteForceTopKWindow(embs, queries, "vec_id", "embedding", 7))
    assert(heap == window)
    assert(heap.size == 8 * 7)
  }

  test("invalid union tags every row with each failing check") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, null, 20.0), (3L, "c", -5.0), (4L, null, -1.0)
    ).toDF("id", "name", "amount")
    val mgr = new DQManager(spark, "t")
    mgr.setData(df)
    mgr.addCheck(new CompletenessColRatioCheck("t", "r", SeverityLevel.High, "name_complete", Seq("name"), 1.0))
    mgr.addCheck(new ValidityCheck("t", "r", SeverityLevel.High, "amount_pos", col("amount") > 0, 1.0))
    val u = mgr.run().getInvalidUnionDf()
    val got = u.select("id", "__graft_failed_check").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // row 2: null name; row 3: negative; row 4: both
    assert(got == Set(
      (2L, "name_complete"), (4L, "name_complete"),
      (3L, "amount_pos"), (4L, "amount_pos")))
  }

  test("profiler: one-pass exact stats and sketch row") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = Profiler.profileExact(li, Seq("l_quantity", "l_returnflag"))
    val rows = exact.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("l_quantity").getAs[Long]("n_non_null") == 6000L)
    assert(rows("l_quantity").getAs[Double]("min_val") >= 1.0)
    assert(rows("l_returnflag").getAs[Any]("min_val") == null) // non-numeric
    assert(rows("l_returnflag").getAs[Long]("n_distinct") == 3L)

    val wide = Profiler.profileRow(li, Seq("l_quantity", "l_shipdate"))
    val r = wide.head()
    assert(r.getAs[Long]("l_quantity__count") == 6000L)
    assert(r.getAs[Double]("l_quantity__p25") <= r.getAs[Double]("l_quantity__p50"))
    assert(r.getAs[Double]("l_quantity__p50") <= r.getAs[Double]("l_quantity__p75"))
    // sketch distinct close to exact (HLL++ default rsd = 5%, allow 3σ)
    val approx = r.getAs[Long]("l_quantity__approx_distinct").toDouble
    val exactD = li.select(countDistinct("l_quantity")).head().getLong(0).toDouble
    assert(math.abs(approx - exactD) / exactD < 0.15)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "key", "payload")
    val out = graft.streaming.StreamingDQ.streamingDedup(df, "ts", Seq("key"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      mem.addData((ts(1), 1L, "a"), (ts(2), 1L, "dup"), (ts(3), 2L, "b"))
      q.processAllAvailable()
      mem.addData((ts(4), 1L, "dup2"), (ts(5), 3L, "c"))
      q.processAllAvailable()
      val keys = spark.table("dedup_stream").select("key").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
