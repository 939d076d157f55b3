package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.multimodal._
import graft.streaming.StreamingDQ
import graft.checks.CompletenessColRatioCheck
import graft.core.SeverityLevel

class MultimodalStreamingSpec extends SparkSpec {

  test("multimodal: payload synthesis, byte stats, partition-wise feature extraction") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.synthesizePayload(docs, "doc_id", "text")
    val stats = Multimodal.byteStats(media)
    assert(stats.columns.toSeq == Seq("media_id", "n_bytes", "sha256", "sniffed_type"))
    // UTF-8 byte length >= char length (multibyte text) and > 0
    val joined = stats.join(docs.select(col("doc_id").as("media_id"), length(col("text")).as("n_chars")), "media_id")
    assert(joined.filter(col("n_bytes") < col("n_chars")).count() == 0)
    assert(stats.filter(col("sniffed_type") =!= "bin").count() == 0) // text payloads

    val records = Multimodal.asRecords(spark, media)
    val feats = Multimodal.extractFeatures(records, () => new DeterministicFakeDecoder(8))
    val f1 = feats.collect().map(f => f.mediaId -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(records, () => new DeterministicFakeDecoder(8))
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(f1 == f2, "fake decoder must be deterministic")
    assert(f1.values.forall(_.length == 8))

    // magic-byte sniffing on real signatures
    val s = spark
    import s.implicits._
    val bins = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
      (3L, Array[Byte](0x52, 0x49, 0x46, 0x46, 0x00))).toDF("media_id", "payload")
    val types = bins.select(col("media_id"), Multimodal.sniffType(col("payload")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff"))
  }

  test("streaming: windowed completeness with watermark over MemoryStream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, java.lang.Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingDQ.windowedCompleteness(df, "ts", Seq("value"), Seq("event_type"),
      windowDuration = "10 minutes", watermark = "20 minutes")
    val q = agg.writeStream.format("memory").queryName("dq_windows").outputMode("update").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      mem.addData((ts(1), "a", 1.0), (ts(2), "a", null), (ts(11), "b", 3.0))
      q.processAllAvailable()
      val rows = spark.table("dq_windows").collect()
      assert(rows.nonEmpty)
      val aRow = rows.find(r => r.getAs[String]("event_type") == "a").get
      assert(aRow.getAs[Double]("value_ratio") == 0.5)
      assert(aRow.getAs[Long]("n_rows") == 2L)
    } finally q.stop()
  }

  test("streaming: mapGroupsWithState carries running metrics across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("key", "ok")
    val out = graft.streaming.StreamingDQ.runningCompleteness(df)
    val q = out.writeStream.format("memory").queryName("running_dq").outputMode("update").start()
    try {
      mem.addData(("a", 1), ("a", 0), ("b", 1))
      q.processAllAvailable()
      mem.addData(("a", 1), ("a", 1))
      q.processAllAvailable()
      val rows = spark.table("running_dq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // batch 1: a → (2,1); batch 2 CUMULATIVE: a → (4,3)
      assert(rows.contains(("a", 2L, 1L)))
      assert(rows.contains(("a", 4L, 3L)))
      assert(rows.contains(("b", 1L, 1L)))
    } finally q.stop()
  }

  test("streaming: transformWithState twin matches mapGroupsWithState semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("key", "ok")
    // transformWithState needs the RocksDB provider (multi-column-family state)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = graft.streaming.StreamingDQ.runningCompletenessTws(df)
    val q = out.writeStream.format("memory").queryName("running_tws").outputMode("update").start()
    try {
      mem.addData(("a", 1), ("a", 0), ("b", 1))
      q.processAllAvailable()
      mem.addData(("a", 1), ("a", 1))
      q.processAllAvailable()
      val rows = spark.table("running_tws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // identical cumulative trajectory to the mapGroupsWithState twin
      assert(rows.contains(("a", 2L, 1L)))
      assert(rows.contains(("a", 4L, 3L)))
      assert(rows.contains(("b", 1L, 1L)))
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("streaming: space-saving heavy hitters — exact when under capacity, cumulative across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val df = mem.toDF().toDF("group", "item")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = graft.streaming.StreamingDQ.streamingHeavyHitters(df, capacity = 8, k = 2)
    val q = out.writeStream.format("memory").queryName("hh_exact").outputMode("update").start()
    try {
      mem.addData(("g", "whale"), ("g", "whale"), ("g", "x"), ("g", "y"))
      q.processAllAvailable()
      mem.addData(("g", "whale"), ("g", "x"))
      q.processAllAvailable()
      val rows = spark.table("hh_exact").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      // batch 1: whale 2; batch 2 cumulative: whale 3, x 2 — all exact
      assert(rows.contains(("g", 1, "whale", 2L, 0L)))
      assert(rows.contains(("g", 1, "whale", 3L, 0L)))
      assert(rows.contains(("g", 2, "x", 2L, 0L)))
      assert(rows.forall(_._5 == 0L)) // under capacity -> no overcounts
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("streaming: space-saving heavy hitters — whale survives eviction pressure with bounded state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val df = mem.toDF().toDF("group", "item")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = graft.streaming.StreamingDQ.streamingHeavyHitters(df, capacity = 3, k = 3)
    val q = out.writeStream.format("memory").queryName("hh_evict").outputMode("update").start()
    try {
      // whale: 16 of 36 rows; 20 distinct singletons (cardinality 21 >>
      // capacity 3). 16 > N/capacity = 12, so the space-saving theorem
      // guarantees the whale is tracked at the end REGARDLESS of the
      // arrival order inside each micro-batch.
      val whale = Seq.fill(16)("g" -> "whale")
      val noise = (1 to 20).map(i => "g" -> s"n$i")
      mem.addData(noise.take(10) ++ whale.take(8): _*)
      q.processAllAvailable()
      mem.addData(noise.drop(10) ++ whale.drop(8): _*)
      q.processAllAvailable()
      val last = spark.table("hh_evict").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .filter(_._4 >= 16L) // final-batch rows (whale est >= its true count)
      val whaleRow = last.find(_._3 == "whale")
      assert(whaleRow.isDefined, s"whale missing from $last")
      // space-saving bound: true <= est <= true + max_overcount
      val (_, _, _, est, over) = whaleRow.get
      assert(est >= 16L && est - over <= 16L)
      // state bound: never more than `capacity` items per group per batch
      val all = spark.table("hh_evict").collect()
      assert(all.length <= 2 * 3)
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("streaming: row-local curation ops (split, stratified sample, temperature thresholds) run unchanged on a stream and match batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = (1L to 300L).map(i => (i, s"s${i % 5}"))
    val batchDf = rows.toDF("id", "stratum")
    val mem = MemoryStream[(Long, String)]
    // md5-threshold ops are pure row-local projections/filters — no
    // aggregation, no watermark, no state — so the SAME operator code is
    // streaming-safe and produces the batch-identical deterministic result
    val streamed = graft.operators.Splits.stratifiedSample(
      graft.operators.Splits.assignSplit(
        mem.toDF().toDF("id", "stratum"), "id"),
      "stratum", "id", Map("s0" -> 128, "s1" -> 256), defaultUpper = 64)
    val q = streamed.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = s.table("curation_stream")
      .select("id", "stratum", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = graft.operators.Splits.stratifiedSample(
      graft.operators.Splits.assignSplit(batchDf, "id"),
      "stratum", "id", Map("s0" -> 128, "s1" -> 256), defaultUpper = 64)
      .select("id", "stratum", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("streaming: observed check metrics arrive per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("id", "name")
    val check = new CompletenessColRatioCheck("stream", "r", SeverityLevel.High,
      "sc", Seq("name"), 0.5)
    val observed = StreamingDQ.observedMetrics(df, Seq(check), "dq_obs")
    val listener = new StreamingDQ.MetricsListener("dq_obs")
    spark.streams.addListener(listener)
    val q = observed.writeStream.format("noop").start()
    try {
      mem.addData((1L, "x"), (2L, null), (3L, "y"), (4L, "z"))
      q.processAllAvailable()
      // listener delivery is async relative to processAllAvailable
      val deadline = System.currentTimeMillis() + 10000
      while (listener.batches.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.batches.nonEmpty, "no observed metrics arrived")
      val ratio = listener.batches.head("sc__name") // aggAlias(metricName, col)
      assert(ratio.asInstanceOf[Double] == 0.75)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
