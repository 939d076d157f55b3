package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream join coverage: watermarked interval join (the streaming
  * twin of the batch as-of/attribution shape) — state on both sides is
  * bounded by the watermark + join interval, so it runs indefinitely. */
class StreamJoinSpec extends SparkSpec {

  test("watermarked stream-stream interval join: purchase attributed to prior click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)

    val clicks = MemoryStream[(Long, String, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, String, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("click_id", "user", "click_ts")
      .withWatermark("click_ts", "10 seconds")
    val p = purchases.toDF().toDF("purchase_id", "puser", "purchase_ts")
      .withWatermark("purchase_ts", "10 seconds")
    // purchase joins any click by the same user within the preceding hour
    val joined = p.join(c,
      col("puser") === col("user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id", "user")

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, "u1", ts(0)), (2L, "u1", ts(100)), (3L, "u2", ts(50)))
      purchases.addData((10L, "u1", ts(120)), (11L, "u2", ts(2000)), (12L, "u2", ts(5000)))
      q.processAllAvailable()
      // u1 purchase @120s joins clicks @0 and @100 (both within 1h before);
      // u2 purchase @2000s joins click @50 (1950s < 1h);
      // u2 purchase @5000s matches nothing (4950s > 1h)
      val got = spark.table("attrib")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 1L), (10L, 2L), (11L, 3L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits null-padded rows once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)

    val clicks = MemoryStream[(Long, String, java.sql.Timestamp)]
    val convs = MemoryStream[(Long, String, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("click_id", "user", "click_ts")
      .withWatermark("click_ts", "5 seconds")
    val v = convs.toDF().toDF("conv_id", "cuser", "conv_ts")
      .withWatermark("conv_ts", "5 seconds")
    // left = clicks; a click converts if a conversion follows within 60s
    val joined = c.join(v,
      col("user") === col("cuser") &&
        col("conv_ts") >= col("click_ts") &&
        col("conv_ts") < col("click_ts") + expr("INTERVAL 60 SECONDS"),
      "left_outer")
      .select(col("click_id"), col("conv_id"))

    val q = joined.writeStream.format("memory").queryName("leftattrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, "u1", ts(0)), (2L, "u2", ts(10)))
      convs.addData((100L, "u1", ts(30)))
      q.processAllAvailable()
      // advance both watermarks far past click@10 + 60s so the unmatched
      // left row is finalized and emitted null-padded
      clicks.addData((3L, "u9", ts(500)))
      convs.addData((101L, "u9", ts(500)))
      q.processAllAvailable()
      clicks.addData((4L, "u9", ts(900)))
      convs.addData((102L, "u9", ts(900)))
      q.processAllAvailable()
      val got = spark.table("leftattrib")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got(1L) == 100L)  // matched within the window
      assert(got(2L) == -1L)   // u2 never converted -> null-padded after watermark
    } finally q.stop()
  }
}
