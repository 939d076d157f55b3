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
}
