package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Round-4 batch 3: sparse TF-IDF cosine pairs, linear-interpolation
  * resample, streaming sliding-window volume. */
class Round4cSpec extends SparkSpec {

  test("sparseCosinePairs matches a dense brute-force computation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),        // identical to 1
      (3L, "alpha beta delta delta"),
      (4L, "epsilon zeta"),            // shares nothing with 1-3
      (5L, "epsilon zeta")
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis
      .sparseCosinePairs(docs, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dense reference
    val texts = Map(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "alpha beta delta delta", 4L -> "epsilon zeta", 5L -> "epsilon zeta")
    val tf = texts.map { case (d, t) =>
      d -> t.split("\\s+").groupBy(identity).map { case (k, v) => k -> v.length }
    }
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (k, v) => k -> v.size }
    val n = texts.size.toDouble
    val w = tf.map { case (d, m) =>
      d -> m.map { case (t, f) => t -> f * math.log(n / (dfreq(t) + 1)) }
    }
    def cos(a: Map[String, Double], b: Map[String, Double]): Double = {
      val dot = a.keySet.intersect(b.keySet).toSeq.map(t => a(t) * b(t)).sum
      dot / (math.sqrt(a.values.map(x => x * x).sum) * math.sqrt(b.values.map(x => x * x).sum))
    }
    for (i <- texts.keys; j <- texts.keys if i < j) {
      val want = cos(w(i), w(j))
      got.get((i, j)) match {
        case Some(g) => assert(math.abs(g - want) < 1e-5, s"pair ($i,$j)")
        case None => assert(want.isNaN || want < 1e-9, s"missing pair ($i,$j) want=$want")
      }
    }
    assert(got((1L, 2L)) > 0.999) // identical docs
    assert(!got.contains((1L, 4L))) // disjoint vocab -> no postings row
  }

  test("sparseCosinePairs maxDf prunes ubiquitous-term postings") {
    val s = spark
    import s.implicits._
    // 'the' occurs in all docs; with maxDf=2 it must generate no pairs
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the bird")).toDF("doc_id", "text")
    val pruned = graft.text.TextAnalysis
      .sparseCosinePairs(docs, "doc_id", "text", threshold = 0.0, maxDf = 2)
    assert(pruned.isEmpty) // cat/dog/bird unique -> only 'the' co-occurs, and it's pruned
  }

  test("resampleLinearByKey interpolates interior gaps, leaves edge gaps null") {
    val s = spark
    import s.implicits._
    val obs = Seq(("a", 0L, 10.0), ("a", 3L, 40.0), ("a", 4L, 0.0),
      ("b", 5L, 7.0)).toDF("k", "p", "v")
    val out = TimeSeries.resampleLinearByKey(obs, "k", "p", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))).toMap
    assert(out(("a", 0L)) == (Some(10.0), false))
    assert(out(("a", 1L)) == (Some(20.0), true))   // 10 + (40-10)*1/3
    assert(out(("a", 2L)) == (Some(30.0), true))
    assert(out(("a", 3L)) == (Some(40.0), false))
    assert(out(("a", 4L)) == (Some(0.0), false))
    assert(out(("b", 5L)) == (Some(7.0), false))   // singleton key: just itself
    assert(out.size == 6)
  }

  test("resampleLinearByKey: leading gap stays null when axis starts before first obs") {
    val s = spark
    import s.implicits._
    // key's own bounds start at its first observation, so synthesize the
    // leading gap via a second value column pattern: use two keys sharing
    // a dense union frame instead — here we check interior null-v rows
    // only exist between observations, never outside
    val obs = Seq(("a", 10L, 1.0), ("a", 12L, 3.0)).toDF("k", "p", "v")
    val rows = TimeSeries.resampleLinearByKey(obs, "k", "p", "v").collect()
    assert(rows.length == 3 && rows.forall(!_.isNullAt(2)))
  }

  test("streaming sliding windows: each event lands in window/slide overlapping windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val out = graft.streaming.StreamingDQ.slidingVolume(df, "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      def t(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000000000L + sec))
      mem.addData((t(2), 1.0), (t(7), 2.0), (t(12), 4.0))
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .select(col("w_start").cast("long"), col("n"), col("sum_value")).collect()
        .map(r => r.getLong(0) - 1000000000L -> (r.getLong(1), r.getDouble(2))).toMap
      // event@2 -> windows [-5,5) [0,10); @7 -> [0,10) [5,15); @12 -> [5,15) [10,20)
      assert(rows(-5L) == (1L, 1.0))
      assert(rows(0L) == (2L, 3.0))
      assert(rows(5L) == (2L, 6.0))
      assert(rows(10L) == (1L, 4.0))
    } finally q.stop()
  }
}
