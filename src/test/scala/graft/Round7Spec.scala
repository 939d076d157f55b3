package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: ADVICE-r06 hardening (short-doc compressibility guard,
  * knn packing guard, pairLift cache release) and the re-contracted
  * quantized moments. */
class Round7Spec extends SparkSpec {

  test("compressibility: docs shorter than the gram length get an empty list") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, ""), (3L, "abc"), (4L, "abcd"), (5L, "abcde"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.compressibility(df, "doc_id", "text", 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 0, 0, 0.0), (2L, 0, 0, 0.0), (3L, 0, 0, 0.0),
      (4L, 1, 1, 1.0), (5L, 2, 2, 1.0)))
  }

  test("compressibility: repeated text drives distinct_ratio down") {
    import spark.implicits._
    val df = Seq((1L, "aaaaaaaa")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.compressibility(df, "doc_id", "text", 4)
      .collect().head
    assert(r.getInt(1) === 5 && r.getInt(2) === 1 && r.getDouble(3) === 0.2)
  }

  test("knnClassify: out-of-range label fails loudly instead of corrupting the heap") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0f, 0f), 1L << 21, false),
      (1L, Array(1f, 1f), 0L, true)
    ).toDF("vec_id", "embedding", "label", "is_q")
    val ex = intercept[Exception] {
      graft.ml.Classify.knnClassify(df, "vec_id", "embedding", "label",
        col("is_q"), 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("pairLift releases its basket cache before returning") {
    import spark.implicits._
    spark.catalog.clearCache()
    val df = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L)).toDF("bk", "item")
    val out = graft.operators.Basket.pairLift(df, "bk", "item", 3)
    assert(out.count() === 1)
    // the MEMORY_AND_DISK baskets block must be gone (localCheckpoint
    // blocks of the k-row result are not `persist`-tracked cache entries)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("VectorMomentsAgg quantization: exact hand-computed long buffer") {
    val agg = new graft.ml.VectorMomentsAgg(2)
    val b = agg.reduce(agg.zero, Array(1.5f, -0.25f))
    // layout: [n, S0, S1, S00, S01, S11] at nano scale
    assert(b.toSeq === Seq(1L, 1500000000L, -250000000L,
      2250000000L, -375000000L, 62500000L))
  }

  test("Markov: hand-computed 2-state chain") {
    import spark.implicits._
    // key 1: a->b->a->b ; key 2: b->b
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "b"), (2L, 2L, "b")).toDF("k", "o", "st")
    val counts = graft.operators.Markov.transitionCounts(
      df, "k", "st", Seq(org.apache.spark.sql.functions.col("o")))
    val (states, pm) = graft.operators.Markov.collectChain(counts)
    assert(states.toSeq === Seq("a", "b"))
    // a: 2 transitions, both to b ; b: 2 transitions: 1 to a, 1 to b
    assert(pm(0).toSeq === Seq(0.0, 1.0))
    assert(pm(1).toSeq === Seq(0.5, 0.5))
    val v1 = graft.operators.Markov.evolveUniform(pm, 1)
    assert(v1.toSeq === Seq(0.25, 0.75))
    // stationary of this chain is (1/3, 2/3); 8 steps gets close
    val v8 = graft.operators.Markov.evolveUniform(pm, 8)
    assert(math.abs(v8(0) - 1.0 / 3) < 0.01 && math.abs(v8(1) - 2.0 / 3) < 0.01)
    // entropy rate: row a contributes 0 (deterministic), row b ln 2
    val r = graft.operators.Markov.entropyRate(pm, v8)
    assert(math.abs(r - v8(1) * math.log(2.0)) < 1e-12)
  }

  test("Markov: null keys and null states are dropped") {
    import spark.implicits._
    val df = Seq((Some(1L), 1L, Some("a")), (Some(1L), 2L, None),
      (None, 3L, Some("b"))).toDF("k", "o", "st")
    val counts = graft.operators.Markov.transitionCounts(
      df, "k", "st", Seq(org.apache.spark.sql.functions.col("o")))
    assert(counts.count() === 0)
  }

  test("cooccurrenceEdges: basket cap bounds pair generation deterministically") {
    import spark.implicits._
    // one mega-basket of 6 items + a small basket
    val df = ((1L to 6L).map(i => (1L, i)) ++ Seq((2L, 10L), (2L, 11L)))
      .toDF("bk", "item")
    val full = graft.operators.Graph.cooccurrenceEdges(df, "bk", "item")
    assert(full.count() === 15 + 1)
    val capped = graft.operators.Graph.cooccurrenceEdges(df, "bk", "item", 3)
    val got = capped.orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cap keeps the 3 SMALLEST items of the mega-basket: {1,2,3}
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    // cap 0 = unlimited (the shipped-query default)
    assert(graft.operators.Graph.cooccurrenceEdges(df, "bk", "item", 0).count() === 16)
  }

  test("jsDriftMonitor: replayed stream equals the batch twin bit-for-bit") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val baseline = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c")).toDF("cat")
    val batch1 = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("z")
    val batch2 = Seq.fill(7)("c") ++ Seq.fill(2)("a")
    val mem = MemoryStream[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val q = graft.streaming.StreamingDQ.jsDriftMonitor(
      mem.toDF().toDF("cat"), baseline, "cat") { (id, js, n) =>
      results.synchronized { results += ((id, js, n)) }
    }
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = results.sortBy(_._1)
    assert(streamed.size === 2)
    // batch twin: the same shared computation driven statically
    val baseDist = graft.streaming.StreamingDQ.jsBaselineDist(baseline, "cat")
    val twins = Seq(batch1, batch2).map { b =>
      graft.streaming.StreamingDQ
        .jsDivergenceAgainst(b.toDF("cat"), baseDist, "cat").get
    }
    streamed.zip(twins).foreach { case ((_, js, n), (tjs, tn)) =>
      assert(java.lang.Double.doubleToLongBits(js) ===
        java.lang.Double.doubleToLongBits(tjs))
      assert(n === tn)
    }
  }
}
