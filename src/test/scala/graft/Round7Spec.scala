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

  test("pairLift eagerly materializes so its basket cache is releasable") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L)).toDF("bk", "item")
    val out = graft.operators.Basket.pairLift(df, "bk", "item", 3)
    assert(out.count() === 1)
    // the returned k-row frame is a localCheckpoint scan: its plan has NO
    // lineage onto the (unpersisted) cached baskets frame, so the release
    // inside pairLift cannot invalidate the result. (No global
    // cache-manager asserts here — the test session is shared and suites
    // run concurrently.)
    assert(out.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.startsWith("LogicalRDD")))
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

  test("kendallTau: perfect, reversed, and mixed rankings") {
    import spark.implicits._
    val perfect = Seq((1L, 1, 1), (2L, 2, 2), (3L, 3, 3)).toDF("id", "x", "y")
    val r1 = graft.operators.RankStats.kendallTau(perfect, "id", "x", "y").collect().head
    assert(r1.getLong(0) === 3L && r1.getDouble(3) === 1.0)
    val rev = Seq((1L, 1, 3), (2L, 2, 2), (3L, 3, 1)).toDF("id", "x", "y")
    val r2 = graft.operators.RankStats.kendallTau(rev, "id", "x", "y").collect().head
    assert(r2.getDouble(3) === -1.0)
    // one discordant pair of three: tau = (2 - 1) / 3
    val mix = Seq((1L, 1, 2), (2L, 2, 1), (3L, 3, 3)).toDF("id", "x", "y")
    val r3 = graft.operators.RankStats.kendallTau(mix, "id", "x", "y").collect().head
    assert(math.abs(r3.getDouble(3) - 1.0 / 3) < 1e-12)
  }

  test("theilSen: robust to a single outlier") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 100L)).toDF("x", "y")
    val r = graft.operators.RankStats.theilSen(df, "x", "y").collect().head
    // slopes sorted: 2, 2, 2, 33.33, 49, 96 -> lower median (k=3) = 2
    assert(r.getLong(0) === 4L && r.getLong(1) === 6L && r.getDouble(2) === 2.0)
  }

  test("permutationEntropy: monotone series is zero, alternating is ln 2") {
    import spark.implicits._
    val mono = (1L to 5L).map(i => (i, i * 10)).toDF("t", "v")
    val r1 = graft.operators.RankStats.permutationEntropy(mono, "t", "v").collect().head
    assert(r1.getLong(0) === 3L && r1.getInt(1) === 1)
    assert(r1.getDouble(2) === 0.0 && r1.getDouble(3) === 0.0)
    val alt = Seq((1L, 1L), (2L, 5L), (3L, 2L), (4L, 6L), (5L, 3L), (6L, 7L)).toDF("t", "v")
    val r2 = graft.operators.RankStats.permutationEntropy(alt, "t", "v").collect().head
    assert(r2.getLong(0) === 4L && r2.getInt(1) === 2)
    assert(math.abs(r2.getDouble(2) - math.log(2.0)) < 1e-9)
  }

  test("hillTail: hand-computed powers of two") {
    import spark.implicits._
    val df = Seq(8000L, 4000L, 2000L, 1000L).toDF("v")
    val r = graft.operators.RankStats.hillTail(df, "v", 3).collect().head
    // top-3 = {8000, 4000, 2000}, x_k = 2000: gamma = (ln 4 + ln 2 + 0) / 2
    assert(r.getInt(0) === 3 && r.getLong(1) === 2000L)
    assert(math.abs(r.getDouble(2) - 3 * math.log(2.0) / 2) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0 / (3 * math.log(2.0) / 2)) < 1e-9)
  }

  test("adamicAdar: C4 cycle predicts both diagonals") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val out = graft.operators.Graph.adamicAdar(e, "a", "b", minCommon = 2, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 2)
    // both diagonals share 2 degree-2 midpoints: score = 2 / ln 2
    assert(out(0)._1 === 1L && out(0)._2 === 4L && out(0)._3 === 2L)
    assert(out(1)._1 === 2L && out(1)._2 === 3L)
    out.foreach(t => assert(math.abs(t._4 - 2.0 / math.log(2.0)) < 1e-6))
  }

  test("clusteringCoefficient: triangle plus a tail") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = graft.operators.Graph
      .clusteringCoefficient(e, "a", "b", minDegree = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // cc: node1 = 1.0, node2 = 1.0, node3 = 2*1/(3*2) = 1/3; node4 filtered
    assert(out.toSeq === Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 1.0 / 3)))
  }

  test("spanCorruptionPlan: integer budget arithmetic") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(20)("w").mkString(" ")),
      (2L, "a b c d e f"), (3L, "")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.spanCorruptionPlan(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    // 20 tokens: 20*15 div 100 = 3 -> 1 span of 3; 6 tokens: budget 0 -> 0 spans
    assert(out.toSeq === Seq(
      (1L, 20, 1L, 3L, 18L, 4L, 0.15),
      (2L, 6, 0L, 0L, 6L, 0L, 0.0)))
  }

  test("kTruss: triangle-pair graph peels the tail, keeps the 4-clique") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + pendant triangle {4,5,6}: the 4-truss (support
    // >= 2) keeps exactly the clique's 6 edges (each closing 2 triangles);
    // the pendant triangle's edges close only 1 and peel off
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val e = (clique ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("a", "b")
    val out = graft.operators.Graph.kTruss(e, "a", "b", k = 4)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("kTruss: triangle-free graph empties out") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(graft.operators.Graph.kTruss(e, "a", "b", k = 3).count() === 0)
  }

  test("mannKendall: monotone series, with and without ties") {
    import spark.implicits._
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val r = graft.operators.RankStats.mannKendall(up, "x", "y").collect().head
    // S = 6, var = 4*3*13/18 = 26/3, z = 5 / sqrt(26/3)
    assert(r.getLong(0) === 4L && r.getLong(1) === 6L)
    assert(math.abs(r.getDouble(2) - 26.0 / 3) < 1e-9)
    assert(math.abs(r.getDouble(3) - 5.0 / math.sqrt(26.0 / 3)) < 1e-12)
    val tied = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("x", "y")
    val r2 = graft.operators.RankStats.mannKendall(tied, "x", "y").collect().head
    // S = 2; ties: one group of 2 -> 2*1*9 = 18; var = (3*2*11 - 18)/18
    assert(r2.getLong(1) === 2L)
    assert(math.abs(r2.getDouble(2) - (66.0 - 18.0) / 18) < 1e-12)
  }

  test("contrastiveTriplets: hand-built positives and hardest negative") {
    import spark.implicits._
    // anchors 1-2 are near-dups; 3 is close to 1 (hard negative), 4 is far
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0.6f, 0.8f, 0f)),
      (4L, Array(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val pos = graft.dedup.Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.95)
    val out = graft.similarity.Similarity
      .contrastiveTriplets(emb, "vec_id", "embedding", pos)
      .orderBy("anchor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both anchors pick each other as positive and 3 as the hardest negative
    assert(out.toSeq === Seq((1L, 2L, 3L), (2L, 1L, 3L)))
  }

  test("lshBucketProfile: bucket sizes sum to the corpus per band") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val prof = graft.dedup.Dedup.lshBucketProfile(emb, "vec_id", "embedding", 64)
      .collect()
    val n = emb.count()
    assert(prof.length === 4)
    prof.foreach { r =>
      assert(r.getAs[Long]("n_vectors") === n)
      assert(r.getAs[Long]("max_bucket") <= n)
      assert(r.getAs[Long]("n_buckets") <= 16L)
    }
  }

  test("diffInDiff: hand-computed 2x2 cells") {
    import spark.implicits._
    // treat pre mean 10, post 30 (lift 20); ctrl pre 10, post 15 (lift 5)
    val df = Seq(
      (true, false, 10L), (true, false, 10L), (true, true, 30L),
      (false, false, 10L), (false, true, 15L), (false, true, 15L)
    ).toDF("t", "p", "cents")
    val r = graft.operators.Stats.diffInDiff(df, col("t"), col("p"), col("cents"))
      .collect().head
    assert(r.getAs[Long]("n_treat_pre") === 2L && r.getAs[Long]("n_ctrl_post") === 2L)
    assert(r.getAs[Double]("did") === (30.0 - 10.0) - (15.0 - 10.0))
  }

  test("cuped: perfectly correlated covariate removes all variance") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)).toDF("x", "y")
    val r = graft.operators.Stats.cuped(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("theta") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_adj")) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_reduction")) < 1e-12)
  }

  test("cuped: independent covariate reduces nothing") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (1L, 9L), (2L, 9L)).toDF("x", "y")
    val r = graft.operators.Stats.cuped(df, "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("theta")) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-12)
  }

  test("tripleCounts: hand-computed baskets") {
    import spark.implicits._
    // basket 1 = {1,2,3,4}, basket 2 = {1,2,3}: triple (1,2,3) appears twice
    val df = (Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)) ++
      Seq((2L, 1L), (2L, 2L), (2L, 3L))).toDF("bk", "item")
    val out = graft.operators.Basket.tripleCounts(df, "bk", "item", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head === ((1L, 2L, 3L, 2L)))
    assert(out.length === 4) // C(4,3) from basket 1; (1,2,3) merges with basket 2's
  }

  test("filterFunnel: cumulative conjunction in one pass") {
    import spark.implicits._
    val df = Seq((1, true, true), (2, true, false), (3, false, true), (4, true, true))
      .toDF("id", "a", "b")
    val out = graft.Pipeline.filterFunnel(df,
        Seq("a" -> col("a"), "b" -> col("b")))
      .orderBy("stage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0, "all", 4L, 1.0), (1, "a", 3L, 0.75),
      (2, "b", 2L, 0.5)))
  }

  test("plan: clusteringCoefficient broadcasts the oriented adjacency (no wedge join)") {
    import spark.implicits._
    val e = (1L to 40L).flatMap(i => Seq((i, i + 1), (i, i + 2))).toDF("a", "b")
    val out = graft.operators.Graph.clusteringCoefficient(e, "a", "b", 2, 10)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("plan: hillTail's top-k is a heap cut, not a global sort") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("v")
    val out = graft.operators.RankStats.hillTail(df, "v", 50)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("filterFunnelMonitor: streamed funnel equals the batch twin exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stages = Seq(
      "pos" -> (col("v") > 0),
      "even" -> (col("v") % 2 === 0))
    val batch1 = Seq(-1L, 2L, 3L, 4L)
    val batch2 = Seq(5L, 6L)
    val mem = MemoryStream[Long]
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Int, String, Long, Double)])]
    val q = graft.streaming.StreamingDQ.filterFunnelMonitor(
      mem.toDF().toDF("v"), stages) { (id, rows) =>
      results.synchronized { results += ((id, rows)) }
    }
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = results.sortBy(_._1).map(_._2)
    val twins = Seq(batch1, batch2).map { b =>
      graft.Pipeline.filterFunnel(b.toDF("v"), stages).orderBy("stage")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    }
    assert(streamed == twins)
    // hand check of batch 1: 4 rows, 3 positive, 2 positive-and-even
    assert(twins.head === Seq((0, "all", 4L, 1.0), (1, "pos", 3L, 0.75),
      (2, "even", 2L, 0.5)))
  }

  test("anovaF: hand-computed two-group contrast") {
    import spark.implicits._
    // group A = {1, 3} (mean 2), group B = {5, 7} (mean 6); grand mean 4
    // SSB = 2*(2-4)^2 + 2*(6-4)^2 = 16 ; SSW = 2 + 2 = 4
    // F = (16/1) / (4/2) = 8
    val df = Seq(("A", 1L), ("A", 3L), ("B", 5L), ("B", 7L)).toDF("g", "v")
    val r = graft.operators.Stats.anovaF(df, "g", "v").collect().head
    assert(r.getAs[Long]("k") === 2L && r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("ssb") - 16.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ssw") - 4.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f") - 8.0) < 1e-9)
  }

  test("oddsRatio: hand-computed 2x2 table") {
    import spark.implicits._
    // a=20 b=10 c=5 d=10: OR = 200/50 = 4, lnOR = ln 4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(10)((false, false))
    val df = rows.toDF("ex", "oc")
    val r = graft.operators.Stats.oddsRatio(df, col("ex"), col("oc")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((20L, 10L, 5L, 10L)))
    assert(r.getAs[Double]("odds_ratio") === 4.0)
    assert(math.abs(r.getAs[Double]("ln_or") - math.log(4.0)) < 1e-9)
    val se = math.sqrt(1.0 / 20 + 1.0 / 10 + 1.0 / 5 + 1.0 / 10)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-12)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ln_or"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("ln_or"))
  }

  test("hits: hand-computed integer-exact one-iteration scores") {
    import spark.implicits._
    // hubs {1,2}, authorities {10,11}: 1->10, 1->11, 2->10
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "v")
    val r = graft.operators.Graph.hits(e, "u", "v", iters = 1)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    // h0 = 5e11 each; a'(10)=1e12, a'(11)=5e11, total 1.5e12 ->
    // a = (2/3, 1/3)·1e12 floored; h'(1)=a10+a11, h'(2)=a10 ->
    // h = (0.6, 0.4)·1e12 exactly (the divisions land on exact multiples)
    assert(r(("authority", 10L)) === 666666666666L)
    assert(r(("authority", 11L)) === 333333333333L)
    assert(r(("hub", 1L)) === 600000000000L)
    assert(r(("hub", 2L)) === 400000000000L)
  }

  test("hits: multi-iteration scores stay L1-normalized and rank-stable") {
    import spark.implicits._
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L)).toDF("u", "v")
    val rows = graft.operators.Graph.hits(e, "u", "v", iters = 3).collect()
    val byRole = rows.groupBy(_.getString(0))
    // floor-division drops at most 1 unit per node from the 1e12 L1 total
    byRole.foreach { case (_, rs) =>
      val tot = rs.map(_.getLong(2)).sum
      assert(tot <= 1000000000000L && tot > 1000000000000L - rs.length)
    }
    val a = rows.filter(_.getString(0) == "authority")
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    // node 10 has two in-edges from the strongest hubs: top authority
    assert(a(10L) > a(11L) && a(10L) > a(12L))
  }

  test("adjustedRandIndex: hand-computed contingency and perfect agreement") {
    import spark.implicits._
    // A = [1,1,1,2,2,2], B = [1,1,2,2,2,2]: nij = {2,1,3} ->
    // index=4, pairs_a=6, pairs_b=7, ARI = 144/444
    val df = Seq((1, 1), (1, 1), (1, 2), (2, 2), (2, 2), (2, 2)).toDF("a", "b")
    val r = graft.operators.Stats.adjustedRandIndex(df, "a", "b").collect().head
    assert(r.getLong(0) === 6L)
    assert(r.getAs[Long]("index_pairs") === 4L)
    assert(r.getAs[Long]("pairs_a") === 6L)
    assert(r.getAs[Long]("pairs_b") === 7L)
    assert(math.abs(r.getAs[Double]("ari") - 144.0 / 444.0) < 1e-12)
    val same = Seq((1, 1), (1, 1), (2, 2), (3, 3)).toDF("a", "b")
    val p = graft.operators.Stats.adjustedRandIndex(same, "a", "b").collect().head
    assert(p.getAs[Double]("ari") === 1.0)
  }

  test("mcnemar: continuity-corrected statistic from the discordant cells") {
    import spark.implicits._
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("ca", "cb")
    val r = graft.operators.Stats.mcnemar(df, col("ca"), col("cb")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((5L, 6L, 2L, 3L)))
    assert(r.getAs[Double]("chi2") === 9.0 / 8.0) // (|6-2|-1)^2 / 8
  }

  test("cochranArmitage: 2-level trend matches the hand formula") {
    import spark.implicits._
    // s=0: 10 rows, 2 positive; s=1: 10 rows, 8 positive
    val rows = Seq.fill(2)((0, true)) ++ Seq.fill(8)((0, false)) ++
      Seq.fill(8)((1, true)) ++ Seq.fill(2)((1, false))
    val df = rows.toDF("s", "y")
    val r = graft.operators.Stats.cochranArmitage(df, "s", col("y")).collect().head
    assert(r.getLong(0) === 20L && r.getLong(1) === 10L && r.getLong(2) === 8L)
    assert(r.getAs[Double]("expected") === 5.0)
    // Var = (10·10/19) · (20·10 − 100)/400 = 25/19
    assert(math.abs(r.getAs[Double]("var_t") - 25.0 / 19.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 3.0 / math.sqrt(25.0 / 19.0)) < 1e-12)
  }

  test("rendezvousAssign: adding a shard only moves keys TO the new shard") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    val s8 = graft.operators.Routing.rendezvousAssign(ids, "id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s9 = graft.operators.Routing.rendezvousAssign(ids, "id", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // HRW: existing shards' weights are unchanged, so a key either keeps
    // its shard or moves to the NEW shard 8 — never between old shards
    s8.foreach { case (id, old) =>
      assert(s9(id) == old || s9(id) == 8L, s"key $id moved $old -> ${s9(id)}")
    }
    val moved = s8.count { case (id, old) => s9(id) != old }
    // expected moves = 500/9 ≈ 56; allow wide but meaningful bounds
    assert(moved > 20 && moved < 120, s"moved=$moved")
  }

  test("mojibakeFlag: flags each artifact family, passes clean text") {
    import spark.implicits._
    val df = Seq(
      (1L, "totally clean ascii text"),
      (2L, "double encoded cafÃ©"),          // Ã©
      (3L, "smart quote gone â€œwrong"), // â€
      (4L, "replacement � char"),
      (5L, "control\u0001byte"),
      (6L, "tabs\tand\nnewlines are fine")
    ).toDF("id", "text")
    val flagged = df.filter(graft.text.TextAnalysis.mojibakeFlag(col("text")))
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(2L, 3L, 4L, 5L))
  }

  test("truncationRecall: identical vectors in the kept prefix give full overlap") {
    import spark.implicits._
    // 4-dim vectors whose FIRST 2 dims fully determine the ranking
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0.5f, 0.5f, 0f, 0f)), (3L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
    val r = graft.similarity.Similarity
      .truncationRecall(emb, q, "vec_id", "embedding", dims = 2, k = 2)
      .collect().head
    assert(r.getLong(1) === 2L && r.getDouble(2) === 1.0)
  }
}
