package graft

import org.apache.spark.sql.functions._
import graft.ml.{Classify, Covariance, VectorMomentsAgg}

/** Round-6 continuation: classical-ML curation operators — Naive Bayes
  * text scoring, kNN majority vote, leakage-safe cluster splits, and the
  * single-pass covariance moments buffer. */
class Round6dSpec extends SparkSpec {

  test("naiveBayesScore: hand-computed two-label corpus") {
    import spark.implicits._
    // train: doc 0/2 label a, doc 4 label b; test: doc 1 ("x x") and 3 ("z")
    val docs = Seq(
      (0L, "x y", "a"), (2L, "x x", "a"), (4L, "z z z", "b"),
      (1L, "x x", "?"), (3L, "z", "?")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayesScore(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L))
    // vocab = {x,y,z} -> |V| = 3; label a: cnt(x)=3, tot=4; label b: cnt(z)=3, tot=3
    // doc 1 ("x x"): score_a = ln(2/3) + 2*ln(4) - 2*ln(7)
    //                score_b = ln(1/3) + 0       - 2*ln(6)
    val s1a = math.log(2.0 / 3) + 2 * math.log(4.0) - 2 * math.log(7.0)
    val s1b = math.log(1.0 / 3) - 2 * math.log(6.0)
    assert(s1a > s1b)
    val r1 = out(0)
    assert(r1.getAs[String]("pred") === "a")
    assert(math.abs(r1.getAs[Double]("score") - s1a) < 1e-6)
    // doc 3 ("z"): score_a = ln(2/3) + 0 - ln(7) ; score_b = ln(1/3) + ln(4) - ln(6)
    val r3 = out(1)
    assert(r3.getAs[String]("pred") === "b")
    assert(math.abs(r3.getAs[Double]("score")
      - (math.log(1.0 / 3) + math.log(4.0) - math.log(6.0))) < 1e-6)
  }

  test("naiveBayesScore: all-unseen tokens fall back to the prior") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x", "a"), (2L, "x", "a"), (4L, "y", "b"),
      (1L, "qqq www", "?")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayesScore(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect()
    assert(out.length === 1)
    // no token joins: score_l = ln(prior) - 2*ln(tot_l + 2); label a has
    // prior 2/3 and the same normalizer (tot=2... a: tot 2, b: tot 1) ->
    // a: ln(2/3)-2*ln(4), b: ln(1/3)-2*ln(3); a wins (-1.18 vs -3.30... )
    assert(out(0).getAs[String]("pred") === "a")
  }

  test("knnClassify: majority vote with tie broken toward the smaller label") {
    import spark.implicits._
    // query 0 at origin; 2 neighbors of label 1 at d=1, 2 of label 2 at
    // d=1.5 -> k=4 votes 2:2, tie -> label 1
    val rows = Seq(
      (0L, Array(0f, 0f), 9),
      (1L, Array(1f, 0f), 1), (2L, Array(0f, 1f), 1),
      (3L, Array(1.5f, 0f), 2), (4L, Array(0f, 1.5f), 2),
      (5L, Array(9f, 9f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Classify.knnClassify(rows, "vec_id", "embedding", "label",
      col("vec_id") === 0, 4).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Int]("pred_label") === 1)
    assert(out(0).getAs[Long]("n_votes") === 2L)
    assert(out(0).getAs[Int]("true_label") === 9)
  }

  test("knnClassify: clear majority") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(0f, 0f), 9),
      (1L, Array(1f, 0f), 7), (2L, Array(0f, 1f), 7),
      (3L, Array(1.1f, 0f), 7), (4L, Array(0f, 1.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Classify.knnClassify(rows, "vec_id", "embedding", "label",
      col("vec_id") === 0, 3).collect()
    assert(out(0).getAs[Int]("pred_label") === 7)
    assert(out(0).getAs[Long]("n_votes") === 3L)
  }

  test("clusterSafeSplit: near-duplicates always share a split") {
    val docs = Tables.docs(spark) // sf0.001 documents fixture
    val out = graft.operators.Splits.clusterSafeSplit(
      docs, "doc_id", "text", n = 1, threshold = 0.9, blockCols = Seq("lang"))
    // every doc exactly once
    assert(out.count() === docs.count())
    // no cluster spans two splits
    val spanning = out.groupBy("rep")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(spanning === 0L)
    // clusters exist in the fixture (the dedup fixtures plant near-dups)
    assert(out.filter(col("rep") =!= col("doc_id")).count() > 0)
  }

  test("covarianceMatrix: matches brute force on a small frame") {
    import spark.implicits._
    val data = Seq(
      Array(1f, 2f, 3f), Array(2f, 4f, 5f), Array(3f, 6f, 8f), Array(4f, 8f, 9f))
    val df = data.map(Tuple1(_)).toDF("embedding")
    val out = Covariance.covarianceMatrix(df, "embedding", 3)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out.size === 6)
    def cov(i: Int, j: Int): Double = {
      val xs = data.map(_(i).toDouble); val ys = data.map(_(j).toDouble)
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / xs.size
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(out((i, j)) - cov(i, j)) < 1e-9, s"cov($i,$j)")
    // dim 0 and 1 are exactly proportional (y = 2x): corr check
    assert(math.abs(out((0, 1)) - 2 * out((0, 0))) < 1e-9)
  }

  test("principalComponent: recovers the exact axis of rank-1 data") {
    import spark.implicits._
    // points t·(3,4) for t ∈ {-2,-1,1,2}: covariance is rank 1 with
    // eigenvector (0.6, 0.8) and eigenvalue 25·Var(t) = 25·2.5 = 62.5
    val df = Seq(-2f, -1f, 1f, 2f).map(t => Tuple1(Array(3 * t, 4 * t)))
      .toDF("embedding")
    val out = Covariance.principalComponent(df, "embedding", 2)
      .orderBy("dim").collect()
    assert(math.abs(out(0).getAs[Double]("loading") - 0.6) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("loading") - 0.8) < 1e-9)
    assert(math.abs(out(0).getAs[Double]("eigval") - 62.5) < 1e-9)
  }

  test("principalComponent: sign fixed positive on the dominant entry") {
    import spark.implicits._
    // axis (-0.8, 0.6): dominant |loading| is dim 0 -> flipped to +0.8
    val df = Seq(-2f, -1f, 1f, 2f).map(t => Tuple1(Array(-4 * t, 3 * t)))
      .toDF("embedding")
    val out = Covariance.principalComponent(df, "embedding", 2)
      .orderBy("dim").collect()
    assert(math.abs(out(0).getAs[Double]("loading") - 0.8) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("loading") - (-0.6)) < 1e-9)
  }

  test("embeddingOutliers: matches the hand-computed diagonal Mahalanobis") {
    import spark.implicits._
    val data = Seq(
      (1L, Array(0f, 10f)), (2L, Array(2f, 12f)),
      (3L, Array(0f, 12f)), (4L, Array(2f, 10f)), (5L, Array(20f, 40f)))
    val df = data.toDF("vec_id", "embedding")
    val xs = data.map(_._2)
    def stats(i: Int) = {
      val v = xs.map(_(i).toDouble)
      val mu = v.sum / v.size
      (mu, v.map(x => (x - mu) * (x - mu)).sum / v.size)
    }
    val out = Covariance.embeddingOutliers(df, "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    data.foreach { case (id, v) =>
      val exp = (0 until 2).map { i =>
        val (mu, s2) = stats(i); (v(i) - mu) * (v(i) - mu) / s2
      }.sum
      assert(math.abs(out(id)._1 - exp) < 1e-9, s"md2($id)")
      assert(out(id)._2 === (exp > 4.0), s"flag($id)")
    }
    assert(out(5L)._2, "the planted outlier is flagged")
  }

  test("c4LineAudit: line rules, tripwires, and the keep verdict") {
    import spark.implicits._
    val good = "This is a perfectly fine sentence with many words.\n" +
      "Another long and complete line that ends with punctuation!\n" +
      "Third full sentence right here to pass the minimum."
    val short = "Too short.\nNo punct line here at all\nok."
    val brace = "A sentence with code { inside it. More text here. And more."
    val lorem = "Lorem ipsum dolor sit amet consectetur. Two. Three."
    val df = Seq((1L, good), (2L, short), (3L, brace), (4L, lorem))
      .toDF("doc_id", "text")
    val f = graft.text.TextAnalysis.c4LineAudit(col("text")).toMap
    val out = df.select(col("doc_id"), f("n_lines").as("nl"),
        f("n_kept_lines").as("nk"), f("n_sentences").as("ns"),
        f("has_brace").as("hb"), f("has_lorem").as("hl"), f("keep").as("keep"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("nl") === 3 && out(0).getAs[Int]("nk") === 3)
    assert(out(0).getAs[Boolean]("keep"))
    // doc 2: "Too short." has <5 words; middle line lacks punctuation;
    // "ok." is too short -> 0 kept lines, keep = false
    assert(out(1).getAs[Int]("nk") === 0 && !out(1).getAs[Boolean]("keep"))
    assert(out(2).getAs[Boolean]("hb") && !out(2).getAs[Boolean]("keep"))
    assert(out(3).getAs[Boolean]("hl") && !out(3).getAs[Boolean]("keep"))
  }

  test("curriculumInterleave: round-robin weave matches the global sort") {
    import spark.implicits._
    // strata a(3 docs), b(2), c(1) with distinct scores
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.1),
      (4L, "b", 0.8), (5L, "b", 0.2), (6L, "c", 0.7)
    ).toDF("doc_id", "lang", "q")
    val out = graft.operators.Splits.curriculumInterleave(df, "doc_id", "lang", "q")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    // round 1: a:1, b:4, c:6 ; round 2: a:2, b:5 ; round 3: a:3
    assert(out === Map(1L -> 1L, 4L -> 2L, 6L -> 3L, 2L -> 4L, 5L -> 5L, 3L -> 6L))
  }

  test("curriculumInterleave: pos is a 1..n bijection on the fixture") {
    val scored = Tables.docs(spark).select(col("doc_id"), col("lang"),
      round(graft.text.TextAnalysis.qualityScore(col("text")), 6).as("q"))
    val out = graft.operators.Splits.curriculumInterleave(scored, "doc_id", "lang", "q")
    val n = out.count()
    assert(out.select("pos").distinct().count() === n)
    val mm = out.agg(min(col("pos")), max(col("pos"))).collect()(0)
    assert(mm.getLong(0) === 1L && mm.getLong(1) === n)
  }

  test("silhouetteByCluster: hand-computed 1-D clusters") {
    import spark.implicits._
    // cluster 0 at {0, 2} (centroid 1), cluster 1 at {10, 12} (centroid 11)
    // every point: a = 1, b = 81 (0,12) or 121 (2,10)... compute exactly:
    // point 0: a=(0-1)^2=1, b=(0-11)^2=121 -> s=(121-1)/121
    // point 2: a=1, b=81 -> s=80/81 ; symmetric for 10, 12
    val df = Seq(
      (0L, Array(0f), 0), (1L, Array(2f), 0),
      (2L, Array(10f), 1), (3L, Array(12f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity
      .silhouetteByCluster(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("avg_silhouette"))).toMap
    val exp = (120.0 / 121 + 80.0 / 81) / 2
    assert(out(0)._1 === 2L)
    assert(math.abs(out(0)._2 - exp) < 1e-6)
    assert(math.abs(out(1)._2 - exp) < 1e-6)
  }

  test("silhouetteByCluster: coincident centroids give s = 0") {
    import spark.implicits._
    // both labels sit at the same point -> a = b = 0 -> s defined as 0
    val df = Seq(
      (0L, Array(1f), 0), (1L, Array(1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity
      .silhouetteByCluster(df, "vec_id", "embedding", "label")
      .collect()
    assert(out.forall(_.getAs[Double]("avg_silhouette") === 0.0))
  }

  test("tokenBigrams: adjacent pairs, empty under two tokens") {
    import spark.implicits._
    val df = Seq("a b c", "solo", "", "x y").toDF("text")
    val out = df.select(graft.text.TextAnalysis.tokenBigrams(col("text")).as("bg"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) === List("a b", "b c"))
    assert(out(1) === Nil && out(2) === Nil)
    assert(out(3) === List("x y"))
  }

  test("pcaProject: projection equals the dot with the signed loadings") {
    import spark.implicits._
    val df = Seq(-2f, -1f, 1f, 2f).map(t => Tuple1(Array(3 * t, 4 * t)))
      .toDF("embedding").withColumn("vec_id", monotonically_increasing_id())
    val out = graft.ml.Covariance.pcaProject(df, "vec_id", "embedding", 2)
      .collect().map(_.getAs[Double]("proj")).sorted
    // loadings (0.6, 0.8): projections are 5t for t in {-2,-1,1,2}
    assert(out.zip(Seq(-10.0, -5.0, 5.0, 10.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("source scorecard entropy: single-lang source has H = 0") {
    import spark.implicits._
    val d = Seq(("s1", "en", "t1"), ("s1", "en", "t2"),
      ("s2", "en", "t3"), ("s2", "fr", "t4")).toDF("source", "lang", "text")
    val ent = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(sum(col("c")).as("tt"),
        sum(col("c") * log(col("c"))).as("sl"))
      .select(col("source"), (log(col("tt")) - col("sl") / col("tt")).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ent("s1")) < 1e-12)
    assert(math.abs(ent("s2") - math.log(2)) < 1e-12)
  }

  test("pairLift: hand-computed support/confidence/lift") {
    import spark.implicits._
    // baskets: {1,2,3}, {1,2}, {1,3}, {2} -> n=4; pair (1,2): n_ab=2,
    // n_1=3, n_2=3 -> support .5, conf 2/3, lift 2*4/9
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L), // dup item in basket
      (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L), (40L, 2L)
    ).toDF("bk", "item")
    val out = graft.operators.Basket.pairLift(df, "bk", "item", 10)
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    assert(out.size === 3)
    assert(out((1L, 2L))._1 === 2L)
    assert(out((1L, 2L))._2 === 0.5)
    assert(math.abs(out((1L, 2L))._3 - 0.666667) < 1e-9)
    assert(math.abs(out((1L, 2L))._4 - 0.888889) < 1e-9)
    assert(out((1L, 3L))._1 === 2L)
    assert(out((2L, 3L))._1 === 1L)
  }

  test("pairLift: top-k cut is deterministic under count ties") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 6L), (1L, 7L), (1L, 8L)).toDF("bk", "item")
    // all 6 pairs have n_ab = 1; top-3 must be the lexicographically first
    val out = graft.operators.Basket.pairLift(df, "bk", "item", 3)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((5L, 6L), (5L, 7L), (5L, 8L)))
  }

  test("VectorMomentsAgg: shard merge equals the single-pass buffer") {
    import spark.implicits._
    // incremental maintenance: moments(all) == merge(moments(A), moments(B))
    val a = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 6f))
    val b = Seq(Array(7f, 8f), Array(9f, 10f))
    val agg = new VectorMomentsAgg(2)
    def buf(xs: Seq[Array[Float]]) = xs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(buf(a), buf(b))
    val single = buf(a ++ b)
    assert(merged.toSeq === single.toSeq)
  }

  test("harmonicCentrality: hand-computed path graph, two seeds") {
    import spark.implicits._
    // path 0-1-2-3 (symmetric edges), seeds {0,1}, maxHops 4:
    // node 0: d(1,0)=1 -> h=1 ; node 1: d(0,1)=1 -> h=1
    // node 2: d(0,2)=2, d(1,2)=1 -> 1.5 ; node 3: 1/3 + 1/2 = .833333
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val sym = (e ++ e.map(_.swap)).toDF("u", "v")
    val out = graft.operators.Graph
      .harmonicCentrality(sym, "u", "v", Seq(0L, 1L), 4, 10)
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_seeds"), r.getAs[Double]("harmonic"))).toMap
    assert(out === Map(
      0L -> (1L, 1.0), 1L -> (1L, 1.0),
      2L -> (2L, 1.5), 3L -> (2L, 0.833333)))
  }

  test("harmonicCentrality: maxHops bounds the reach") {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 2L))
    val sym = (e ++ e.map(_.swap)).toDF("u", "v")
    val out = graft.operators.Graph
      .harmonicCentrality(sym, "u", "v", Seq(0L), 1, 10)
      .collect().map(r => r.getAs[Long]("node")).toSet
    assert(out === Set(1L)) // node 2 is at hop 2, beyond maxHops=1
  }

  test("kaplanMeier: hand-computed churn curve with right censoring") {
    import spark.implicits._
    val day = 86400000000L
    // A: lifetime 2d (churn), B: 0d (churn), C: 9d (censored - at horizon),
    // D: 8d (censored - within 1d of horizon). KM: t=0 S=.75, t=2 S=.5
    val ev = Seq(
      ("A", 0L), ("A", 2 * day),
      ("B", 0L),
      ("C", 0L), ("C", 9 * day),
      ("D", 0L), ("D", 8 * day)
    ).toDF("user_id", "ts_us")
    val out = graft.operators.Retention
      .kaplanMeier(ev, "user_id", "ts_us", censorDays = 1)
      .orderBy("t_days").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("t_days") === 0L)
    assert(out(0).getAs[Long]("n_at_risk") === 4L)
    assert(out(0).getAs[Long]("d_churned") === 1L)
    assert(math.abs(out(0).getAs[Double]("survival") - 0.75) < 1e-9)
    assert(out(1).getAs[Long]("t_days") === 2L)
    assert(out(1).getAs[Long]("n_at_risk") === 3L)
    assert(math.abs(out(1).getAs[Double]("survival") - 0.5) < 1e-9)
  }

  test("dpNoisyCounts: noise matches the inverse-CDF draw from md5") {
    import spark.implicits._
    val df = Seq("click", "click", "view").toDF("k")
    val out = graft.operators.Stats.dpNoisyCounts(df, "k", b = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("noise"), r.getAs[Double]("noisy_n"))).toMap
    def expected(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val u = (v.toDouble + 1.0) / 4503599627370497.0
      val x = u - 0.5
      -1.0 * math.signum(x) * math.log(1.0 - 2.0 * math.abs(x))
    }
    assert(out("click")._1 === 2L)
    assert(math.abs(out("click")._2 - expected("click")) < 1e-12)
    assert(math.abs(out("view")._2 - expected("view")) < 1e-12)
    assert(math.abs(out("click")._3 - (2.0 + expected("click"))) < 1e-12)
  }

  test("degree assortativity of a star graph is -1") {
    import spark.implicits._
    // K1,3: center 0 (degree 3) only ever pairs with leaves (degree 1)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val sym = (e ++ e.map(_.swap)).toDF("u", "v")
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    val r = sym
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .agg(corr(col("du").cast("double"), col("dv").cast("double")))
      .collect()(0).getDouble(0)
    assert(math.abs(r - (-1.0)) < 1e-12)
  }

  test("fleschScore: hand-computed on a known sentence") {
    import spark.implicits._
    // "the cat sat." -> words 3, sentences 1, syllables 1+1+1 = 3
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    val df = Seq("the cat sat.").toDF("text")
    val out = df.select(
      graft.text.TextAnalysis.syllableCount(col("text")).as("sy"),
      round(graft.text.TextAnalysis.fleschScore(col("text")), 6).as("f"))
      .collect()(0)
    assert(out.getAs[Long]("sy") === 3L)
    assert(math.abs(out.getAs[Double]("f") - 119.19) < 1e-9)
  }

  test("syllableCount: vowel runs floored at one per token") {
    import spark.implicits._
    // "beautiful" -> eau|i|u = 3 runs; "rhythm" -> y = 1; "123" -> 0 -> 1
    val df = Seq("beautiful rhythm 123").toDF("text")
    val out = df.select(graft.text.TextAnalysis.syllableCount(col("text")))
      .collect()(0).getLong(0)
    assert(out === 5L)
  }

  test("rbo: identical rankings score the truncated maximum") {
    import spark.implicits._
    val r = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)).toDF("q", "rank", "id")
    val out = graft.similarity.RetrievalEval.rbo(r, r, "q", "id", 3, 0.9)
      .collect()(0).getAs[Double]("rbo")
    // identical lists: overlap(d) = d -> rbo = (1-p)·Σ p^(d-1) = 1 - p^3
    assert(math.abs(out - (1.0 - math.pow(0.9, 3))) < 1e-12)
  }

  test("rbo: disjoint rankings score 0; partial overlap hand-checked") {
    import spark.implicits._
    val a = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("q", "rank", "id")
    val b = Seq((1L, 1, 98L), (1L, 2, 99L)).toDF("q", "rank", "id")
    assert(graft.similarity.RetrievalEval.rbo(a, b, "q", "id", 2, 0.9)
      .collect()(0).getAs[Double]("rbo") === 0.0)
    // shared doc 10 at ranks (1, 2): enters prefixes from depth 2
    val c = Seq((1L, 1, 99L), (1L, 2, 10L)).toDF("q", "rank", "id")
    val out = graft.similarity.RetrievalEval.rbo(a, c, "q", "id", 2, 0.9)
      .collect()(0).getAs[Double]("rbo")
    assert(math.abs(out - (1.0 - 0.9) * 0.9 * (1.0 / 2)) < 1e-12)
  }

  test("bhReject: textbook step-up example") {
    import spark.implicits._
    // m=5, q=0.25; sorted p: .01 .02 .03 .2 .9 -> thresholds .05 .10 .15
    // .20 .25; largest satisfied rank = 4 (.2 <= .2) -> reject first 4
    val p = Seq(("a", 0.01), ("b", 0.9), ("c", 0.02), ("d", 0.2), ("e", 0.03))
      .toDF("k", "p")
    val out = graft.operators.Stats.bhReject(p, "k", "p", q = 0.25)
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("rejected")).toMap
    assert(out === Map("a" -> true, "c" -> true, "e" -> true, "d" -> true,
      "b" -> false))
  }

  test("bhReject: nothing rejected when all p large") {
    import spark.implicits._
    val p = Seq(("a", 0.5), ("b", 0.9)).toDF("k", "p")
    val out = graft.operators.Stats.bhReject(p, "k", "p", q = 0.1)
      .collect().map(_.getAs[Boolean]("rejected"))
    assert(out.forall(!_))
  }

  test("spearman: monotone relation gives rho = 1, ties averaged") {
    import spark.implicits._
    val df = Seq((1, 10), (2, 20), (3, 30), (4, 40)).toDF("x", "y")
    val r = graft.operators.Stats.spearman(df, "x", "y").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("rho") - 1.0) < 1e-12)
    // with ties: x = (1,1,2,2), y = (1,2,3,4): avg ranks x = (1.5,1.5,3.5,3.5)
    // y = (1,2,3,4) -> rho = cov/sd product; hand value via Pearson on ranks
    val df2 = Seq((1, 1), (1, 2), (2, 3), (2, 4)).toDF("x", "y")
    val r2 = graft.operators.Stats.spearman(df2, "x", "y")
      .collect()(0).getAs[Double]("rho")
    val rx = Seq(1.5, 1.5, 3.5, 3.5); val ry = Seq(1.0, 2.0, 3.0, 4.0)
    val mx = rx.sum / 4; val my = ry.sum / 4
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val exp2 = cov / math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum *
      ry.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(r2 - exp2) < 1e-12)
  }

  test("effectSizes: hand-computed Cohen's d and Cliff's delta") {
    import spark.implicits._
    // A = {1,2,3}, B = {4,5,6}: m_a=2, m_b=5, s2 both 1 -> pooled sd 1,
    // d = -3; every A < every B -> U_a = 0 -> cliff = -1
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = graft.operators.Profiler.effectSizes(df, "v", "g", "a", "b")
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 3L)
    assert(math.abs(r.getAs[Double]("cohen_d") - (-3.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("cliff_delta") - (-1.0)) < 1e-9)
    // hedges = d * (1 - 3/(4*6-9)) = -3 * (1 - 0.2) = -2.4
    assert(math.abs(r.getAs[Double]("hedges_g") - (-2.4)) < 1e-9)
  }

  test("jsDriftMonitor: matching batch ~0, disjoint batch = ln 2") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val baseline = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("cat")
    val mem = MemoryStream[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val q = graft.streaming.StreamingDQ.jsDriftMonitor(
      mem.toDF().toDF("cat"), baseline, "cat") { (id, js, n) =>
      results.synchronized { results += ((id, js, n)) }
    }
    try {
      mem.addData(Seq.fill(6)("a") ++ Seq.fill(4)("b"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(10)("z"): _*) // wholly novel category
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = results.sortBy(_._1)
    assert(byBatch.size == 2)
    assert(math.abs(byBatch(0)._2) < 1e-12 && byBatch(0)._3 == 10L)
    assert(math.abs(byBatch(1)._2 - math.log(2)) < 1e-12)
  }

  test("VectorMomentsAgg: rejects mismatched dimensions") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(1f, 2f))).toDF("v")
    val ex = intercept[Exception] {
      df.agg(udaf(new VectorMomentsAgg(3)).apply(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  private object Tables {
    def docs(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(sfDir + "/documents.parquet")
  }
}
