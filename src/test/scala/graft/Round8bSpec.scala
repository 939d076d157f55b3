package graft

import org.apache.spark.sql.functions._

/** Round-8 additions (second batch): blocklist scan, binned two-sample
  * Cramér–von Mises drift, and the minimax isotonic calibration fit. */
class Round8bSpec extends SparkSpec {

  test("blocklistHits counts docs and non-overlapping occurrences exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, Option("spark hash hash")),
      (1L, Option("join")),
      (2L, Option("nothing here")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis
      .blocklistHits(docs, "doc_id", "text", Seq("hash", "join", "zz"))
      .orderBy("term").collect()
    // 3 non-null docs; hash appears twice in doc 0
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("hash", 1L, 2L), ("join", 1L, 1L), ("zz", 0L, 0L)))
    assert(out.head.getDouble(3) === 1.0 / 3.0)
  }

  test("blocklistHits counts overlapping repeats non-overlapping (replace semantics)") {
    import spark.implicits._
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis
      .blocklistHits(docs, "doc_id", "text", Seq("aa"))
      .collect()
    // left-to-right non-overlapping: "aaa" contains ONE "aa"
    assert(out.head.getLong(2) === 1L)
  }

  test("blocklistHits rejects empty and duplicate term lists") {
    import spark.implicits._
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.text.TextAnalysis.blocklistHits(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.text.TextAnalysis.blocklistHits(docs, "doc_id", "text", Seq("a", "a"))
    }
  }

  test("cvmBinned is zero on identical distributions") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v").repartition(5)
    val out = graft.operators.Stats
      .cvmBinned(df, df, "v", lo = 0.0, hi = 100.0, nBins = 10)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(5) === 0.0))
    assert(out.forall(r => r.getDouble(3) === r.getDouble(4)))
  }

  test("cvmBinned matches a hand-computed disjoint two-bin case") {
    import spark.implicits._
    val base = Seq(1.0, 2.0).toDF("v")
    val curr = Seq(9.0).toDF("v")
    val out = graft.operators.Stats
      .cvmBinned(base, curr, "v", lo = 0.0, hi = 10.0, nBins = 2)
      .orderBy("bin").collect()
    // bin 0: F1=1, F2=0, term = (2·1)/(3²) · (2+0) · 1² = 4/9
    // bin 1: F1=F2=1 → 0
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(math.abs(out(0).getDouble(5) - 4.0 / 9.0) < 1e-12)
    assert(out(1).getDouble(5) === 0.0)
  }

  test("isotonicFit equals a scalar PAV merge on seeded random bins") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val nBins = 2 + rnd.nextInt(7)
      // random per-bin (n, pos) with pos <= n
      val bins = (0 until nBins).map { b =>
        val n = 1 + rnd.nextInt(20)
        (b, n, rnd.nextInt(n + 1))
      }
      val rows = bins.flatMap { case (b, n, pos) =>
        val s = (b + 0.5) / nBins
        (0 until n).map(i => (s, if (i < pos) 1 else 0))
      }
      val got = graft.operators.Profiler
        .isotonicFit(rows.toDF("score", "label"), "score", "label", nBins)
        .orderBy("bin").collect().map(_.getDouble(4))
      // scalar PAV: pool adjacent violators on (pos, n) blocks
      case class Blk(var p: Long, var n: Long)
      val st = scala.collection.mutable.Stack.empty[Blk]
      bins.foreach { case (_, n, pos) =>
        st.push(Blk(pos.toLong, n.toLong))
        while (st.size >= 2 && {
          val top = st(0); val und = st(1)
          top.p.toDouble * und.n < und.p.toDouble * top.n // top rate < under rate
        }) {
          val top = st.pop(); val und = st.pop()
          st.push(Blk(top.p + und.p, top.n + und.n))
        }
      }
      // expand blocks back to bins: each block covers consecutive bins whose
      // total n equals the block n — rebuild by walking bin sizes
      val binSizes = bins.map(_._2.toLong)
      val fits = Array.ofDim[Double](nBins)
      var bi = 0
      st.toList.reverse.foreach { blk =>
        var acc = 0L
        while (acc < blk.n) { fits(bi) = blk.p.toDouble / blk.n; acc += binSizes(bi); bi += 1 }
      }
      got.zip(fits).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) < 1e-9, s"bin $i: got $g expected $e (bins=$bins)")
      }
    }
  }

  test("isotonicFit reproduces the hand-computed PAV merge") {
    import spark.implicits._
    // four bins (nBins=4) with pos rates 0.1, 0.3, 0.2, 0.4:
    // PAV merges bins 1 and 2 -> 0.25
    def rows(s: Double, n: Int, pos: Int) =
      (0 until n).map(i => (s, if (i < pos) 1 else 0))
    val df = (rows(0.1, 10, 1) ++ rows(0.3, 10, 3) ++
        rows(0.6, 10, 2) ++ rows(0.9, 10, 4))
      .toDF("score", "label").repartition(4)
    val out = graft.operators.Profiler.isotonicFit(df, "score", "label", 4)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    assert(out.map(_.getDouble(4)).toSeq === Seq(0.1, 0.25, 0.25, 0.4))
  }

  test("isotonicFit pools by weight, stays monotone, and preserves raw rates") {
    import spark.implicits._
    // bin1 = 2 rows all positive (rate 1.0), bin2 = 10 rows none (rate 0):
    // weighted pool -> 2/12
    def rows(s: Double, n: Int, pos: Int) =
      (0 until n).map(i => (s, if (i < pos) 1 else 0))
    val df = (rows(0.1, 10, 0) ++ rows(0.3, 2, 2) ++ rows(0.6, 10, 0) ++
        rows(0.9, 10, 9)).toDF("score", "label")
    val out = graft.operators.Profiler.isotonicFit(df, "score", "label", 4)
      .orderBy("bin").collect()
    val iso = out.map(_.getDouble(4)).toSeq
    assert(math.abs(iso(1) - 2.0 / 12.0) < 1e-12)
    assert(iso(1) === iso(2))
    assert(iso === iso.sorted)
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.0, 1.0, 0.0, 0.9))
  }

  test("expectedCalibrationError matches a hand-computed two-bin case") {
    import spark.implicits._
    // bin0: scores all 0.2, 1/4 positive -> gap 0.05, weight 4
    // bin1: scores all 0.8, 1/2 positive -> gap 0.30, weight 2
    val df = Seq((0.2, 0), (0.2, 0), (0.2, 0), (0.2, 1), (0.8, 1), (0.8, 0))
      .toDF("score", "label")
    val out = graft.operators.Profiler
      .expectedCalibrationError(df, "score", "label", 2)
      .collect().head
    assert(out.getLong(0) === 6L)
    assert(math.abs(out.getDouble(1) - (4 * 0.05 + 2 * 0.30) / 6.0) < 1e-9)
    assert(math.abs(out.getDouble(2) - 0.30) < 1e-12)
  }

  test("mmdQuadratic is zero on identical samples and positive on shifted ones") {
    import spark.implicits._
    val a = (1 to 40).map(i =>
      Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat / 5f))
      .toDF("embedding")
    val same = graft.ml.Covariance.mmdQuadratic(a, a, "embedding", 4)
      .collect().head
    assert(same.getLong(0) === 40L && same.getLong(1) === 40L)
    assert(same.getDouble(2) === 0.0)
    val b = a.select(org.apache.spark.sql.functions.transform(
      col("embedding"), x => x + lit(0.5f)).as("embedding"))
    val diff = graft.ml.Covariance.mmdQuadratic(a, b, "embedding", 4)
      .collect().head
    assert(diff.getDouble(2) > 0.0)
  }

  test("mmdQuadratic matches a scalar replay of the moment-matrix form") {
    import spark.implicits._
    val va = Seq(Array(1f, 0f), Array(0f, 1f))
    val vb = Seq(Array(1f, 1f), Array(1f, -1f))
    val out = graft.ml.Covariance
      .mmdQuadratic(va.toDF("embedding"), vb.toDF("embedding"), "embedding", 2)
      .collect().head
    // M_a = [[.5,0],[0,.5]], M_b = [[1,0],[0,1]] -> diff diag .5 each,
    // off-diag 0 -> mmd2 = .25 + .25 = .5
    assert(out.getDouble(2) === 0.5)
  }

  test("Shapley channel attribution matches a hand-computed game and sums to v(full)") {
    import spark.implicits._
    // user 1: click only, $1; user 2: click+view, $2; user 3: no touch, $4
    val ev = Seq(
      (1L, "click", 0.0), (1L, "purchase", 1.0),
      (2L, "click", 0.0), (2L, "view", 0.0), (2L, "purchase", 2.0),
      (3L, "purchase", 4.0),
      (4L, "view", 0.0) // no purchase -> excluded
    ).toDF("user_id", "event_type", "value")
    val out = graft.operators.Shapley.channelAttribution(
        ev, "user_id", "event_type", "value", Seq("click", "view"), "purchase")
      .orderBy("channel").collect()
    // v(empty)=4, v(c)=5, v(v)=4, v(cv)=7 (n=2, weights 1/2 each)
    // phi_click = ((5-4) + (7-4))/2 = 2 ; phi_view = ((4-4) + (7-5))/2 = 1
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("click", 2.0), ("view", 1.0)))
  }

  /** Scalar twin of Bucketing.withHilbert (canonical xy2d). */
  private def hilbertScalar(order: Int, x0: Long, y0: Long): Long = {
    val full = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = full - 1 - x; y = full - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbert is a bijection with unit-step adjacency at order 3") {
    import spark.implicits._
    val grid = for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)
    val out = graft.sources.Bucketing
      .withHilbert(grid.toDF("x", "y"), "x", "y", 3, "h")
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).toMap
    assert(out.size === 64)
    assert(out.keys.min === 0L && out.keys.max === 63L)
    // consecutive curve positions are grid-adjacent (the Hilbert property
    // Z-order lacks)
    (0L until 63L).foreach { d =>
      val (x1, y1) = out(d); val (x2, y2) = out(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"at d=$d")
    }
    // and the column matches the scalar twin everywhere
    grid.foreach { case (x, y) =>
      assert(out.find(_._2 == ((x, y))).get._1 === hilbertScalar(3, x, y))
    }
  }

  test("withHilbert matches the scalar twin on random points at order 10") {
    import spark.implicits._
    val pts = (0 until 200).map { i =>
      (((i * 2654435761L) >>> 7) % 1024, ((i * 40503L) >>> 3) % 1024)
    }
    val out = graft.sources.Bucketing
      .withHilbert(pts.toDF("x", "y"), "x", "y", 10, "h")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(out((x, y)) === hilbertScalar(10, x, y))
    }
  }

  test("Hilbert buckets are tighter than Z-order at unaligned file sizes") {
    import spark.implicits._
    // full 32x32 grid split into 48-index files (unaligned with quadrant
    // boundaries — the realistic compaction case): Hilbert's unit-step
    // adjacency keeps every file a compact blob; Z jumps quadrant seams
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def spans(indexed: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = indexed.groupBy((col("idx") / 48).cast("long").as("b"))
        .agg((max("x") - min("x") + (max("y") - min("y"))).as("span"))
        .agg(avg("span").as("a"), max("span").as("m")).collect().head
      (r.getDouble(0), r.getLong(1))
    }
    val (ha, hm) = spans(graft.sources.Bucketing
      .withHilbert(grid, "x", "y", 5, "idx"))
    val (za, zm) = spans(grid.withColumn("idx",
      graft.sources.Bucketing.zValue(col("x"), col("y"))))
    assert(ha < za, s"hilbert avg $ha vs zorder $za")
    assert(hm === 14L && zm === 38L)
  }

  test("cvmBinned adWeighted applies the 1/(H(1-H)) pooled weight") {
    import spark.implicits._
    val base = Seq(1.0, 2.0).toDF("v")
    val curr = Seq(9.0).toDF("v")
    val out = graft.operators.Stats
      .cvmBinned(base, curr, "v", lo = 0.0, hi = 10.0, nBins = 2,
        adWeighted = true)
      .orderBy("bin").collect()
    // bin 0: cvm term 4/9, H = 2/3 -> (4/9)/((2/3)(1/3)) = 2; bin 1: H=1 -> 0
    assert(math.abs(out(0).getDouble(5) - 2.0) < 1e-12)
    assert(out(1).getDouble(5) === 0.0)
    val same = graft.operators.Stats
      .cvmBinned(base, base, "v", lo = 0.0, hi = 10.0, nBins = 2,
        adWeighted = true).collect()
    assert(same.forall(_.getDouble(5) === 0.0))
  }

  test("vOptimalBoundaries finds the zero-SSE split and repeats the objective") {
    import spark.implicits._
    // bins (nFine=4, lo=0, hi=4): counts 10, 10, 2, 2 -> the 2-bucket
    // V-optimal split is after bin 2 (both buckets constant, SSE 0)
    val vals = (Seq.fill(10)(0.5) ++ Seq.fill(10)(1.5) ++
      Seq.fill(2)(2.5) ++ Seq.fill(2)(3.5)).toDF("v")
    val out = graft.operators.Histograms
      .vOptimalBoundaries(vals, "v", 0.0, 4.0, nFine = 4, nBuckets = 2)
      .collect()
    assert(out.length === 1)
    assert(out.head.getInt(0) === 1)
    assert(out.head.getInt(1) === 2)
    assert(out.head.getDouble(2) === 0.0)
  }

  test("vOptimalBoundaries beats the equi-width split under skew") {
    import spark.implicits._
    // one hot bin then a long flat tail: equi-width (boundary 2) mixes the
    // spike with flat bins; V-optimal isolates the spike (boundary 1)
    val vals = (Seq.fill(100)(0.5) ++ Seq.fill(2)(1.5) ++
      Seq.fill(2)(2.5) ++ Seq.fill(2)(3.5)).toDF("v")
    val out = graft.operators.Histograms
      .vOptimalBoundaries(vals, "v", 0.0, 4.0, nFine = 4, nBuckets = 2)
      .collect().head
    assert(out.getInt(1) === 1)
    assert(out.getDouble(2) === 0.0)
  }

  test("yuleK matches the hand-computed statistic") {
    import spark.implicits._
    val docs = Seq((0L, "a b a"), (1L, "c")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.yuleK(docs, "doc_id", "text")
      .collect().head
    // counts a:2 b:1 c:1 -> N=4, types=3, hapax=2, S2=6
    assert(out.getLong(0) === 4L)
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 2L)
    assert(out.getDouble(3) === 2.0 / 3.0)
    assert(out.getDouble(4) === 1e4 * (6.0 - 4.0) / 16.0)
  }

  test("idIslands finds contiguous runs via anti-joins") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 7L, 10L, 11L, 2L).toDF("id").repartition(3)
    val out = graft.operators.Sessionize.idIslands(df, "id")
      .orderBy("island").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((1, 1L, 3L, 3L), (2, 7L, 7L, 1L), (3, 10L, 11L, 2L)))
  }

  test("idIslands plan has no corpus-sized single-partition window") {
    import spark.implicits._
    val df = (1L to 100L).filter(_ % 7 != 0).toDF("id")
    val plan = graft.operators.Sessionize.idIslands(df, "id")
      .queryExecution.executedPlan.toString
    // the anti-joins do the corpus work; windows only touch boundary rows
    assert(plan.toLowerCase.contains("leftanti"))
  }

  test("partitioned fact scan is dynamically pruned by a filtered dim join") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dpp").toString
    val useStatsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prevUseStats = spark.conf.get(useStatsKey)
    try {
      // fallback filter-ratio benefit estimation (tiny test frames defeat
      // the stats-based one, which a real fact table would satisfy)
      spark.conf.set(useStatsKey, "false")
      (1 to 100000).map(i => (i.toLong, i % 20)).toDF("v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$root/fact")
      (0 until 20).map(k => (k, s"name$k")).toDF("k", "nm")
        .write.mode("overwrite").parquet(s"$root/dim")
      val fact = spark.read.parquet(s"$root/fact")
      val dim = spark.read.parquet(s"$root/dim")
      val q = fact.join(dim.filter(col("nm") === "name3"),
        fact("p") === dim("k"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"expected dynamic partition pruning in plan:\n$plan")
      assert(q.count() === 5000L)
    } finally {
      spark.conf.set(useStatsKey, prevUseStats)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("crossCorrelation equals a scalar Pearson replay on seeded random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val xs = (0L until 40L).map(k => (k, rnd.nextInt(1000).toLong))
    val ys = (0L until 40L).map(k => (k, rnd.nextInt(1000).toLong))
    val out = graft.operators.TimeSeries
      .crossCorrelation(xs.toDF("k", "x"), ys.toDF("k", "y"), "k", "x", "y", 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val ym = ys.toMap
    (-2 to 2).foreach { lag =>
      val pairs = xs.flatMap { case (k, x) => ym.get(k + lag).map(y => (x, y)) }
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val exp = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(out(lag) - exp) < 1e-12, s"lag $lag")
    }
  }

  test("crossCorrelation matches hand-computed Pearson at the aligning lag") {
    import spark.implicits._
    // y(k) = x(k-1) exactly -> r = 1 at lag +1 (y leads by one key)
    val xs = Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 5L)).toDF("k", "x")
    val ys = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 5L)).toDF("k", "y")
    val out = graft.operators.TimeSeries
      .crossCorrelation(xs, ys, "k", "x", "y", maxLag = 2)
      .orderBy("lag").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(-2, -1, 0, 1, 2))
    val at1 = out.find(_.getInt(0) === 1).get
    assert(at1.getLong(1) === 4L)
    assert(math.abs(at1.getDouble(2) - 1.0) < 1e-12)
    // zero-variance pairing yields null, not NaN
    val ysConst = Seq((0L, 7L), (1L, 7L), (2L, 7L)).toDF("k", "y")
    val nulls = graft.operators.TimeSeries
      .crossCorrelation(xs, ysConst, "k", "x", "y", 0).collect()
    assert(nulls.forall(_.isNullAt(2)))
  }

  test("AQE splits a skewed sort-merge join partition") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val prev = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null))
    try {
      spark.conf.set(keys(0), "-1")
      spark.conf.set(keys(1), "-1")
      spark.conf.set(keys(2), "32768")
      spark.conf.set(keys(3), "16384")
      // 95% of rows share key 0 -> one shuffle partition dwarfs the median
      val left = (1 to 200000)
        .map(i => (if (i % 20 == 0) (i % 97).toLong else 0L,
          s"payload_padding_for_bytes_$i"))
        .toDF("k", "pl")
      val right = (0L to 96L).map(k => (k, k * 2)).toDF("k", "v")
      val q = left.join(right, "k")
      q.queryExecution.toRdd.count() // materialize THIS plan so AQE finalizes it
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final AQE plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("periodogram puts all power on the true cycle") {
    import spark.implicits._
    // x = [1,2,1,2]: y = [-2,2,-2,2]; period-2 bin captures everything
    // ((-8)^2/16 = 4), period-4 bin is orthogonal (0)
    val daily = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)).toDF("k", "x")
    val out = graft.operators.TimeSeries
      .periodogram(daily, "k", "x", Seq(2, 4))
      .orderBy("period").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(2, 4))
    assert(math.abs(out(0).getDouble(2) - 4.0) < 1e-6)
    assert(math.abs(out(1).getDouble(2)) < 1e-6)
  }

  test("ljungBox matches the hand-computed ACF and Q statistic") {
    import spark.implicits._
    // x = [1,2,1,2]: y = 4x-6 = [-2,2,-2,2], den = 16
    // rho1 = -12/16 = -0.75, rho2 = 8/16 = 0.5
    // Q1 = 4*6*(0.5625/3) = 4.5 ; Q2 = 24*(0.1875 + 0.25/2) = 7.5
    val daily = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)).toDF("k", "x")
    val out = graft.operators.TimeSeries.ljungBox(daily, "k", "x", 2)
      .orderBy("lag").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 3L), (2, 2L)))
    assert(out(0).getDouble(2) === -0.75)
    assert(out(1).getDouble(2) === 0.5)
    assert(math.abs(out(0).getDouble(3) - 4.5) < 1e-6)
    assert(math.abs(out(1).getDouble(3) - 7.5) < 1e-6)
  }

  test("new heavy queries prune their scans to the referenced columns") {
    // plan hygiene: a 2-column operator must not read 16-column lineitem
    def readSchema(q: String): String = {
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    }
    val hil = readSchema("q_hilbert")
    assert(hil.contains("l_partkey") && hil.contains("l_suppkey"))
    assert(!hil.contains("l_extendedprice") && !hil.contains("l_comment"),
      s"q_hilbert reads more than its two key columns:\n$hil")
    val split = readSchema("q_best_split")
    assert(split.contains("l_extendedprice") && split.contains("l_returnflag"))
    assert(!split.contains("l_partkey"),
      s"q_best_split reads unrelated columns:\n$split")
    val bl = readSchema("q_blocklist")
    assert(bl.contains("text") && !bl.contains("lang"),
      s"q_blocklist reads unrelated columns:\n$bl")
  }

  test("relativeRisk matches the hand-computed 2x2 and fails loudly on empty cells") {
    import spark.implicits._
    // exposed: 2/4 outcome; unexposed: 1/4 -> RR = 2
    val df = (Seq.fill(2)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("ex", "oc")
    val out = graft.operators.Stats.relativeRisk(df, col("ex"), col("oc"))
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      === ((2L, 2L, 1L, 3L)))
    assert(out.getDouble(4) === 2.0)
    // ln RR via the series ln
    assert(math.abs(out.getDouble(5) -
      (graft.functions.DetMath.lnPosIntScalar(8) -
        graft.functions.DetMath.lnPosIntScalar(4))) < 1e-12)
    val bad = Seq((true, false), (false, true)).toDF("ex", "oc")
    val ex = intercept[Exception] {
      graft.operators.Stats.relativeRisk(bad, col("ex"), col("oc")).collect()
    }
    assert(ex.getMessage.contains("relativeRisk"))
  }

  test("wilsonCI brackets the rate and stays inside [0,1] at the boundary") {
    import spark.implicits._
    val df = (Seq.fill(3)(("a", true)) ++ Seq.fill(1)(("a", false)) ++
      Seq.fill(5)(("b", false))).toDF("g", "s")
    val out = graft.operators.Stats.wilsonCI(df, "g", col("s"))
      .orderBy("group").collect()
    val a = out(0)
    assert(a.getLong(1) === 4L && a.getLong(2) === 3L)
    assert(a.getDouble(4) < 0.75 && a.getDouble(5) > 0.75)
    // scalar replay of the Wilson algebra
    val (n, p, z2) = (4.0, 0.75, 1.96 * 1.96)
    val center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
    val half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) /
      (1.0 + z2 / n)
    assert(math.abs(a.getDouble(4) - (center - half)) < 1e-12)
    // k = 0 boundary: Wald collapses to [0,0]; Wilson stays a real interval
    // (the lower bound is mathematically 0 and may carry -1ulp fp noise)
    val b = out(1)
    assert(b.getDouble(3) === 0.0)
    assert(b.getDouble(4) >= -1e-12 && b.getDouble(5) > 0.0 && b.getDouble(5) < 1.0)
  }

  test("pageTrend matches the hand-computed perfect monotone case") {
    import spark.implicits._
    // 3 blocks, values rise with treatment order A<B<C in every block:
    // R = (3,6,9), L = 42, mu = 36, var = 6 -> z = sqrt(6)
    val df = (1L to 3L).flatMap(b =>
      Seq((b, "A", b * 10L), (b, "B", b * 10L + 1), (b, "C", b * 10L + 2)))
      .toDF("b", "t", "v")
    val out = graft.operators.Stats.pageTrend(df, "b", "t", "v")
      .collect().head
    assert(out.getLong(0) === 3L && out.getLong(1) === 3L)
    assert(out.getLong(2) === 42L)
    assert(math.abs(out.getDouble(3) - math.sqrt(6.0)) < 1e-12)
  }

  test("logLossOnGrid matches ln 2 on the p=1/2 lattice point") {
    import spark.implicits._
    import graft.functions.DetMath
    // k = 32768 on the 2^16 grid -> p = 0.5 for both labels -> LL = ln 2
    val df = Seq((32768L, 1), (32768L, 0)).toDF("k", "y")
    val out = graft.operators.EvalMetrics.logLossOnGrid(df, "k", "y", 16)
      .collect().head
    assert(out.getLong(0) === 2L)
    assert(math.abs(out.getDouble(1) - DetMath.LN2) < 1e-9)
    // k clamps into domain: k = 0 and k = grid stay finite
    val edge = Seq((0L, 0), (65536L, 1)).toDF("k", "y")
    val oe = graft.operators.EvalMetrics.logLossOnGrid(edge, "k", "y", 16)
      .collect().head
    assert(!oe.getDouble(1).isNaN && !oe.getDouble(1).isInfinite)
  }

  test("streaming blocklistMonitor cumulative state equals the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val seen = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val q = graft.streaming.StreamingDQ.blocklistMonitor(
      df, "text", Seq("hash", "join")) { (_, m) =>
      seen.synchronized { seen ++= m }
    }
    try {
      val b1 = Seq((0L, "hash hash join"), (1L, "nothing"))
      val b2 = Seq((2L, "join join"), (3L, "hash"))
      mem.addData(b1: _*)
      q.processAllAvailable()
      val mid = seen.synchronized(seen.toMap)
      assert(mid("hash") === ((1L, 2L)) && mid("join") === ((1L, 1L)))
      mem.addData(b2: _*)
      q.processAllAvailable()
      val fin = seen.synchronized(seen.toMap)
      // cumulative state == batch operator over everything ingested
      val batch = graft.text.TextAnalysis
        .blocklistHits((b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
          Seq("hash", "join"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(fin === batch)
    } finally q.stop()
  }

  test("partialCorr recovers full dependence once the confounder is held") {
    import spark.implicits._
    // y = x + z with x orthogonal to z: r_xy < 1 but r_xy.z = 1
    val df = Seq((0L, 0L, 0L), (1L, 1L, 0L), (0L, 1L, 1L), (1L, 2L, 1L))
      .toDF("x", "y", "z")
    val out = graft.operators.Stats.partialCorr(df, "x", "y", "z")
      .collect().head
    assert(out.getLong(0) === 4L)
    assert(math.abs(out.getDouble(1) - math.sqrt(0.5)) < 1e-12)
    assert(out.getDouble(2) === 0.0)
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-9)
    // degenerate variance -> nulls, not NaN
    val deg = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 5L)).toDF("x", "y", "z")
    assert(graft.operators.Stats.partialCorr(deg, "x", "y", "z")
      .collect().head.isNullAt(4))
  }

  test("cronbachAlpha matches the hand-computed two-item case") {
    import spark.implicits._
    // item A: 1,2,3 (var 1); item B = 2A (var 4); totals 3,6,9 (var 9)
    // alpha = 2 * (1 - 5/9) = 8/9
    val df = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (1L, "B", 2L), (2L, "B", 4L), (3L, "B", 6L)).toDF("s", "i", "v")
    val out = graft.operators.Stats.cronbachAlpha(df, "s", "i", "v")
      .collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 3L)
    assert(math.abs(out.getDouble(2) - 5.0) < 1e-6)
    assert(math.abs(out.getDouble(3) - 9.0) < 1e-6)
    assert(math.abs(out.getDouble(4) - 8.0 / 9.0) < 1e-6)
  }

  test("bestGiniSplit finds the perfect separator and scores the root") {
    import spark.implicits._
    // bins (lo=0, hi=3, nFine=3): bin0 = 4x label X, bin1 = 6x label Y,
    // bin2 = 1x label Y -> cut at bin 0 separates perfectly (gini 0)
    val rows = Seq.fill(4)((0.5, "X")) ++ Seq.fill(6)((1.5, "Y")) ++
      Seq((2.5, "Y"))
    val out = graft.operators.Histograms
      .bestGiniSplit(rows.toDF("v", "lbl"), "v", "lbl", 0.0, 3.0, 3)
      .collect().head
    assert(out.getInt(0) === 0)
    assert(out.getLong(1) === 4L && out.getLong(2) === 7L)
    assert(out.getDouble(3) === 0.0)
    // root gini = (11 - 65/11)/11
    assert(math.abs(out.getDouble(4) - (11.0 - 65.0 / 11.0) / 11.0) < 1e-9)
  }

  test("tostEquivalence matches the hand-computed shifted Welch statistics") {
    import spark.implicits._
    val df = Seq(("a", 100L), ("a", 200L), ("a", 300L),
      ("b", 200L), ("b", 300L)).toDF("g", "v")
    val out = graft.operators.Stats
      .tostEquivalence(df, "v", "g", "a", "b", margin = 100L)
      .collect().head
    val sea = 10000.0 / 3.0
    val seb = 2500.0
    val se = math.sqrt(sea + seb)
    assert(out.getLong(0) === 3L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === -50.0)
    assert(math.abs(out.getDouble(3) - se) < 1e-12)
    assert(math.abs(out.getDouble(5) - 50.0 / se) < 1e-12)
    assert(math.abs(out.getDouble(6) - -150.0 / se) < 1e-12)
    // singleton group -> empty result, not NaN
    val tiny = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    assert(graft.operators.Stats
      .tostEquivalence(tiny, "v", "g", "a", "b", 10L).collect().isEmpty)
  }

  test("brownForsythe separates equal-spread from unequal-spread groups") {
    import spark.implicits._
    // group A: |dev| = (1,1), group B: |dev| = (10,10) -> all within-group
    // spread of deviations is 0 -> SSW = 0, SSB > 0 (clear inequality)
    val df = Seq(("A", 9L), ("A", 10L), ("A", 11L),
      ("B", 90L), ("B", 100L), ("B", 110L)).toDF("g", "v")
    val out = graft.operators.Stats.brownForsythe(df, "g", "v")
      .collect().head
    // medians 10 and 100; z_A = (1,0,1), z_B = (10,0,10)
    // means 2/3 and 20/3, grand 11/3: SSB = 3*(3)^2*2 = 54... hand:
    // ssb = 3*(2/3-11/3)^2 + 3*(20/3-11/3)^2 = 3*9 + 3*9 = 54
    // ssw = (1-2/3)^2*... compute: A: sum z^2=2, (sum z)^2/n=4/3 -> 2/3
    //       B: 200 - 400/3 = 200/3 -> ssw = 202/3 - 134/3? -> 2/3+200/3
    assert(out.getLong(0) === 2L && out.getLong(1) === 6L)
    assert(math.abs(out.getDouble(2) - 54.0) < 1e-6)
    assert(math.abs(out.getDouble(3) - 202.0 / 3.0) < 1e-6)
    // identical groups -> F = 0 numerator (ssb = 0)
    val same = Seq(("A", 1L), ("A", 3L), ("B", 11L), ("B", 13L))
      .toDF("g", "v")
    val o2 = graft.operators.Stats.brownForsythe(same, "g", "v")
      .collect().head
    assert(o2.getDouble(2) === 0.0)
  }

  test("seasonalMannKendall ignores a pure seasonal cycle, sees a trend") {
    import spark.implicits._
    // pure period-2 cycle: within-season series are constant -> S = 0
    val cyc = (0L until 12L).map(d => (d % 2, d, if (d % 2 == 0) 10L else 20L))
      .toDF("g", "x", "y")
    val oc = graft.operators.RankStats
      .seasonalMannKendall(cyc, "g", "x", "y").collect().head
    assert(oc.getLong(2) === 0L && oc.getDouble(4) === 0.0)
    // strictly rising series: within each of 2 seasons of 3 points,
    // S_g = 3 -> S = 6; var numerator per season = 3*2*11 = 66
    val up = (0L until 6L).map(d => (d % 2, d, d * 100L)).toDF("g", "x", "y")
    val ou = graft.operators.RankStats
      .seasonalMannKendall(up, "g", "x", "y").collect().head
    assert(ou.getLong(0) === 2L && ou.getLong(1) === 6L)
    assert(ou.getLong(2) === 6L)
    assert(math.abs(ou.getDouble(3) - 132.0 / 18.0) < 1e-12)
    assert(math.abs(ou.getDouble(4) - 5.0 / math.sqrt(132.0 / 18.0)) < 1e-9)
  }

  test("wilcoxonSignedRank matches hand-computed W+ and z, with ties") {
    import spark.implicits._
    // d = (+1, -2, +3): ranks 1,2,3 -> W+ = 4, mu = 3, var = 3.5
    val a = Seq((10L, 11L), (10L, 8L), (10L, 13L), (5L, 5L))
      .toDF("pre", "post")
    val oa = graft.operators.Profiler.wilcoxonSignedRank(a, "pre", "post")
      .collect().head
    assert(oa.getLong(0) === 3L)
    assert(oa.getDouble(1) === 4.0)
    assert(math.abs(oa.getDouble(2) - 1.0 / math.sqrt(3.5)) < 1e-12)
    // tie case: d = (+1, -1, +2): avg ranks 1.5,1.5,3 -> W+ = 4.5,
    // var = 3.5 - 6/48 = 3.375 -> z = 1.5/sqrt(3.375)
    val b = Seq((10L, 11L), (10L, 9L), (10L, 12L)).toDF("pre", "post")
    val ob = graft.operators.Profiler.wilcoxonSignedRank(b, "pre", "post")
      .collect().head
    assert(ob.getDouble(1) === 4.5)
    assert(math.abs(ob.getDouble(2) - 1.5 / math.sqrt(3.375)) < 1e-12)
  }

  test("captureRecapture matches the hand-computed Chapman estimate") {
    import spark.implicits._
    // n_a=3, n_b=2, overlap=1 -> chapman = 4*3/2 - 1 = 5 (true pop feel)
    val df = Seq((true, true), (true, false), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    val out = graft.operators.Stats.captureRecapture(df, "a", "b")
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      === ((3L, 2L, 1L, 4L)))
    assert(out.getDouble(4) === 5.0)
    assert(out.getDouble(5) === 0.8)
  }

  test("cochranQ matches the hand-computed textbook case") {
    import spark.implicits._
    // blocks x treatments successes: b1:{A,B} b2:{A} b3:{A,B,C} b4:{B}
    // T=(3,3,1), N=7, sumT2=19, sumU2=15 -> Q = 2*(3*19-49)/(21-15) = 8/3
    val df = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "B"), (4L, "B") // duplicate observation collapses
    ).toDF("blk", "trt")
    val out = graft.operators.Stats.cochranQ(df, "blk", "trt").collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === 4L)
    assert(out.getLong(2) === 7L)
    assert(out.getLong(3) === 2L)
    assert(math.abs(out.getDouble(4) - 8.0 / 3.0) < 1e-12)
  }

  test("gpdTail matches the hand-computed moment estimators") {
    import spark.implicits._
    // threshold $1.00 -> exceedances 100 and 300 cents:
    // m = 200, s^2 = 20000, r = 2 -> xi = -0.5, sigma = 300c = 3.0
    val df = Seq(0.50, 1.00, 2.00, 4.00).toDF("v")
    val out = graft.operators.Stats.gpdTail(df, "v", thresholdCents = 100L)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 2L)
    assert(out.head.getDouble(1) === 2.0)
    assert(out.head.getDouble(2) === -0.5)
    assert(out.head.getDouble(3) === 3.0)
    // < 2 exceedances -> empty, not NaN
    assert(graft.operators.Stats.gpdTail(df, "v", 30000L).collect().isEmpty)
  }

  test("pacf matches the hand-unrolled Durbin-Levinson recursion") {
    import spark.implicits._
    // x = [1,2,1,2]: rho = (-0.75, 0.5, -0.25)
    // phi11 = -0.75; phi22 = (0.5-0.5625)/(1-0.5625) = -1/7
    // phi21 = -0.75 - (-1/7)(-0.75) = -6/7; phi33 = 1/6
    val daily = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)).toDF("k", "x")
    val out = graft.operators.TimeSeries.pacf(daily, "k", "x", 3)
      .orderBy("lag").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out(0).getDouble(1) === -0.75)
    assert(math.abs(out(1).getDouble(1) - (-1.0 / 7.0)) < 1e-12)
    assert(math.abs(out(2).getDouble(1) - 1.0 / 6.0) < 1e-12)
    // short series fails loudly instead of returning a partial curve
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.pacf(daily, "k", "x", 4)
    }
  }

  test("qiniByBucket matches the hand-computed cumulative uplift") {
    import spark.implicits._
    // bucket 0: T 2/4 convert, C 1/4 -> qini(0) = 2 - 1*(4/4) = 1
    // bucket 1: T 0/2, C 1/2      -> qini(1) = 2 - 2*(6/6) = 0
    def rows(b: Int, treated: Boolean, n: Int, conv: Int) =
      (0 until n).map(i => (b, treated, i < conv))
    val df = (rows(0, treated = true, 4, 2) ++ rows(0, treated = false, 4, 1) ++
      rows(1, treated = true, 2, 0) ++ rows(1, treated = false, 2, 1))
      .toDF("bucket", "treated", "conv")
    val out = graft.operators.EvalMetrics
      .qiniByBucket(df, "bucket", "treated", "conv")
      .orderBy("bucket").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).toSeq ===
      Seq((0, 4L, 2L), (1, 2L, 0L)))
    assert(out(0).getDouble(5) === 1.0)
    assert(out(1).getDouble(5) === 0.0)
  }

  test("vocabCoverage picks the smallest covering type count") {
    import spark.implicits._
    // counts a:4 b:2 c:1 d:1 -> N=8, V=4; p50 target 4 -> 1 type;
    // p90/95/99 targets 8 -> all 4 types
    val docs = Seq((0L, "a a a a b b c d")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.vocabCoverage(docs, "doc_id", "text")
      .orderBy("p").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("0.50", 4L, 1L), ("0.90", 8L, 4L), ("0.95", 8L, 4L),
        ("0.99", 8L, 4L)))
    assert(out.head.getDouble(4) === 0.25)
  }

  test("Shapley attribution rejects bad channel configs") {
    import spark.implicits._
    val ev = Seq((1L, "click", 1.0)).toDF("user_id", "event_type", "value")
    intercept[IllegalArgumentException] {
      graft.operators.Shapley.channelAttribution(
        ev, "user_id", "event_type", "value", Seq("a", "a"), "purchase")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Shapley.channelAttribution(
        ev, "user_id", "event_type", "value", Seq("purchase", "b"), "purchase")
    }
  }
}
