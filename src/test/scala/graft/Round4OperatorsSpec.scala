package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Merge, Reconcile, TimeSeries}

/** Round-4 operators: CDC changelog replay, EWMA / CUSUM control charts
  * (batch closed forms + streaming recursion), single-changepoint
  * detection, Merkle bucket digests, Unicode NFC cleanup. */
class Round4OperatorsSpec extends SparkSpec {

  // ---- CDC changelog replay ----

  test("applyChangelog: last op per key decides fate; deletes drop keys") {
    val s = spark
    import s.implicits._
    val ops = Seq(
      // k1: insert then update -> present with v=20
      ("k1", 1L, "I", 10.0), ("k1", 2L, "U", 20.0),
      // k2: update then delete -> absent
      ("k2", 1L, "U", 5.0), ("k2", 9L, "D", 0.0),
      // k3: delete then re-insert -> present with v=7
      ("k3", 3L, "D", 0.0), ("k3", 4L, "I", 7.0),
      // k4: single delete of an unknown key -> absent
      ("k4", 1L, "D", 0.0)
    ).toDF("k", "seq", "op", "v")
    val out = Merge.applyChangelog(ops, Seq("k"), "seq", "op", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq(("k1", 2L, 20.0), ("k3", 4L, 7.0)))
  }

  test("applyChangelog == latestByKey + delete filter (random log)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val ops = (1 to 500).map { i =>
      (s"k${rnd.nextInt(40)}", i.toLong,
        if (rnd.nextInt(5) == 0) "D" else "U", rnd.nextInt(1000).toDouble)
    }.toDF("k", "seq", "op", "v")
    val got = Merge.applyChangelog(ops, Seq("k"), "seq", "op", Seq("v"))
      .select("k", "seq", "v")
    val want = Merge.latestByKey(ops, Seq("k"), "seq", "seq")
      .filter(col("op") =!= "D").select("k", "seq", "v")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  // ---- EWMA ----

  private def ewmaRef(xs: Seq[Double], alpha: Double): Seq[Double] = {
    // pandas ewm(adjust=True): s_t = sum r^(t-i) x_i / sum r^(t-i)
    val r = 1.0 - alpha
    var num = 0.0; var den = 0.0
    xs.map { x => num = x + r * num; den = 1.0 + r * den; num / den }
  }

  test("ewma matches the direct recursion per key (several alphas)") {
    val s = spark
    import s.implicits._
    val xs1 = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 3.0, 9.0)
    val xs2 = Seq(100.0, 0.0, 50.0)
    val df = (xs1.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) } ++
      xs2.zipWithIndex.map { case (x, i) => ("b", i.toLong, x) })
      .toDF("k", "ord", "x")
    for (alpha <- Seq(0.1, 0.5, 0.9)) {
      val got = TimeSeries.ewma(df, "k", Seq(col("ord")), "x", alpha)
        .orderBy("k", "ord").collect()
        .map(r => (r.getString(0), r.getDouble(3)))
      val want = ewmaRef(xs1, alpha).map(("a", _)) ++ ewmaRef(xs2, alpha).map(("b", _))
      got.zip(want).foreach { case ((gk, gv), (wk, wv)) =>
        assert(gk == wk && math.abs(gv - wv) < 1e-9, s"alpha=$alpha got=$gv want=$wv")
      }
    }
  }

  // ---- CUSUM ----

  private def cusumRef(xs: Seq[Double], target: Double, slack: Double): Seq[(Double, Double)] = {
    var sp = 0.0; var sn = 0.0
    xs.map { x =>
      sp = math.max(0.0, sp + (x - target - slack))
      sn = math.max(0.0, sn - (x - target + slack))
      (sp, sn)
    }
  }

  test("cusum closed form == Page's recursion; alarm fires on a planted shift") {
    val s = spark
    import s.implicits._
    // in-control around 10, then a +5 shift from index 10
    val xs = Seq.tabulate(20)(i => if (i < 10) 10.0 + (i % 3) - 1 else 15.0 + (i % 3) - 1)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }.toDF("k", "ord", "x")
    val got = TimeSeries.cusum(df, "k", Seq(col("ord")), "x",
        target = 10.0, slack = 1.0, h = 10.0)
      .orderBy("ord").collect()
      .map(r => (r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"), r.getAs[Boolean]("alarm")))
    val want = cusumRef(xs, 10.0, 1.0)
    got.zip(want).foreach { case ((gp, gn, _), (wp, wn)) =>
      assert(math.abs(gp - wp) < 1e-12 && math.abs(gn - wn) < 1e-12)
    }
    // pre-shift: no alarm; post-shift: alarm latched by the end
    assert(!got.take(10).exists(_._3) && got.last._3)
  }

  test("cusum flags downward shifts via s_neg") {
    val s = spark
    import s.implicits._
    val xs = Seq.fill(5)(10.0) ++ Seq.fill(10)(4.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }.toDF("k", "ord", "x")
    val last = TimeSeries.cusum(df, "k", Seq(col("ord")), "x", 10.0, 1.0, 20.0)
      .orderBy("ord").collect().last
    assert(last.getAs[Double]("s_neg") > 20.0 && last.getAs[Boolean]("alarm"))
  }

  // ---- changepoint ----

  test("changepoint finds a planted mean shift exactly") {
    val s = spark
    import s.implicits._
    val xs = Seq.fill(10)(0L) ++ Seq.fill(10)(100L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }.toDF("k", "ord", "x")
    val r = TimeSeries.changepoint(df, "k", Seq(col("ord")), "x").collect().head
    assert(r.getAs[Int]("split_at") == 10)
    assert(r.getAs[Double]("mean_left") == 0.0 && r.getAs[Double]("mean_right") == 100.0)
    // gain at the true split = n1*n2/n * (m1-m2)^2 = 10*10/20 * 100^2
    assert(math.abs(r.getAs[Double]("gain") - 50000.0) < 1e-6)
  }

  test("changepoint: constant series ties break to the smallest t; <2-row keys dropped") {
    val s = spark
    import s.implicits._
    val df = (Seq.tabulate(6)(i => ("flat", i.toLong, 5L)) :+ (("single", 0L, 1L)))
      .toDF("k", "ord", "x")
    val rows = TimeSeries.changepoint(df, "k", Seq(col("ord")), "x").collect()
    assert(rows.length == 1) // 'single' has no interior split
    val r = rows.head
    assert(r.getString(0) == "flat" && r.getAs[Int]("split_at") == 1
      && math.abs(r.getAs[Double]("gain")) < 1e-9)
  }

  // ---- bucket digests ----

  test("bucketDigests: identical snapshots agree; targeted edits surface in exactly their buckets") {
    val s = spark
    import s.implicits._
    val a = (1 to 300).map(i => (i.toLong, s"name_$i", i % 7)).toDF("id", "name", "grp")
    assert(Reconcile.digestDiff(
      Reconcile.bucketDigests(a, Seq("id"), Seq("name", "grp"), 16),
      Reconcile.bucketDigests(a, Seq("id"), Seq("name", "grp"), 16)).isEmpty)
    // value edit on id=42 and delete of id=100
    val b = a.filter(col("id") =!= 100)
      .withColumn("name", when(col("id") === 42, lit("changed")).otherwise(col("name")))
    val diff = Reconcile.digestDiff(
      Reconcile.bucketDigests(a, Seq("id"), Seq("name", "grp"), 16),
      Reconcile.bucketDigests(b, Seq("id"), Seq("name", "grp"), 16)).collect()
    val touched = Seq(42L, 100L).map { id =>
      Reconcile.bucketDigests(a.filter(col("id") === id), Seq("id"), Seq("name", "grp"), 16)
        .collect().head.getLong(0)
    }.distinct.sorted
    assert(diff.map(_.getLong(0)).sorted.toSeq == touched)
    // the deleted row's bucket loses a row; the edited row's bucket keeps its count
    val byBucket = diff.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val delBucket = touched.filter(bk => byBucket(bk)._1 != byBucket(bk)._2)
    assert(delBucket.forall(bk => byBucket(bk)._1 == byBucket(bk)._2 + 1))
  }

  // ---- NFC normalize + cleanText ----

  test("nfc_normalize composes decomposed sequences; ASCII passes through; SQL surface registered") {
    val s = spark
    import s.implicits._
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val df = Seq(("c", composed), ("d", decomposed), ("a", "plain ascii")).toDF("id", "t")
    val out = df.select(col("id"), graft.functions.nfc_normalize(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("c") == composed && out("d") == composed && out("a") == "plain ascii")
    // SQL registration via GraftExtensions
    df.createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql("SELECT id, nfc_normalize(t) AS n FROM nfc_in")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSql == out)
  }

  test("cleanText collapses whitespace runs and trims") {
    val s = spark
    import s.implicits._
    val df = Seq(("  a\t\tb\n\nc  ", "a b c"), ("x", "x"), ("", "")).toDF("t", "want")
    val bad = df.select(graft.text.TextAnalysis.cleanText(col("t")).as("got"), col("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.isEmpty)
  }

  // ---- streaming control charts ----

  test("streaming EWMA/CUSUM recursion converges to the batch closed forms") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val xs = Seq(12.0, 9.0, 15.0, 30.0, 31.0, 2.0, 28.0, 29.5)
      val rows = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      val mem = MemoryStream[(String, Long, Double)]
      val df = mem.toDF().toDF("key", "ord", "value")
      val out = graft.streaming.ControlCharts.runningCharts(df,
        alpha = 0.3, target = 15.0, slack = 2.0, h = 25.0)
      val q = out.writeStream.format("memory").queryName("charts")
        .outputMode("update").start()
      try {
        // ordered arrival split across 3 micro-batches
        rows.grouped(3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val got = spark.table("charts")
          .select("ord", "ewma", "s_pos", "s_neg").collect()
          .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3))))
          .toMap
        val batchDf = rows.toDF("k", "ord", "x")
        val be = TimeSeries.ewma(batchDf, "k", Seq(col("ord")), "x", 0.3)
          .select("ord", "ewma").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val bc = TimeSeries.cusum(batchDf, "k", Seq(col("ord")), "x", 15.0, 2.0, 25.0)
          .select("ord", "s_pos", "s_neg").collect()
          .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
        xs.indices.foreach { i =>
          val (ge, gp, gn) = got(i.toLong)
          assert(math.abs(ge - be(i.toLong)) < 1e-9, s"ewma@$i")
          assert(math.abs(gp - bc(i.toLong)._1) < 1e-9, s"s_pos@$i")
          assert(math.abs(gn - bc(i.toLong)._2) < 1e-9, s"s_neg@$i")
        }
      } finally q.stop()
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
