package graft

import org.apache.spark.sql.functions._
import graft.checks.DriftCheck
import graft.core.SeverityLevel
import graft.operators.Funnel

class DriftFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def check(base: org.apache.spark.sql.DataFrame) =
    new DriftCheck("t", "r", SeverityLevel.High, "drift", "v", base,
      lo = 0.0, hi = 10.0, nBins = 10)

  test("PSI of an identical distribution is ~0 and KS is exactly 0") {
    val d = (0 until 1000).map(i => (i % 10).toDouble).toDF("v")
    val c = check(d)
    assert(math.abs(c.psi(d)) < 1e-12)
    assert(c.ksDf(d).head().getDouble(0) == 0.0)
  }

  test("PSI and KS detect a location shift") {
    val base = (0 until 1000).map(i => (i % 5).toDouble).toDF("v")        // mass on 0..4
    val curr = (0 until 1000).map(i => (i % 5).toDouble + 5.0).toDF("v")  // mass on 5..9
    val c = check(base)
    assert(c.psi(curr) > 1.0) // total drift: far above the 0.2 action level
    val ks = c.ksDf(curr).head()
    assert(ks.getDouble(0) == 1.0) // disjoint supports -> max CDF gap 1
    assert(ks.getAs[Long]("n_base") == 1000L && ks.getAs[Long]("n_curr") == 1000L)
  }

  test("distributed KS sweep is bit-identical to a local exact KS; plan has no Window") {
    // continuous doubles: the distinct-value frame is ~row-sized — exactly
    // the shape where the old single-partition window was the scale killer
    val rnd = new scala.util.Random(7)
    val baseVals = Array.fill(2000)(rnd.nextGaussian() * 3 + 5)
    val currVals = Array.fill(1500)(rnd.nextGaussian() * 2 + 6)
    val base = baseVals.toSeq.toDF("v")
    val curr = currVals.toSeq.toDF("v")
    val c = check(base)
    val got = c.ksDf(curr)
    // the distributed pass must not fall back to any window operator
    assert(got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty)
    // independent local oracle with operation-for-operation identical doubles
    val na = baseVals.length.toLong; val nb = currVals.length.toLong
    val counts = scala.collection.mutable.TreeMap.empty[Double, (Long, Long)]
    baseVals.foreach(v => counts.updateWith(v) { p =>
      val (a, b) = p.getOrElse((0L, 0L)); Some((a + 1, b)) })
    currVals.foreach(v => counts.updateWith(v) { p =>
      val (a, b) = p.getOrElse((0L, 0L)); Some((a, b + 1)) })
    var ca = 0L; var cb = 0L; var expected = -1.0
    counts.valuesIterator.foreach { case (a, b) =>
      ca += a; cb += b
      val gap = math.abs(ca.toDouble / na - cb.toDouble / nb)
      if (gap > expected) expected = gap
    }
    val row = got.head()
    assert(row.getDouble(0) == expected) // bit-identical, not approx
    assert(row.getAs[Long]("n_base") == na && row.getAs[Long]("n_curr") == nb)
  }

  test("KS one-sided and both-empty inputs yield null ks instead of fake zero drift") {
    val base = Seq(1.0, 2.0, 3.0).toDF("v")
    val c = check(base)
    val oneSided = c.ksDf(spark.emptyDataset[Double].toDF("v")).head()
    assert(oneSided.isNullAt(0) && oneSided.getAs[Long]("n_base") == 3L &&
      oneSided.getAs[Long]("n_curr") == 0L)
    val empty = spark.emptyDataset[Double].toDF("v")
    val bothEmpty = new DriftCheck("t", "r", SeverityLevel.High, "drift", "v",
      empty, lo = 0.0, hi = 10.0, nBins = 10).ksDf(empty).head()
    assert(bothEmpty.isNullAt(0) && bothEmpty.isNullAt(1) && bothEmpty.isNullAt(2))
  }

  test("out-of-range values clamp into edge bins; proportions sum to 1") {
    val base = Seq(-5.0, 0.5, 3.0, 25.0).toDF("v")
    val c = check(base)
    val bins = c.binnedDist(base).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bins.keySet == Set(0L, 3L, 9L)) // -5 and 0.5 both clamp/land in bin 0
    assert(math.abs(bins.values.sum - 1.0) < 1e-12)
    assert(bins(0L) == 0.5)
  }

  test("empty / all-null datasets yield zero-drift metrics, not a crash") {
    val empty = Seq.empty[Double].toDF("v")
    val some = Seq(1.0, 2.0).toDF("v")
    val c = check(some)
    val ms = c.metricResults(empty)
    assert(ms.size == 2 && ms.forall(_.valueDouble.isDefined))
    // empty current vs non-empty baseline: PSI flags the vanished mass,
    // KS degrades to 0 (no CDF to compare) instead of NPE
    assert(ms.find(_.extraInfo("kind") == "psi").get.valueDouble.get > 0.0)
    assert(ms.find(_.extraInfo("kind") == "ks").get.valueDouble.contains(0.0))
    val cEmptyBase = check(empty)
    val ms2 = cEmptyBase.metricResults(empty)
    assert(ms2.size == 2 && ms2.forall(_.valueDouble.contains(0.0)))
  }

  test("metricResults emits psi + ks rows") {
    val d = (0 until 100).map(i => (i % 10).toDouble).toDF("v")
    val ms = check(d).metricResults(d)
    assert(ms.map(_.extraInfo("kind")).sorted == Seq("ks", "psi"))
    assert(ms.forall(_.valueDouble.exists(v => math.abs(v) < 1e-9)))
  }

  test("funnel counts ordered stage completion only") {
    // u1 completes all 3 in order; u2 views then purchases (no click);
    // u3 clicks BEFORE first view -> stops at view; u4 only views.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "purchase", 30L),
      (3L, "click", 5L), (3L, "view", 10L), (3L, "purchase", 30L),
      (4L, "view", 10L),
      (5L, "error", 1L)
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0, "view", 4L), (1, "click", 1L), (2, "purchase", 1L)))
  }

  test("streaming driftMonitor: PSI per micro-batch against a static baseline") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val baseline = (0 until 1000).map(i => (i % 10).toDouble).toDF("v")
    val c = check(baseline)
    val mem = MemoryStream[Double]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = graft.streaming.StreamingDQ.driftMonitor(mem.toDF().toDF("v"), c) {
      (id, psi) => results.synchronized { results += ((id, psi)) }
    }
    try {
      mem.addData((0 until 100).map(i => (i % 10).toDouble): _*) // same distribution
      q.processAllAvailable()
      mem.addData((0 until 100).map(i => (i % 5).toDouble + 5.0): _*) // shifted
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = results.sortBy(_._1).map(_._2)
    assert(byBatch.size == 2)
    assert(math.abs(byBatch(0)) < 1e-9)  // no drift
    assert(byBatch(1) > 1.0)             // strong drift
  }

  test("streaming categoricalDriftMonitor: chi-square per micro-batch vs static baseline") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // baseline: a/b/c in 60/30/10 proportions
    val baseline = (Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c")).toDF("cat")
    val mem = MemoryStream[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val q = graft.streaming.StreamingDQ.categoricalDriftMonitor(
      mem.toDF().toDF("cat"), baseline, "cat") {
      (id, chi2, n) => results.synchronized { results += ((id, chi2, n)) }
    }
    try {
      mem.addData(Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(50)("c") ++ Seq.fill(50)("d"): _*) // inverted + novel cat
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = results.sortBy(_._1)
    assert(byBatch.size == 2)
    assert(math.abs(byBatch(0)._2) < 1e-9 && byBatch(0)._3 == 100L) // matching mix
    assert(byBatch(1)._2 > 100.0 && byBatch(1)._3 == 100L)          // strong drift
  }

  test("categoricalDriftGate: planted shift alarms, in-distribution batch does not") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val baseline = (Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c")).toDF("cat")
    val mem = MemoryStream[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long, Double, Boolean)]
    val q = graft.streaming.StreamingDQ.categoricalDriftGate(
      mem.toDF().toDF("cat"), baseline, "cat", alpha = 0.01) {
      (id, n, chi2, dof, p, drifted) =>
        results.synchronized { results += ((id, n, chi2, dof, p, drifted)) }
    }
    try {
      mem.addData(Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(30)("a") ++ Seq.fill(30)("b") ++ Seq.fill(40)("c"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = results.sortBy(_._1)
    assert(byBatch.size == 2)
    val (_, n0, chi0, dof0, p0, d0) = byBatch(0)
    assert(n0 == 100L && dof0 == 2L && chi0 < 1e-9 && p0 > 0.99 && !d0,
      s"in-distribution batch must not alarm: $byBatch")
    val (_, _, chi1, _, p1, d1) = byBatch(1)
    // planted shift: chi2 = (30-60)^2/60 + 0 + (40-10)^2/10 = 105 -> p ~ 1e-23
    assert(chi1 > 100.0 && p1 < 1e-10 && d1, s"planted shift must alarm: $byBatch")
  }

  test("transitionCounts builds the adjacent-pair matrix per user") {
    val ev = Seq(
      (1L, "a", 1L, 100L), (1L, "b", 2L, 101L), (1L, "a", 3L, 102L),
      (2L, "a", 1L, 103L), (2L, "b", 2L, 104L),
      (3L, "c", 1L, 105L)  // single event -> no transitions
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitionCounts(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("transitionCounts breaks timestamp ties deterministically by the tie column") {
    val ev = Seq((1L, "x", 5L, 1L), (1L, "y", 5L, 2L)).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.transitionCounts(ev, "user_id", "event_type", "ts", "event_id").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("x", "y")))
  }

  test("funnel ties at equal first-touch timestamps count as ordered") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L)).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }
}
