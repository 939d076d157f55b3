package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch properties — the property that makes approximate
  * aggregation work at 100 TB: per-shard sketches union to EXACTLY the
  * sketch of the whole, so partial aggregation / incremental rollups give
  * the same answer as a single pass. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("DDSketch Aggregator: merge-of-shards EQUALS single-pass exactly, any partitioning") {
    val rnd = new scala.util.Random(71)
    val data = (0 until 20000).map(_ => math.exp(rnd.nextGaussian() * 2)) // lognormal
    val probs = Seq(0.25, 0.5, 0.75, 0.99)
    val ddq = graft.functions.DDSketchQuantiles.columnFn(0.01, probs) _
    def run(parts: Int): Seq[Double] = data.toDF("x").repartition(parts)
      .agg(ddq(col("x")).as("q")).head().getSeq[Double](0)
    val single = run(1)
    // bucket-count addition is commutative+associative: shard merges are
    // BIT-IDENTICAL to the single pass, not just within-eps
    assert(run(13) === single)
    assert(run(32) === single)
  }

  test("DDSketch estimates are within relative alpha of the exact disc quantiles") {
    val rnd = new scala.util.Random(73)
    val alpha = 0.01
    val data = (0 until 30000).map(_ => math.exp(rnd.nextGaussian() * 3)).toArray
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val ddq = graft.functions.DDSketchQuantiles.columnFn(alpha, probs) _
    val est = data.toSeq.toDF("x").agg(ddq(col("x")).as("q")).head().getSeq[Double](0)
    val sorted = data.sorted
    probs.zip(est).foreach { case (p, e) =>
      val exact = sorted(math.max(0, math.ceil(p * data.length).toInt - 1))
      assert(math.abs(e - exact) <= alpha * exact * (1 + 1e-9),
        s"p=$p est=$e exact=$exact outside alpha=$alpha")
    }
  }

  test("DDSketch handles negatives, zeros and nulls; empty input yields empty array") {
    val probs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val ddq = graft.functions.DDSketchQuantiles.columnFn(0.01, probs) _
    val vals = Seq(Some(-100.0), Some(-1.0), Some(0.0), Some(0.0), Some(2.0),
      Some(50.0), None, None)
    val est = vals.toDF("x").agg(ddq(col("x")).as("q")).head().getSeq[Double](0)
    // n=6 non-null; disc ranks ceil(p*6): 1,2,3,5,6 -> -100,-1,0,2,50
    val expectSign = Seq(-1.0, -1.0, 0.0, 1.0, 1.0)
    est.zip(expectSign).foreach { case (e, s) => assert(math.signum(e) === s, s"$est") }
    assert(math.abs(est(0) + 100.0) <= 1.0 + 1e-9) // within alpha of -100
    assert(est(2) === 0.0)
    assert(math.abs(est(4) - 50.0) <= 0.5 + 1e-9)
    val empty = Seq.empty[Option[Double]].toDF("x")
      .agg(ddq(col("x")).as("q")).head().getSeq[Double](0)
    assert(empty.isEmpty)
  }

  test("profileContract: exact counts match naive, every sketch bound holds on real data") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val got = graft.operators.Profiler.profileContract(li,
      Seq("l_quantity", "l_extendedprice"))
    val rows = got.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    Seq("l_quantity", "l_extendedprice").foreach { c =>
      val (n, nulls, distinct, dOk, q25, q50, q75) = rows(c)
      val want = li.agg(count(col(c)), count(when(col(c).isNull, 1)),
        countDistinct(col(c).cast("double"))).head()
      assert(n === want.getLong(0) && nulls === want.getLong(1) &&
        distinct === want.getLong(2), s"$c exact stats")
      assert(dOk && q25 && q50 && q75, s"$c sketch bound violated")
    }
  }

  test("DataSketches HLL: per-shard sketches union to the whole-data estimate") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey")).filter(col("l_orderkey").isNotNull)
    val whole = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est"))
      .head().getLong(0)
    // shard by an arbitrary key, sketch per shard, union the sketches
    val merged = li
      .withColumn("shard", pmod(col("l_orderkey"), lit(7)))
      .groupBy("shard").agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    // union is estimate-equivalent (NOT bit-identical: the sparse→dense
    // transition differs when built sharded vs whole — measured 1465 vs
    // 1473 on this fixture), and both stay inside the HLL error envelope
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(merged - whole).toDouble / whole < 0.02)
    assert(math.abs(whole - exact).toDouble / exact < 0.05)
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }

  test("approx_count_distinct (HLL++) error bound on real keys") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = row.getLong(0); val approx = row.getLong(1)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
