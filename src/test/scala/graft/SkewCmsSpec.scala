package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiler

/** Ops diagnostics: partition-skew report and Count-Min-Sketch
  * mergeability (the third mergeable-sketch family next to HLL and
  * Bloom). */
class SkewCmsSpec extends SparkSpec {

  test("partitionSkew: balanced repartition ~1, single-key partitioning maximal") {
    val s = spark
    import s.implicits._
    val df = (1 to 10000).toDF("x")
    val balanced = Profiler.partitionSkew(df.repartition(8)).collect().head
    assert(balanced.getAs[Long]("n_partitions") == 8L)
    assert(balanced.getAs[Double]("skew") < 1.3)
    // partition by a constant key: everything lands in one partition
    val skewed = Profiler.partitionSkew(df.repartition(8, lit(1))).collect().head
    assert(skewed.getAs[Long]("max_rows") == 10000L)
  }

  test("weightedQuantilesDisc: weight-heavy values pull the quantile; p=1 is the max") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L), ("g", 4.0, 7L),
      ("h", 10.0, 5L), ("h", 20.0, 5L)).toDF("k", "v", "wt")
    val out = Profiler.weightedQuantilesDisc(df, "k", "v", "wt", Seq(0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // g: W=10, cum(1,2,3,4)=(1,2,3,10): first cum>=5 is v=4 (row median is 2.x)
    assert(out("g") == (10L, 4.0, 4.0))
    // h: W=10, cum(10)=5 >= 5 -> p50=10; p100=20
    assert(out("h") == (10L, 10.0, 20.0))
  }

  test("CountMinSketch: sharded sketches merge to the exact whole-table sketch") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => s"k${i % 97}").toDF("k")
    val eps = 0.001; val conf = 0.99; val seed = 42
    val whole = df.stat.countMinSketch("k", eps, conf, seed)
    val left = df.filter(md5(col("k")) < "8").stat.countMinSketch("k", eps, conf, seed)
    val right = df.filter(md5(col("k")) >= "8").stat.countMinSketch("k", eps, conf, seed)
    left.mergeInPlace(right)
    // CMS merge is counter addition with shared hashes: estimates match
    // the single-pass sketch EXACTLY, and est ∈ [true, true + eps·N]
    val trueCounts = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    trueCounts.foreach { case (key, trueCount) =>
      val est = whole.estimateCount(key)
      assert(est == left.estimateCount(key), s"merged != whole for $key")
      assert(est >= trueCount && est <= trueCount + (eps * 5000).toLong + 1)
    }
    assert(whole.totalCount() == 5000L)
  }
}
