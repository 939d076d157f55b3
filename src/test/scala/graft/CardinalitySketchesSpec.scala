package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.functions.Md5Hash60

/** CMS / KMV / HLL mergeable-sketch properties: partition invariance
  * (merge-of-shards ≡ single-pass, the property that makes them safe at
  * any cluster layout), the CMS overestimate guarantee, KMV exact-below-k
  * and accuracy-above-k, HLL duplicate idempotence and accuracy. The
  * bit-level cross-engine reproducibility is covered by the DuckDB
  * oracles of q_cms_estimate / q_kmv_distinct / q_kmv_overlap /
  * q_hll_distinct.
  */
class CardinalitySketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 equals the documented md5 prefix definition") {
    // independent reference: parse the first 15 hex chars of the digest
    def ref(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    Seq("", "a", "0:hello", "42", "graft é中").foreach { s =>
      assert(Md5Hash60.hash60(s) === ref(s), s)
      assert(Md5Hash60.hash60(s) >= 0L)
    }
  }

  test("CMS: partition-invariant counters; est >= true count on real tokens") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val toks = docs.select(graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    val keys = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

    val est1 = Sketches.cmsEstimates(toks.repartition(1), "toks", keys, "tok",
      depth = 4, width = 16).select("tok", "est", "cnt")
    val est13 = Sketches.cmsEstimates(toks.repartition(13), "toks", keys, "tok",
      depth = 4, width = 16).select("tok", "est", "cnt")
    val a = est1.orderBy("tok").collect().toSeq
    val b = est13.orderBy("tok").collect().toSeq
    assert(a === b, "sketch must be identical under any partitioning")
    a.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"CMS must never underestimate: $r")
    }
    // width 16 << 31 keys: collisions must actually inflate some estimates
    assert(a.count(r => r.getLong(1) > r.getLong(2)) > 0)
  }

  test("KMV: exact below k, accurate and partition-invariant above k") {
    val small = spark.range(40).select(concat(lit("u"), col("id")).as("k"))
    val smallEst = Sketches.kmvDistinct(small.withColumn("g", lit(1)), Seq("g"), "k", k = 64)
      .select("est_distinct").head.getDouble(0)
    assert(smallEst === 40.0, "below k the sketch IS the set")

    val big = spark.range(5000).select(concat(lit("u"), col("id")).as("k"))
      .withColumn("g", lit(1))
    val e1 = Sketches.kmvDistinct(big.repartition(1), Seq("g"), "k", k = 64)
      .select("kmv", "est_distinct").head
    val e13 = Sketches.kmvDistinct(big.repartition(13), Seq("g"), "k", k = 64)
      .select("kmv", "est_distinct").head
    assert(e1.getSeq[Long](0) === e13.getSeq[Long](0), "k-min set is partition-invariant")
    assert(e1.getDouble(1) === e13.getDouble(1))
    val rel = math.abs(e1.getDouble(1) / 5000.0 - 1.0)
    assert(rel < 0.4, s"KMV k=64 should land within 40% (stderr ~1/sqrt(k)): got $rel")
  }

  test("KMV overlap: identical sets -> jaccard 1, disjoint sets -> jaccard 0") {
    val a = spark.range(500).select(lit("A").as("g"), concat(lit("x"), col("id")).as("k"))
    val b = spark.range(500).select(lit("B").as("g"), concat(lit("x"), col("id")).as("k"))
    val c = spark.range(500).select(lit("C").as("g"), concat(lit("y"), col("id")).as("k"))
    val out = Sketches.kmvOverlap(a.union(b).union(c), "g", "k", k = 64)
      .orderBy("ga", "gb").collect()
    val ab = out.find(r => r.getString(0) == "A" && r.getString(1) == "B").get
    val ac = out.find(r => r.getString(0) == "A" && r.getString(1) == "C").get
    assert(ab.getAs[Double]("jaccard_est") === 1.0)
    assert(ab.getAs[Double]("est_intersection") === ab.getAs[Double]("est_union"))
    assert(ac.getAs[Double]("jaccard_est") === 0.0)
    assert(ac.getAs[Double]("est_intersection") === 0.0)
  }

  test("CMS xxh64 scale path: JVM counters agree with Column lookups; same guarantees") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val toks = docs.select(graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    val keys = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    // wide sketch: collisions rare, so est == cnt for most keys — any
    // JVM-vs-Column hash divergence would surface as underestimates
    val rows = Sketches.cmsEstimates(toks, "toks", keys, "tok",
      depth = 4, width = 512, md5Hash = false).select("tok", "est", "cnt").collect()
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2), s"underestimate: $r"))
    assert(rows.count(r => r.getLong(1) == r.getLong(2)) >= rows.length - 2)
    // and partition invariance holds on the scale path too
    val a = Sketches.cmsEstimates(toks.repartition(1), "toks", keys, "tok", 4, 16, md5Hash = false)
      .select("tok", "est").orderBy("tok").collect().toSeq
    val b = Sketches.cmsEstimates(toks.repartition(13), "toks", keys, "tok", 4, 16, md5Hash = false)
      .select("tok", "est").orderBy("tok").collect().toSeq
    assert(a === b)
  }

  test("plan shapes: one aggregation pass per sketch; CMS estimates join a broadcast one-row sketch") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val toks = docs.select(graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    val keys = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val cmsPlan = Sketches.cmsEstimates(toks, "toks", keys, "tok", 4, 16)
      .queryExecution.executedPlan.toString
    // the counters side reaches the keys through a broadcast, never a shuffle
    assert(cmsPlan.contains("BroadcastNestedLoopJoin") || cmsPlan.contains("BroadcastExchange"),
      s"counters must broadcast:\n$cmsPlan")

    // per-group sketches: exactly one shuffle (the groupBy) feeds the agg —
    // no extra exchange for a distinct pre-pass (the sketches dedup internally)
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    Seq(
      Sketches.kmvDistinct(ev, Seq("event_type"), "user_id", 64),
      Sketches.hllDistinct(ev, Seq("event_type"), "user_id", 8)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val nExchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
      assert(nExchanges == 1, s"expected exactly 1 shuffle, got $nExchanges:\n$plan")
    }
  }

  test("HLL lifecycle: daily registers round-trip through parquet; rollup == direct sketch") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("day", expr("(ts div 1000) div 86400000000").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("hll_daily").toString
    // the persistable daily sketch table, actually persisted
    Sketches.hllRegisters(ev, Seq("event_type", "day"), "user_id", p = 8)
      .write.mode("overwrite").parquet(dir)
    val rolled = Sketches.hllRollup(spark.read.parquet(dir), Seq("event_type"), p = 8)
      .select("event_type", "est_distinct", "harmonic_sum_scaled", "zero_registers")
      .orderBy("event_type").collect().toSeq
    val direct = Sketches.hllDistinct(ev, Seq("event_type"), "user_id", p = 8)
      .orderBy("event_type").collect().toSeq
    assert(rolled === direct,
      "rollup of parquet-persisted dailies must equal the direct sketch bit-for-bit")
  }

  test("HLL: duplicate-idempotent, partition-invariant, within 20% at n=1500") {
    val base = spark.range(1500).select(concat(lit("u"), col("id")).as("k"))
      .withColumn("g", lit(1))
    val dup = base.union(base).union(base) // every key 3x
    val h1 = Sketches.hllDistinct(base.repartition(1), Seq("g"), "k", p = 8).head
    val h13 = Sketches.hllDistinct(dup.repartition(13), Seq("g"), "k", p = 8).head
    assert(h1 === h13, "registers are max-merged: duplicates and layout are no-ops")
    val est = h1.getAs[Double]("est_distinct")
    assert(math.abs(est / 1500.0 - 1.0) < 0.2,
      s"HLL p=8 should land within ~20% (1.04/sqrt(256)=6.5% stderr): $est")
  }
}
