package graft

import org.apache.spark.sql.functions._
import graft.functions.DetMath

/** Round-8 additions: the q_heaps re-contract (distributed prefix scan +
  * DetMath-exact regression moments) and its building blocks. */
class Round8Spec extends SparkSpec {

  test("Prefix.cumSumLongs is bit-identical to the single-partition window") {
    import spark.implicits._
    val df = (1L to 257L).map(i => (i, i * 37 % 101, (i * i) % 53))
      .toDF("k", "v1", "v2").repartition(7)
    val out = graft.operators.Prefix.cumSumLongs(df, "k",
        Seq("v1", "v2"), Seq("c1", "c2"))
      .orderBy("k").collect()
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
    val exp = df.withColumn("c1", sum(col("v1")).over(w))
      .withColumn("c2", sum(col("v2")).over(w))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq ===
      exp.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq)
  }

  test("Prefix.cumSumLongs rejects non-long value columns") {
    import spark.implicits._
    val df = Seq((1L, 2)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Prefix.cumSumLongs(df, "k", Seq("v"), Seq("c"))
    }
    assert(ex.getMessage.contains("LongType"))
  }

  test("heapsLaw curve and slope match a hand-computed scalar replay") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (1L, "a b d d"), (2L, "a e"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.heapsLaw(docs, "doc_id", "text", 1)
      .orderBy("b").collect()
    // hand curve: per-batch (n_tokens, new_tokens, cum_tokens, cum_distinct)
    val curve = Seq((3L, 3L, 3L, 3L), (4L, 1L, 7L, 4L),
      (2L, 1L, 9L, 5L), (3L, 0L, 12L, 5L))
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq === curve)
    // independent scalar replay of the exact-moment regression
    val pts = curve.map { case (_, _, ct, cd) =>
      def micro(n: Long) =
        math.floor(DetMath.lnPosIntScalar(n) * 1e6 + 0.5).toLong
      (BigInt(micro(ct)), BigInt(micro(cd)))
    }
    val n = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = math.floor((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble * 1e6 + 0.5) / 1e6
    assert(out.forall(r => r.getDouble(5) === beta))
    // sanity: a sub-linear growth exponent in (0, 1)
    assert(beta > 0.0 && beta < 1.0)
  }

  test("heapsLaw: single batch yields a null slope (zero denominator)") {
    import spark.implicits._
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.heapsLaw(docs, "doc_id", "text", 100)
      .collect()
    assert(out.length === 1 && out.head.isNullAt(5))
  }

  // two 4-cliques sharing node 3, a pendant, and a chord — triangles,
  // truss structure, and degree spread without being symmetric
  private def cliqueGraph = {
    import spark.implicits._
    val c1 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c2 = for (a <- 3L to 6L; b <- (a + 1) to 6L) yield (a, b)
    (c1 ++ c2 ++ Seq((6L, 7L), (0L, 4L))).toDF("s", "d")
  }

  test("clusteringCoefficient: no-broadcast path is bit-identical and broadcast-free") {
    val g = cliqueGraph
    val bc = graft.operators.Graph.clusteringCoefficient(g, "s", "d")
      .collect().map(_.toSeq).toSeq
    val nobc = graft.operators.Graph.clusteringCoefficient(g, "s", "d",
      broadcastAdjacency = false).collect().map(_.toSeq).toSeq
    assert(bc === nobc) // exact integer counts: identical under either plan
    // -1 threshold simulates an adjacency past broadcastable size — the
    // situation broadcastAdjacency = false exists for
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val off = graft.operators.Graph.clusteringCoefficient(g, "s", "d",
        broadcastAdjacency = false)
      off.collect()
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("BroadcastExchange"),
        s"no-broadcast path must shuffle-join the adjacency:\n$offPlan")
      val on = graft.operators.Graph.clusteringCoefficient(g, "s", "d")
      on.collect()
      val onPlan = on.queryExecution.executedPlan.toString
      assert(onPlan.contains("BroadcastExchange"),
        "default path must keep the adjacency broadcast hint")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("kTruss: no-broadcast path is bit-identical") {
    val g = cliqueGraph
    val bc = graft.operators.Graph.kTruss(g, "s", "d", 4)
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    val nobc = graft.operators.Graph.kTruss(g, "s", "d", 4,
      broadcastAdjacency = false)
      .orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(bc === nobc && bc.nonEmpty)
    // both 4-cliques survive a 4-truss; the pendant and chord do not
    assert(bc.size === 12)
  }

  test("hits: no-broadcast scores are bit-identical; degraded join shuffles") {
    import spark.implicits._
    val e = Seq((0L, 1L), (0L, 2L), (3L, 1L), (3L, 2L), (1L, 2L), (4L, 2L))
      .toDF("s", "d")
    val bc = graft.operators.Graph.hits(e, "s", "d", iters = 3)
      .orderBy("role", "node").collect().map(_.toSeq).toSeq
    val nobc = graft.operators.Graph.hits(e, "s", "d", iters = 3,
      broadcastScores = false)
      .orderBy("role", "node").collect().map(_.toSeq).toSeq
    assert(bc === nobc) // integer-exact loop: plan cannot change a bit
    // plan shape of one no-broadcast score join, constructed exactly as
    // hits builds it (the returned frame is checkpoint-truncated, so the
    // per-iteration join is asserted on its own lineage)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = e.select(col("s").as("u"), col("d").as("v"))
      val hub = edges.select(col("u").as("node")).distinct()
        .withColumn("s", lit(100L))
      val it = edges.join(hub, edges("u") === hub("node"))
        .groupBy(col("v").as("node")).agg(sum(col("s")).as("s"))
      it.collect()
      val plan = it.queryExecution.executedPlan.toString
      assert(!plan.contains("Broadcast"),
        s"no-broadcast HITS iteration must keyed-join the scores:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("heapsLaw is invariant to input partitioning (the r07 flake class)") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${i % 13} w${i * 31 % 97} common"))
      .toDF("doc_id", "text")
    val a = graft.text.TextAnalysis.heapsLaw(docs.repartition(1), "doc_id", "text", 10)
      .orderBy("b").collect().toSeq
    val b = graft.text.TextAnalysis.heapsLaw(docs.repartition(17), "doc_id", "text", 10)
      .orderBy("b").collect().toSeq
    assert(a === b)
  }
}
