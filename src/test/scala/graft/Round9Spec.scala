package graft

import org.apache.spark.sql.functions._

/** Round-9 hardening: the ADVICE fixes (winnow BIGINT fingerprints,
  * kruskalWallis degenerate-tie null, heavy-hitter broadcast semi-join,
  * vocabCoverage true integer division) pinned by spec. */
class Round9Spec extends SparkSpec {

  test("winnowMd5 fingerprints are 60-bit md5 prefixes (non-negative longs)") {
    import spark.implicits._
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val fps = graft.text.TextAnalysis
      .winnowMd5(docs, "doc_id", "text").collect().map(_.getLong(1))
    assert(fps.nonEmpty)
    // 15 hex chars = 60 bits: always in [0, 2^60)
    assert(fps.forall(f => f >= 0L && f < (1L << 60)))
  }

  test("kruskalWallis nulls h_tie when every value ties (degenerate)") {
    import spark.implicits._
    val df = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5), ("c", 5))
      .toDF("g", "v")
    val r = graft.operators.Profiler.kruskalWallis(df, "v", "g").collect().head
    assert(r.isNullAt(r.fieldIndex("h_tie")),
      "all-tied input must yield null h_tie, not Inf/NaN")
  }

  test("kruskalWallis h_tie unchanged on a non-degenerate input") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 2), ("c", 5))
      .toDF("g", "v")
    val r = graft.operators.Profiler.kruskalWallis(df, "v", "g").collect().head
    val h = r.getDouble(r.fieldIndex("h"))
    val ht = r.getDouble(r.fieldIndex("h_tie"))
    // one tie pair (value 2, t=3^... actually t=2): correction < 1 so h_tie > h
    assert(ht > h && !ht.isNaN && !ht.isInfinite)
  }

  test("exactHeavyHitters matches brute force and plans a broadcast semi-join") {
    import spark.implicits._
    val rows = (1 to 400).map(i => s"k${i % 7}") ++ Seq.fill(300)("hot")
    val df = rows.toDF("key").repartition(8)
    val got = graft.operators.HeavyHitters.exactHeavyHitters(df, "key", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = rows.size
    val brute = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 3 >= n }.toMap
    assert(got === brute)
    // the candidate restriction must be a broadcast semi-join, not an
    // In/InSet literal embedded in the plan (inspect the pre-truncate
    // plan — Checkpoints.truncate hides it behind a Scan ExistingRDD)
    val (out, keys) = graft.operators.HeavyHitters.heavyHittersPlan(df, "key", 3)
    val plan = out.queryExecution.executedPlan.toString
    keys.unpersist()
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join in:\n$plan")
    assert(!plan.contains(" IN ("), "candidates must not be a plan literal")
  }

  test("dedup catalog is a commutative monoid; merge == one-shot; size is bounded") {
    import spark.implicits._
    import graft.dedup.Dedup
    val docs = Seq(                       // batch = doc_id % 3
      (1L, "alpha beta"), (2L, "alpha  BETA"),      // same fp, batches 1/2
      (3L, "gamma"), (4L, "gamma"),                 // same fp, batches 0/1
      (5L, "delta"), (6L, "epsilon"), (7L, "alpha beta"))
      .toDF("doc_id", "text")
    def batch(b: Long) = docs.filter(col("doc_id") % 3 === b)
    val cats = (0L to 2L).map(b => Dedup.dedupCatalogOfBatch(batch(b), "doc_id", "text", b))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fingerprint", "first_batch", "first_id", "n_seen")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // associativity + commutativity: any fold order yields the same state
    val leftFold = rows(Dedup.dedupCatalogMerge(
      Dedup.dedupCatalogMerge(cats(0), cats(1)), cats(2)))
    val rightFold = rows(Dedup.dedupCatalogMerge(
      cats(2), Dedup.dedupCatalogMerge(cats(1), cats(0))))
    val flat = rows(Dedup.dedupCatalogMerge(cats: _*))
    assert(leftFold === rightFold && leftFold === flat)
    // bounded-size invariant: |state| == distinct fingerprints, not batches
    val nFp = docs.select(graft.text.TextAnalysis.fingerprint(col("text")))
      .distinct().count()
    assert(leftFold.size.toLong === nFp)
    // semantics vs a scalar replay: first = lexicographic min (batch, id)
    val byFp = docs.collect().map { r =>
      val id = r.getLong(0)
      (java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString, id % 3, id)
    }.groupBy(_._1)
    val want = byFp.map { case (fp, rs) =>
      val (_, fb, fi) = rs.minBy(t => (t._2, t._3))
      (fp, fb, fi, rs.size.toLong)
    }.toSet
    assert(leftFold === want)
    // the probe flags exactly the cataloged fingerprints
    val flagged = Dedup.dedupCatalogFlag(
      Dedup.dedupCatalogMerge(cats(0), cats(1)),
      batch(2), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // batch 2 = doc_ids {2, 5}: 2 ("alpha  BETA") dups batch-0 doc 1;
    // 5 ("delta") is novel
    assert(flagged === Map(2L -> 1, 5L -> 0))
  }

  test("mixturePlan: binding source saturates at rate 1, rates realize weights, absent sources drop") {
    import spark.implicits._
    import graft.operators.Splits
    // src a: 1000 tokens, b: 1000, c: 300, d unweighted
    val df = Seq(("a", 1000L), ("b", 1000L), ("c", 300L), ("d", 500L))
      .toDF("source", "tok")
    val plan = Splits.mixturePlan(df, "source", col("tok"),
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    // budget = min(1000/0.5, 1000/0.3, 300/0.2) = 1500 -> c binds at rate 1
    assert(plan("c")._3 === 1.0 && plan("c")._4 === 256)
    assert(math.abs(plan("a")._3 - 0.75) < 1e-12)  // 0.5*1500/1000
    assert(math.abs(plan("b")._3 - 0.45) < 1e-12)  // 0.3*1500/1000
    assert(plan("d")._3 === 0.0 && plan("d")._4 === 0)
    // realized token mixture == target weights exactly at the unquantized
    // rates: rate_s * n_s = w_s * budget
    val realized = Seq("a", "b", "c").map(s => plan(s)._3 * plan(s)._1)
    assert(realized.zip(Seq(0.5, 0.3, 0.2)).forall { case (r, w) =>
      math.abs(r - w * 1500.0) < 1e-9 })
    // the sampler only keeps weighted sources
    val sampled = Splits.mixtureSample(df, "source", "source", col("tok"),
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(sampled.filter(col("source") === "d").count() === 0L)
  }

  test("boilerplateStatsHashed is row-identical to the string-gram path on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_grams", "n_boiler", "boiler_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val s = rows(graft.text.TextAnalysis.boilerplateStats(docs, "doc_id", "text"))
    val h = rows(graft.text.TextAnalysis.boilerplateStatsHashed(docs, "doc_id", "text"))
    assert(s.nonEmpty && s === h)
  }

  test("slidingChunks: full token coverage, exact window/stride grid, short-doc single chunk") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val docs = Seq(
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")), // len 11: starts 1,4,7,8
      (2L, "a b c"),                                   // len 3 < window -> one chunk
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.slidingChunks(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // grid 1,4,7 capped at len-w+1=8, plus clamped final start 8
    assert(d1.map(_._3).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t8 t9 t10 t11"))
    assert(d1.forall(_._4 == 4))
    // coverage: every token index appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 11).map(i => s"t$i").toSet)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == "a b c" && d2.head._4 == 3)
    assert(!got.exists(t => t._1 == 3L || t._1 == 4L))
  }

  test("epochPlan: binding source at the cap, planned tokens realize the mixture") {
    import spark.implicits._
    import graft.operators.Splits
    val df = Seq(("a", 1000L), ("b", 100L), ("c", 500L)).toDF("source", "tok")
    val plan = Splits.epochPlan(df, "source", col("tok"),
        Map("a" -> 0.5, "b" -> 0.5), maxRepeat = 4.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // budget = min(4*1000/0.5, 4*100/0.5) = 800 -> b binds at repeat 4.0
    assert(plan("b")._1 === 4.0 && plan("b")._2 === 400.0)
    assert(math.abs(plan("a")._1 - 0.4) < 1e-12 && plan("a")._2 === 400.0)
    assert(plan("c") === ((0.0, 0.0))) // unweighted source drops
  }

  test("deterministicShuffle: identical order across reruns and repartitionings, seed rotates") {
    import spark.implicits._
    import graft.operators.Splits
    val df = (1L to 200L).toDF("id")
    def order(d: org.apache.spark.sql.DataFrame, seed: String): Seq[Long] =
      Splits.deterministicShuffle(d, "id", seed).collect().map(_.getLong(0)).toSeq
    val o1 = order(df, "s1")
    assert(o1 === order(df.repartition(13), "s1"))
    assert(o1 !== order(df, "s2"))
    assert(o1.toSet === (1L to 200L).toSet) // a permutation, nothing lost
  }

  test("vocabCoverage ceiling divisions are integer-exact (div, not double /)") {
    import spark.implicits._
    // 10 tokens total; p=0.50 target = ceil(10*1/2) = 5 tokens
    val docs = Seq((1L, "a a a a b b c c d e")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis
      .vocabCoverage(docs, "doc_id", "text", Seq(("0.50", 1, 2)))
      .collect().head
    assert(out.getLong(out.fieldIndex("target_tokens")) === 5L)
    // counts desc: a(4), b(2)|c(2), d|e(1). cum after a=4 < 5; need 1 more
    // token from the c=2 stratum (b,c: 2 types, ceil(1/2)=1 type) -> k=2
    assert(out.getLong(out.fieldIndex("k_types")) === 2L)
  }
}
