package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiler, Splits}
import graft.similarity.Similarity
import graft.text.TextAnalysis
import graft.dedup.Dedup

/** Round-2 corpus-curation operators: stratified sampling, quota caps,
  * repetition signals, decontamination, embedding quantization, MAD
  * outliers. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: threshold 256 keeps all, 0/absent drops all, mid is deterministic subset") {
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "grp")
    val all = Splits.stratifiedSample(df, "grp", "id", Map("a" -> 256))
    assert(all.count() == 200 && all.filter($"grp" === "b").count() == 0)
    val half = Splits.stratifiedSample(df, "grp", "id", Map("a" -> 128, "b" -> 128))
    val n = half.count()
    assert(n > 120 && n < 280) // ~50% of 400, md5-uniform
    // deterministic: same rows on re-run and under repartitioning
    val again = Splits.stratifiedSample(df.repartition(7), "grp", "id", Map("a" -> 128, "b" -> 128))
    assert(half.select("id").except(again.select("id")).count() == 0 &&
      again.select("id").except(half.select("id")).count() == 0)
  }

  test("stratifiedSample: null stratum follows defaultUpper") {
    val df = Seq((1L, null: String), (2L, "a")).toDF("id", "grp")
    assert(Splits.stratifiedSample(df, "grp", "id", Map("a" -> 256)).count() == 1)
    assert(Splits.stratifiedSample(df, "grp", "id", Map("a" -> 256), defaultUpper = 256).count() == 2)
  }

  test("quotaCap keeps at most cap rows per group, deterministically") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val capped = Splits.quotaCap(df, "grp", "id", cap = 10)
    val counts = capped.groupBy("grp").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 10) && counts.length == 3)
    val again = Splits.quotaCap(df.repartition(5), "grp", "id", cap = 10)
    assert(capped.select("id").except(again.select("id")).count() == 0)
    // small groups survive whole
    val tiny = Splits.quotaCap(df.limit(5), "grp", "id", cap = 10)
    assert(tiny.count() == 5)
  }

  test("repetitionStats flags degenerate repetition") {
    val df = Seq(
      (1L, "a a a a a a a a"),             // one token repeated
      (2L, "x y x y x y x y"),             // one bigram dominating
      (3L, "all words here are different"),
      (4L, "single")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byId(1L) == ((8L, 0.125, 1.0, 1.0)))      // "a a": 7 of 7 bigrams
    assert(byId(2L)._3 == 0.5)                        // top token x: 4/8
    assert(byId(2L)._4 > 0.5)                         // "x y" bigram: 4/7
    assert(byId(3L)._2 == 1.0 && byId(3L)._3 == 0.2)  // all distinct
    assert(byId(4L) == ((1L, 1.0, 1.0, 0.0)))         // no bigrams
  }

  test("crossNgramContamination finds planted overlap, reports clean docs as zero") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (10L, s"alpha beta $shared gamma"),
      (11L, "totally unrelated training text with many words")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, s"prefix tokens $shared suffix tokens"),
      (2L, "a clean evaluation document nothing shared here okay")
    ).toDF("doc_id", "text")
    val out = Dedup.crossNgramContamination(train, eval_, "doc_id", "text", n = 8)
      .orderBy("eval_id").collect()
    val r1 = out(0)
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 1L && r1.getLong(2) >= 1L)
    val r2 = out(1)
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 0L && r2.getLong(2) == 0L)
    assert(r2.getLong(3) > 0L) // still reports its gram count
  }

  test("quantizeSummary: norms, code bounds, max element hits ±127") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),          // norm 5, maxabs 4
      (2L, Array(0.0f, 0.0f)),          // all-zero guard
      (3L, Array(-2.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeSummary(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val r1 = out(0)
    assert(r1.getDouble(1) == 5.0)                       // l2_norm
    assert(r1.getInt(2) == 2)                            // n_pos
    // codes: floor(3/ (4/127) + .5)=95, 4 -> 127
    assert(r1.getLong(3) == 95L + 127L && r1.getLong(4) == 95L + 127L)
    val r2 = out(1)
    assert(r2.getDouble(1) == 0.0 && r2.getLong(3) == 0L && r2.getDouble(5) == 1.0)
    val r3 = out(2)
    val code1 = math.floor(1.0 / (2.0 / 127.0) + 0.5).toLong // ±1 ulp around 64
    assert(r3.getLong(4) == 127L + code1) // |-127| + |code(1.0)|
  }

  test("incrementalDedup flags batch docs whose fingerprint exists in the corpus") {
    val corpus = Seq((1L, "the same text"), (2L, "other corpus text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  The   SAME text "),   // normalizes to corpus doc 1
      (11L, "genuinely new text")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(2))).toSeq == Seq((10L, 1), (11L, 0)))
  }

  test("weightBudgetCap keeps the hash-order prefix within budget per group") {
    val df = (1 to 20).map(i => (i.toLong, "g", 10.0)).toDF("id", "grp", "w")
    val kept = Splits.weightBudgetCap(df, "grp", "id", $"w", budget = 45.0)
    assert(kept.count() == 4) // 4 * 10 <= 45 < 5 * 10
    // deterministic under repartitioning
    val again = Splits.weightBudgetCap(df.repartition(6), "grp", "id", $"w", budget = 45.0)
    assert(kept.select("id").except(again.select("id")).count() == 0)
    // a single over-budget head row in a group yields an empty group
    val big = Seq((1L, "h", 100.0)).toDF("id", "grp", "w")
    assert(Splits.weightBudgetCap(big, "grp", "id", $"w", budget = 45.0).count() == 0)
  }

  test("imputeGroupMean fills nulls with the group mean, default for all-null groups") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "a", None),
      (4L, "b", None), (5L, "b", None)
    ).toDF("id", "grp", "v")
    val out = graft.operators.Repair.imputeGroupMean(df, "grp", "v", default = -1.0)
      .orderBy("id").collect().map(_.getDouble(2))
    assert(out.toSeq == Seq(10.0, 20.0, 15.0, -1.0, -1.0))
  }

  test("winsorize clips to the exact percentile cutoffs and flags clipped rows") {
    val df = ((1 to 99).map(_.toDouble) ++ Seq(1000.0)).toDF("v")
    val out = graft.operators.Repair.winsorize(df, "v", pLo = 0.0, pHi = 0.9)
    // p90 of 1..99,1000 = interpolated at index 0.9*99 = 89.1 -> 90.1
    val clipped = out.filter($"was_clipped" === 1)
    assert(clipped.count() == 10) // 91..99 and 1000 exceed 90.1
    assert(math.abs(out.agg(max("v")).head().getDouble(0) - 90.1) < 1e-9)
    assert(out.filter($"v".isNull).count() == 0)
    // nulls stay null
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val w2 = graft.operators.Repair.winsorize(withNull, "v", 0.0, 1.0)
    assert(w2.filter($"v".isNull).count() == 1)
  }

  test("zscoreByGroup normalizes within group; singleton groups yield null") {
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), (4L, "s", 5.0))
      .toDF("id", "grp", "v")
    val out = df.select($"id", graft.operators.Repair.zscoreByGroup("grp", "v"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - (-1.0)) < 1e-9) // (10-20)/10
    assert(math.abs(out(1).getDouble(1)) < 1e-9)
    assert(math.abs(out(2).getDouble(1) - 1.0) < 1e-9)
    assert(out(3).isNullAt(1))
  }

  test("packOffsets: contiguous spans per group, pack spans consistent with offsets") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 100L),
      (4L, "h", 600L), (5L, "h", 1L), (6L, "h", 0L) // zero-weight doc dropped
    ).toDF("id", "grp", "w")
    val out = graft.operators.Splits.packOffsets(df, "grp", "id", $"w", contextLen = 512L)
    assert(out.count() == 5)
    // per group: spans are contiguous, start at 0, and total equals sum(w)
    val rows = out.select("grp", "start_off", "end_off").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    rows.foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._2 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2) // end == next start
        case _ =>
      }
    }
    // pack arithmetic: first/last pack match offset div, doc spanning a
    // boundary reports both windows
    val byId = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("start_off"), r.getAs[Long]("end_off"),
        r.getAs[Long]("first_pack"), r.getAs[Long]("last_pack"))).toMap
    byId.values.foreach { case (s0, e0, fp, lp) =>
      assert(fp == s0 / 512 && lp == (e0 - 1) / 512 && fp <= lp)
    }
    assert(byId.values.exists { case (_, _, fp, lp) => lp > fp }) // straddler exists
  }

  test("madOutlierSummary: symmetric data with one spike") {
    val df = (Seq.fill(50)(10.0) ++ Seq.fill(50)(12.0) ++ Seq(1000.0)).toDF("v")
    val r = Profiler.madOutlierSummary(df, "v").head()
    assert(r.getLong(0) == 101L)
    assert(r.getDouble(1) == 12.0)   // sorted index 0.5*(101-1) = 50 -> 12
    assert(r.getDouble(2) == 2.0)    // |x-12| = {0, 2, 988} -> median 2
    assert(r.getLong(3) == 1L)       // only the spike exceeds 4.4478*mad
  }
}
