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
}
