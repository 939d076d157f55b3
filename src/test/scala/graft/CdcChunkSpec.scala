package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class CdcChunkSpec extends SparkSpec {

  private val rnd = new scala.util.Random(31)
  private def randText(n: Int): String =
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  /** naive reference: closed-form polynomial window hash per position. */
  private def naiveCuts(s: String, w: Int, d: Int): Seq[Int] = {
    val M = 1000000007L; val B = 257L
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - w).flatMap { i =>
      var h = 0L
      (0 until w).foreach { j => h = (h * B + (bytes(i + j) & 0xff)) % M }
      if (h % d == 0L) Some(i + w) else None
    }
  }

  test("kernel cut positions equal the closed-form polynomial hash on random strings") {
    import spark.implicits._
    val texts = (1 to 30).map(i => (i.toLong, randText(50 + rnd.nextInt(500))))
    val got = texts.toDF("id", "t")
      .select(col("id"), graft.functions.cdc_boundaries(col("t"), 16, 64).as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == naiveCuts(t, 16, 64), s"doc $id")
    }
    // short strings (< window) yield no cuts, not a crash
    val short = Seq((1L, "tiny")).toDF("id", "t")
      .select(graft.functions.cdc_boundaries(col("t"), 16, 64)).head().getSeq[Int](0)
    assert(short.isEmpty)
  }

  test("chunks partition [1, len] exactly: contiguous, ordered, full coverage") {
    import spark.implicits._
    val texts = (1 to 20).map(i => (i.toLong, randText(10 + rnd.nextInt(800))))
    val chunks = TextAnalysis.cdcChunks(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq)
      .toMap
    texts.foreach { case (id, t) =>
      val spans = chunks(id)
      assert(spans.head._1 == 1L, s"doc $id starts at 1")
      spans.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 == s2, s"doc $id contiguous")
        case _ =>
      }
      assert(spans.map(_._2).sum == t.length.toLong, s"doc $id covers all bytes")
      assert(spans.forall(_._2 > 0))
    }
  }

  test("non-ASCII text: spans stay a valid char partition, chunk_text reassembles") {
    import spark.implicits._
    // multi-byte chars make the BYTE length exceed the CHAR length, so raw
    // byte cuts can land at or past length(text); cdcChunks must drop those
    // and still emit contiguous positive-length spans covering [1, charLen]
    val pool = "abcdefgh éüß中文日本語".toCharArray
    val texts = (1 to 25).map { i =>
      (i.toLong, (1 to 200 + rnd.nextInt(600)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    }
    val rows = TextAnalysis.cdcChunks(texts.toDF("doc_id", "text"), "doc_id", "text",
        emitText = true)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toSeq)
      .toMap
    texts.foreach { case (id, t) =>
      val spans = rows(id)
      assert(spans.head._1 == 1L, s"doc $id starts at 1")
      assert(spans.forall(_._2 > 0), s"doc $id positive lengths")
      spans.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 == s2, s"doc $id contiguous")
        case _ =>
      }
      assert(spans.map(_._2).sum == t.length.toLong, s"doc $id covers all chars")
      assert(spans.map(_._3).mkString == t, s"doc $id chunk_text reassembles")
    }
  }

  test("content-defined resync: cuts after a prefix edit shift by exactly the edit length") {
    import spark.implicits._
    val s0 = randText(600)
    val prefix = randText(20)
    val s1 = prefix + s0
    val both = Seq((0L, s0), (1L, s1)).toDF("id", "t")
      .select(col("id"), graft.functions.cdc_boundaries(col("t"), 16, 64).as("cuts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    // every window fully inside the old content cuts at the same CONTENT
    // position: old cut c (>= w) reappears at c + 20. Fixed-size chunking
    // has no such property — every boundary after the edit moves.
    val preserved = both(0L).filter(_ >= 16).map(_ + 20)
    assert(preserved.nonEmpty)
    assert(preserved.subsetOf(both(1L)),
      s"missing resynced cuts: ${preserved -- both(1L)}")
  }

  test("winsorizeByGroup equals naive per-group discrete clipping on random data") {
    import spark.implicits._
    val data = (0 until 400).map { i =>
      val g = if (rnd.nextInt(20) == 0) null else s"g${rnd.nextInt(4)}"
      val v = if (rnd.nextInt(10) == 0) None else Some(rnd.nextGaussian() * 50)
      (i.toLong, g, v)
    }
    val df = data.toDF("id", "g", "v")
    val got = graft.operators.Repair.winsorizeByGroup(df, "g", "v", 0.1, 0.9)
      .select("id", "v", "was_clipped").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Int]))).toMap
    val cuts = data.filter(d => d._2 != null && d._3.isDefined)
      .groupBy(_._2).view.mapValues { rows =>
        val sorted = rows.flatMap(_._3).sorted
        val n = sorted.length
        (sorted(math.floor(0.1 * (n - 1)).toInt), sorted(math.floor(0.9 * (n - 1)).toInt))
      }.toMap
    data.foreach { case (id, g, v) =>
      val (gotV, gotClip) = got(id)
      (v, Option(g).flatMap(cuts.get)) match {
        case (Some(x), Some((lo, hi))) =>
          assert(gotV.contains(math.min(math.max(x, lo), hi)), s"row $id value")
          assert(gotClip.contains(if (x < lo || x > hi) 1 else 0), s"row $id clip")
        case (Some(x), None) => // null group: pass through unclipped
          assert(gotV.contains(x) && gotClip.isEmpty, s"row $id null-group")
        case (None, _) =>
          assert(gotV.isEmpty && gotClip.isEmpty, s"row $id null value")
      }
    }
  }

  test("curateNovel drops near-replays of the reference corpus, keeps fresh docs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 80)
    val evalDocs = docs.filter(col("doc_id") >= 70)
      .select(col("doc_id").as("eval_id"), col("text"))
    // reference corpus = half the incoming docs with a tiny prefix edit:
    // exact dedup misses them, chunk novelty catches them
    val reference = docs.filter(col("doc_id") < 40 && col("doc_id") % 2 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(lit("edited prefix "), col("text")).as("text"))
    // a k-chunk replay scores exactly 1/k after a prefix edit (only the
    // first chunk changes), so 0.6 catches even the 2-chunk shortest docs
    val kept = Pipeline.curateNovel(docs, evalDocs, reference, "doc_id", "text",
      minNovelty = 0.6).select("doc_id").as[Long].collect().toSet
    val baseline = Pipeline.curateDetailed(docs, evalDocs, "doc_id", "text")
    try {
      val base = baseline.curated.select("doc_id").as[Long].collect().toSet
      assert(kept.subsetOf(base))
      // every replayed even doc < 40 that survives curation must be gone...
      val replayed = base.filter(id => id < 40 && id % 2 == 0)
      assert(replayed.nonEmpty && replayed.forall(!kept.contains(_)),
        s"replays not filtered: ${replayed.filter(kept.contains)}")
      // ...while docs the reference never saw mostly survive (the corpus
      // plants near-dups, so a few odd docs legitimately resemble evens)
      val fresh = base.filter(id => id % 2 == 1)
      val freshKept = fresh.count(kept.contains)
      assert(fresh.nonEmpty && freshKept.toDouble / fresh.size >= 0.8,
        s"too many fresh docs lost: $freshKept/${fresh.size}")
    } finally baseline.unpersist()
  }

  test("curateChunked: chunk texts reassemble the curated corpus, split carried") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 120)
    val evalDocs = docs.filter(col("doc_id") >= 100)
      .select(col("doc_id").as("eval_id"), col("text"))
    val curated = Pipeline.curateDetailed(docs, evalDocs, "doc_id", "text")
    try {
      val chunked = Pipeline.curateChunked(docs, evalDocs, "doc_id", "text")
      val reassembled = chunked
        .groupBy("doc_id", "split")
        .agg(concat_ws("", array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("joined"),
          count(lit(1)).as("n_chunks"))
      val want = curated.curated.select(col("doc_id"), col("split"), col("text"))
      val cmp = reassembled.join(want, Seq("doc_id", "split"))
      assert(cmp.count() == want.count() && cmp.count() > 0)
      assert(cmp.filter(col("joined") =!= col("text")).isEmpty)
    } finally curated.unpersist()
  }
}
