package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Round-5: span-level dedup with document reassembly. */
class Round5Spec extends SparkSpec {

  test("paragraphDedup keeps first occurrence and reassembles documents") {
    val s = spark
    import s.implicits._
    // blockWords=2 → doc1: [a b][c d], doc2: [a b][x y], doc3: [x y][a b][z]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "x y a b z")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text", blockWords = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "a b" first seen at (1,0); "x y" first seen at (2,1); "z" only in 3
    assert(got === Array(
      (1L, "a b c d", 2L, 2L),
      (2L, "x y", 2L, 1L),
      (3L, "z", 3L, 1L)))
  }

  test("paragraphDedup: fully-duplicated document survives as empty text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "p q r s"),
      (2L, "p q r s")
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text", blockWords = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got === Array((1L, "p q r s", 2L), (2L, "", 0L)))
  }

  test("paragraphDedup: short final block, whitespace-only and null docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"),        // blocks: [a b][c]
      (2L, "   "),          // no tokens -> absent from output
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text", blockWords = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1L, "a b c", 2L)))
  }

  test("winnowMd5 matches an independent in-memory winnowing over md5 grams") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "the  QUICK   brown fox"), // normalizes to a prefix of doc 1
      (3L, "abcdefgh"),               // g=2 < w -> single window
      (4L, "abcdef"),                 // g=0 (6 < k=7) -> no fingerprints
      (5L, "abcdefg")                 // g=1 exactly one gram
    )
    val got = graft.text.TextAnalysis
      .winnowMd5(texts.toDF("doc_id", "text"), "doc_id", "text", k = 7, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def md5prefix60(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15), 16)
    def winnow(text: String, k: Int, w: Int): Set[Long] = {
      val nt = text.trim.toLowerCase.replaceAll("\\s+", " ")
      if (nt.length < k) return Set.empty
      val hs = (0 to nt.length - k).map(i => md5prefix60(nt.substring(i, i + k)))
      val nw = math.max(hs.length - w + 1, 1)
      (0 until nw).map(p => hs.slice(p, p + w).min).toSet
    }
    for (id <- Seq(1L, 2L, 3L, 5L))
      assert(got(id) === winnow(texts.find(_._1 == id).get._2, 7, 4), s"doc $id")
    assert(!got.contains(4L))
    assert(got(3L).size === 1 && got(5L).size === 1)
  }

  test("simhash64_md5 matches an independent per-bit majority over md5 token hashes") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma", "beta")),
      (2L, Seq("x")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val got = df.select(col("id"), graft.functions.simhash64_md5(col("toks")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def tokHash(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xffL))
    }
    def ref(toks: Seq[String]): Long = {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = tokHash(t)
        for (j <- 0 until 64) if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
      (0 until 64).foldLeft(0L)((o, j) => if (counts(j) > 0) o | (1L << j) else o)
    }
    assert(got(1L) === ref(Seq("alpha", "beta", "gamma", "beta")))
    assert(got(2L) === tokHash("x")) // single token: signature == its hash
    assert(got(3L) === 0L)
  }

  test("paragraphDedup is idempotent on its own output") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val once = Dedup.paragraphDedup(docs, "doc_id", "text", blockWords = 5)
      .filter(col("n_kept") > 0).select("doc_id", "text")
    val twice = Dedup.paragraphDedup(once, "doc_id", "text", blockWords = 5)
    // every surviving block is globally unique, so a second pass keeps all
    assert(twice.filter(col("n_kept") =!= col("n_blocks")).count() === 0L)
  }
}
