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

  test("paragraphDedup is idempotent on its own output") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val once = Dedup.paragraphDedup(docs, "doc_id", "text", blockWords = 5)
      .filter(col("n_kept") > 0).select("doc_id", "text")
    val twice = Dedup.paragraphDedup(once, "doc_id", "text", blockWords = 5)
    // every surviving block is globally unique, so a second pass keeps all
    assert(twice.filter(col("n_kept") =!= col("n_blocks")).count() === 0L)
  }
}
