package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class ChunkSpec extends SparkSpec {

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(TextAnalysis.tokenChunks(col("t"), size, overlap).as("c"))
      .head().getSeq[String](0)
  }

  test("tokenChunks: exact windows, overlap, and short-doc behavior") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4, overlap 1 -> stride 3: [w1..w4], [w4..w7], [w7..w10]
    assert(chunksOf(doc, 4, 1) === Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // size 4, overlap 0, 10 tokens -> last chunk short
    assert(chunksOf(doc, 4, 0) === Seq(
      "w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    // doc shorter than chunk -> single chunk
    assert(chunksOf("a b", 4, 1) === Seq("a b"))
    // empty text -> no chunks
    assert(chunksOf("   ", 4, 1) === Seq.empty)
  }

  test("tokenChunks: every token covered; consecutive chunks share `overlap` tokens") {
    val doc = (1 to 137).map(i => s"t$i").mkString(" ")
    val cs = chunksOf(doc, 16, 4)
    val toks = cs.map(_.split(" ").toSeq)
    assert(toks.head.head === "t1" && toks.last.last === "t137")
    toks.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(4) === b.take(4))
      case _ =>
    }
    // stride coverage: union of all chunk tokens == original token set
    assert(toks.flatten.toSet === (1 to 137).map(i => s"t$i").toSet)
  }
}
