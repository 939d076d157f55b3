package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.streaming.StreamingDedupCatalog

/** Batch-replay contract for the streaming dedup catalog: per-batch
  * stream flags equal the batch-operator fold `flag(C_{k-1}, b_k)` with
  * `C_k = merge(C_{k-1}, ofBatch(b_k, k))` (in-batch repeats flagged
  * against the deterministic min-id admission), and a replayed batch is
  * all-dup with no state growth. */
class StreamingDedupCatalogSpec extends SparkSpec {

  private def fixture: Seq[(Long, String)] = Seq(
    (10L, "alpha beta"), (11L, "ALPHA   beta"),   // in-batch dup pair
    (12L, "gamma delta"),
    (20L, "alpha beta"),                           // cross-batch dup
    (21L, "epsilon"), (22L, "epsilon"), (23L, "zeta"))

  // scalar replay of the batch-operator fold at the same batching
  private def expected(batches: Seq[Seq[(Long, String)]]): Set[(Long, String, Int, Long)] = {
    def fp(t: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(t.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val catalog = scala.collection.mutable.Map.empty[String, Long] // fp -> firstId
    val out = scala.collection.mutable.Set.empty[(Long, String, Int, Long)]
    batches.foreach { b =>
      val byFp = b.map { case (id, t) => (id, fp(t)) }.groupBy(_._2)
      byFp.foreach { case (f, rows) =>
        val first = catalog.getOrElse(f, rows.map(_._1).min)
        val preexisting = catalog.contains(f)
        rows.foreach { case (id, _) =>
          out += ((id, f, if (preexisting || id != first) 1 else 0, first))
        }
        if (!preexisting) catalog(f) = first
      }
    }
    out.toSet
  }

  private def runStream(name: String, batches: Seq[Seq[(Long, String)]]):
      (Set[(Long, String, Int, Long)], Long) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamingDedupCatalog.catalogFlags(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", nShards = 4)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      (rows.toSet, rows.length.toLong)
    } finally q.stop()
  }

  test("stream flags equal the batch-operator fold; replay is all-dup, zero growth") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (b1, b2) = fixture.splitAt(3)
      val (got, n) = runStream("cat_stream", Seq(b1, b2))
      assert(n === fixture.size.toLong) // one flag row per document
      assert(got === expected(Seq(b1, b2)))
      // cross-check the cross-batch flags against the BATCH operators on
      // the same fold: flag(b2) vs catalogOfBatch(b1)
      val s = spark
      import s.implicits._
      val c1 = Dedup.dedupCatalogOfBatch(b1.toDF("doc_id", "text"), "doc_id", "text", 0L)
      val flags2 = Dedup.dedupCatalogFlag(c1, b2.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      // docs dup-vs-HISTORY must agree (in-batch repeats are the stream's
      // stronger contract, excluded here: flag() only checks the catalog)
      got.filter(t => flags2.getOrElse(t._1, 0) == 1).foreach { t =>
        assert(t._3 == 1, s"doc ${t._1} cataloged in b1 but streamed as novel")
      }
      // replay batch 1: all dup, not one new state entry
      val (gotR, nR) = runStream("cat_stream_replay", Seq(b1, b2, b1))
      assert(nR === (fixture.size + b1.size).toLong)
      val replayRows = gotR -- got
      assert(replayRows.forall(_._3 == 1), s"replay emitted novel: $replayRows")
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
