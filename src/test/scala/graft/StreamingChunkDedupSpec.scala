package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingChunkDedup
import graft.streaming.StreamingChunkDedup.Bloom

class StreamingChunkDedupSpec extends SparkSpec {

  test("Bloom: no false negatives ever; FP rate small at sizing; state round-trip") {
    val rnd = new scala.util.Random(3)
    val bl = new Bloom(1 << 16)
    val inserted = Array.fill(2000)(rnd.nextLong())
    inserted.foreach(bl.add)
    assert(inserted.forall(bl.mightContain)) // no-FN is unconditional
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(inserted.contains)
    val fp = probes.count(bl.mightContain).toDouble / probes.length
    info(f"bloom fp rate = $fp%.4f at n=2000/m=65536")
    assert(fp < 0.02, f"fp rate $fp%.4f too high")
    val rt = Bloom.fromState(1 << 16, bl.toState)
    assert(rt.n == bl.n && inserted.forall(rt.mightContain))
  }

  test("replayed docs score zero novelty across batches; fresh docs score high") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(17)
      def doc(n: Int): String =
        (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val a = doc(800); val b = doc(700); val c = doc(900)
      val mem = MemoryStream[(Long, String)]
      val out = StreamingChunkDedup.noveltyPartials(
        mem.toDF().toDF("doc_id", "text"), nShards = 4)
      val q = out.writeStream.format("memory").queryName("novelty")
        .outputMode("update").start()
      try {
        mem.addData((1L, a), (2L, b)); q.processAllAvailable()
        mem.addData((3L, a), (4L, c)); q.processAllAvailable() // 3 replays 1's text
        val rows = spark.table("novelty")
          .groupBy("docId").agg(sum("nSeen").as("seen"), sum("nNew").as("nw"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        // batch-1 fresh docs: every chunk new (fresh random text, no-FN
        // means only genuine repeats or rare FPs count seen)
        assert(rows(1L)._2 > 0 && rows(2L)._2 > 0)
        // replayed content: the Bloom has no false negatives, so ZERO new
        assert(rows(3L)._2 == 0L, s"replayed doc reported new chunks: ${rows(3L)}")
        assert(rows(3L)._1 > 0L)
        // fresh doc in batch 2 still scores high novelty
        val (cSeen, cNew) = rows(4L)
        assert(cNew.toDouble / (cSeen + cNew) > 0.9, s"fresh doc novelty too low: $cNew/$cSeen")
      } finally q.stop()
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }
}
