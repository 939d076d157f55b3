package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingLshDedup

/** Batch-replay contract for the streaming sharded-LSH twin: the union of
  * per-micro-batch candidate outputs equals the one-shot enumeration of
  * the batch-banded buckets, however the stream is split into batches,
  * and replayed documents emit nothing. */
class StreamingLshDedupSpec extends SparkSpec {

  private val N_HASHES = 32
  private val BANDS = 8
  private val N_SHARDS = 4

  // near-dup clusters (small edits) + distinct docs
  private def fixture: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    Seq(
      (1L, base),
      (2L, base + " tonight"),
      (3L, base.replace("lazy", "sleepy")),
      (4L, "completely different text about spark catalyst optimizer internals"),
      (5L, "completely different text about spark catalyst optimizer details"),
      (6L, "third topic entirely numbers one two three four five six seven eight"),
      (7L, base),
      (8L, "third topic entirely numbers one two three four five six seven nine"))
  }

  private def expectedPairs(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int)] = {
    // collect the IDENTICAL banded table the processor consumes, pair
    // within each (shard, band-key) bucket in plain Scala
    val rows = StreamingLshDedup.bandedSignatures(docs, "doc_id", "text",
        shingleN = 3, numHashes = N_HASHES, bands = BANDS, seed = 42L,
        nShards = N_SHARDS)
      .select(col("shard"), col("__bk"), col("id"), col("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getSeq[Long](3)))
    rows.groupBy(t => (t._1, t._2)).iterator.flatMap { case ((shard, _), members) =>
      val ms = members.map(m => (m._3, m._4)).distinct
      for {
        i <- ms.indices
        j <- (i + 1) until ms.length
      } yield {
        val (ia, sa) = ms(i); val (ib, sb) = ms(j)
        val same = sa.zip(sb).count { case (a, b) => a == b }
        (shard, math.min(ia, ib), math.max(ia, ib), same)
      }
    }.toSet
  }

  test("streamed candidate union == batch bucket enumeration; replay emits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = StreamingLshDedup.candidatePairs(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      shingleN = 3, numHashes = N_HASHES, bands = BANDS, seed = 42L,
      nShards = N_SHARDS)
    val q = out.writeStream.format("memory").queryName("lsh_stream")
      .outputMode("update").start()
    try {
      val (b1, b2) = fixture.splitAt(4)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      def got: Set[(Long, Long, Long, Int)] = spark.table("lsh_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val docs = fixture.toDF("doc_id", "text")
      val want = expectedPairs(docs)
      assert(want.nonEmpty, "fixture must produce shared buckets")
      assert(got === want)
      // near-dup clusters must actually surface with high agreement
      assert(got.exists(t => t._2 == 1L && t._3 == 7L && t._4 == N_HASHES),
        "identical docs 1 and 7 must agree on every component")
      // the estimate column is the exact rational same/numHashes
      val est = spark.table("lsh_stream").collect()
        .map(r => (r.getInt(3), r.getInt(4), r.getDouble(5)))
      assert(est.forall { case (same, nh, e) => e == same.toDouble / nh && nh == N_HASHES })
      // REPLAY batch 1: every (bucket, id) is already admitted -> no rows
      val before = spark.table("lsh_stream").count()
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.table("lsh_stream").count() === before,
        "replayed documents must emit no candidates")
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("bucket cap: mid-batch overflow admits min-first, full buckets emit nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // identical text -> identical signatures -> every doc lands in the SAME
    // buckets; ids arrive in scrambled order so order-dependent admission
    // would admit {5, 3} instead of the sorted {1, 3}
    val text = "the quick brown fox jumps over the lazy dog again and again tonight"
    val scrambled = Seq(5L, 3L, 9L, 1L, 7L).map(id => (id, text))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamingLshDedup.candidatePairs(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, numHashes = N_HASHES, bands = BANDS, seed = 42L,
        maxBucketSize = 2, nShards = N_SHARDS)
      .writeStream.format("memory").queryName("lsh_cap").outputMode("update").start()
    try {
      mem.addData(scrambled: _*)
      q.processAllAvailable()
      val pairs = spark.table("lsh_cap").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      // deterministic min-first admission: ONLY the two smallest ids occupy
      // any bucket, so (1, 3) is the only possible pair
      assert(pairs === Set((1L, 3L)),
        s"cap admission must be min-first; got $pairs")
      // a later batch cannot enter the full buckets — nothing is emitted
      val before = spark.table("lsh_cap").count()
      mem.addData((0L, text))
      q.processAllAvailable()
      assert(spark.table("lsh_cap").count() === before,
        "full buckets must admit no further ids")
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("batch-split invariance: one batch vs doc-at-a-time yield the same set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def run(name: String, batches: Seq[Seq[(Long, String)]]): Set[(Long, Long, Long, Int)] = {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = StreamingLshDedup.candidatePairs(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, numHashes = N_HASHES, bands = BANDS, seed = 42L,
          nShards = N_SHARDS)
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      } finally q.stop()
    }
    try {
      val oneShot = run("lsh_one", Seq(fixture))
      val perDoc = run("lsh_per_doc", fixture.map(Seq(_)))
      assert(oneShot === perDoc && oneShot.nonEmpty)
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
