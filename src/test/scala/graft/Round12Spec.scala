package graft

import org.apache.spark.sql.functions._
import graft.similarity.AnnIndex
import graft.streaming.StreamingAnnIngest

/** Round-12 slate: exactly-once streaming ANN ingest (redelivery +
  * crash-recovery paths), the retrain ↔ ingest catch-up seam, the
  * versioned per-batch writer, and RocksDB TTL eviction on the streaming
  * dedup catalog. */
class Round12Spec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_r12_${name}_${System.nanoTime()}"

  private def withRocksDb[T](body: => T): T = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  // ---------------------------------------------- exactly-once ANN ingest

  test("ANN ingest is exactly-once: redelivery, crash-before-marker, and " +
      "partial publish all converge to the one-shot twin") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseCorpus = emb.filter(col("vec_id") < 100)
    val path = tmp("ann_once")
    val twin = tmp("ann_once_twin")
    val model = AnnIndex.buildIndex(baseCorpus, "vec_id", "embedding", path,
      dim = 64, nLists = 8)
    val twinModel = AnnIndex.buildIndex(baseCorpus, "vec_id", "embedding",
      twin, dim = 64, nLists = 8)
    def slice(lo: Long, hi: Long) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select("vec_id", "embedding")
    val (b0, b1, b2) = (slice(100, 150), slice(150, 200), slice(200, 250))
    assert(StreamingAnnIngest.committedBatch(spark, path) === -1L)

    // batch 0 commits; redelivery of the SAME batchId is a no-op
    assert(StreamingAnnIngest.appendBatchIdempotent(b0, "vec_id", "embedding",
      path, model, 0L))
    val n0 = spark.read.parquet(path).count()
    assert(n0 === 150L)
    assert(!StreamingAnnIngest.appendBatchIdempotent(b0, "vec_id", "embedding",
      path, model, 0L), "redelivered committed batch must be skipped")
    assert(spark.read.parquet(path).count() === n0)
    assert(StreamingAnnIngest.committedBatch(spark, path) === 0L)

    // crash AFTER the publish renames but BEFORE the marker: batch 1 lands
    // fully, then the marker is rolled back to simulate the torn commit;
    // the redelivered batch must tear down its b1-* files, not double them
    assert(StreamingAnnIngest.appendBatchIdempotent(b1, "vec_id", "embedding",
      path, model, 1L))
    val n1 = spark.read.parquet(path).count()
    assert(n1 === 200L)
    // roll the marker back THROUGH the Hadoop FS (keeps the checksum
    // sidecar consistent — a real torn commit leaves the old, valid marker)
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rollMarkerBack(to: Long): Unit = {
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(s"$path/_ingest/COMMITTED"), true)
      try out.write(s"$to\n".getBytes("UTF-8")) finally out.close()
    }
    rollMarkerBack(0L)
    assert(StreamingAnnIngest.appendBatchIdempotent(b1, "vec_id", "embedding",
      path, model, 1L), "uncommitted batch must re-run")
    assert(spark.read.parquet(path).count() === n1,
      "crash-before-marker replay must not duplicate rows")

    // crash MID-publish: batch 2 lands, then the marker is rolled back AND
    // some published b2-* files are deleted (a half-renamed publish); the
    // replay must rebuild the batch exactly
    assert(StreamingAnnIngest.appendBatchIdempotent(b2, "vec_id", "embedding",
      path, model, 2L))
    val n2 = spark.read.parquet(path).count()
    assert(n2 === 250L)
    rollMarkerBack(1L)
    val published = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("list_id="))
      .flatMap(_.listFiles().filter(_.getName.startsWith("b2-")))
    assert(published.nonEmpty)
    published.take(math.max(1, published.length / 2)).foreach { f =>
      assert(hfs.delete(new org.apache.hadoop.fs.Path(f.getAbsolutePath), false))
    }
    assert(StreamingAnnIngest.appendBatchIdempotent(b2, "vec_id", "embedding",
      path, model, 2L))
    assert(spark.read.parquet(path).count() === n2,
      "partial-publish replay must converge to exactly-once")

    // the recovered store equals the one-shot twin row for row
    Seq(b0, b1, b2).foreach(b =>
      AnnIndex.appendToIndex(b, "vec_id", "embedding", twin, twinModel))
    val queries = emb.filter(col("vec_id") < 5)
    def rows(p: String, m: graft.similarity.PqIndexModel) =
      AnnIndex.searchIndex(spark, p, m, queries, "vec_id", "embedding",
        topK = 10, nProbe = 8).collect().map(_.toString).sorted.toSeq
    assert(rows(path, model) === rows(twin, twinModel),
      "recovered store must equal the one-shot twin")
  }

  // ------------------------------------------ retrain ↔ ingest catch-up

  test("ingest during retrain: vectors appended after the corpus snapshot " +
      "survive into the promoted version") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") < 300)
    val base = tmp("retrain_seam")
    assert(AnnIndex.buildVersioned(corpus, "vec_id", "embedding", base,
      dim = 64, nLists = 8) === 1)
    // streaming ingest into the CURRENT version, resolved per batch
    val late = emb.filter(col("vec_id") >= 300 && col("vec_id") < 320)
      .select("vec_id", "embedding").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnnIngest.writerVersioned(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", base).start()
    try {
      mem.addData(late.toSeq: _*); q.processAllAvailable()
      // the batch landed in v1 and is committed at the BASE-level marker
      assert(StreamingAnnIngest.committedBatch(spark, base) === 0L)
      // retrain from the STALE snapshot (taken before the batch): without
      // catch-up the 20 late vectors would vanish from the promoted store
      val res = AnnIndex.retrain(corpus, "vec_id", "embedding", base,
        dim = 64, probeQueries = emb.filter(col("vec_id") < 5), nLists = 8,
        topK = 3, nProbe = 8, recallFloor = 0.50)
      assert(res.promoted && res.toVersion === 2, s"expected promotion: $res")
      val promotedIds = spark.read.parquet(AnnIndex.versionPath(base, 2))
        .select("id").as[Long].collect().toSet
      assert((300L until 320L).forall(promotedIds.contains),
        "catch-up must re-encode ingested vectors into the candidate")
      assert(promotedIds.size === 320, "promoted store = snapshot ∪ delta, exactly")
      // an exact-duplicate query finds its ingested twin at rank 1 through
      // the promoted index (cosine 1.0, full probe)
      val probe = emb.filter(col("vec_id") === 310)
        .select(lit(999999L).as("vec_id"), col("embedding"))
      val top = AnnIndex.searchCurrent(spark, base, probe, "vec_id",
        "embedding", topK = 1, nProbe = 8).collect()
      assert(top.length === 1 && top.head.getLong(2) === 310L,
        s"ingested vector must be searchable post-promotion: ${top.toSeq}")
      // post-cutover batches follow the pointer into v2 — no restart
      val late2 = emb.filter(col("vec_id") >= 320 && col("vec_id") < 330)
        .select("vec_id", "embedding").orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      mem.addData(late2.toSeq: _*); q.processAllAvailable()
      val v2Ids = spark.read.parquet(AnnIndex.versionPath(base, 2))
        .select("id").as[Long].collect().toSet
      assert((320L until 330L).forall(v2Ids.contains),
        "post-cutover batch must land in the promoted version")
    } finally q.stop()
  }

  // ------------------------------------------- versioned store compaction

  test("compactVersioned: small files bounded, tombstones physically removed, " +
      "search identical across the cutover") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = tmp("compact")
    assert(AnnIndex.buildVersioned(emb.filter(col("vec_id") < 200),
      "vec_id", "embedding", base, dim = 64, nLists = 8) === 1)
    val v1 = AnnIndex.versionPath(base, 1)
    // three exactly-once ingest batches -> b0-/b1-/b2- files accumulate
    (0 until 3).foreach { b =>
      val lo = 200 + b * 30
      StreamingAnnIngest.appendBatchIdempotent(
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 30)
          .select("vec_id", "embedding"),
        "vec_id", "embedding", v1,
        AnnIndex.loadModel(spark, s"$v1/_model"), b, markerDir = Some(base))
    }
    AnnIndex.deleteFromIndex(emb.filter(col("vec_id") % 7 === 0), "vec_id", v1)
    val queries = emb.filter(col("vec_id") < 5)
    def rows() = AnnIndex.searchCurrent(spark, base, queries, "vec_id",
      "embedding", topK = 5, nProbe = 8).collect().map(_.toString).sorted.toSeq
    val before = rows() // v1, tombstone-filtered
    val dataFiles = (p: String) => new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("list_id="))
      .map(d => d.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(dataFiles(v1).max > 1, "ingest batches must have accumulated files")
    assert(AnnIndex.compactVersioned(spark, base) === 2)
    val v2 = AnnIndex.versionPath(base, 2)
    // identical results across the cutover — the filter became physical
    assert(rows() === before, "compaction must not change search results")
    // ~one file per list again; no tombstone log; old version GC'd
    assert(dataFiles(v2).max === 1, "compacted store must be one file per list")
    assert(!new java.io.File(s"$v2/_tombstones").exists())
    assert(!new java.io.File(v1).exists(), "old version must be GC'd")
    val ids = spark.read.parquet(v2).select("id").as[Long].collect().toSet
    assert(ids.forall(_ % 7 != 0), "tombstoned ids must be physically gone")
    assert(ids.contains(201L) && ids.contains(261L),
      "live ingested rows must survive compaction")
    // ingest continues into the compacted version; the base-level marker
    // still recognizes the already-committed batches
    assert(!StreamingAnnIngest.appendBatchIdempotent(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 230)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", v2,
      AnnIndex.loadModel(spark, s"$v2/_model"), 2L, markerDir = Some(base)),
      "a batch committed before compaction must not re-ingest after it")
  }

  // ----------------------------------------------- RocksDB TTL eviction

  test("catalog TTL: entries age out and content re-admits without a takedown") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingDedupCatalog
      // TimeMode.ProcessingTime makes the engine schedule micro-batches
      // CONTINUOUSLY to advance TTL state (shouldRunAnotherBatch is
      // unconditionally true — processAllAvailable never quiesces and
      // even Trigger.AvailableNow never terminates). Each phase therefore
      // starts the query over a SHARED checkpoint, polls the memory sink
      // for the ingested row's flag, and stops the query explicitly —
      // which also exercises TTL state RECOVERY across restarts: the
      // entry written in run 1 must still suppress in run 2 and expire
      // by run 3.
      val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val ckpt = tmp("ttl_ckpt")
      val ttl = java.time.Duration.ofSeconds(10)
      // the memory sink refuses checkpoint RECOVERY, so the restartable
      // sink is a foreachBatch collector (the fault-tolerant sink shape)
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[StreamingDedupCatalog.CatalogFlag]()
      def start() = StreamingDedupCatalog.catalogFlags(
          docs.toDF().toDF("doc_id", "text"), "doc_id", "text", nShards = 4,
          ttl = Some(ttl))
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingDedupCatalog.CatalogFlag], _: Long) =>
            b.collect().foreach(sink.add)
        }
        .outputMode("update").option("checkpointLocation", ckpt)
        .start()
      def awaitDoc(docId: Long): (Long, String, Int, Long) = {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        var row: Option[(Long, String, Int, Long)] = None
        while (row.isEmpty && System.nanoTime() < deadline) {
          row = sink.toArray(Array.empty[StreamingDedupCatalog.CatalogFlag])
            .map(f => (f.docId, f.fingerprint, f.isDup, f.firstId))
            .find(_._1 == docId)
          if (row.isEmpty) Thread.sleep(200)
        }
        row.getOrElse(fail(s"doc $docId never surfaced in the sink"))
      }
      // one run, seconds apart — well inside the 10 s TTL: x admits, then
      // suppresses (the TTL must not evict live entries)
      val q1 = start()
      val lastUpdate = try {
        docs.addData((1L, "x x x"))
        assert(awaitDoc(1L)._3 === 0)
        docs.addData((2L, "x x x"))
        val b2 = awaitDoc(2L)
        assert(b2._3 === 1 && b2._4 === 1L, s"inside the TTL x stays a dup: $b2")
        System.nanoTime()
      } finally q1.stop()
      // past the TTL (counted from the LAST update) the entry is gone: x
      // re-admits as novel with a fresh firstId — the retention-policy
      // twin of the takedown path (Round11Spec). The restart ALSO proves
      // recovery never resurrects expired state from the checkpoint.
      val elapsedMs = (System.nanoTime() - lastUpdate) / 1000000
      Thread.sleep(math.max(0L, ttl.toMillis + 1500 - elapsedMs))
      val q2 = start()
      try {
        docs.addData((3L, "x x x"))
        val b3 = awaitDoc(3L)
        assert(b3._3 === 0 && b3._4 === 3L,
          s"expired entry must re-admit content as novel: $b3")
      } finally q2.stop()
    }
  }
}
