package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.AnnIndex

/** Round-11 slate: catalog-write safety guards, crash-safe atomic catalog
  * persistence, typed ANN tombstones, integer-rank exact quantiles, the
  * blue/green ANN retrain lifecycle, streaming ANN ingestion, streaming
  * state forget/TTL, and the upstream-Spark-bug canary. */
class Round11Spec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_r11_${name}_${System.nanoTime()}"

  // ---------------------------------------------------------------- guards

  test("dedupCatalogWrite refuses a plan that reads the target table") {
    val s = spark
    import s.implicits._
    val cat = Dedup.dedupCatalogOfBatch(
      Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text"), "doc_id", "text", 0L)
    try {
      Dedup.dedupCatalogWrite(cat, "r11_guard_t")
      // writing a state whose lineage scans the target would delete the
      // source before reading it — must throw, not corrupt
      val ex = intercept[IllegalArgumentException] {
        Dedup.dedupCatalogWrite(
          Dedup.dedupCatalogMerge(spark.table("r11_guard_t")), "r11_guard_t")
      }
      assert(ex.getMessage.contains("reads the target table"))
      // compacting INTO an input day table is the named variant
      val ex2 = intercept[IllegalArgumentException] {
        Dedup.dedupCatalogCompact(spark, Seq("r11_guard_t"), "r11_guard_t")
      }
      assert(ex2.getMessage.contains("is one of the day tables"))
      // the atomic variant handles the same lineage safely: the staging
      // write completes the read before the old table drops
      Dedup.dedupCatalogWriteAtomic(
        Dedup.dedupCatalogMerge(spark.table("r11_guard_t")), "r11_guard_t")
      assert(spark.table("r11_guard_t").count() === cat.count())
    } finally Seq("r11_guard_t", "r11_guard_t__staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("atomic catalog persistence: a complete state is recoverable after a crash at any point") {
    val s = spark
    import s.implicits._
    val v1 = Dedup.dedupCatalogOfBatch(
      Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text"), "doc_id", "text", 0L)
      .localCheckpoint()
    val v2 = Dedup.dedupCatalogOfBatch(
      Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text"),
      "doc_id", "text", 1L).localCheckpoint()
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    try {
      // normal path: write v1, resume reads v1
      Dedup.dedupCatalogWriteAtomic(v1, "r11_atomic")
      assert(eq(Dedup.dedupCatalogResume(spark, "r11_atomic").get, v1))
      // crash DURING the v2 staging write: main table untouched — resume
      // prefers it (a partial staging table is never preferred)
      Dedup.dedupCatalogWrite(v2, "r11_atomic__staging")
      assert(eq(Dedup.dedupCatalogResume(spark, "r11_atomic").get, v1))
      // crash BETWEEN drop and rename (the write-in-place hazard window):
      // only the COMPLETE staging table exists — resume recovers v2
      spark.sql("DROP TABLE r11_atomic")
      assert(eq(Dedup.dedupCatalogResume(spark, "r11_atomic").get, v2))
      // the next atomic write proceeds normally from the recovered state
      Dedup.dedupCatalogWriteAtomic(v2, "r11_atomic")
      assert(eq(Dedup.dedupCatalogResume(spark, "r11_atomic").get, v2))
      assert(!spark.catalog.tableExists("r11_atomic__staging"))
    } finally Seq("r11_atomic", "r11_atomic__staging")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  // ------------------------------------------------------- typed tombstones

  test("ANN tombstones keep the index's id type: string-id deletes suppress") {
    val s = spark
    import s.implicits._
    val vecs = Seq("a", "b", "c", "d", "e", "f").zipWithIndex.map { case (id, i) =>
      (id, Array.tabulate(4)(d => (math.sin(i * 4 + d).toFloat + 2f)).toSeq)
    }
    val df = vecs.toDF("sid", "vec")
    val path = tmp("string_ids")
    val model = AnnIndex.buildIndex(df, "sid", "vec", path, dim = 4,
      nLists = 2, m = 2, kCodes = 4)
    val queries = df.filter(col("sid") === "a")
    def neighbors() = AnnIndex.searchIndex(spark, path, model, queries,
      "sid", "vec", topK = 5, nProbe = 2, shortlist = 5)
      .select("neighbor_id").collect().map(_.getString(0)).toSet
    assert(neighbors().contains("b"), "fixture: b must rank before deletion")
    AnnIndex.deleteFromIndex(df.filter(col("sid") === "b"), "sid", path)
    // the tombstone parquet carries StringType (the store's id type), so
    // the anti-join matches exactly — no double coercion, no nulled cast
    val ts = AnnIndex.tombstones(spark, path)
    assert(ts.schema("id").dataType === org.apache.spark.sql.types.StringType)
    assert(!neighbors().contains("b"), "deleted string id surfaced in search")
  }

  // ------------------------------------------------ integer-rank quantiles

  test("exactValuesAtRanks selects the exact sorted data values") {
    val s = spark
    import s.implicits._
    val xs = (1 to 997).map(i => ((i * 7919) % 997).toDouble / 10.0)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    val n = xs.length.toLong
    val ranks = Seq(0L, (n - 1) / 3, 2 * (n - 1) / 3, n - 1)
    val got = graft.operators.Profiler.exactValuesAtRanks(df, "v", ranks)
    assert(got === ranks.map(r => sorted(r.toInt)))
    intercept[IllegalArgumentException] {
      graft.operators.Profiler.exactValuesAtRanks(df, "v", Seq(n))
    }
  }

  // ---------------------------------------------- blue/green ANN lifecycle

  test("retrain lifecycle: verified promotion, atomic cutover, old-version grace") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = tmp("retrain")
    val v1 = AnnIndex.buildVersioned(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", base, dim = 64, nLists = 8)
    assert(v1 === 1 && AnnIndex.currentVersion(spark, base) === Some(1))
    val queries = emb.filter(col("vec_id") < 5)
    // a search plan resolved BEFORE the cutover (pinned to v1)
    val preModel = AnnIndex.loadModel(spark, s"${AnnIndex.versionPath(base, 1)}/_model")
    val preSearch = AnnIndex.searchIndex(spark, AnnIndex.versionPath(base, 1),
      preModel, queries, "vec_id", "embedding", topK = 3, nProbe = 8)
    val preRows = preSearch.collect() // in-flight search completes on v1
    assert(preRows.nonEmpty)
    // drift arrives: retrain on the full corpus; keep v1 for the grace
    // period (gcOldVersion = false) — in-flight searches stay correct
    val res = AnnIndex.retrain(emb, "vec_id", "embedding", base, dim = 64,
      probeQueries = queries, nLists = 8, topK = 3, nProbe = 8,
      recallFloor = 0.80, gcOldVersion = false)
    assert(res.promoted && res.fromVersion === 1 && res.toVersion === 2,
      s"expected promotion, got $res")
    assert(res.recall >= 0.80)
    assert(AnnIndex.currentVersion(spark, base) === Some(2))
    // the v1-pinned plan still collects the same rows AFTER the cutover
    assert(preSearch.collect().map(_.toString).sorted.toSeq
      === preRows.map(_.toString).sorted.toSeq)
    // post-cutover searches see the full corpus: odd ids can now surface
    val post = AnnIndex.searchCurrent(spark, base, queries, "vec_id",
      "embedding", topK = 3, nProbe = 8)
    assert(post.filter(col("neighbor_id") % 2 === 1).count() > 0,
      "retrained index must surface the new (odd-id) corpus half")
    // == one-shot build on the same corpus (deterministic training)
    val oneShot = tmp("retrain_oneshot")
    val osModel = AnnIndex.buildIndex(emb, "vec_id", "embedding", oneShot,
      dim = 64, nLists = 8)
    val osRows = AnnIndex.searchIndex(spark, oneShot, osModel, queries,
      "vec_id", "embedding", topK = 3, nProbe = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(post.collect().map(_.toString).sorted.toSeq === osRows,
      "promoted retrain must equal a one-shot build on the new corpus")
    // a FAILED candidate is deleted and the current version keeps serving:
    // an impossible floor forces rejection
    val res2 = AnnIndex.retrain(emb, "vec_id", "embedding", base, dim = 64,
      probeQueries = queries, nLists = 8, topK = 3, nProbe = 1,
      recallFloor = 1.01)
    assert(!res2.promoted && AnnIndex.currentVersion(spark, base) === Some(2))
    assert(!new java.io.File(AnnIndex.versionPath(base, 3)).exists(),
      "rejected candidate store must be GC'd")
  }

  test("suggestNLists: √N sizing with a min-list-size clamp") {
    assert(AnnIndex.suggestNLists(1000000) === 1000)
    assert(AnnIndex.suggestNLists(50000) === 224)
    // clamp: tiny corpora never get 1-vector lists
    assert(AnnIndex.suggestNLists(100, minListSize = 64) === 1)
    assert(AnnIndex.suggestNLists(0) === 1)
  }

  // ------------------------------------------------- streaming ANN ingest

  test("streaming ANN ingest: searchable while growing == one-shot build+append") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseCorpus = emb.filter(col("vec_id") < 100)
    val rest = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .select("vec_id", "embedding").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val batches = Seq(rest.take(rest.length / 2), rest.drop(rest.length / 2))
    val streamPath = tmp("ann_stream")
    val twinPath = tmp("ann_twin")
    val model = AnnIndex.buildIndex(baseCorpus, "vec_id", "embedding",
      streamPath, dim = 64, nLists = 8)
    // deterministic training on the same corpus -> the twin model is equal
    val twinModel = AnnIndex.buildIndex(baseCorpus, "vec_id", "embedding",
      twinPath, dim = 64, nLists = 8)
    val queries = emb.filter(col("vec_id") < 5)
    def rows(path: String, m: graft.similarity.PqIndexModel) =
      AnnIndex.searchIndex(spark, path, m, queries, "vec_id", "embedding",
        topK = 5, nProbe = 8).collect().map(_.toString).sorted.toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamingAnnIngest.writer(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      streamPath, model).start()
    try {
      batches.foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
        // one-shot twin over the same ingested prefix
        AnnIndex.appendToIndex(b.toSeq.toDF("vec_id", "embedding"),
          "vec_id", "embedding", twinPath, twinModel)
        // between batches the index serves the already-ingested corpus and
        // equals the one-shot store row for row
        assert(rows(streamPath, model) === rows(twinPath, twinModel),
          "stream-appended index diverged from the one-shot twin")
      }
    } finally q.stop()
    // the grown index actually surfaces appended vectors
    val appended = AnnIndex.searchIndex(spark, streamPath, model,
      queries, "vec_id", "embedding", topK = 20, nProbe = 8)
      .filter(col("neighbor_id") >= 100).count()
    assert(appended > 0, "appended vectors must be searchable")
  }

  // ------------------------------------------- streaming state retention

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

  test("streaming catalog forget: state shrinks and forgotten content re-admits mid-stream") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingDedupCatalog
      val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val forgets = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = StreamingDedupCatalog.catalogFlagsWithForget(
          docs.toDF().toDF("doc_id", "text"),
          forgets.toDF().toDF("doc_id", "text"), "doc_id", "text", nShards = 4)
        .writeStream.format("memory").queryName("r11_cat_forget")
        .outputMode("update").start()
      def collected() = spark.table("r11_cat_forget").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      try {
        // batch 1: ingest x (id 1) and y (id 2)
        docs.addData((1L, "x x x"), (2L, "y y y")); q.processAllAvailable()
        assert(collected().count(_._3 == 0) === 2)
        // batch 2: takedown of x — ack carries the removed entry's firstId
        forgets.addData((99L, "x x x")); q.processAllAvailable()
        val acks = collected().filter(_._3 == -1)
        assert(acks.length === 1 && acks.head._1 === 99L && acks.head._4 === 1L,
          s"forget must ack the removed entry (state shrank): ${acks.toSeq}")
        // batch 3: x re-admits as novel (firstId = the NEW id); y stays dup
        docs.addData((3L, "x x x"), (4L, "y y y")); q.processAllAvailable()
        val b3 = collected().filter(t => t._1 == 3L || t._1 == 4L)
        assert(b3.find(_._1 == 3L).get._3 === 0, "forgotten content must re-admit")
        assert(b3.find(_._1 == 3L).get._4 === 3L)
        assert(b3.find(_._1 == 4L).get._3 === 1, "unforgotten content stays suppressed")
        // batch 4: same-batch (forget y, ingest y) — forgets resolve FIRST,
        // deterministic whatever the row interleaving
        forgets.addData((98L, "y y y")); docs.addData((5L, "y y y"))
        q.processAllAvailable()
        val y5 = collected().find(_._1 == 5L).get
        assert(y5._3 === 0 && y5._4 === 5L,
          s"same-batch forget-then-ingest must re-admit: $y5")
        // forgetting a never-seen fingerprint acks -1 (nothing removed)
        forgets.addData((97L, "never seen before")); q.processAllAvailable()
        assert(collected().find(_._1 == 97L).get._4 === -1L)
      } finally q.stop()
    }
  }

  test("streaming LSH forget: bucket entries removed, re-submission pairs afresh") {
    withRocksDb {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingLshDedup
      val base = "the quick brown fox jumps over the lazy dog and runs far away home"
      val near = base + " tonight"
      val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val forgets = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = StreamingLshDedup.candidatePairsWithForget(
          docs.toDF().toDF("doc_id", "text"),
          forgets.toDF().toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, nShards = 4)
        .writeStream.format("memory").queryName("r11_lsh_forget")
        .outputMode("update").start()
      def rows() = spark.table("r11_lsh_forget").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(5)))
      try {
        docs.addData((1L, base), (2L, near)); q.processAllAvailable()
        val pairs1 = rows().filter(_._5 >= 0)
        assert(pairs1.exists(p => p._2 == 1L && p._3 == 2L),
          "fixture must pair (1,2) on ingest")
        // takedown doc 2: its band keys are recomputed and every bucket
        // entry removed; acks carry per-shard removal counts
        forgets.addData((2L, near)); q.processAllAvailable()
        val acks = rows().filter(_._5 < 0)
        assert(acks.nonEmpty && acks.forall(_._3 == -1L))
        assert(acks.map(_._4).sum > 0, "state must shrink (bucket entries removed)")
        val nPairsAfterForget = rows().count(_._5 >= 0)
        // re-submission is admitted and pairs AFRESH — state was removed
        // (a replay WITHOUT forget emits nothing: StreamingLshDedupSpec)
        docs.addData((2L, near)); q.processAllAvailable()
        val pairs3 = rows().filter(_._5 >= 0)
        assert(pairs3.length > nPairsAfterForget &&
          pairs3.count(p => p._2 == 1L && p._3 == 2L) >= 2,
          "re-submitted content must pair again after forget")
      } finally q.stop()
    }
  }

  // -------------------------------------------------- upstream-bug canary

  test("CANARY: Spark union-of-bucketed-scans mis-aggregation (remove the " +
      "dedupCatalogMerge repartition when this FAILS)") {
    // Minimal repro of the Spark 4.1.2 bug documented in
    // Dedup.dedupCatalogMerge: an aggregation over a UNION of identically
    // BUCKETED scans plans NO exchange (each child scan reports
    // HashPartitioning(key, n) and the requirement check lets the union
    // through, but UnionExec CONCATENATES partitions — the same key lives
    // in one partition PER INPUT), silently emitting one row per
    // (key, table). The explicit `repartition(col("fingerprint"))` in
    // dedupCatalogMerge works around it AT THE COST of replacing a
    // should-be-free bucketed read with a real shuffle. This canary PINS
    // the buggy behavior: the day a Spark upgrade fixes the planner, the
    // assertion fails, and the workaround exchange must be REMOVED (not
    // fossilized as a permanent extra shuffle).
    val s = spark
    import s.implicits._
    try {
      val a = (1 to 100).map(i => (s"k$i", 1L)).toDF("k", "v")
      graft.sources.Bucketing.writeBucketed(a, "r11_canary_a", Seq("k"), 4)
      graft.sources.Bucketing.writeBucketed(a, "r11_canary_b", Seq("k"), 4)
      val u = spark.table("r11_canary_a").unionByName(spark.table("r11_canary_b"))
      val groups = u.groupBy("k").count().count()
      assert(groups === 200L,
        s"UPSTREAM FIX DETECTED (got $groups groups, the CORRECT answer is " +
          "100): Spark now plans the exchange for aggregations over " +
          "unions of co-bucketed scans. Remove the repartition workaround " +
          "in Dedup.dedupCatalogMerge (Dedup.scala, see its scaladoc) and " +
          "delete this canary.")
      // HAZARD CONFIG (numBuckets == shuffle partitions, both 4 here): a
      // bare repartition(col) is judged redundant and ELIDED — the naive
      // workaround silently reinstates the bug. This is why
      // dedupCatalogMerge probes the claimed partitioning for its count.
      val naive = u.repartition(col("k")).groupBy("k").count().count()
      assert(naive === 200L,
        s"bare repartition(col) no longer elided (got $naive): revisit " +
          "dedupCatalogMerge's partition-count probe")
      // the shipped merge survives the hazard config: un-elidable count
      val viaMerge = Dedup.dedupCatalogMerge(
        spark.table("r11_canary_a")
          .select(col("k").as("fingerprint"), lit(0L).as("first_batch"),
            col("v").as("first_id"), lit(1L).as("n_seen")),
        spark.table("r11_canary_b")
          .select(col("k").as("fingerprint"), lit(1L).as("first_batch"),
            col("v").as("first_id"), lit(1L).as("n_seen")))
      assert(viaMerge.count() === 100L,
        "dedupCatalogMerge must aggregate correctly when bucket count == " +
          "shuffle partitions")
      assert(viaMerge.agg(sum("n_seen")).head().getLong(0) === 200L)
    } finally Seq("r11_canary_a", "r11_canary_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
