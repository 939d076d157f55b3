package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Round-10 slate: the persisted dedup-catalog lifecycle (bucketed day
  * states, on-disk tree compaction, zero-exchange probe). */
class Round10Spec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("disk catalog lifecycle: compacted-table probe == in-memory fold") {
    val d0 = Dedup.dedupCatalogOfBatch(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 0L)
    val d1 = Dedup.dedupCatalogOfBatch(docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", 1L)
    val batch = docs.filter(col("doc_id") % 3 === 2)
    try {
      Dedup.dedupCatalogWrite(d0, "r10_cat_d0")
      Dedup.dedupCatalogWrite(d1, "r10_cat_d1")
      Dedup.dedupCatalogCompact(spark, Seq("r10_cat_d0", "r10_cat_d1"), "r10_cat_all")
      // compacted state == in-memory merge, row for row
      val mem = Dedup.dedupCatalogMerge(d0, d1)
      val disk = spark.table("r10_cat_all")
      assert(disk.exceptAll(mem).isEmpty && mem.exceptAll(disk).isEmpty,
        "compacted table must equal the in-memory monoid merge")
      // probe against the table == probe against the in-memory state
      val fMem = Dedup.dedupCatalogFlag(mem, batch, "doc_id", "text")
      val fDisk = Dedup.dedupCatalogFlag(disk, batch, "doc_id", "text")
      assert(fDisk.exceptAll(fMem).isEmpty && fMem.exceptAll(fDisk).isEmpty)
    } finally Seq("r10_cat_d0", "r10_cat_d1", "r10_cat_all")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("catalog probe join reads the bucketed state with ZERO catalog-side exchange") {
    val d0 = Dedup.dedupCatalogOfBatch(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 0L)
    val batch = docs.filter(col("doc_id") % 3 === 2)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Dedup.dedupCatalogWrite(d0, "r10_cat_plan")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val probe = Dedup.dedupCatalogFlag(spark.table("r10_cat_plan"),
        batch, "doc_id", "text")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"catalog scan must be bucketed-read in:\n$plan")
      // exactly ONE hash exchange: the (small) daily batch aligning to the
      // catalog's bucket layout; the catalog side reads pre-shuffled
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(nExchanges == 1,
        s"expected exactly 1 exchange (batch side), got $nExchanges in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS r10_cat_plan")
    }
  }

  test("media near-dup: planted byte edits pair within format blocks, headers stripped") {
    import graft.multimodal.{MediaFixtures, Multimodal}
    val s = spark
    import s.implicits._
    val text = ("the quick brown fox jumps over the lazy dog " * 10).trim
    val body = text.getBytes("UTF-8")
    val edited = body.clone(); edited(100) = 'X'.toByte // one-byte body edit
    val other = ("completely different content about catalyst optimizer internals " * 8)
      .trim.getBytes("UTF-8")
    val rows = Seq(
      (1L, MediaFixtures.pngBytes(100, 80, body)),    // base png
      (2L, MediaFixtures.pngBytes(100, 80, edited)),  // near-dup: 1 byte edit
      (3L, MediaFixtures.jpegBytes(100, 80, body)),   // SAME body, other format
      (4L, MediaFixtures.pngBytes(100, 80, other)),   // unrelated png
      (5L, MediaFixtures.pngBytes(100, 80, body)),    // exact re-upload
      (6L, MediaFixtures.pngBytes(999, 777, body)))   // re-encode: new dims, same body
      .toDF("media_id", "payload")
    val pairs = Multimodal.mediaNearDupPairs(rows, "media_id", "payload",
        gramBytes = 8, strideBytes = 8, maxHamming = 7, probeBits = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val pairSet = pairs.map(p => (p._2, p._3)).toSet
    info(s"planted media pairs: ${pairs.sortBy(p => (p._2, p._3)).mkString(", ")}")
    // exact re-uploads and re-encodes (same body, new header fields) are
    // hamming-0: headers are stripped before hashing
    assert(pairs.filter(p => Set((1L, 5L), (1L, 6L), (5L, 6L))(p._2 -> p._3))
      .forall(p => p._4 == 0 && p._1 == "png"))
    // the one-byte edit is a near-dup of every copy of the base body
    assert(Set((1L, 2L), (2L, 5L), (2L, 6L)).subsetOf(pairSet),
      s"byte-edited twin must pair with the base copies; got $pairSet")
    // cross-format pairs are blocked even with identical bodies; unrelated
    // content never pairs
    assert(!pairs.exists(p => p._2 == 3L || p._3 == 3L), "format blocking violated")
    assert(!pairs.exists(p => p._2 == 4L || p._3 == 4L), "unrelated content paired")
  }

  test("streaming curation: foreachBatch chain == batch fold; ascending arrival == one-shot curate") {
    import graft.streaming.StreamingCuration
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val all = train.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    // three ascending-id micro-batches (ascending arrival => first
    // occurrence of every fingerprint carries the global min id)
    val batches = Seq(all.filter(_._1 < 17), all.filter(t => t._1 >= 17 && t._1 < 34),
      all.filter(_._1 >= 34))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val state = new StreamingCuration.CurationState(spark)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = StreamingCuration.writer(
      mem.toDF().toDF("doc_id", "text"), evalDocs, "doc_id", "text", state) {
      (curated, _) =>
        got ++= curated.select("doc_id", "split").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        ()
    }.start()
    try {
      batches.foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    // twin 1: the batch curateIncremental fold over the same splits
    var cat = Pipeline.emptyCatalog(spark)
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      val (curated, updated) = Pipeline.curateIncremental(
        cat, b.toSeq.toDF("doc_id", "text"), evalDocs, "doc_id", "text", i.toLong)
      want ++= curated.select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      cat = updated
    }
    assert(got.toSet === want.toSet, "stream output must equal the batch fold")
    assert(got.nonEmpty)
    // twin 2: under ascending arrival the union equals the ONE-SHOT curate
    val oneShot = Pipeline.curate(train, evalDocs, "doc_id", "text")
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet === oneShot,
      "ascending-arrival streaming curation must equal one-shot curate")
    // the carried catalog equals the fold's end state
    assert(state.catalogState.exceptAll(cat).isEmpty && cat.exceptAll(state.catalogState).isEmpty)
  }

  test("streaming curation restart recovery: resumed-from-table run == uninterrupted run") {
    import graft.streaming.StreamingCuration
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val all = train.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val batches = Seq(all.filter(_._1 < 17), all.filter(t => t._1 >= 17 && t._1 < 34),
      all.filter(_._1 >= 34))
    def run(bs: Seq[Array[(Long, String)]], state: StreamingCuration.CurationState,
        table: Option[String]): Seq[Set[(Long, String)]] = {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val outs = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String)]]
      val q = StreamingCuration.writer(mem.toDF().toDF("doc_id", "text"),
        evalDocs, "doc_id", "text", state, catalogTable = table) { (curated, _) =>
        outs += curated.select("doc_id", "split").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        ()
      }.start()
      try bs.foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      finally q.stop()
      outs.toSeq
    }
    try {
      // uninterrupted run over all three batches
      val full = run(batches, new StreamingCuration.CurationState(spark), None)
      // crashed run: batches 1-2 persist the catalog per batch...
      val crashed = run(batches.take(2),
        new StreamingCuration.CurationState(spark), Some("r10_cur_cat"))
      // ...then a NEW session resumes from the persisted table for batch 3
      val resumed = run(batches.drop(2),
        new StreamingCuration.CurationState(spark, Some(spark.table("r10_cur_cat"))),
        None)
      assert(crashed === full.take(2))
      assert(resumed.head === full(2),
        "resumed-from-disk batch 3 must equal the uninterrupted run's batch 3")
      assert(full(2).nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS r10_cur_cat")
  }

  test("decontaminateSpans: cuts exactly the overlapping window, keeps the rest") {
    val s = spark
    import s.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta eta theta" // one 8-gram
    val train = Seq(
      // eval gram embedded mid-doc: the 8 covered tokens go, prefix+suffix stay
      (1L, "one two three " + evalText + " four five six"),
      // clean doc: unchanged
      (2L, "totally unrelated content with enough tokens to matter here today"),
      // doc shorter than n: no grams, unchanged
      (3L, "tiny doc")).toDF("doc_id", "text")
    val eval_ = Seq((100L, evalText)).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.decontaminateSpans(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def md5of(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._1 === 14L && out(1L)._2 === 8L)
    assert(out(1L)._3 === md5of("one two three four five six"),
      "only the covered window may be cut")
    assert(out(2L)._2 === 0L &&
      out(2L)._3 === md5of("totally unrelated content with enough tokens to matter here today"))
    assert(out(3L)._2 === 0L && out(3L)._3 === md5of("tiny doc"))
  }

  test("incrementalComponents: fold over edge batches == one-shot CC, any split") {
    import graft.dedup.Dedup
    val s = spark
    import s.implicits._
    // chain + clique + isolated pairs; batches deliberately interleave so
    // merges happen across batches (components must merge incrementally)
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 3L), (7L, 8L),
      (6L, 7L), (4L, 5L), (10L, 11L), (11L, 12L), (20L, 21L))
    val oneShot = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(1, 3, 10)) {
      var assign = Dedup.emptyAssignment(spark)
      edges.grouped(math.max(1, edges.length / k)).foreach { b =>
        assign = Dedup.incrementalComponents(assign, b.toDF("a", "b"), "a", "b")
      }
      val folded = assign.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(folded === oneShot, s"fold at $k batches diverged from one-shot CC")
    }
  }

  test("streaming LSH clusters: carried assignment == batch CC over the one-shot pair set") {
    import graft.streaming.{StreamingLshClusters, StreamingLshDedup}
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val fixture = Seq(
      (1L, base), (2L, base + " tonight"), (3L, base.replace("lazy", "sleepy")),
      (4L, "completely different text about spark catalyst optimizer internals"),
      (5L, "completely different text about spark catalyst optimizer details"),
      (6L, "third topic entirely numbers one two three four five six seven eight"),
      (7L, base), (8L, "third topic entirely numbers one two three four five six seven nine"))
    val nHashes = 32; val bands = 8; val nShards = 4; val thr = 0.5
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val cands = StreamingLshDedup.candidatePairs(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      shingleN = 3, numHashes = nHashes, bands = bands, seed = 42L, nShards = nShards)
    val state = new StreamingLshClusters.ClusterState(spark)
    val q = StreamingLshClusters.writer(cands, state, minEstJaccard = thr) {
      (_, _) => ()
    }.start()
    try {
      fixture.grouped(3).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
    // batch twin: one-shot bucket enumeration at the same threshold -> CC
    val docs = fixture.toDF("doc_id", "text")
    val banded = StreamingLshDedup.bandedSignatures(docs, "doc_id", "text",
        shingleN = 3, numHashes = nHashes, bands = bands, seed = 42L, nShards = nShards)
      .select(col("shard"), col("__bk"), col("id"), col("sig")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getSeq[Long](3)))
    val batchPairs = banded.groupBy(t => (t._1, t._2)).iterator.flatMap { case (_, ms) =>
      val mm = ms.map(m => (m._3, m._4)).distinct
      for { i <- mm.indices; j <- (i + 1) until mm.length } yield {
        val (ia, sa) = mm(i); val (ib, sb) = mm(j)
        val same = sa.zip(sb).count { case (x, y) => x == y }
        (math.min(ia, ib), math.max(ia, ib), same.toDouble / nHashes)
      }
    }.filter(_._3 >= thr).map(t => (t._1, t._2)).toSeq.distinct
    val want = graft.dedup.Dedup.connectedComponents(
        batchPairs.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = state.assignment.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture must produce clusters")
    assert(got === want, s"stream clusters $got != batch CC $want")
  }

  test("lshParamPlan: S-curve monotone in s and in bands; known constants") {
    val plan = Dedup.lshParamPlan(spark, numHashes = 128)
      .collect().map(r => ((r.getInt(0), r.getInt(2)), r.getDouble(3))).toMap
    // p(s) monotone non-decreasing in s at fixed (bands, rows)
    for (b <- Seq(1, 8, 32, 128); i <- 2 to 19)
      assert(plan((b, i * 5)) >= plan((b, (i - 1) * 5)) - 1e-12)
    // more bands (shorter rows) -> higher candidate probability at fixed s
    for (s <- Seq(25, 50, 80))
      assert(plan((32, s)) >= plan((16, s)) && plan((16, s)) >= plan((8, s)))
    // b=1, r=128: p = s^128 — essentially 0 until s ~ 1
    assert(plan((1, 50)) < 1e-12 && plan((1, 95)) < 0.01)
    // b=128, r=1: p = 1 - (1-s)^128 — essentially 1 well below 0.5
    assert(plan((128, 50)) > 0.999999)
    // the shipped text-dedup config (32 bands of 4) catches s=0.8 pairs
    assert(plan((32, 80)) > 0.99,
      s"32x4 banding must be near-lossless at s=0.8, got ${plan((32, 80))}")
  }

  test("shardManifest: conserves bytes/docs, respects the byte budget, key ranges ordered") {
    val target = 5000L
    val src = docs.filter(col("text").isNotNull)
    val m = graft.operators.Splits.shardManifest(src, "doc_id",
        octet_length(encode(col("text"), "UTF-8")), seed = "epoch7", targetBytes = target)
      .orderBy("file_idx").collect()
    val totalBytes = src.agg(sum(octet_length(encode(col("text"), "UTF-8")).cast("long")))
      .head().getLong(0)
    assert(m.map(_.getLong(2)).sum === totalBytes, "manifest must conserve bytes")
    assert(m.map(_.getLong(1)).sum === src.count(), "manifest must conserve docs")
    // a file exceeds the target only by its LAST doc (cut rule: a doc goes
    // to the file its starting offset falls in)
    val maxDoc = src.agg(max(octet_length(encode(col("text"), "UTF-8")).cast("long")))
      .head().getLong(0)
    assert(m.forall(_.getLong(2) <= target + maxDoc))
    // file key ranges are disjoint and ordered — the seekable layout
    val ranges = m.map(r => (r.getString(3), r.getString(4)))
    assert(ranges.forall { case (lo, hi) => lo <= hi })
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("ccnet buckets: partition the corpus, head scores highest") {
    val q = SparkEntry.queries("q_ccnet_buckets")(spark, sfDir).collect()
    val byBucket = q.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    val scored = graft.text.TextAnalysis.knBigramScore(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text").count()
    assert(q.map(_.getLong(1)).sum === scored, "buckets must partition the scored corpus")
    assert(byBucket("head")._2 > byBucket("middle")._2 &&
      byBucket("middle")._2 > byBucket("tail")._2,
      s"bucket means must order head > middle > tail: $byBucket")
  }

  test("softdedup weights: every cluster contributes exactly one doc's worth of weight") {
    val out = SparkEntry.queries("q_softdedup_weights")(spark, sfDir)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === spark.read.parquet(s"$sfDir/documents.parquet").count())
    // Σ weights == #clusters (size × 1/size = 1 per cluster, up to rounding)
    val nClusters = rows.map(_._2).distinct.length
    assert(math.abs(rows.map(_._4).sum - nClusters) < 1e-3)
    // weight is exactly the reciprocal of the carried cluster size
    assert(rows.forall { case (_, _, sz, w) =>
      math.abs(w - BigDecimal(1.0 / sz).setScale(6,
        scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12 })
  }

  test("near-dup leakage audit validates cluster-safe splits: zero cross-split pairs") {
    // the audit (q_split_neardup_leakage's algebra) applied to the split
    // that clusterSafeSplit produces must find NOTHING — the preventer and
    // the auditor agree end-to-end
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.9, blockCols = Seq("lang"))
    val safe = graft.operators.Splits.clusterSafeSplit(docs, "doc_id", "text",
        n = 1, threshold = 0.9, blockCols = Seq("lang"))
      .select(col("doc_id"), col("split"))
    val crossing = pairs
      .join(safe.select(col("doc_id").as("ida"), col("split").as("sa")), Seq("ida"))
      .join(safe.select(col("doc_id").as("idb"), col("split").as("sb")), Seq("idb"))
      .filter(col("sa") =!= col("sb"))
    assert(crossing.count() === 0,
      "clusterSafeSplit must leave no near-dup pair crossing a split")
    // while the plain md5 split DOES leak on this fixture (the audit has
    // something to find — q_split_neardup_leakage is non-vacuous)
    val plain = docs.select(col("doc_id"),
      graft.operators.Splits.splitCol(col("doc_id")).as("split"))
    val plainCrossing = pairs
      .join(plain.select(col("doc_id").as("ida"), col("split").as("sa")), Seq("ida"))
      .join(plain.select(col("doc_id").as("idb"), col("split").as("sb")), Seq("idb"))
      .filter(col("sa") =!= col("sb")).count()
    assert(plainCrossing > 0, "fixture must exhibit near-dup leakage under the plain split")
  }

  test("catalog forget: forgotten content re-admits as novel, the rest stays suppressed") {
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val cat = Dedup.dedupCatalogOfBatch(batch, "doc_id", "text", 0L)
    // forget half the fingerprints (by first_id parity)
    val forget = cat.filter(col("first_id") % 2 === 0)
    val kept = Dedup.dedupCatalogForget(cat, forget, "fingerprint")
    assert(kept.count() === cat.count() - forget.count())
    // replay the SAME batch against the forgotten state: content whose
    // fingerprint was forgotten flags as novel again (takedown semantics),
    // everything else stays suppressed
    val flags = Dedup.dedupCatalogFlag(kept, batch, "doc_id", "text")
    val forgottenFps = forget.select("fingerprint").collect().map(_.getString(0)).toSet
    val byFp = flags.collect().map(r => (r.getString(1), r.getInt(2)))
    val (offFps, onFps) = byFp.partition(t => forgottenFps(t._1))
    assert(offFps.nonEmpty && onFps.nonEmpty)
    // forgotten fingerprints: at most the batch's min id per fp is novel —
    // every row of a forgotten fp EXCEPT in-batch dups flags 0; cataloged
    // fps all flag 1
    assert(onFps.forall(_._2 == 1), "non-forgotten content must stay suppressed")
    assert(offFps.exists(_._2 == 0), "forgotten content must re-admit")
  }

  test("bounded-size invariant holds through the disk lifecycle at the sf1 replica") {
    // |compacted state| == #distinct fingerprints of the unioned inputs —
    // growth tracks novel content only, never batch count. Measured at the
    // 10x documents replica so the invariant is exercised at ladder scale.
    val sf1 = "/root/repo/benchdata/sf1/documents.parquet"
    assume(new java.io.File(sf1).isDirectory, "sf1 replica not generated")
    val big = spark.read.parquet(sf1)
    val halves = Seq(
      big.filter(col("doc_id") % 2 === 0),
      big.filter(col("doc_id") % 2 === 1))
    try {
      halves.zipWithIndex.foreach { case (h, i) =>
        Dedup.dedupCatalogWrite(
          Dedup.dedupCatalogOfBatch(h, "doc_id", "text", i.toLong), s"r10_cat_sf1_$i")
      }
      Dedup.dedupCatalogCompact(spark,
        Seq("r10_cat_sf1_0", "r10_cat_sf1_1"), "r10_cat_sf1_all")
      val stateSize = spark.table("r10_cat_sf1_all").count()
      val distinctFp = big.select(graft.text.TextAnalysis.fingerprint(col("text")))
        .distinct().count()
      assert(stateSize === distinctFp,
        s"catalog state $stateSize != distinct content $distinctFp")
      // n_seen conserves rows: every document is counted exactly once
      val nSeen = spark.table("r10_cat_sf1_all").agg(sum("n_seen")).head().getLong(0)
      assert(nSeen === big.count())
    } finally Seq("r10_cat_sf1_0", "r10_cat_sf1_1", "r10_cat_sf1_all")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
