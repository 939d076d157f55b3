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
