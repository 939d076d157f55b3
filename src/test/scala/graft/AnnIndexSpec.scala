package graft

import org.apache.spark.sql.functions._
import graft.similarity.{AnnIndex, Pq, Similarity}

/** The composed production ANN path (disk IVF code store + ADC shortlist +
  * exact re-rank): disk == in-memory twin, partition/column pruning reaches
  * the scans, frozen-model appends are one-shot-identical, and the recall
  * floor of the shipped configuration holds. */
class AnnIndexSpec extends SparkSpec {

  // correctness-gate data (sf0.01, like RecallFloorSpec): recall floors are
  // meaningless on the 50-vector sf0.001 fixture
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)
  // rows the index admits (valid 64-dim vectors) — the brute-force twin must
  // rank over the same universe
  private lazy val valid = emb.filter(col("embedding").isNotNull && size(col("embedding")) === 64)

  private def rmTree(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val f = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.walk(f).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
  }

  private def matchSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("disk search == in-memory ivfPqRerankTopK; scans are partition- and column-pruned") {
    val path = "/tmp/graft_ann_index_spec"
    rmTree(path)
    val model = AnnIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = 64, nLists = 16, m = 8, kCodes = 16)
    val disk = AnnIndex.searchIndex(spark, path, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    val mem = Pq.ivfPqRerankTopK(emb, queries, "vec_id", "embedding",
      dim = 64, nLists = 16, nProbe = 12, topK = 5, shortlist = 100)
    assert(disk.exceptAll(mem).isEmpty && mem.exceptAll(disk).isEmpty,
      "disk-index search must be row-identical to the in-memory twin")
    val plan = disk.queryExecution.executedPlan.toString
    // probed lists reach the scan as directory pruning
    assert(plan.contains("PartitionFilters: [list_id"),
      s"expected list_id partition pruning in:\n$plan")
    // the corpus-wide ADC pass must never read the raw vector column: one
    // scan reads (id, codes), only the bounded re-rank scan reads (id, v)
    val scanSchemas = "ReadSchema: [^\\n]+".r.findAllIn(plan).toSeq
      .filter(_.contains("struct"))
    assert(scanSchemas.exists(s => s.contains("codes") && !s.contains("\"v\"")),
      s"ADC scan must prune the vector column; scans:\n${scanSchemas.mkString("\n")}")
  }

  test("shipped config (nProbe=12/16, shortlist=100) recall@5 >= 0.90 vs brute force") {
    val path = "/tmp/graft_ann_index_recall"
    rmTree(path)
    val model = AnnIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = 64, nLists = 16, m = 8, kCodes = 16)
    val exact = matchSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    def recallAt(nProbe: Int, shortlist: Int): Double = {
      val got = matchSet(AnnIndex.searchIndex(spark, path, model, queries,
        "vec_id", "embedding", topK = 5, nProbe = nProbe, shortlist = shortlist))
      got.intersect(exact).size.toDouble / exact.size
    }
    assert(exact.size == 50)
    val r8 = recallAt(8, 100)
    val r12 = recallAt(12, 100)
    val r16 = recallAt(16, 100)
    info(f"disk IVFADC-R recall@5: nProbe=8 $r8%.4f, nProbe=12 $r12%.4f, nProbe=16 $r16%.4f (shortlist=100)")
    assert(r12 >= r8 - 1e-9, "more probed lists must not lose recall")
    assert(r12 >= 0.90, f"shipped disk-ANN recall@5 $r12%.4f below floor 0.90")
  }

  test("frozen-model append: incrementally grown index == one-shot index") {
    val incPath = "/tmp/graft_ann_index_inc"
    val oncePath = "/tmp/graft_ann_index_once"
    rmTree(incPath); rmTree(oncePath)
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val model = AnnIndex.buildIndex(half1, "vec_id", "embedding", incPath,
      dim = 64, nLists = 16, m = 8, kCodes = 16)
    AnnIndex.appendToIndex(half2, "vec_id", "embedding", incPath, model)
    AnnIndex.appendToIndex(emb, "vec_id", "embedding", oncePath, model)
    val a = AnnIndex.searchIndex(spark, incPath, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    val b = AnnIndex.searchIndex(spark, oncePath, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("model save/load round-trip: loaded model searches and appends identically") {
    val idxPath = "/tmp/graft_ann_model_idx"
    val modelPath = "/tmp/graft_ann_model_store"
    rmTree(idxPath); rmTree(modelPath)
    val model = AnnIndex.buildIndex(emb, "vec_id", "embedding", idxPath,
      dim = 64, nLists = 16, m = 8, kCodes = 16)
    AnnIndex.saveModel(spark, model, modelPath)
    val loaded = AnnIndex.loadModel(spark, modelPath)
    assert(loaded.dim == model.dim && loaded.m == model.m)
    assert(loaded.coarse.zip(model.coarse).forall { case (a, b) => a.sameElements(b) })
    assert(loaded.books.zip(model.books).forall { case (ba, bb) =>
      ba.zip(bb).forall { case (a, b) => a.sameElements(b) } })
    // a future session's search with the loaded model is row-identical
    val a = AnnIndex.searchIndex(spark, idxPath, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    val b = AnnIndex.searchIndex(spark, idxPath, loaded, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("tombstone deletes never surface; rebuild absorbs them physically") {
    val path = "/tmp/graft_ann_tomb"
    val cleanPath = "/tmp/graft_ann_tomb_clean"
    val rebuilt = "/tmp/graft_ann_tomb_rebuilt"
    Seq(path, cleanPath, rebuilt).foreach(rmTree)
    val model = AnnIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = 64, nLists = 16, m = 8, kCodes = 16)
    AnnIndex.deleteFromIndex(emb.filter(col("vec_id") % 7 === 0), "vec_id", path)
    val got = AnnIndex.searchIndex(spark, path, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    assert(got.filter(col("neighbor_id") % 7 === 0).count() === 0,
      "a deleted id surfaced in search results")
    // tombstoned search == search over an index of corpus-minus-deleted
    // built under the SAME frozen model
    AnnIndex.appendToIndex(emb.filter(col("vec_id") % 7 =!= 0),
      "vec_id", "embedding", cleanPath, model)
    val want = AnnIndex.searchIndex(spark, cleanPath, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // rebuild: physical removal — same results, no tombstone log carried
    AnnIndex.rebuildIndex(spark, path, rebuilt)
    val after = AnnIndex.searchIndex(spark, rebuilt, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 12, shortlist = 100)
    assert(after.exceptAll(got).isEmpty && got.exceptAll(after).isEmpty)
    assert(AnnIndex.tombstones(spark, rebuilt).count() === 0)
  }

  test("probing every list with a corpus-sized shortlist degenerates to brute force") {
    val path = "/tmp/graft_ann_index_full"
    rmTree(path)
    val n = valid.count().toInt
    val model = AnnIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = 64, nLists = 8, m = 8, kCodes = 16)
    val full = AnnIndex.searchIndex(spark, path, model, queries,
      "vec_id", "embedding", topK = 5, nProbe = 8, shortlist = n)
    val bf = Similarity.bruteForceTopK(valid, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine")) // searchIndex rounds to 6 dp
    assert(full.exceptAll(bf).isEmpty && bf.exceptAll(full).isEmpty,
      "nProbe = nLists + shortlist = corpus must equal exact brute force")
  }
}
