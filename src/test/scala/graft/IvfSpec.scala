package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Ivf, Similarity}

class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  test("ivfTopK at nProbe = nLists equals brute force exactly") {
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val ivf = Ivf.ivfTopK(emb, queries, "vec_id", "embedding", 5, nLists = 8, nProbe = 8)
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty)
  }

  test("ivfTopK recall@5 vs brute force is high at nProbe=4/16") {
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Ivf.ivfTopK(emb, queries, "vec_id", "embedding", 5, nLists = 16, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"))
    val hits = ivf.intersect(exact).count().toDouble
    val total = exact.count().toDouble
    val recall = hits / total
    assert(total > 0)
    assert(recall >= 0.5, s"recall@5 = $recall too low for nProbe=4/16")
  }

  test("disk index: search equals in-memory ivfTopK and the scan is partition-pruned") {
    val path = "/tmp/graft_ivf_index"
    val centroids = Ivf.buildIndex(emb, "vec_id", "embedding", path, nLists = 16)
    val fromDisk = Ivf.searchIndex(spark, path, centroids, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
    val inMem = Ivf.ivfTopK(emb, queries, "vec_id", "embedding", 5, nLists = 16, nProbe = 4)
    assert(fromDisk.exceptAll(inMem).isEmpty && inMem.exceptAll(fromDisk).isEmpty)
    // the probed-list filter must reach the scan as a partition filter
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"expected list_id partition pruning in:\n$plan")
  }

  test("every corpus vector is assigned to exactly one list (partition of corpus)") {
    // at nProbe = nLists every query touches all lists, so candidate set per
    // query = corpus minus itself; k = corpus-1 returns every vector once
    val n = emb.count().toInt
    val one = emb.filter(col("vec_id") === 0)
    val all = Ivf.ivfTopK(emb, one, "vec_id", "embedding", k = n, nLists = 4, nProbe = 4)
    assert(all.count() === n - 1)
    assert(all.select("neighbor_id").distinct().count() === n - 1)
  }
}
