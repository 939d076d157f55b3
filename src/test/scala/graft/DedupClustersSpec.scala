package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupClustersSpec extends SparkSpec {

  test("connectedComponents: empty edge list returns an empty labeling") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.dedup.Dedup.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("connectedComponents: exact components on a hand-built graph") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("hot-bucket caps bound candidate blowup (recall tradeoff is explicit)") {
    import spark.implicits._
    // 30 identical docs -> one hot simhash bucket in every band
    val docs = (1 to 30).map(i => (i.toLong, "the same boilerplate text repeated verbatim"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
    assert(uncapped.count() === 30L * 29 / 2) // full clique
    val capped = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3,
      maxBucketSize = 10)
    assert(capped.count() === 0) // every bucket exceeds the cap and is dropped
  }

  test("connectedComponents equals driver-side union-find on real near-dup pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1,
      threshold = 0.9, blockCols = Seq("lang")).cache()
    val edges = pairs.select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // brute-force union-find oracle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.connectedComponents(pairs, "ida", "idb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    pairs.unpersist()
  }
}
