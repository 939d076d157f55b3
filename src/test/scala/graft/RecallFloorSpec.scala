package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.{Ivf, Similarity}

/** Quantified recall floors for the four approximate ("rows-only by
  * contract") queries, each measured at the EXACT configuration its
  * `SparkEntry.queries` entry ships with, against its exact twin on the
  * same correctness-gate data (sf0.01). The driver-generated tables are
  * deterministic (seed 42) and every approximate operator here is
  * hash-seeded — no RNG — so each measured recall is a constant, not a
  * flaky sample. Floors sit just below the measured constants so a
  * regression in banding/probing logic trips the spec while harmless
  * refactors don't.
  *
  * Measured (sf0.01, 2026-08-13):
  *   - q_ann_topk_lsh recall@5 = 0.96 (floor 0.90) — 16 planes / 4 bands
  *     with 4 hamming-1 probes per band (0.56 at probes=0; the ladder
  *     test records both ends of the dial)
  *   - q_ann_topk_ivf recall@5 = 0.80 at the shipped nProbe=7/16 (floor
  *     0.75, integer-exact trainer); ladder 0.56 @ 4, 0.74 @ 6, 0.84 @ 8
  *     — the scan/recall dial
  *   - q_dedup_embedding_lsh recall = 10/14 ≈ 0.714 (floor 0.65)
  *   - q_dedup_simhash (shipped: probeBits=true) = EXACT hamming<=6 pair
  *     enumeration — loss-free by pigeonhole + hamming-1 probes, asserted
  *     as set equality; without probes the banding recalls 270/360 = 0.75
  *     (floor 0.70) with the hamming<=3 subset loss-free
  */
class RecallFloorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val annQueries = emb.filter(col("vec_id") < 10)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def matchSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q_ann_topk_lsh (multi-probe, shipped config) recall@5 >= 0.90 (measured 0.96)") {
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    val lsh = matchSet(Similarity.lshTopK(emb, annQueries, "vec_id", "embedding", 5,
      dim = 64, probes = 4))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"q_ann_topk_lsh recall@5 = $recall%.4f (${lsh.intersect(exact).size}/${exact.size})")
    assert(exact.size == 50)
    assert(recall >= 0.90, f"LSH ANN recall@5 $recall%.4f below floor 0.90")
  }

  test("multi-probe LSH: recall climbs with probes; floor 0.90 at probes=4 (measured 0.96)") {
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    def recallAt(p: Int): Double = {
      val got = matchSet(Similarity.lshTopK(emb, annQueries, "vec_id", "embedding", 5,
        dim = 64, probes = p))
      got.intersect(exact).size.toDouble / exact.size
    }
    val r0 = recallAt(0); val r4 = recallAt(4)
    info(f"multi-probe recall@5: probes=0 $r0%.4f, probes=4 $r4%.4f")
    assert(r4 >= r0, "probing must not lose candidates")
    assert(r4 >= 0.90, f"multi-probe recall $r4%.4f below floor 0.90")
  }

  test("q_ann_topk_ivf (shipped nProbe=7, integer-exact trainer) recall@5 >= 0.75; ladder monotone") {
    // measures the variant the query actually ships (ivfTopKExact — the
    // oracle-graduated quantized trainer), not the float path
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    def recallAt(p: Int): Double = {
      val ivf = matchSet(Ivf.ivfTopKExact(emb, annQueries, "vec_id", "embedding",
        k = 5, nLists = 16, nProbe = p, iters = 8))
      ivf.intersect(exact).size.toDouble / exact.size
    }
    assert(exact.size == 50)
    val r4 = recallAt(4); val r7 = recallAt(7)
    info(f"q_ann_topk_ivf recall@5: nProbe=4 $r4%.4f, nProbe=7 $r7%.4f (ladder 0.56/0.74/0.80/0.84 at 4/6/7/8)")
    assert(r7 >= r4, "more probed lists must not lose recall")
    assert(r4 >= 0.50, f"IVF recall@5 at nProbe=4 $r4%.4f below floor 0.50")
    assert(r7 >= 0.75, f"IVF recall@5 at shipped nProbe=7 $r7%.4f below floor 0.75")
  }

  test("q_dedup_embedding_lsh recall vs brute pairs: probes=0 >= 0.65, probes=4 >= 0.90") {
    val brute = pairSet(Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.45))
    def recallAt(p: Int): Double = {
      val lsh = pairSet(Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.45, probes = p))
      assert(lsh.subsetOf(brute)) // precision 1 by construction (exact verify step)
      lsh.intersect(brute).size.toDouble / brute.size
    }
    assert(brute.nonEmpty)
    val r0 = recallAt(0); val r4 = recallAt(4)
    info(f"q_dedup_embedding_lsh recall: probes=0 $r0%.4f, probes=4 $r4%.4f (of ${brute.size})")
    assert(r0 >= 0.65, f"embedding-LSH near-dup recall $r0%.4f below floor 0.65")
    assert(r4 >= 0.90, f"multi-probe near-dup recall $r4%.4f below floor 0.90")
  }

  test("q_dedup_simhash (probeBits, shipped config) EQUALS the exact hamming<=6 pair set") {
    val sigs = docs
      .select(col("doc_id"), graft.functions.simhash64(
        graft.text.TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact6 = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 6
    } yield (math.min(sigs(i)._1, sigs(j)._1), math.max(sigs(i)._1, sigs(j)._1))).toSet
    val probed = pairSet(Dedup.simHashPairs(docs, "doc_id", "text",
      maxHamming = 6, probeBits = true))
    // pigeonhole + hamming-1 probes: loss-free up to distance 7, so at
    // maxHamming=6 the banding is EXACT enumeration — recall 1, precision 1
    assert(probed == exact6, s"missing ${exact6 -- probed}, extra ${probed -- exact6}")
    assert(exact6.nonEmpty)
  }

  test("simhash banding without probes: recall vs exact hamming<=6 pairs >= 0.70; hamming<=3 complete") {
    // exact twin: brute-force hamming over the SAME 64-bit signatures,
    // computed locally over all ~125k pairs of the 500 signatures. The
    // 4-band pigeonhole guarantees hamming<=3 exactly; this measures how
    // much of the 4..6 tail the banding also catches at the shipped
    // maxHamming=6 configuration.
    val sigs = docs
      .select(col("doc_id"), graft.functions.simhash64(
        graft.text.TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def exactPairs(maxH: Int): Set[(Long, Long)] = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= maxH
    } yield {
      val (a, b) = (sigs(i)._1, sigs(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    val exact6 = exactPairs(6)
    val banded = pairSet(Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6))
    val recall = banded.intersect(exact6).size.toDouble / exact6.size
    info(f"q_dedup_simhash banding recall = $recall%.4f (${banded.intersect(exact6).size}/${exact6.size})")
    assert(exact6.nonEmpty)
    assert(banded.subsetOf(exact6)) // precision 1: every emitted pair verified exactly
    assert(exactPairs(3).subsetOf(banded)) // pigeonhole: hamming<=3 is loss-free
    assert(recall >= 0.70, f"simhash banding recall $recall%.4f below floor 0.70")
  }

  test("SemDeDup cluster confinement: measured share of global pairs, kmeans > labels") {
    // SemDeDup's deliberate tradeoff: pairwise cosine runs only WITHIN a
    // cluster, so cross-cluster near-dups are never examined — that is
    // what makes it tractable at corpus scale. This pins the measured
    // coverage on the gate data (deterministic fixtures, no RNG): the
    // learned k-means clusters capture 70/271 = 0.258 of all tau=0.35
    // pairs, vs 26/271 = 0.096 for the raw label partition — clustering
    // quality directly buys dedup coverage, which is the reason
    // q_semdedup_kmeans composes the E-step instead of trusting labels.
    val brute = Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.35)
    val asg = Similarity.kmeansAssign(emb, "vec_id", "embedding", "label")
      .select(col("vec_id"), col("assigned"))
    def captured(cluster: org.apache.spark.sql.DataFrame, cName: String): Long =
      brute
        .join(cluster.select(col("vec_id").as("ida"), col(cName).as("ca")), "ida")
        .join(cluster.select(col("vec_id").as("idb"), col(cName).as("cb")), "idb")
        .filter(col("ca") === col("cb")).count()
    val total = brute.count()
    val byKmeans = captured(asg, "assigned")
    val byLabel = captured(emb.select(col("vec_id"), col("label")), "label")
    info(s"semdedup coverage: kmeans $byKmeans/$total, label $byLabel/$total")
    assert(total === 271L)
    assert(byKmeans === 70L && byLabel === 26L) // deterministic constants
    assert(byKmeans > byLabel) // learned clusters beat arbitrary partitions
  }

  // The PQ family measures three points on the compression/recall curve,
  // all against the same exact-cosine twin (embeddings are unit-norm, so
  // L2 and cosine rank identically — verified: the exact L2 and cosine
  // top-5 sets coincide on all 10 queries). The codes-only paths rank
  // COARSELY by design — 32-bit codes are a 64× compression — which is
  // exactly why the shipped stack includes the re-rank variant:
  //   - q_pq_adc_topk   (codes only)        recall@5 = 0.26
  //   - q_ivfpq_topk    (routed codes only) recall@5 = 0.24
  //   - q_pq_rerank_topk (ADC shortlist=100 → exact re-rank) = 0.94
  //     (ladder 0.82 / 0.94 / 0.98 at shortlist 50 / 100 / 150)
  // Deterministic constants (hash-seeded, no RNG); floors sit just below.

  test("q_pq_adc_topk (shipped m=8/k=16, codes only) recall@5 >= 0.20 (measured 0.26)") {
    import graft.similarity.Pq
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    val adc = matchSet(Pq.pqAdcTopK(emb, annQueries, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, topK = 5))
    val recall = adc.intersect(exact).size.toDouble / exact.size
    info(f"q_pq_adc_topk recall@5 = $recall%.4f (${adc.intersect(exact).size}/${exact.size})")
    assert(exact.size == 50)
    assert(recall >= 0.20, f"PQ-ADC recall@5 $recall%.4f below floor 0.20")
  }

  test("q_ivfpq_topk (shipped nProbe=6, codes only) recall@5 >= 0.18; ADC-only is its ceiling") {
    import graft.similarity.Pq
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    val ivfpq = matchSet(Pq.ivfPqTopK(emb, annQueries, "vec_id", "embedding",
      dim = 64, nLists = 16, nProbe = 6, m = 8, kCodes = 16, topK = 5))
    val adc = matchSet(Pq.pqAdcTopK(emb, annQueries, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, topK = 5))
    val rIvfpq = ivfpq.intersect(exact).size.toDouble / exact.size
    val rAdc = adc.intersect(exact).size.toDouble / exact.size
    info(f"q_ivfpq_topk recall@5 = $rIvfpq%.4f, full-ADC ceiling $rAdc%.4f")
    // IVF routing can only LOSE candidates relative to scanning all lists
    assert(rIvfpq <= rAdc + 1e-9, "IVF-PQ cannot beat its own ADC ceiling")
    assert(rIvfpq >= 0.18, f"IVF-PQ recall@5 $rIvfpq%.4f below floor 0.18")
  }

  test("q_pq_rerank_topk (shipped shortlist=100) recall@5 >= 0.90; ladder monotone") {
    import graft.similarity.Pq
    val exact = matchSet(Similarity.bruteForceTopK(emb, annQueries, "vec_id", "embedding", 5))
    def recallAt(l: Int): Double = {
      val r = matchSet(Pq.pqAdcRerankTopK(emb, annQueries, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, topK = 5, shortlist = l))
      r.intersect(exact).size.toDouble / exact.size
    }
    val r50 = recallAt(50); val r100 = recallAt(100)
    info(f"q_pq_rerank_topk recall@5: shortlist=50 $r50%.4f, shortlist=100 $r100%.4f (ladder 0.82/0.94/0.98 at 50/100/150)")
    assert(r100 >= r50, "a longer shortlist must not lose recall")
    assert(r100 >= 0.90, f"re-ranked PQ recall@5 $r100%.4f below floor 0.90")
    val rr = matchSet(Pq.pqAdcRerankTopK(emb, annQueries, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, topK = 5, shortlist = 100))
    // any true neighbor the shortlist contains must rank exactly (the
    // re-rank metric IS the exact metric): precision of hits is 1
    assert(rr.subsetOf(matchSet(Similarity.bruteForceTopK(
      emb, annQueries, "vec_id", "embedding", 50))))
  }
}
