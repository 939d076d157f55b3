package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Round-6: SemDeDup cluster-level semantic dedup, hard-negative mining,
  * and BPE tokenizer training (pair-stat kernel + full greedy merge loop).
  */
class Round6Spec extends SparkSpec {

  /** Reference BPE (Sennrich et al. 2016) on a word-frequency map: plain
    * single-machine Scala, greedy non-overlapping left-to-right merges,
    * ties broken (count desc, left asc, right asc). */
  private def refBpe(words: Map[String, Long], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, c) => c }(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, l, r, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
            else { b += syms(i); i += 1 }
          }
          b.result()
        } { case (_, c) => c }(_ + _)
      }
    }
    out.toSeq
  }

  test("bpeTrain matches the reference merge table on the classic corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq("low low lower lowest", "new newer newest wide wider widest",
      "low newer new low wider").toDF("text")
    val words = docs.collect().flatMap(_.getString(0).split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = refBpe(words, 8)
    val got = TextAnalysis.bpeTrain(docs, "text", 8)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("bpeTrain merge kernel: overlapping runs merge greedily left-to-right") {
    val s = spark
    import s.implicits._
    // 'aaaa' under merge (a,a): greedy gives [aa][aa], NOT [a][aa][a] or
    // re-merging into [aaaa]; next round's top pair is then (aa,aa)
    val docs = Seq("aaaa aaaa aab").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", 2)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (a,a) count = 3 per 'aaaa' x2 + 1 per 'aab' = 7
    // round 2 on [aa][aa] x2 + [aa][b]: (aa,aa) = 2 vs (aa,b) = 1
    assert(got === Seq((1, "a", "a", 7L), (2, "aa", "aa", 2L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", 5).collect()
    assert(got.length === 1) // after merging (a,b) every word is one symbol
  }

  test("bpeEncode replays the trained merges exactly (reference round-trip)") {
    val s = spark
    import s.implicits._
    val docs = Seq("low low lower lowest", "new newer newest wide wider widest",
      "low newer new low wider").toDF("text")
    val nM = 6
    val mergeTable = TextAnalysis.bpeTrain(docs, "text", nM)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // reference encoder: greedy merge replay per word, single-machine
    def encodeRef(text: String): Seq[String] =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms = w.map(_.toString).toVector
        for ((l, r) <- mergeTable) {
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
            else { b += syms(i); i += 1 }
          }
          syms = b.result()
        }
        syms
      }
    val got = TextAnalysis.bpeEncode(docs, "text", mergeTable)
      .select("text", "tokens", "n_tokens").collect()
    for (row <- got) {
      val want = encodeRef(row.getString(0))
      assert(row.getSeq[String](1) === want, s"doc '${row.getString(0)}'")
      assert(row.getInt(2) === want.length)
    }
  }

  test("semanticDedup agrees with within-cluster brute-force pairs") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding", "label", 0.35)
    // reference: brute-force all-pairs, then keep only same-cluster pairs
    val labels = emb.select(col("vec_id"), col("label"))
    val brute = Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.35)
      .join(labels.select(col("vec_id").as("ida"), col("label").as("la")), "ida")
      .join(labels.select(col("vec_id").as("idb"), col("label").as("lb")), "idb")
      .filter(col("la") === col("lb"))
      .groupBy(col("idb").as("vec_id")).agg(min(col("ida")).as("ref_nn"))
    val joined = got.join(brute, Seq("vec_id"), "left_outer").cache()
    try {
      assert(joined.filter(col("is_dup") =!= col("ref_nn").isNotNull).count() === 0L)
      assert(joined.filter(col("is_dup") && col("nn_id") =!= col("ref_nn")).count() === 0L)
      assert(got.count() === emb.count()) // every vector is in the verdict
    } finally joined.unpersist()
  }

  test("hardNegativesTopK: every neighbor has a different label, ranks exact") {
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.hardNegativesTopK(emb, queries, "vec_id", "embedding", "label", 3)
      .cache()
    try {
      // no negative shares its query's label
      val ql = queries.select(col("vec_id").as("query_id"), col("label").as("ql"))
      assert(got.join(ql, "query_id").filter(col("neg_label") === col("ql")).count() === 0L)
      // ranks agree with the window-ranking reference restricted off-label
      val withL = emb.withColumnRenamed("label", "lbl")
      val ref = Similarity.bruteForceTopKWindow(withL, queries.withColumnRenamed("label", "lbl"),
          "vec_id", "embedding", 500)
        .join(withL.select(col("vec_id").as("neighbor_id"), col("lbl").as("nl")), "neighbor_id")
        .join(ql.withColumnRenamed("ql", "q_lbl"), "query_id")
        .filter(col("nl") =!= col("q_lbl"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      val refTop = ref.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("query_id"), col("rk").as("rank"), col("neighbor_id"))
      val cmp = got.select("query_id", "rank", "neighbor_id")
      assert(cmp.exceptAll(refTop).count() === 0L)
      assert(refTop.exceptAll(cmp).count() === 0L)
    } finally got.unpersist()
  }
}
