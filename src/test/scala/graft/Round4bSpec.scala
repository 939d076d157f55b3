package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiler
import graft.similarity.Similarity

/** Round-4 batch 2: BM25 ranking, exact Lloyd k-means step, Cohen's
  * kappa. */
class Round4bSpec extends SparkSpec {

  test("bm25 matches the hand-computed Lucene-idf formula; no-hit docs absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark joins data"),          // hits: spark(1) join? no - 'joins' != 'join'
      (2L, "spark spark hash table scan hash"),
      (3L, "nothing relevant here"),
      (4L, "hash")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "hash")
    val out = graft.text.TextAnalysis.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(3L)) // no query term
    assert(out(1L)._1 == 1 && out(2L)._1 == 2 && out(4L)._1 == 1)
    // reference computation (same quantization)
    val dls = Map(1L -> 3, 2L -> 6, 3L -> 3, 4L -> 1)
    val nDocs = 4.0
    val avgdl = dls.values.sum.toDouble / nDocs
    val dfs = Map("spark" -> 2, "hash" -> 2)
    val tfs = Map((1L, "spark") -> 1, (2L, "spark") -> 2, (2L, "hash") -> 2, (4L, "hash") -> 1)
    def score(doc: Long): Double = {
      val k1 = 1.2; val b = 0.75
      val qs = terms.flatMap { t =>
        tfs.get((doc, t)).map { tf =>
          val idf = math.log(1.0 + (nDocs - dfs(t) + 0.5) / (dfs(t) + 0.5))
          val part = (tf * (k1 + 1)) / (tf + k1 * (1.0 - b + b * dls(doc) / avgdl))
          math.floor(idf * part * 1e9).toLong
        }
      }
      qs.sum.toDouble / 1e9
    }
    Seq(1L, 2L, 4L).foreach { d =>
      assert(math.abs(out(d)._2 - score(d)) < 1e-9, s"doc $d")
    }
  }

  test("kmeansAssign moves a mislabeled vector to its true cluster; update reports exact sizes") {
    val s = spark
    import s.implicits._
    // two tight clusters; vec 99 sits at cluster 0's center but is
    // labeled 1 -> the E-step must reassign it to 0
    val rows =
      (0 until 10).map(i => (i.toLong, Array(0.0f + i * 0.01f, 0.0f), 0)) ++
      (10 until 20).map(i => (i.toLong, Array(10.0f + (i - 10) * 0.01f, 10.0f), 1)) :+
      ((99L, Array(0.05f, 0.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val assign = Similarity.kmeansAssign(emb, "vec_id", "embedding", "label")
    val got = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(99L) == 0)
    assert((0 until 10).forall(i => got(i.toLong) == 0))
    assert((10 until 20).forall(i => got(i.toLong) == 1))
    val upd = Similarity.kmeansUpdate(emb, assign, "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(upd(0) == 11L && upd(1) == 10L)
  }

  test("kmeansAssign distance ties break to the smallest label") {
    val s = spark
    import s.implicits._
    // centroid(5) = mean(-2, 0) = -1 (probe included), centroid(3) = 1;
    // the probe at 0 is exactly equidistant from both
    val emb = Seq(
      (0L, Array(-2.0f), 5), (1L, Array(1.0f), 3), (2L, Array(0.0f), 5)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.kmeansAssign(emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(2L) == 3) // tie between centroids 3 and 5 -> smaller label
  }

  test("cohenKappa: perfect agreement = 1; hand-computed 2x2 table") {
    val s = spark
    import s.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    val k1 = Profiler.cohenKappa(perfect, "x", "y").collect().head
    assert(k1.getAs[Double]("kappa") == 1.0 && k1.getAs[Double]("po") == 1.0)
    // classic example: n=100, agree on 45 a-pairs + 30 b-pairs = 75;
    // marginals: A: 55a/45b, B: 60a/40b -> pe = .55*.6+.45*.4 = .51
    // kappa = (.7-.51)/(1-.51) = 0.387755...
    val rows = Seq.fill(45)(("a", "a")) ++ Seq.fill(10)(("a", "b")) ++
      Seq.fill(15)(("b", "a")) ++ Seq.fill(30)(("b", "b"))
    val k2 = Profiler.cohenKappa(rows.toDF("x", "y"), "x", "y").collect().head
    assert(k2.getLong(0) == 100L)
    assert(math.abs(k2.getAs[Double]("po") - 0.75) < 1e-12)
    // marginals: A: 55a/45b, B: 60a/40b -> pe = 0.51
    assert(math.abs(k2.getAs[Double]("pe") - 0.51) < 1e-12)
    assert(math.abs(k2.getAs[Double]("kappa") - (0.75 - 0.51) / 0.49) < 1e-12)
  }
}
