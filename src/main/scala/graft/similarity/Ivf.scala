package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{cosine_sim, dot_product}

/** IVF (inverted-file) approximate nearest-neighbor search — the classic
  * coarse-quantizer scale path for embedding search (public design: FAISS
  * IVF-Flat; here re-expressed as Spark dataflow):
  *
  *  1. TRAIN: spherical k-means over a bounded driver-side sample →
  *     `nLists` unit centroids (the sample is small and fixed-size, so
  *     driver training is O(sample × nLists × iters) regardless of corpus
  *     scale; a 100 TB corpus still trains on a 2k-row sample).
  *  2. ASSIGN: every corpus vector goes to its nearest centroid's list —
  *     a pure map (argmax of `nLists` dot products, all codegen'd column
  *     ops), no shuffle.
  *  3. PROBE: each query is scored against the same centroids and probes
  *     its `nProbe` best lists; candidates = corpus rows in those lists
  *     (equi-join on `list_id`, queries broadcast), then exact cosine +
  *     bounded-heap top-k rerank.
  *
  * Recall < 1 by design (a true neighbor can live in an unprobed list);
  * raise `nProbe` toward `nLists` to trade compute for recall — at
  * `nProbe = nLists` results equal [[Similarity.bruteForceTopK]].
  */
object Ivf {

  /** Spherical k-means (Lloyd's, cosine assignment) on a deterministic
    * sample: first `sampleSize` rows by ascending id. Returns unit-norm
    * centroids. */
  def trainCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      iters: Int = 8,
      sampleSize: Int = 2048
  ): Array[Array[Float]] = {
    val sample: Array[Array[Float]] = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .map(normalize)
    require(sample.length >= nLists, s"sample ${sample.length} < nLists $nLists")
    val dim = sample.head.length
    // init: evenly spaced sample points (deterministic, spread across ids)
    var centroids = Array.tabulate(nLists)(i => sample((i * sample.length) / nLists).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Int](nLists)
      sample.foreach { v =>
        val a = nearest(centroids, v)
        counts(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(nLists) { i =>
        if (counts(i) == 0) centroids(i) // empty list keeps its centroid
        else normalize(sums(i).map(_.toFloat))
      }
      it += 1
    }
    centroids
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  private def nearest(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestDot = Double.MinValue; var i = 0
    while (i < centroids.length) {
      var dot = 0.0; var d = 0
      val c = centroids(i)
      while (d < v.length) { dot += c(d).toDouble * v(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
  }

  /** Column: array of dot products of `vec` against each centroid. */
  private def centroidScores(vec: Column, centroids: Array[Array[Float]]): Column =
    array(centroids.toIndexedSeq.map(c => dot_product(vec, typedLit(c.toSeq))): _*)

  /** Column: 0-based index of the best-scoring centroid (ties → first). */
  private def argmaxList(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scores = centroidScores(vec, centroids)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Materialize an IVF index on disk: corpus assigned to lists and
    * written `partitionBy(list_id)` — every probe then reads ONLY the
    * probed lists' files (partition pruning, visible as PartitionFilters
    * in the scan). This is how the coarse quantizer actually pays off at
    * 100 TB: the per-query scan cost drops to nProbe/nLists of the corpus
    * without any custom reader. Returns the trained centroids (persist
    * them alongside the index for future sessions). */
  def buildIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nLists: Int = 16,
      iters: Int = 8,
      sampleSize: Int = 2048
  ): Array[Array[Float]] = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nLists, iters, sampleSize)
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("list_id", argmaxList(col("v"), centroids))
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
    centroids
  }

  /** Query a disk IVF index built by [[buildIndex]]: per-query probe lists
    * become a pushed-down `list_id IN (...)` partition filter. */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Array[Array[Float]],
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val nLists = centroids.length
    require(nProbe >= 1 && nProbe <= nLists)
    val probes = probeLists(queries, idCol, vecCol, centroids, nProbe)
    // partition pruning: restrict the scan to the union of probed lists
    val probedListIds = probes.select("list_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(path)
      .filter(col("list_id").isin(probedListIds: _*))
    val scored = index.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine_sim(col("qv"), col("v")).as("cosine"))
    Similarity.topKByKey(scored, "query_id", "cosine", "neighbor_id", k)
  }

  /** (query_id, qv, list_id) rows: each query's nProbe best centroid lists. */
  private def probeLists(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Float]],
      nProbe: Int
  ): DataFrame = {
    val nLists = centroids.length
    val qScores = centroidScores(col("qv"), centroids)
    val probeIdx = slice(
      reverse(array_sort(zip_with(qScores,
        sequence(lit(0), lit(nLists - 1)),
        (s, i) => struct(s.as("s"), i.as("i"))))),
      1, nProbe)
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("__probe", explode(probeIdx))
      .withColumn("list_id", col("__probe.i").cast("int"))
      .drop("__probe")
  }

  /** End-to-end IVF top-k. Output schema matches
    * [[Similarity.bruteForceTopK]]: (query_id, rank, neighbor_id, cosine). */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      iters: Int = 8,
      sampleSize: Int = 2048
  ): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists)
    val centroids = trainCentroids(corpus, idCol, vecCol, nLists, iters, sampleSize)
    val assigned = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("list_id", argmaxList(col("v"), centroids))
    val probes = probeLists(queries, idCol, vecCol, centroids, nProbe)
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine_sim(col("qv"), col("v")).as("cosine"))
    Similarity.topKByKey(scored, "query_id", "cosine", "neighbor_id", k)
  }
}
