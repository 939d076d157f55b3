package graft

import org.apache.spark.sql.functions._
import graft.similarity.{AnnIndex, Similarity}

/** nLists-sizing evidence run (VERDICT r10 item 4): the shipped gated
  * queries use nLists=16 — toy-appropriate, and at sf0.01 a 12-probe
  * search touches ALL lists, so the `PartitionFilters` spec pin proves
  * the pruning MECHANISM, not its benefit. This builds the sf1-replica
  * index with the corpus-sized rule ([[AnnIndex.suggestNLists]] ≈ √N)
  * and measures pruned search (nProbe « nLists) against the full-probe
  * scan (nProbe = nLists — the same code path reading every list), plus
  * recall@5 vs exact brute force at each setting: the BASELINE row that
  * shows directory pruning BITING, with the recall it costs.
  *
  * Methodology matches [[Bench]]: warm-up + 3 timed runs per setting,
  * medians, `toRdd.count` materialization. One JSON line. */
object AnnPruneBench {

  private def run(df: org.apache.spark.sql.DataFrame): Unit = {
    df.queryExecution.toRdd.count(); ()
  }

  private def median3(body: => Unit): Double = {
    body // warm-up: steady-state codegen + file listing
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf1"
    // vector-corpus replication beyond the sf1 replica: at 20k vectors the
    // whole code store scans in microseconds and FIXED per-query costs
    // (job scheduling, broadcasts, the shortlist window) dominate — both
    // pruned and full-probe search time the overhead, not the scan
    // (measured: 3.50 vs 3.61 s). Pruning's benefit is proportional to
    // corpus size, so the evidence run replicates the embedding corpus
    // (id-shifted copies, the ScaleLadder discipline) to the scale where
    // the scan term is visible.
    val copies = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def d2(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val stride = emb0.agg(max(col("vec_id"))).head().getLong(0) + 1
    val emb =
      if (copies <= 1) emb0
      else (0 until copies).map(c =>
        emb0.withColumn("vec_id", col("vec_id") + lit(c * stride)))
        .reduce(_ unionByName _)
        .localCheckpoint()
    val n = emb.count()
    val nLists = AnnIndex.suggestNLists(n)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ann_prune_" +
      spark.sparkContext.applicationId
    val (model, tBuild) = {
      val t0 = System.nanoTime()
      val m = AnnIndex.buildIndex(emb, "vec_id", "embedding", path,
        dim = 64, nLists = nLists, m = 8, kCodes = 16)
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val settings = Seq(12, math.max(16, nLists / 8), nLists)
    val rows = settings.distinct.map { nProbe =>
      def search = AnnIndex.searchIndex(spark, path, model, queries,
        "vec_id", "embedding", topK = 5, nProbe = nProbe, shortlist = 100)
      val t = median3(run(search))
      val got = search.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      s""""nprobe_$nProbe":{"sec":${d2(t)},"recall_at_5":${d2(recall)},""" +
        s""""lists_read_frac":${d2(nProbe.toDouble / nLists)}}"""
    }
    println(s"""{"metric":"ann_prune","sf":"$sfDir","n_vectors":$n,""" +
      s""""n_lists":$nLists,"build_s":${d2(tBuild)},${rows.mkString(",")}}""")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    spark.stop()
  }
}
