package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up EVERY query once at the smallest SF before timing: a query's
    // first execution in a fresh JVM is dominated by one-time Janino
    // compilation + C2 JIT of its generated stages (measured ~5-6 s for the
    // heaviest custom-kernel query vs 0.5 s steady state), which says
    // nothing about engine throughput. Warming on sf0.001 compiles the
    // exact same generated code (same plans) for cents of data, so the
    // timed sf run below measures steady-state execution.
    // Warm at the TARGET sf by default: AQE re-plans at runtime, so the
    // sf0.001 warm-up used previously compiled DIFFERENT generated code
    // than the sf0.1 run for any query whose join strategy / partition
    // coalescing flips with size (measured: q_dedup_clusters 8.2 s first
    // run vs 4.3 s steady state in one JVM). One-time codegen+cache cost
    // amortizes to nothing over a real 100 TB job, so steady-state is the
    // number that extrapolates.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", sfDir)
    if (!new java.io.File(warmDir).isDirectory)
      System.err.println(s"[bench] WARNING: warm-up dir $warmDir missing - timed runs will be JIT-cold")
    // Force FULL evaluation of every output column: `df.count()` would let
    // Catalyst prune computed projections (a regex-scoring query would time
    // as a bare scan) and eliminate final sorts; materializing the plan's
    // own output rows times the real work the query claims to do.
    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    // Per-query cache hygiene (the caller-owned-cache convention, ADVICE
    // r06): a handful of operators persist intermediates they cannot cheaply
    // release themselves (model count tables whose output is corpus-sized).
    // Releasing here keeps a 294-query session from accumulating
    // MEMORY_AND_DISK blocks — and keeps timings honest: CacheManager
    // matches identical plan fragments, so a leaked warm-up cache would
    // otherwise be silently REUSED by the timed run of the same query.
    def release(): Unit = if (!sys.env.contains("SPARK_GRAFT_NO_RELEASE")) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // optional comma-separated query filter for iterating on one hot query
    // (timing methodology unchanged when unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      // a failed warm-up must be visible: the timed run below would
      // otherwise silently pay cold-JIT cost (or fail again) with no signal
      try run(fn(spark, warmDir))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warm-up $name FAILED: ${e.getMessage}") }
      release()
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      // a failed query must be visible in the JSON, not silently timed
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      release()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The full line above exceeds the harness's 2000-char stdout-tail
    // capture once ~100 queries report full-precision doubles, so it is
    // unparseable from the tail (seen in BENCH_r01/r02: "parsed": null).
    // Emit a compact, contract-shaped summary LAST: total + the slowest
    // queries at 2 dp always fit in the tail alongside sbt's closing line.
    def d2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val failed = results.count(_._2 < 0)
    val slowest = results.toSeq.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + d2(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${d2(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
