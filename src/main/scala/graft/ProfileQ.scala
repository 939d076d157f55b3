package graft

/** Scratch per-query profiler: runs the named query N times in one JVM and
  * prints each wall time. Usage: runMain graft.ProfileQ <sfDir> <query> [n]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // same materialization as Bench: the query's own output rows, so
      // computed projections / final sorts are not pruned from the timing
      val c = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[profileq] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    spark.stop()
  }
}
