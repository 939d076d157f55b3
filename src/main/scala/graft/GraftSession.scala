package graft

import org.apache.spark.sql.SparkSession

/** Recommended `SparkSession` wiring for this engine — one place that
  * documents WHY each knob matters at 100 TB. All mains/specs in this repo
  * build on it; a production deployment keeps the same settings and swaps
  * the master/shuffle sizing for cluster-level values.
  */
object GraftSession {

  /** Pre-configured builder (caller still sets master/app specifics).
    *
    *  - `graft.GraftExtensions`: registers the native codegen functions
    *    (cosine_sim, shingle_hashes, winnow_fingerprints, …) for SQL users.
    *  - `nanosAsLong`: Spark 4 refuses parquet TIMESTAMP(NANOS) otherwise;
    *    reading it as bigint nanos keeps event-time math exact (int
    *    arithmetic, no double rounding at 2^60).
    *  - UTC session timezone: timestamp semantics stable across machines.
    *  - AQE + skew-join + partition coalescing (pinned explicitly even
    *    though they default on): at scale these re-plan sort-merge joins to
    *    broadcast when runtime stats allow, split skewed partitions
    *    (the whale keys that salting handles when you know them ahead of
    *    time), and merge tiny post-shuffle partitions so 32k-partition
    *    shuffles don't schedule 32k near-empty tasks.
    *  - `spark.sql.shuffle.partitions`: size to ~2-3× total executor cores
    *    on a real cluster (set here only by mains/tests to their core
    *    count); with AQE coalescing the cost of oversizing is small.
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Long-lived-driver hygiene: the app-status store retains job/stage/
      // task/SQL-execution bookkeeping even with the UI off (it backs the
      // status REST API), at defaults of 1000 jobs / 1000 stages / 100k
      // tasks / 1000 SQL executions. A session that runs hundreds of
      // multi-job iterative queries (this engine's bench and any standing
      // 100 TB driver) accumulates that bookkeeping as live driver heap —
      // measured here as a ~1.4× late-session inflation on the most
      // job-intensive queries. Bound it; nothing in the engine reads the
      // status store back.
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "50")
}
