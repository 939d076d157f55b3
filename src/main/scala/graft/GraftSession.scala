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
}
