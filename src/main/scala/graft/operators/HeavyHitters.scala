package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters at shuffle-light cost: a Misra–Gries candidate
  * prepass, then an exact count restricted to the (bounded) candidate set.
  *
  * The classic one-shuffle approach — `groupBy(key).count.filter(cnt ≥
  * n/k)` — shuffles EVERY distinct key. At 100 TB the distinct-key frame
  * is itself corpus-sized (think tokens), which is exactly what you do
  * not want to exchange for a k-row answer. Misra–Gries (1982) summarizes
  * a partition with k counters such that every item with true frequency
  * > n/k survives in SOME partition's summary (the no-false-negative
  * merge property of MG summaries — Agarwal et al., PODS'12). So:
  *
  *  1. per-partition MG with `k` counters via a streaming `mapPartitions`
  *     pass (bounded state, no shuffle),
  *  2. union of per-partition survivors = candidate set, ≤ k·#partitions
  *     rows, kept as a DataFrame and broadcast (never a driver Set or an
  *     `isin` plan literal — see the join-site comment),
  *  3. one exact counting pass over the corpus semi-joined to the
  *     broadcast candidates MAP-SIDE — the only shuffle is
  *     ≤ k·#partitions keys wide,
  *  4. emit keys with exact `count ≥ ceil(n/k)` (support `φ = 1/k`).
  *
  * The MG summaries depend on partition order, but the OUTPUT does not:
  * candidates are a superset of the true heavy hitters for ANY order, and
  * the final exact filter prunes everything below the threshold — so the
  * result is deterministic and exactly equals the brute-force answer. */
object HeavyHitters {

  /** Exact `φ = 1/k` heavy hitters of `keyCol` (string), with exact
    * counts. Returns `(key, cnt)` for every key with `cnt·k ≥ n`. */
  def exactHeavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val (out, keys) = heavyHittersPlan(df, keyCol, k)
    val res = out.transform(graft.core.Checkpoints.truncate)
    keys.unpersist()
    res
  }

  /** The un-truncated plan of [[exactHeavyHitters]] plus the persisted key
    * frame (caller unpersists) — split out so specs can assert the
    * broadcast-semi-join physical shape, which `Checkpoints.truncate`
    * (eager materialization) otherwise hides behind a Scan ExistingRDD. */
  private[graft] def heavyHittersPlan(df: DataFrame, keyCol: String,
      k: Int): (DataFrame, DataFrame) = {
    require(k >= 2 && k <= 100000, s"k=$k")
    val keys = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1) per-partition Misra-Gries: k counters, decrement-all on overflow
    val candidates = keys.queryExecution.toRdd.mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](k * 2)
      it.foreach { r =>
        val s = r.getUTF8String(0).toString
        val cur = counters.get(s)
        if (cur != null) counters.put(s, cur + 1L)
        else if (counters.size < k) counters.put(s, 1L)
        else { // decrement all; drop zeros (the MG eviction step)
          val itr = counters.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue <= 1L) itr.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[String](counters.size)
      counters.keySet().forEach(s => { out += s; () })
      out.iterator
    }.map(org.apache.spark.sql.Row(_))
    val candDf = df.sparkSession.createDataFrame(candidates,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__k",
          org.apache.spark.sql.types.StringType)))).distinct()
    // 2..4) exact counts restricted to the candidate set via a BROADCAST
    // semi-join (map-side hash probe — no shuffle for non-candidates).
    // A broadcast relation, not an `isin` literal: k·#partitions can reach
    // millions of strings, and an In/InSet literal of that size is a
    // driver-plan-size hazard (serialized into every task), while the
    // broadcast path stays off the plan and fails loudly past Spark's
    // broadcast limits. Candidates never land in a driver Set at all —
    // the MG pass re-runs from the persisted `keys` when the join
    // executes, and ANY candidate superset yields the same output (the
    // exact threshold filter prunes below-φ keys regardless).
    val n = keys.count()
    val thresh = (n + k - 1) / k // ceil(n/k): cnt·k >= n
    val out = keys.join(broadcast(candDf), Seq("__k"), "left_semi")
      .groupBy(col("__k").as("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
    (out, keys)
  }

  /** Convenience: heavy-hitter TOKENS of a text column (whitespace
    * tokens, one row per occurrence). */
  def heavyHitterTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    exactHeavyHitters(
      df.select(explode(graft.text.TextAnalysis.tokens(col(textCol))).as("tok")),
      "tok", k)
}
