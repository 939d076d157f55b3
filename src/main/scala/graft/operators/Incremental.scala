package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-state maintenance — the materialized-view update
  * shape: a persisted per-key state table of DECOMPOSABLE aggregates
  * (count / sum / min / max; avg derives as sum/count) is merged with the
  * partial aggregates of a new batch, so refreshing the view costs
  * O(batch + |state|) instead of O(full history). This is the batch twin of
  * what Structured Streaming's stateful aggregation does per micro-batch,
  * expressed as plain DataFrame ops so it composes with MERGE/SCD sinks.
  *
  * Scale: the batch is partial-aggregated map-side before its one keyed
  * shuffle; the state table joins on the same key. A 100 TB history never
  * gets re-read — that is the entire point.
  */
object Incremental {

  /** Schema of a state row: keyCols ++ (n, total, vmin, vmax). `total` is
    * DECIMAL so repeated merges stay partition-order independent. */
  def aggState(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      // pin the widened sum type so state and merged-state schemas agree
      // across arbitrarily many merge generations
      sum(col(valueCol).cast("decimal(30,6)")).cast("decimal(38,6)").as("total"),
      min(col(valueCol)).as("vmin"),
      max(col(valueCol)).as("vmax"))

  /** Merge an existing state with a new batch of RAW rows: aggregate the
    * batch, then combine component-wise. Keys present in only one side
    * pass through. */
  def mergeAggState(state: DataFrame, batch: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    state.unionByName(aggState(batch, keyCols, valueCol))
      .groupBy(keyCols.map(col): _*).agg(
        sum("n").as("n"),
        sum("total").cast("decimal(38,6)").as("total"),
        min("vmin").as("vmin"),
        max("vmax").as("vmax"))
}
