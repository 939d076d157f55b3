package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** RUNNING cluster assignments over the streaming LSH dedup candidate
  * stream — what a standing ingest pipeline actually consumes
  * ([[StreamingLshDedup]] emits candidate PAIRS; "which cluster does this
  * doc belong to right now" needs the transitive closure): a
  * `foreachBatch` micro-batch CC step that folds each batch's verified
  * pairs into the carried assignment via [[graft.dedup.Dedup
  * .incrementalComponents]].
  *
  * Why micro-batch CC and not per-shard operator state: candidate pairs
  * for one document surface in MULTIPLE rendezvous shards (one per band
  * key), so a per-shard union-find can never merge across shards — the
  * closure is inherently global. The incremental step keeps it cheap:
  * the previous assignment is a star forest with the same connectivity
  * as the accumulated pair history, so each batch costs O(active
  * clustered nodes + new pairs) — the pair log is never replayed, and
  * near-dup stars converge in ~2 label-propagation rounds.
  *
  * Equality contract (Round10Spec): after any batch split of the corpus,
  * the carried assignment equals batch [[graft.dedup.Dedup
  * .connectedComponents]] over the one-shot candidate pair set at the
  * same threshold. */
object StreamingLshClusters {

  /** Cross-batch loop state: the current `(node, component)` assignment. */
  final class ClusterState(spark: SparkSession) {
    @volatile private var assign: DataFrame = graft.dedup.Dedup.emptyAssignment(spark)

    /** Current global cluster assignment (clustered nodes only). */
    def assignment: DataFrame = assign

    private[streaming] def advance(next: DataFrame): Unit = { assign = next }
  }

  /** Build the `foreachBatch` writer over [[StreamingLshDedup
    * .candidatePairs]] output: each batch's candidates are thresholded on
    * the signature-agreement Jaccard estimate, folded into the state, and
    * the post-batch assignment is handed to `sink`. The assignment is
    * `localCheckpoint`-materialized per batch (bounded driver plan, no
    * growing lineage). Caller `start()`s. */
  def writer(
      candidates: Dataset[StreamingLshDedup.LshCandidate],
      state: ClusterState,
      minEstJaccard: Double = 0.5
  )(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    candidates.toDF().writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val edges = batch.filter(col("estJaccard") >= minEstJaccard)
        .select(col("ida"), col("idb")).distinct()
      val next = graft.dedup.Dedup
        .incrementalComponents(state.assignment, edges, "ida", "idb")
        .localCheckpoint()
      state.advance(next)
      sink(next, batchId)
    }
}
