package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** End-to-end STREAMING curation — the whole [[graft.Pipeline
  * .curateIncremental]] chain (quality gate → standing-catalog dedup →
  * in-batch dedup → broadcast decontamination → split) run as a
  * `foreachBatch` pipeline over a document stream, with the dedup catalog
  * carried across micro-batches as the loop state.
  *
  * Why `foreachBatch` and not per-row operator state: curation is
  * BATCH-granular by nature — the catalog probe is a join against
  * distinct-content-sized state, decontamination broadcasts the eval
  * grams, and both already exist as audited batch operators. `foreachBatch`
  * reuses them verbatim (one code path to trust, spec'd equal to the
  * batch fold BY CONSTRUCTION of the composition, and equal to the
  * one-shot [[graft.Pipeline.curate]] under ascending-id arrival —
  * Round10Spec), while the streaming runtime contributes ordering,
  * backpressure and restart semantics. Contrast with
  * [[StreamingDedupCatalog]], which keeps the same catalog as PER-SHARD
  * OPERATOR state for when flag latency must be row-level.
  *
  * State discipline: the updated catalog returned by each
  * `curateIncremental` call is `localCheckpoint`-materialized (inside the
  * pipeline), so the driver holds a bounded plan handle, not a growing
  * lineage; the catalog itself grows only with novel content. A
  * production deployment persists it per batch via
  * [[graft.dedup.Dedup.dedupCatalogWrite]] for restart recovery. */
object StreamingCuration {

  /** The cross-batch loop state: the standing dedup catalog. Thread-safe:
    * `foreachBatch` invocations are serialized by the streaming runtime,
    * but state reads (audits) may come from other threads.
    *
    * RESTART RECOVERY: construct with `initial =
    * Dedup.dedupCatalogResume(spark, <catalog table>)` to resume from a
    * state persisted by a `catalogTable`-enabled [[writer]] — the resumed
    * run continues exactly where the crashed one left off (spec-asserted
    * equal to the uninterrupted run, Round10Spec; the resume helper also
    * recovers the staging table if the crash hit mid-swap, Round11Spec).
    * Pair with an idempotent sink keyed on batch id for exactly-once
    * output across the restart. */
  final class CurationState(spark: SparkSession, initial: Option[DataFrame] = None) {
    @volatile private var catalog: DataFrame =
      initial.getOrElse(graft.Pipeline.emptyCatalog(spark))

    /** Current catalog state (one row per distinct fingerprint seen). */
    def catalogState: DataFrame = catalog

    private[streaming] def advance(updated: DataFrame): Unit = { catalog = updated }
  }

  /** Build the `foreachBatch` writer: each micro-batch is curated against
    * the state's catalog and the curated rows `(idCol, split, textCol)`
    * are handed to `sink` with the batch id; the catalog advances to the
    * post-batch state. Caller configures trigger/checkpoint and `start()`s. */
  def writer(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      state: CurationState,
      minQuality: Double = 0.83,
      contaminationNgram: Int = 8,
      /** When set, the post-batch catalog is ALSO persisted to this
        * fingerprint-bucketed table every micro-batch via the CRASH-SAFE
        * staged swap ([[graft.dedup.Dedup.dedupCatalogWriteAtomic]]: the
        * new state lands completely in a staging table before the old one
        * is touched, so a driver crash at ANY point — including mid-swap —
        * leaves a complete state for [[graft.dedup.Dedup
        * .dedupCatalogResume]] to recover; write-in-place would open a
        * drop→rewrite window with NO persisted state every batch). A
        * crashed driver resumes by constructing [[CurationState]] from
        * `Dedup.dedupCatalogResume(spark, catalogTable)`. The write is
        * distinct-content-sized, and the bucketed layout makes the NEXT
        * session's probes zero-exchange from the first batch. */
      catalogTable: Option[String] = None
  )(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (curated, updated) = graft.Pipeline.curateIncremental(
        state.catalogState, batch, evalDocs, idCol, textCol, batchId,
        minQuality, contaminationNgram)
      catalogTable.foreach(t => graft.dedup.Dedup.dedupCatalogWriteAtomic(updated, t))
      state.advance(updated)
      sink(curated, batchId)
    }
}
