package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.similarity.{AnnIndex, PqIndexModel}

/** STREAMING ingestion for the disk ANN index — the daily-ingest story
  * ([[StreamingCuration]]'s foreachBatch pattern applied to
  * [[graft.similarity.AnnIndex]]): new vectors arrive as a stream and are
  * appended to the partitioned `(id, codes, v)` store under the FROZEN
  * model, so the index is searchable WHILE it grows.
  *
  * Why this is sound without any coordination: `appendToIndex` is per-row
  * assignment against frozen quantizers + an append-only partitioned
  * write, and `searchIndex` reads whole list directories — so after any
  * prefix of micro-batches the store is EXACTLY the store a one-shot
  * `buildIndex`+`appendToIndex` over the same prefix would produce
  * (spec-asserted, `AnnRetrainSpec`): searches between batches return the
  * already-ingested corpus, no torn state, no index server. Parquet's
  * `_temporary` staging keeps half-written files invisible to a
  * concurrent search within one JVM's filesystem view; cross-cluster
  * deployments get the same isolation from the usual output-committer
  * discipline.
  *
  * Model freshness is the [[graft.similarity.AnnIndex.retrain]]
  * lifecycle's job: when `Ivf.indexStats` over the growing store shows
  * list drift, retrain blue/green and point the NEXT ingest stream at the
  * new version — the frozen-model append and the versioned cutover
  * compose because both resolve paths at call time. */
object StreamingAnnIngest {

  /** Build the `foreachBatch` writer: each micro-batch appends to the
    * store at `path` under the frozen `model`; `onBatch` (optional) runs
    * AFTER the append lands — the hook a deployment uses for
    * ingest-progress telemetry or between-batch index audits. Caller
    * configures trigger/checkpoint and `start()`s. */
  def writer(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      model: PqIndexModel,
      onBatch: (Long => Unit) = _ => ()
  ): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      AnnIndex.appendToIndex(batch, idCol, vecCol, path, model)
      onBatch(batchId)
    }
}
