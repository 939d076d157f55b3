package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * (spec-asserted): searches between batches return the already-ingested
  * corpus, no torn state, no index server.
  *
  * EXACTLY-ONCE (round 12): foreachBatch is at-least-once — after a
  * driver restart Structured Streaming re-delivers the last micro-batch
  * whose offset commit didn't land, and a bare append would ingest those
  * vectors twice (duplicate neighbor rows double ADC distances and can
  * displace true topK results). [[appendBatchIdempotent]] closes BOTH
  * replay windows with a staged two-phase publish:
  *
  *  1. `batchId <= COMMITTED` marker (atomic rename-OVERWRITE write,
  *     same discipline as `AnnIndex.repoint`) → the batch already landed
  *     in full; skip.
  *  2. Otherwise a previous attempt may have crashed mid-publish: every
  *     file this batch ever moved into the store carries the
  *     deterministic `b<batchId>-` name prefix, so recovery deletes
  *     `list_id=* / b<batchId>-*` leftovers, re-stages the batch into
  *     `_ingest/stage_b<batchId>` (directory overwritten — re-runs are
  *     idempotent), renames the staged files into their list directories
  *     under the prefixed names, and only THEN advances the marker.
  *
  * At every instant the store holds each committed batch's rows exactly
  * once plus possibly one in-flight batch's partial files, and the
  * in-flight files are torn down before re-publish — so the grown store
  * equals the one-shot twin after every recovery path (spec-asserted,
  * `Round12Spec`: redelivery of a committed batch, crash-before-marker,
  * crash-mid-publish). The publish step is O(nLists) driver-side renames
  * (the store is bounded at ~one file per list per batch by
  * `writeRows`' repartition).
  *
  * Model freshness is the [[graft.similarity.AnnIndex.retrain]]
  * lifecycle's job: [[writerVersioned]] resolves `base/CURRENT` at each
  * batch, so after a blue/green cutover the NEXT batch lands in the
  * promoted store, and retrain's catch-up re-encodes what earlier batches
  * put into the old one. */
object StreamingAnnIngest {

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Last batchId committed to the marker at `markerDir` (−1 before any).
    * The marker is `markerDir/_ingest/COMMITTED`. */
  def committedBatch(spark: SparkSession, markerDir: String): Long = {
    val p = new Path(s"$markerDir/_ingest/COMMITTED")
    val fs = fsOf(spark, markerDir)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        buf.readLine().trim.toLong
      } finally in.close()
    }
  }

  private def writeCommitted(spark: SparkSession, markerDir: String,
      batchId: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(spark, markerDir)
    fs.mkdirs(new Path(s"$markerDir/_ingest"))
    val tmp = new Path(s"$markerDir/_ingest/.COMMITTED.tmp")
    val dst = new Path(s"$markerDir/_ingest/COMMITTED")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  private def glob(fs: FileSystem, pattern: String): Array[FileStatus] =
    Option(fs.globStatus(new Path(pattern))).getOrElse(Array.empty)

  /** Exactly-once append of one micro-batch (see class doc for the
    * protocol). Returns `false` when the batch was already committed and
    * nothing was written. `markerDir` defaults to the store `path`;
    * [[writerVersioned]] passes the version-independent `base` so a
    * batch committed to the OLD version is still recognized as committed
    * after a cutover (its rows reach the new version via retrain's
    * catch-up, not via re-ingest). */
  def appendBatchIdempotent(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      model: PqIndexModel,
      batchId: Long,
      markerDir: Option[String] = None
  ): Boolean = {
    val spark = batch.sparkSession
    val marker = markerDir.getOrElse(path)
    if (batchId <= committedBatch(spark, marker)) return false
    val fs = fsOf(spark, path)
    // recovery: tear down anything a crashed attempt of THIS batch already
    // published (deterministic name prefix) before re-publishing
    glob(fs, s"$path/list_id=*/b$batchId-*")
      .foreach(st => fs.delete(st.getPath, false))
    val stage = s"$path/_ingest/stage_b$batchId"
    fs.delete(new Path(stage), true)
    AnnIndex.appendToIndex(batch, idCol, vecCol, stage, model)
    glob(fs, s"$stage/list_id=*/*")
      .filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach { st =>
        val listDir = new Path(s"$path/${st.getPath.getParent.getName}")
        fs.mkdirs(listDir)
        fs.rename(st.getPath, new Path(listDir, s"b$batchId-${st.getPath.getName}"))
      }
    fs.delete(new Path(stage), true)
    writeCommitted(spark, marker, batchId)
    true
  }

  /** Build the `foreachBatch` writer: each micro-batch appends to the
    * store at `path` via [[appendBatchIdempotent]] (re-delivered batches
    * are skipped, crashed publishes torn down — see class doc);
    * `onBatch` (optional) runs AFTER the batch is committed (or
    * recognized as already committed) — the hook a deployment uses for
    * ingest-progress telemetry, between-batch index audits, or as the
    * quiesce point to run [[graft.similarity.AnnIndex.retrain]] from.
    * Caller configures trigger/checkpoint and `start()`s. */
  def writer(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      model: PqIndexModel,
      onBatch: (Long => Unit) = _ => ()
  ): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      appendBatchIdempotent(batch, idCol, vecCol, path, model, batchId)
      onBatch(batchId)
    }

  /** Versioned twin of [[writer]] for a blue/green index under `base`
    * (built with [[graft.similarity.AnnIndex.buildVersioned]]): each
    * micro-batch resolves `base/CURRENT` and that version's persisted
    * model AT BATCH TIME, so the stream follows a
    * [[graft.similarity.AnnIndex.retrain]] cutover without a restart —
    * batches before the swap land in the old version (and reach the
    * promoted one via retrain's catch-up), batches after it land in the
    * new version under its fresh model. The committed-batch marker lives
    * at `base` (version-independent), so a batch re-delivered across a
    * cutover is never double-ingested. */
  def writerVersioned(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      base: String,
      onBatch: (Long => Unit) = _ => ()
  ): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val v = AnnIndex.currentVersion(spark, base).getOrElse(
        throw new IllegalStateException(s"no CURRENT index under $base"))
      val vp = AnnIndex.versionPath(base, v)
      val model = AnnIndex.loadModel(spark, s"$vp/_model")
      appendBatchIdempotent(batch, idCol, vecCol, vp, model, batchId,
        markerDir = Some(base))
      onBatch(batchId)
    }
}
