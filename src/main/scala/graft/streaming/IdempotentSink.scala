package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` sinks. Structured Streaming guarantees
  * AT-LEAST-once delivery to `foreachBatch`: after a crash between the
  * sink write and the checkpoint commit, the SAME (batchId, data) is
  * re-delivered on restart. Exactly-once therefore needs an IDEMPOTENT
  * sink keyed by batchId — the pattern below makes any
  * directory-per-batch parquet sink safe to replay:
  *
  *  - a batch directory that already exists == this batchId committed:
  *    skip (re-delivery is a no-op);
  *  - otherwise write to a `_tmp_` staging dir and RENAME into place —
  *    rename is the atomic commit point on a local/HDFS-like FS, so a
  *    crash mid-write leaves only staging garbage, never a
  *    half-visible batch dir. (On object stores, rename isn't atomic —
  *    use a transactional table format there instead; this sink is the
  *    HDFS-family pattern.)
  */
object IdempotentSink {

  /** `foreachBatch` body writing each micro-batch to
    * `baseDir/batch_<id>` exactly once. Uses the Hadoop `FileSystem`
    * API resolved from the path's scheme, so the existence check and
    * the atomic rename work on any HDFS-family filesystem (`hdfs://`,
    * `file://`, …), not just the local FS. */
  def parquetBatchWriter(baseDir: String): (DataFrame, Long) => Unit = {
    (df: DataFrame, batchId: Long) =>
      import org.apache.hadoop.fs.Path
      val base = new Path(baseDir)
      val fs = base.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      val dir = new Path(base, s"batch_$batchId")
      if (!fs.exists(dir)) {
        val tmp = new Path(base, s"_tmp_batch_$batchId")
        df.write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(tmp, dir)) {
          // lost the race (concurrent replay) or dir appeared: either
          // way the batch is committed by someone; clean the staging
          fs.delete(tmp, true)
          if (!fs.exists(dir))
            throw new java.io.IOException(s"cannot commit batch $batchId to $dir")
        }
      }
  }
}
