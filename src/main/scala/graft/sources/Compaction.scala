package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance chore every long-lived
  * parquet dataset needs: streaming sinks and over-parallel writers leave
  * thousands of KB-sized files, and at 100 TB the resulting task-per-file
  * scheduling + footer-read overhead dominates scan time long before IO
  * does.
  *
  * Sizing comes from the ACTUAL on-disk bytes (Hadoop FS listing — no data
  * scan), not a row-count guess, so compressed/encoded width is accounted
  * for. The rewrite is one round-robin `repartition(n)` — a full shuffle by
  * design: `coalesce(n)` would skip the shuffle but chain upstream
  * parallelism down to `n` tasks AND preserve input skew, producing files
  * as lopsided as the inputs.
  */
object Compaction {

  final case class FileStats(nFiles: Long, totalBytes: Long, minBytes: Long,
      maxBytes: Long)

  /** Data-file size stats for a directory (zero Spark jobs — driver-side
    * file listing only; `_SUCCESS`/metadata files excluded). */
  def fileStats(spark: SparkSession, dir: String): FileStats = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    if (files.isEmpty) FileStats(0, 0, 0, 0)
    else FileStats(files.length, files.map(_.getLen).sum,
      files.map(_.getLen).min, files.map(_.getLen).max)
  }

  /** Rewrite `inDir` (parquet) into `outDir` as ≈`targetFileBytes` files.
    * Returns (input stats, output stats). Compression ratios differ per
    * rewrite (row groups re-form), so actual output sizes approximate the
    * target; the FILE COUNT is exact: `ceil(totalBytes / targetFileBytes)`. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): (FileStats, FileStats) = {
    require(targetFileBytes > 0)
    val in = fileStats(spark, inDir)
    val n = math.max(1L, (in.totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    (in, fileStats(spark, outDir))
  }
}
