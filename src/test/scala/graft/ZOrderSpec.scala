package graft

import org.apache.spark.sql.functions._

/** Quantified data-skipping win of the z-order layout: file-level
  * min/max footer ranges under `Bucketing.writeZOrdered` prune a
  * two-dimensional selection that a linear sort cannot. (Morton-pair
  * correctness and per-file rectangle bounds: `Round3OperatorsSpec`;
  * cross-engine key algebra: the `q_zorder` DuckDB oracle.)
  */
class ZOrderSpec extends SparkSpec {

  test("z-clustered files prune a y-band query that an x-sort cannot") {
    // 40k points uniform on a 1024x1024 grid; y decorrelated from x
    val pts = spark.range(40000).select(
      (col("id") % 1024).as("x"),
      pmod(hash(col("id")), lit(1024)).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val nFiles = 32

    pts.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    graft.sources.Bucketing.writeZOrdered(pts, s"$base/zorder", "x", "y", nFiles)

    // file-level footer ranges: which files could a reader skip for a
    // 32-wide y band (3% of the domain)?
    def filesIntersecting(dir: String, lo: Long, hi: Long): Int = {
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      parts.count { p =>
        val r = spark.read.parquet(p).agg(min("y"), max("y")).head
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val linearHit = filesIntersecting(s"$base/linear", 100, 131)
    val zHit = filesIntersecting(s"$base/zorder", 100, 131)
    // linear x-sort: y is uniform inside every file -> nothing skippable
    assert(linearHit === nFiles, s"x-sorted layout should be unprunable on y: $linearHit")
    // z-order: each file covers a compact rectangle union -> most skipped
    assert(zHit <= nFiles / 3,
      s"z-layout should skip most files for a 3% y-band: hit $zHit of $nFiles")
  }
}
