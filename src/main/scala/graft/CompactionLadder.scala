package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Multi-day catalog-compaction ladder (VERDICT r10 item 7): the round-10
  * compaction story was spec'd at 2-3 day states; a standing pipeline
  * compacts ~30. This measures, at a given corpus dir (run at sf0.1 and
  * the sf1 replica):
  *
  *  1. writing 30 bucketed day states (the daily cost, amortized once);
  *  2. FLAT compaction — all 30 states through ONE
  *     [[Dedup.dedupCatalogMerge]] (one union + one keyed aggregation,
  *     the designed shape);
  *  3. TREE compaction — 6 groups of 5 then a merge of 6 (two levels,
  *     per-level cost; the monoid laws make the results identical,
  *     asserted);
  *  4. probe latency — [[Dedup.dedupCatalogFlag]] of a fresh batch
  *     against the COMPACTED bucketed table vs the UNCOMPACTED view
  *     (merge of all 30 day tables computed inline) — the number that
  *     justifies compacting at all;
  *  5. the cost of the Spark-4.1.2 union-of-bucketed-scans workaround
  *     (see [[Dedup.dedupCatalogMerge]]'s scaladoc): the correct merge
  *     (with its forced exchange) timed against the elided-exchange plan
  *     (whose RESULT is wrong — it exists here only to price the
  *     exchange), so the day the upstream bug is fixed the reclaimable
  *     win is already quantified.
  *
  * Methodology matches [[Bench]]: warm-up + 3 timed runs, medians,
  * `toRdd.count` materialization. One JSON line at the end. */
object CompactionLadder {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def median3(body: => Unit): Double = {
    body // warm-up
    val ts = (1 to 3).map { _ => timed(body)._2 }
    ts.sorted.apply(1)
  }

  private def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val days = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def d2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .filter(col("text").isNotNull)
    // the last "day" is the probe batch; days 0..days-1 are the state
    val dayTables = (0 until days).map(d => s"graft_cmpl_d$d")
    try {
      // 1) daily writes
      val (_, tWrite) = timed {
        (0 until days).foreach { d =>
          Dedup.dedupCatalogWrite(
            Dedup.dedupCatalogOfBatch(
              docs.filter(pmod(col("doc_id"), lit(days + 1)) === d),
              "doc_id", "text", d.toLong),
            dayTables(d))
        }
      }
      // 2) flat compaction: one merge of 30
      val (_, tFlat) = timed {
        Dedup.dedupCatalogCompact(spark, dayTables, "graft_cmpl_flat")
      }
      // 3) tree compaction: 6 groups of 5, then merge of 6
      val groups = dayTables.grouped(5).toSeq
      val (_, tLevel1) = timed {
        groups.zipWithIndex.foreach { case (g, i) =>
          Dedup.dedupCatalogCompact(spark, g, s"graft_cmpl_l1_$i")
        }
      }
      val (_, tLevel2) = timed {
        Dedup.dedupCatalogCompact(spark,
          groups.indices.map(i => s"graft_cmpl_l1_$i"), "graft_cmpl_tree")
      }
      // monoid law: tree == flat, row for row
      val flat = spark.table("graft_cmpl_flat")
      val tree = spark.table("graft_cmpl_tree")
      require(tree.exceptAll(flat).isEmpty && flat.exceptAll(tree).isEmpty,
        "tree compaction diverged from flat merge")
      val stateRows = flat.count()

      // 4) probe latency: compacted table vs uncompacted inline merge
      val probe = docs.filter(pmod(col("doc_id"), lit(days + 1)) === days)
      val tProbeCompacted = median3 {
        run(Dedup.dedupCatalogFlag(spark.table("graft_cmpl_flat"),
          probe, "doc_id", "text"))
      }
      val tProbeUncompacted = median3 {
        run(Dedup.dedupCatalogFlag(
          Dedup.dedupCatalogMerge(dayTables.map(spark.table): _*),
          probe, "doc_id", "text"))
      }

      // 5) price of the upstream-bug workaround: correct merge (forced
      // exchange) vs the elided-exchange aggregation (WRONG result — the
      // Spark 4.1.2 bug; timed only to quantify the reclaimable win)
      val tMergeCorrect = median3 {
        run(Dedup.dedupCatalogMerge(dayTables.map(spark.table): _*))
      }
      val buggy = dayTables.map(spark.table).reduce(_ unionByName _)
        .groupBy("fingerprint").agg(
          min(struct(col("first_batch"), col("first_id"))).as("__f"),
          sum(col("n_seen")).as("n_seen"))
      val tMergeElided = median3 { run(buggy) }

      println(s"""{"metric":"compaction_ladder","sf":"$srcDir","days":$days,""" +
        s""""state_rows":$stateRows,"write_30_days_s":${d2(tWrite)},""" +
        s""""flat_compact_s":${d2(tFlat)},"tree_l1_s":${d2(tLevel1)},""" +
        s""""tree_l2_s":${d2(tLevel2)},""" +
        s""""probe_compacted_s":${d2(tProbeCompacted)},""" +
        s""""probe_uncompacted_s":${d2(tProbeUncompacted)},""" +
        s""""merge_correct_s":${d2(tMergeCorrect)},""" +
        s""""merge_elided_wrong_s":${d2(tMergeElided)}}""")
    } finally {
      (dayTables ++ Seq("graft_cmpl_flat", "graft_cmpl_tree") ++
        (0 until (days + 4) / 5).map(i => s"graft_cmpl_l1_$i"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
    }
  }
}
