package graft

import org.apache.spark.sql.functions._
import graft.core.Checkpoints
import graft.operators.Graph

class CheckpointSpec extends SparkSpec {

  private def withConf[T](dir: String)(body: => T): T =
    try { spark.conf.set(Checkpoints.ConfKey, dir); body }
    finally spark.conf.unset(Checkpoints.ConfKey)

  test("one conf flips every iterative op to reliable checkpoints, results unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val edges = (0 until 600).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .toDF("src", "dst")
    def all() = (
      graft.dedup.Dedup.connectedComponents(edges, "src", "dst")
        .orderBy("node").collect().toSeq,
      Graph.pageRank(edges, "src", "dst", iters = 5)
        .orderBy("node").collect().toSeq,
      Graph.kCorePeel(edges, "src", "dst", k = 3, rounds = 4)
        .orderBy("node").collect().toSeq)
    val local = all() // default path: localCheckpoint
    val dir = "/tmp/graft_ckpt_spec"
    val (cc, pr, kc) = withConf(dir)(all())
    assert((cc, pr, kc) === local, "reliable-checkpoint run must equal local run")
    // the reliable path actually wrote RDD checkpoints into the conf dir
    val files = new java.io.File(dir)
    def count(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(count).sum else 1
    assert(files.exists && count(files) > 0, s"no checkpoint data under $dir")
  }

  test("truncate cuts lineage in both modes (no growth across iterations)") {
    import spark.implicits._
    var df = (1 to 100).toDF("x")
    (1 to 5).foreach { _ =>
      df = Checkpoints.truncate(df.withColumn("x", col("x") + 1))
    }
    // a truncated frame plans as a scan of materialized rows, not 5
    // stacked projections
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      s"expected materialized scan after truncation:\n$plan")
    assert(df.agg(sum("x")).head().getLong(0) === (6 to 105).sum.toLong)
  }
}
