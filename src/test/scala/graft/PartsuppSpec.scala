package graft

import org.apache.spark.sql.functions._

/** Invariants of the DERIVED partsupp relation (`Tables.partsupp`) — the
  * one TPC-H table the fixtures do not ship, reconstructed identically by
  * the engine and the DuckDB oracle CTE (`SparkEntry.psCte`). The four
  * consuming queries (`q2_min_cost_supplier`, `q11_important_stock`,
  * `q16_supplier_cnt`, `q20_excess_stock`) hash-match end to end; this
  * spec pins the relational invariants those shapes assume.
  */
class PartsuppSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partsupp: 4 distinct suppliers per part, all keys in range") {
    val ps = graft.sources.Tables.partsupp(spark, dir).cache()
    try {
      val nPart = graft.sources.Tables.load(spark, dir, "part").count()
      val nSupp = graft.sources.Tables.load(spark, dir, "supplier").count()
      assert(ps.count() === nPart * 4)
      // (ps_partkey, ps_suppkey) is a primary key: the rotation keeps the
      // 4 per-part suppkeys distinct for any supplier count >= 4
      assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() === nPart * 4)
      val r = ps.agg(min("ps_suppkey"), max("ps_suppkey"),
        min("ps_availqty"), max("ps_availqty"),
        min("ps_supplycost"), max("ps_supplycost")).head
      assert(r.getLong(0) >= 0 && r.getLong(1) < nSupp)
      assert(r.getLong(2) >= 1 && r.getLong(3) <= 9999)
      assert(r.getDouble(4) >= 1.0 && r.getDouble(5) <= 200.99 + 1e-9)
      // every suppkey referenced actually exists in supplier
      val orphans = ps.join(
        graft.sources.Tables.load(spark, dir, "supplier"),
        col("ps_suppkey") === col("s_suppkey"), "left_anti").count()
      assert(orphans === 0L)
    } finally ps.unpersist()
  }

  test("the TPC-H partsupp queries keep every dimension join broadcast") {
    // the claim in SparkEntry: partsupp is the ONLY shuffled side — every
    // region/nation/supplier/part join is a broadcast hash join, so no
    // sort-merge exchange appears anywhere in the four plans
    for (q <- Seq("q2_min_cost_supplier", "q11_important_stock",
        "q16_supplier_cnt", "q20_excess_stock")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q: dimension join fell back to sort-merge:\n$plan")
    }
  }

  test("q9 keeps every dimension side broadcast; only orders may shuffle") {
    // Q9's selective composite-key join (lineitem -> red partsupp) plus the
    // supplier/nation dims are all broadcast; the single permissible keyed
    // exchange is survivors -> orders (which AQE may also broadcast at
    // small SF, hence <= 1 rather than == 1)
    val plan = SparkEntry.queries("q9_product_profit")(spark, dir)
      .queryExecution.executedPlan.toString
    val nSmj = "SortMergeJoin".r.findAllIn(plan).length
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nSmj <= 1, s"q9: ${nSmj} sort-merge joins (only orders may shuffle):\n$plan")
    assert(nBhj >= 4, s"q9: expected >=4 broadcast joins, saw $nBhj:\n$plan")
  }

  test("partsupp derivation is deterministic across evaluations") {
    val a = graft.sources.Tables.partsupp(spark, dir)
    val b = graft.sources.Tables.partsupp(spark, dir)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }
}
