package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing
import graft.operators.SkewAgg

class BucketingSpec extends SparkSpec {

  test("bucketed join runs with zero shuffle exchanges and matches plain join") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(l, "b_lineitem", Seq("o_orderkey"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = l.join(o, "o_orderkey")
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned write prunes directories on partition-key filters") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = "/tmp/graft_part_docs"
    Bucketing.writePartitioned(docs, path, Seq("source"))
    val back = Bucketing.readPartitioned(spark, path)
    val filtered = back.filter(col("source") === "src1")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("src1"),
      s"expected partition pruning in:\n$scan")
    // pruned read returns exactly the partition's rows, none lost
    val expected = docs.filter(col("source") === "src1")
    assert(filtered.count() == expected.count() && expected.count() > 0)
    // partition column round-trips (moved to directory, restored on read)
    assert(back.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    assert(back.count() == docs.count())
  }

  test("salted two-stage aggregation equals plain groupBy") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = SkewAgg.aggBySalt(li, Seq("l_returnflag"),
      Seq(("count", "*"), ("sum", "l_quantity"), ("min", "l_extendedprice"), ("max", "l_extendedprice")))
    val plain = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("count_rows"), sum("l_quantity").as("sum_l_quantity"),
      min("l_extendedprice").as("min_l_extendedprice"), max("l_extendedprice").as("max_l_extendedprice"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
