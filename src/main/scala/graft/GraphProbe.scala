package graft

import org.apache.spark.sql.functions._

/** Dev-only stage timer for the graph pipeline (not part of the contract). */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    (1 to 2).foreach { round =>
      println(s"[probe] --- round $round ---")
      val edges = graft.operators.Graph.cooccurrenceEdges(li, "l_orderkey", "l_partkey")
      time("cooccurrenceEdges count")(edges.queryExecution.toRdd.count())
      val canon = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("canon cache")(canon.queryExecution.toRdd.count())
      val deg = graft.operators.Graph.degrees(canon)
      time("degrees")(deg.queryExecution.toRdd.count())
      val ranked = deg.select(col("node"), struct(col("degree"), col("node")).as("rank"))
      val oriented = canon
        .join(ranked.withColumnRenamed("node", "a").withColumnRenamed("rank", "ra"), "a")
        .join(ranked.withColumnRenamed("node", "b").withColumnRenamed("rank", "rb"), "b")
        .select(
          when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
          when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("oriented cache")(oriented.queryExecution.toRdd.count())
      val adj = broadcast(oriented.groupBy(col("u").as("node"))
        .agg(array_sort(collect_list(col("v").cast("long"))).as("nbrs")))
      val empty = array().cast("array<long>")
      val tri = oriented
        .join(adj.select(col("node").as("u"), col("nbrs").as("nu")), Seq("u"), "left")
        .join(adj.select(col("node").as("v"), col("nbrs").as("nv")), Seq("v"), "left")
        .select(graft.functions.sorted_intersection_count(
          coalesce(col("nu"), empty), coalesce(col("nv"), empty)).as("t"))
        .agg(sum("t").cast("long").as("n_triangles"))
      time("intersect+agg")(tri.queryExecution.toRdd.count())
      canon.unpersist(); oriented.unpersist()
    }
    // PageRank iteration plan: verify the O(E) side joins broadcast ranks
    // and aggregates WITHOUT a fresh Exchange (cached edges pre-partitioned
    // on v)
    locally {
      val und = graft.operators.Graph.cooccurrenceEdges(li, "l_orderkey", "l_partkey")
      val sym = und.select(col("a").as("u"), col("b").as("v"))
        .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      val e = sym.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = e.groupBy(col("u").as("src")).agg(count(lit(1)).as("outdeg")).localCheckpoint()
      val nodes = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .distinct().localCheckpoint()
      val eo = e.repartition(col("v")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      eo.queryExecution.toRdd.count()
      val ranks = nodes.withColumn("rank", lit(1000000L)).localCheckpoint()
      val shares = ranks.join(out, ranks("node") === out("src"))
        .select(col("src"), expr("rank div outdeg").as("share"))
      val updated = eo.join(broadcast(shares), eo("u") === shares("src"))
        .select(col("v").as("node"), col("share").as("c"))
        .groupBy("node").agg(sum("c").as("cs"))
      println("[probe] ---- one PageRank iteration plan ----")
      updated.explain("formatted")
      e.unpersist(); eo.unpersist()
    }
    spark.stop()
  }
}
