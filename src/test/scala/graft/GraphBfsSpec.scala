package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphBfsSpec extends SparkSpec {
  import spark.implicits._

  // path 0-1-2-3, branch 1-4, island 9-10 (directed both ways = undirected)
  private def edges = {
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L), (9L, 10L))
    (und ++ und.map(_.swap)).toDF("u", "v")
  }

  test("bfsHops: exact min-hop levels on a hand-built graph") {
    val got = Graph.bfsHops(edges, "u", "v", source = 0L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 4L -> 2, 3L -> 3))
    // island never reached
    assert(!got.contains(9L) && !got.contains(10L))
  }

  test("bfsHops: maxHops truncates levels; shortest path wins over longer routes") {
    val got = Graph.bfsHops(edges, "u", "v", source = 0L, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 4L -> 2))
    // cycle 0-1-2-0 added: node 2 must stay at hop 1 via the direct edge
    val cyc = edges.union(Seq((0L, 2L), (2L, 0L)).toDF("u", "v"))
    val got2 = Graph.bfsHops(cyc, "u", "v", source = 0L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2(2L) === 1 && got2(3L) === 2)
  }

  test("bfsHops: source outside the graph yields just the source at hop 0") {
    val got = Graph.bfsHops(edges, "u", "v", source = 42L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(42L -> 0))
  }
}
