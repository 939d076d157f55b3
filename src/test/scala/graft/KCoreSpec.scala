package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class KCoreSpec extends SparkSpec {

  test("kCorePeel: K4 plus a pendant — the 3-core is exactly the K4") {
    val s = spark
    import s.implicits._
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val edges = (k4 :+ ((4L, 99L))).toDF("src", "dst") // 99 is a pendant
    val out = Graph.kCorePeel(edges, "src", "dst", k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCorePeel: a path graph has no 2-core; a cycle IS its own 2-core") {
    val s = spark
    import s.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    // endpoints peel first, then the cascade eats the whole path
    assert(Graph.kCorePeel(path, "src", "dst", k = 2, rounds = 4).isEmpty)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = Graph.kCorePeel(cycle, "src", "dst", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("kCorePeel truncation is well-defined: one round = one synchronized sweep") {
    val s = spark
    import s.implicits._
    // long path: each round peels exactly the current endpoints
    val path = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("src", "dst")
    val after1 = Graph.kCorePeel(path, "src", "dst", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).sorted
    assert(after1.toSeq == Seq(2L, 3L, 4L, 5L)) // 1 and 6 peeled
    val after2 = Graph.kCorePeel(path, "src", "dst", k = 2, rounds = 2)
      .collect().map(_.getLong(0)).sorted
    assert(after2.toSeq == Seq(3L, 4L)) // next endpoints gone
  }
}
