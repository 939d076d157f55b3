package graft

import graft.operators.Graph

/** Deterministic synchronous label propagation. */
class LabelPropagationSpec extends SparkSpec {

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle converges to the minimum label and stays there") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    // sweep 1: 1 ties {2,3}->2; 2,3 see label 1 -> (2,1,1)
    assert(lpa(tri, 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // sweep 2: everyone majority-sees 1 -> converged
    assert(lpa(tri, 2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(lpa(tri, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("synchronous sweeps on a path 2-cycle deterministically") {
    val path = Seq((1L, 2L), (2L, 3L))
    assert(lpa(path, 2) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(lpa(path, 3) === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("disconnected components keep separate labels") {
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val r = lpa(two, 3)
    assert(r.filter(_._1 < 10L).values.toSet === Set(1L))
    assert(r.filter(_._1 >= 10L).values.toSet === Set(10L))
  }
}
