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

  test("kCorePeel early exit: converged graph stops after one probe sweep") {
    val s = spark
    import s.implicits._
    // a triangle is already its own 2-core: the first sweep removes
    // nothing, so the fixpoint probe must stop the loop — rounds = 500
    // would otherwise run 500 sweeps (~4 jobs each). Count Spark jobs to
    // prove the exit fired.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Graph.kCorePeel(tri, "src", "dst", k = 2, rounds = 500)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
      Thread.sleep(500) // let the async listener bus drain
      // canonicalize + initial count + 1 sweep + probe counts + collect:
      // far under even 2 rounds' worth of 500
      assert(jobs.get() < 40, s"early exit did not fire: ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("kCorePeel early exit: result identical to the fixed-round run") {
    val s = spark
    import s.implicits._
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val edges = (k4 :+ ((4L, 99L))).toDF("src", "dst")
    val few = Graph.kCorePeel(edges, "src", "dst", k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.kCorePeel(edges, "src", "dst", k = 3, rounds = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(few == many)
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
