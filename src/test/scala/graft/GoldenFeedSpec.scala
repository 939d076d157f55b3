package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Golden-record survivorship and change-feed generation. */
class GoldenFeedSpec extends SparkSpec {

  test("goldenRecord takes each field's latest NON-NULL value independently") {
    val s = spark
    import s.implicits._
    val recs = Seq(
      // k1: newer record (seq 3) carries only email; phone survives from seq 1
      ("k1", 1L, Some("old@x"), Some("111")),
      ("k1", 2L, None: Option[String], Some("222")),
      ("k1", 3L, Some("new@x"), None: Option[String]),
      // k2: all-null field stays null
      ("k2", 1L, None: Option[String], None: Option[String]),
      ("k2", 2L, Some("e@y"), None: Option[String])
    ).toDF("k", "seq", "email", "phone")
    val out = Merge.goldenRecord(recs, Seq("k"), "seq", Seq("email", "phone"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(out("k1") == (3L, Some("new@x"), Some("222")))
    assert(out("k2") == (2L, Some("e@y"), None))
  }

  test("toChangelog roundtrip: prev patched with the feed reproduces next") {
    val s = spark
    import s.implicits._
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val next = Seq((1L, "a", 10.0),          // unchanged
      (2L, "b", 25.0),                        // value update
      (4L, "x", 40.0),                        // status update
      (5L, "e", 50.0))                        // insert; 3 deleted
      .toDF("k", "s", "v")
    val ops = Merge.toChangelog(prev, next, Seq("k"), Seq("s", "v"))
    val byOp = ops.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byOp == Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"))
    // patch law
    val touched = ops.select("k")
    val patched = prev.join(touched, Seq("k"), "left_anti")
      .unionByName(ops.filter(col("op") =!= "D").select("k", "s", "v"))
    assert(patched.exceptAll(next).isEmpty && next.exceptAll(patched).isEmpty)
  }

  test("randomized: toChangelog patch law holds on arbitrary snapshot pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      def snap() = (1 to 200).flatMap { k =>
        if (rnd.nextInt(4) == 0) None
        else Some((k.toLong, s"s${rnd.nextInt(3)}", rnd.nextInt(50).toDouble))
      }.toDF("k", "s", "v")
      val prev = snap(); val next = snap()
      val ops = Merge.toChangelog(prev, next, Seq("k"), Seq("s", "v"))
      val patched = prev.join(ops.select("k"), Seq("k"), "left_anti")
        .unionByName(ops.filter(col("op") =!= "D").select("k", "s", "v"))
      assert(patched.exceptAll(next).isEmpty && next.exceptAll(patched).isEmpty)
    }
  }

  test("randomized: bucketDigests flags exactly the buckets of mutated keys") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val a = (1 to 500).map(i => (i.toLong, s"v${i % 11}", i * 3L)).toDF("id", "s", "n")
    (1 to 3).foreach { _ =>
      val victim = 1L + rnd.nextInt(500)
      val b = a.withColumn("n", when(col("id") === victim, col("n") + 1).otherwise(col("n")))
      val diff = graft.operators.Reconcile.digestDiff(
        graft.operators.Reconcile.bucketDigests(a, Seq("id"), Seq("s", "n"), 32),
        graft.operators.Reconcile.bucketDigests(b, Seq("id"), Seq("s", "n"), 32)).collect()
      val victimBucket = graft.operators.Reconcile
        .bucketDigests(a.filter(col("id") === victim), Seq("id"), Seq("s", "n"), 32)
        .collect().head.getLong(0)
      assert(diff.map(_.getLong(0)).toSeq == Seq(victimBucket))
      assert(diff.head.getLong(1) == diff.head.getLong(2)) // counts agree, digests differ
    }
  }

  test("toChangelog: identical snapshots emit an empty feed; null transitions are changes") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, Some("x")), (2L, None: Option[String])).toDF("k", "s")
    assert(Merge.toChangelog(a, a, Seq("k"), Seq("s")).isEmpty)
    val b = Seq((1L, None: Option[String]), (2L, Some("y"))).toDF("k", "s")
    val ops = Merge.toChangelog(a, b, Seq("k"), Seq("s"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(ops(1L) == ("U", None) && ops(2L) == ("U", Some("y")))
  }
}
