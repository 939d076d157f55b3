package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("scd2Merge: every row fate — untouched, no-op, closed+new, insert, history") {
    val current = Seq(
      (1L, Some(10.0), 1, false), // prior version (history) of key 1
      (1L, Some(20.0), 2, true),  // open, will be CHANGED
      (2L, Some(30.0), 1, true),  // open, no update
      (3L, Some(40.0), 1, true),  // open, NO-OP update (same value)
      (4L, None: Option[Double], 1, true) // open, null -> value change
    ).toDF("k", "v", "version", "is_current")
    val updates = Seq(
      (1L, 25.0),                                   // change
      (3L, 40.0),                                   // no-op
      (4L, 44.0),                                   // null -> 44 (null-safe change)
      (9L, 99.0)                                    // brand-new key
    ).toDF("k", "v")
    val out = Merge.scd2Merge(current, updates, Seq("k"), Seq("v"), newVersion = 3)
      .select($"k", $"v", $"version", $"is_current")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, Some(10.0), 1, false),  // history passes through
      (1L, Some(20.0), 2, false),  // closed
      (1L, Some(25.0), 3, true),   // new version
      (2L, Some(30.0), 1, true),   // untouched
      (3L, Some(40.0), 1, true),   // no-op: row kept open, nothing appended
      (4L, None, 1, false),        // null-safe change: closed
      (4L, Some(44.0), 3, true),
      (9L, Some(99.0), 3, true)    // insert
    ))
  }

  test("latestByKey compacts a change log to one deterministic row per key") {
    val log = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 20L, "c", 3L), // ts tie -> higher seq wins
      (2L, 5L, "x", 4L)
    ).toDF("k", "ts", "v", "seq")
    val out = Merge.latestByKey(log, Seq("k"), "ts", "seq")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "c"), (2L, "x")))
    val again = Merge.latestByKey(log.repartition(5), Seq("k"), "ts", "seq")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out)
  }

  test("scd2Merge keeps exactly one open row per key and is idempotent for no-ops") {
    val current = (1L to 50L).map(k => (k, k * 1.0, 1, true)).toDF("k", "v", "version", "is_current")
    val updates = (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v") // all no-ops
    val merged = Merge.scd2Merge(current, updates, Seq("k"), Seq("v"), 2)
    assert(merged.count() == 50)
    assert(merged.filter($"is_current").groupBy("k").count().filter($"count" > 1).count() == 0)
    assert(merged.exceptAll(current).isEmpty)
  }
}
