package graft.checks

import graft.SparkSpec
import graft.core._

/** 1:1 port of `/root/reference/tests/checks/test_unique_check.py` (fixture
  * A1 in FIXTURES.md), plus specs for the D2 schema-preserving invalid. */
class UniqueCheckSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "c")).toDF("id", "name")
  }

  private def check(attrs: Seq[String]) = new UniqueCheck(
    dataset = "t", runId = "r", severityLevel = SeverityLevel.High,
    metricName = "uniq", inputAttributes = attrs)

  test("valid deduplicates by key: keys {1,2}") {
    val out = check(Seq("id")).valid(fixture, Seq("id"))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(out.count() == 2)
  }

  test("invalidGroups returns duplicate groups {(1,2),(2,2)} with schema keys+count") {
    val out = check(Seq("id")).invalidGroups(fixture, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "count"))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 2L)))
  }

  test("invalid (D2 default) is schema-preserving: all 4 rows belong to dup keys") {
    val out = check(Seq("id")).invalid(fixture, Seq("id"))
    assert(out.columns.toSeq == fixture.columns.toSeq)
    assert(out.count() == 4)
    // no dupes on (id,name) pair for (2,b)/(2,c)? keys are id only: both dup
    val uniqueByPair = check(Seq("id", "name")).invalid(fixture, Seq("id", "name"))
    assert(uniqueByPair.collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a")))
  }

  test("missing configured column raises ColumnNotFoundException") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(1L)).toDF("id")
    val c = check(Seq("id", "missing_col"))
    intercept[ColumnNotFoundException] { c.valid(df, Seq("id", "missing_col")) }
    intercept[ColumnNotFoundException] { c.metricResults(df) }
  }

  test("metric (D1 fix of B3): real distinct ratio countDistinct/count") {
    val ms = check(Seq("id")).metricResults(fixture)
    assert(ms.size == 1)
    val m = ms.head
    assert(m.dimension == "uniqueness") // D1 fix of B5
    assert(m.valueDouble.contains(0.5)) // 2 distinct / 4 rows
    assert(m.extraInfo("distinct_count") == "2")
  }
}
