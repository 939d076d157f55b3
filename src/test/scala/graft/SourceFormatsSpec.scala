package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format robustness: the engine's checks are format-agnostic —
  * any `DataFrame` works — so prove the non-parquet read paths produce
  * check-identical inputs (SURVEY §2b lists only in-memory + parquet
  * sources in the reference). */
class SourceFormatsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("JSON-lines round-trip feeds checks identically to parquet") {
    val path = "/tmp/graft_docs_json"
    docs.write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // explicit schema: no inference scan, columns typed exactly as parquet
    val back = spark.read.schema(schema).json(path)
      .select(docs.columns.map(col).toSeq: _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    val c = new graft.checks.CompletenessColRatioCheck("documents", "r",
      graft.core.SeverityLevel.High, "cr", Seq("text", "lang"), 0.9)
    assert(c.metricResults(back).map(_.valueDouble) == c.metricResults(docs).map(_.valueDouble))
  }

  test("ORC round-trip feeds checks identically to parquet") {
    val path = "/tmp/graft_docs_orc"
    docs.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path).select(docs.columns.map(col).toSeq: _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan too
    val plan = back.filter(col("n_chars") > 100).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"), plan)
  }

  test("schemaDiff reports added/removed/retyped columns, omits unchanged") {
    import spark.implicits._
    val prev = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val next = Seq((1L, 2, "x")).toDF("id", "score", "tag")
    val got = graft.operators.Profiler.schemaDiff(prev, next)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(got === Map("name" -> "removed", "score" -> "retyped", "tag" -> "added"))
  }

  test("CSV round-trip with explicit schema preserves check inputs") {
    val path = "/tmp/graft_cust_csv"
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    cust.write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(path)
    assert(back.exceptAll(cust).isEmpty && cust.exceptAll(back).isEmpty)
  }

  test("mergeSchema unions parquet files with evolved schemas") {
    val path = "/tmp/graft_evolved"
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "x").write.mode("overwrite").parquet(s"$path/v1")
    Seq((2L, "b", 9.5)).toDF("id", "x", "score").write.mode("overwrite").parquet(s"$path/v2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/v1", s"$path/v2")
    assert(merged.columns.toSet == Set("id", "x", "score"))
    assert(merged.count() == 2)
    // old-file rows surface the new column as null — completeness checks see it
    assert(merged.filter(col("score").isNull).count() == 1)
  }

  test("corrupt JSON rows parse to null structs without failing the job (PERMISSIVE)") {
    val s = spark
    import s.implicits._
    val raw = Seq("""{"k": 1}""", """{"k": broken""", """{"k": 3}""", "not json")
      .toDF("props")
    val parsed = raw.select(from_json(col("props"),
      StructType(Seq(StructField("k", LongType)))).as("p"))
    // PERMISSIVE (default): corrupt rows yield a struct of nulls, not a crash
    assert(parsed.count() == 4)
    assert(parsed.filter(col("p.k").isNotNull).count() == 2)
    assert(parsed.filter(col("p.k").isNull).count() == 2)
  }
}
