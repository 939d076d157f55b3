package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.core._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry drives the real library surface (check classes / manager /
  * operators), not ad-hoc DataFrame code; `oracleSql` is the DuckDB-runnable
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val SEV = SeverityLevel.High

  /** Deterministic projection of metric rows (drops run/ingest timestamps). */
  private def metricsDf(spark: SparkSession, ms: Seq[MetricResult]): DataFrame =
    MetricResult.toDF(spark, ms)
      .select("metric_name", "column", "dimension", "severity_level", "threshold", "value_double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full manager flow: 3 checks over lineitem, fused single-job metrics. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val mgr = new DQManager(spark, "lineitem")
    mgr.setData(li)
    mgr.addCheck(new CompletenessColRatioCheck("lineitem", "entry", SEV,
      "completeness_ratio", Seq("l_shipdate", "l_returnflag", "l_quantity"), 0.95))
    mgr.addCheck(new CompletenessRawRatioCheck("lineitem", "entry", SEV,
      "raw_completeness", Seq("l_shipdate", "l_returnflag"), 0.95))
    mgr.addCheck(new UniqueCheck("lineitem", "entry", SEV,
      "uniqueness", Seq("l_orderkey")))
    mgr.run().getMetricResults
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- completeness (SURVEY §2a: CompletenessColRatioRule) ---
    "q_completeness_ratio" -> ((s, dir) => {
      val c = new CompletenessColRatioCheck("lineitem", "r1", SEV, "cr",
        Seq("l_shipdate", "l_returnflag", "l_quantity"), 0.95)
      metricsDf(s, c.metricResults(t(s, dir, "lineitem")))
        .select("column", "value_double").orderBy("column")
    }),
    "q_completeness_valid" -> ((s, dir) => {
      val c = new CompletenessColRatioCheck("customer", "r1", SEV, "cv",
        Seq("c_name", "c_acctbal", "c_mktsegment"), 0.95)
      c.valid(t(s, dir, "customer")).orderBy("c_custkey")
    }),
    "q_completeness_invalid" -> ((s, dir) => {
      val c = new CompletenessColRatioCheck("customer", "r1", SEV, "ci",
        Seq("c_name", "c_acctbal"), 0.95)
      c.invalid(t(s, dir, "customer")).orderBy("c_custkey")
    }),
    "q_completeness_raw" -> ((s, dir) => {
      val c = new CompletenessRawRatioCheck("lineitem", "r1", SEV, "raw",
        Seq("l_shipdate", "l_returnflag", "l_quantity"), 0.95)
      metricsDf(s, c.metricResults(t(s, dir, "lineitem")))
        .select("metric_name", "value_double")
    }),
    // --- uniqueness (SURVEY §2a: UniqueCheck; D1/D2 semantics) ---
    "q_unique_valid_keys" -> ((s, dir) => {
      val c = new UniqueCheck("lineitem", "r1", SEV, "uq", Seq("l_orderkey"))
      c.valid(t(s, dir, "lineitem")).select("l_orderkey").orderBy("l_orderkey")
    }),
    "q_unique_invalid_groups" -> ((s, dir) => {
      val c = new UniqueCheck("lineitem", "r1", SEV, "uq", Seq("l_orderkey"))
      c.invalidGroups(t(s, dir, "lineitem")).withColumnRenamed("count", "cnt")
        .orderBy("l_orderkey")
    }),
    "q_unique_invalid_rows" -> ((s, dir) => {
      // D2 schema-preserving invalid: full rows whose key is duplicated
      val c = new UniqueCheck("orders", "r1", SEV, "uq", Seq("o_custkey"))
      c.invalid(t(s, dir, "orders"), Seq("o_custkey")).orderBy("o_orderkey")
    }),
    "q_unique_metric" -> ((s, dir) => {
      val c = new UniqueCheck("lineitem", "r1", SEV, "uqm",
        Seq("l_orderkey", "l_partkey"))
      metricsDf(s, c.metricResults(t(s, dir, "lineitem")))
        .select("column", "value_double").orderBy("column")
    }),
    // --- validity / accuracy (extended dimensions) ---
    "q_validity_invalid" -> ((s, dir) => {
      val c = new ValidityCheck("lineitem", "r1", SEV, "qty_range",
        col("l_quantity") <= 45.0 && col("l_discount").between(0.0, 0.5), 0.9)
      c.invalid(t(s, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q_accuracy_metric" -> ((s, dir) => {
      val c = new AccuracyCheck("lineitem", "r1", SEV, "price_positive",
        col("l_extendedprice") > 0.0 && col("l_tax") >= 0.0, 1.0)
      metricsDf(s, c.metricResults(t(s, dir, "lineitem")))
        .select("metric_name", "value_double")
    }),
    // --- consistency (cross-dataset FK; anti/semi join) ---
    "q_consistency_metric" -> ((s, dir) => {
      val c = new ConsistencyCheck("orders", "r1", SEV, "fk_custkey",
        Seq("o_custkey"), t(s, dir, "customer"), Seq("c_custkey"))
      metricsDf(s, c.metricResults(t(s, dir, "orders")))
        .select("metric_name", "value_double")
    }),
    "q_consistency_orphans" -> ((s, dir) => {
      val c = new ConsistencyCheck("lineitem", "r1", SEV, "fk_orderkey",
        Seq("l_orderkey"), t(s, dir, "orders"), Seq("o_orderkey"))
      c.invalid(t(s, dir, "lineitem")).select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // --- freshness (max-ts aggregate; deterministic fixed anchor) ---
    "q_freshness_metric" -> ((s, dir) => {
      val anchor = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
      val c = new FreshnessCheck("orders", "r1", SEV, "fresh", "o_orderdate",
        FreshnessPeriod.Day, 30.0, anchor = Some(anchor))
      metricsDf(s, c.metricResults(t(s, dir, "orders")))
        .select("metric_name", "value_double")
    }),
    // --- full manager report (fused single-job metrics across checks) ---
    "q_dq_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val mgr = new DQManager(s, "lineitem")
      mgr.setData(li)
      mgr.addCheck(new CompletenessColRatioCheck("lineitem", "r1", SEV,
        "completeness_ratio", Seq("l_shipdate", "l_returnflag", "l_quantity"), 0.95))
      mgr.addCheck(new CompletenessRawRatioCheck("lineitem", "r1", SeverityLevel.Medium,
        "raw_completeness", Seq("l_shipdate", "l_returnflag"), 0.95))
      mgr.addCheck(new UniqueCheck("lineitem", "r1", SeverityLevel.Low,
        "uniqueness_ratio", Seq("l_orderkey")))
      val res = mgr.run()
      metricsDf(s, res.metricRows).orderBy("metric_name", "column")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_completeness_ratio" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS "column", avg(CASE WHEN l_quantity IS NOT NULL THEN 1.0 ELSE 0.0 END) AS value_double FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', avg(CASE WHEN l_returnflag IS NOT NULL THEN 1.0 ELSE 0.0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', avg(CASE WHEN l_shipdate IS NOT NULL THEN 1.0 ELSE 0.0 END) FROM lineitem
        |) ORDER BY "column"""".stripMargin,
    "q_completeness_valid" ->
      """SELECT * FROM customer
        |WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,
    "q_completeness_invalid" ->
      """SELECT * FROM customer
        |WHERE c_name IS NULL OR c_acctbal IS NULL
        |ORDER BY c_custkey""".stripMargin,
    "q_completeness_raw" ->
      """SELECT 'raw' AS metric_name,
        |  CAST(sum(CASE WHEN l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL AND l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*) AS value_double
        |FROM lineitem""".stripMargin,
    "q_unique_valid_keys" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",
    "q_unique_invalid_groups" ->
      """SELECT l_orderkey, count(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey""".stripMargin,
    "q_unique_invalid_rows" ->
      """SELECT * FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) > 1)
        |ORDER BY o_orderkey""".stripMargin,
    "q_unique_metric" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS "column", CAST(count(DISTINCT l_orderkey) AS DOUBLE) / count(l_orderkey) AS value_double FROM lineitem
        |  UNION ALL
        |  SELECT 'l_partkey', CAST(count(DISTINCT l_partkey) AS DOUBLE) / count(l_partkey) FROM lineitem
        |) ORDER BY "column"""".stripMargin,
    "q_validity_invalid" ->
      """SELECT * FROM lineitem
        |WHERE NOT coalesce(l_quantity <= 45.0 AND l_discount BETWEEN 0.0 AND 0.5, FALSE)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_accuracy_metric" ->
      """SELECT 'price_positive' AS metric_name,
        |  CAST(sum(CASE WHEN l_extendedprice > 0.0 AND l_tax >= 0.0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS value_double
        |FROM lineitem""".stripMargin,
    "q_consistency_metric" ->
      """SELECT 'fk_custkey' AS metric_name,
        |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey) THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*) AS value_double
        |FROM orders o""".stripMargin,
    "q_consistency_orphans" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_freshness_metric" ->
      """SELECT 'fresh' AS metric_name,
        |  (epoch(TIMESTAMP '2030-01-01 00:00:00') - epoch(max(o_orderdate))) / 86400.0 AS value_double
        |FROM orders""".stripMargin,
    "q_dq_report" ->
      """SELECT * FROM (
        |  SELECT 'completeness_ratio' AS metric_name, 'l_shipdate' AS "column", 'completeness' AS dimension, 'high' AS severity_level, 0.95 AS threshold, avg(CASE WHEN l_shipdate IS NOT NULL THEN 1.0 ELSE 0.0 END) AS value_double FROM lineitem
        |  UNION ALL
        |  SELECT 'completeness_ratio', 'l_returnflag', 'completeness', 'high', 0.95, avg(CASE WHEN l_returnflag IS NOT NULL THEN 1.0 ELSE 0.0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'completeness_ratio', 'l_quantity', 'completeness', 'high', 0.95, avg(CASE WHEN l_quantity IS NOT NULL THEN 1.0 ELSE 0.0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'raw_completeness', '', 'completeness', 'medium', 0.95, CAST(sum(CASE WHEN l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'uniqueness_ratio', 'l_orderkey', 'uniqueness', 'low', 1.0, CAST(count(DISTINCT l_orderkey) AS DOUBLE) / count(l_orderkey) FROM lineitem
        |) ORDER BY metric_name, "column"""".stripMargin
  )
}
