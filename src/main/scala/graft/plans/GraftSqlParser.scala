package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.{InternalRow => CatalystRow}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Parser extension (`injectParser`) adding one engine command on top of
  * Spark's grammar:
  *
  * {{{ SHOW GRAFT CHECKS }}}
  *
  * returns the catalog of data-quality check types this engine ships
  * (name, dimension, one-line description) as a normal result set, so a
  * SQL-only client can discover the surface without Scala access.
  * Everything else delegates verbatim to Spark's parser — the extension is
  * a strict superset of the stock grammar.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val ShowChecks = """(?i)\s*SHOW\s+GRAFT\s+CHECKS\s*;?\s*""".r

  private def checksCatalog: LogicalPlan = {
    val rows = GraftSqlParser.catalog.map { case (n, d, desc) =>
      CatalystRow.fromSeq(Seq(UTF8String.fromString(n),
        UTF8String.fromString(d), UTF8String.fromString(desc)))
    }
    val attrs: Seq[Attribute] = Seq(
      AttributeReference("check", StringType, nullable = false)(),
      AttributeReference("dimension", StringType, nullable = false)(),
      AttributeReference("description", StringType, nullable = false)())
    LocalRelation(attrs, rows)
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ShowChecks() => checksCatalog
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case ShowChecks() => checksCatalog
    case _ => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** (check, dimension, description) — kept in sync with graft.checks. */
  val catalog: Seq[(String, String, String)] = Seq(
    ("completeness_col_ratio", "completeness", "per-column non-null ratio vs threshold (one fused pass)"),
    ("completeness_raw_ratio", "completeness", "whole-row completeness over the given attributes"),
    ("unique", "uniqueness", "distinct ratio + duplicate key/row extraction"),
    ("validity", "validity", "predicate rule: rows where the predicate holds"),
    ("rule", "validity", "implication rule WHEN antecedent THEN consequent (vacuous rows excluded)"),
    ("accuracy", "accuracy", "cross-column business-rule conformance"),
    ("consistency", "consistency", "referential integrity vs a dimension (orphan extraction)"),
    ("freshness", "freshness", "max event-time lag vs an as-of instant"),
    ("outlier", "accuracy", "z-score outlier ratio with mean/stddev evidence"),
    ("drift_psi", "distribution", "population-stability index over fixed bins vs a baseline"),
    ("drift_ks", "distribution", "exact two-sample Kolmogorov-Smirnov vs a baseline"))
}
