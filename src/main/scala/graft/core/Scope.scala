package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

/** Row-scope predicate ANDed into every valid/invalid/metric computation.
  *
  * The reference models this as `condition: Column | Callable[[DataFrame],
  * Column] | None` with runtime `isinstance` dispatch
  * (`completeness_col_ratio_check.py:35,66-76`). In Scala the dispatch is
  * compile-time via this ADT. Because the scope is expressed as a plain
  * `Column` appended to a `Filter` node, Catalyst pushes it into the scan
  * (`PushDownPredicates`) — user-level predicate pushdown for free.
  */
sealed trait Scope {
  def toColumn(df: DataFrame): Column
  /** Human-readable form for `extra_info` (the reference stores
    * `str(condition)`, `completeness_col_ratio_check.py:138`). */
  def describe: String
}

case object NoScope extends Scope {
  def toColumn(df: DataFrame): Column = lit(true)
  def describe: String = "None"
}

final case class ColScope(c: Column) extends Scope {
  def toColumn(df: DataFrame): Column = c
  def describe: String = c.toString
}

final case class FnScope(f: DataFrame => Column) extends Scope {
  def toColumn(df: DataFrame): Column = f(df)
  def describe: String = "<function>"
}

object Scope {
  def apply(c: Column): Scope = ColScope(c)
  def apply(f: DataFrame => Column): Scope = FnScope(f)
}

/** Raised when a check's configured columns are missing from the input
  * (`core/exceptation.py:3-6`). */
final class ColumnNotFoundException(msg: String) extends RuntimeException(msg)
