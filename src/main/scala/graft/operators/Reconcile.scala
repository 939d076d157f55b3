package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the "did the migration/backfill change data"
  * audit: given two snapshots of the same logical table, classify every key
  * as added / removed / changed / unchanged and report which columns
  * changed. One full-outer shuffle join on the key; the column comparison is
  * null-safe (`<=>`) so NULL→value and value→NULL transitions count as
  * changes while NULL→NULL does not.
  *
  * Scale: the join shuffles both snapshots once on the key columns —
  * unavoidable and optimal for a whole-table diff (AQE handles skew). The
  * per-column compare is row-local codegen. [[diffSummary]] rolls the diff
  * up with a partial-aggregated count per status, so the wide per-row diff
  * never leaves the executors unless the caller asks for rows.
  */
object Reconcile {

  /** Per-key diff of two snapshots. Output: key columns, `diff_status`
    * ('added' = key only in `next`, 'removed' = only in `prev`, 'changed',
    * 'unchanged'), and `changed_cols` (sorted array, empty unless
    * 'changed'). `compareCols` defaults to all non-key columns shared by
    * both schemas. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else prev.columns.filterNot(keyCols.contains)
        .filter(next.columns.contains).toSeq
    require(cols.nonEmpty,
      "snapshotDiff needs at least one shared non-key column to compare " +
        "(for key-only membership diffs use a full outer join directly)")
    val p = prev.select((keyCols ++ cols).map(col): _*)
      .withColumn("__in_prev", lit(1))
    val n = next.select(keyCols.map(col) ++ cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_next", lit(1))
    val joined = p.join(n, keyCols, "full_outer")
    val bothPresent = col("__in_prev").isNotNull && col("__in_next").isNotNull
    // only meaningful when the key exists on both sides — an added/removed
    // row would otherwise "differ" on every column against the join's nulls
    val changed = when(bothPresent,
      array_sort(filter(array(cols.map(c =>
        when(!(col(c) <=> col(s"__n_$c")), lit(c))): _*), x => x.isNotNull)))
      .otherwise(array().cast("array<string>"))
    joined.select(
      keyCols.map(col) :+
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_next").isNull, lit("removed"))
          .when(size(changed) > 0, lit("changed"))
          .otherwise(lit("unchanged")).as("diff_status") :+
        changed.as("changed_cols"): _*)
  }

  /** Roll-up of [[snapshotDiff]]: row counts per status plus, for 'changed'
    * rows, how often each column changed (exploded per-column counts). */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("diff_status").agg(count(lit(1)).as("n_rows"))

  /** Per-column change frequency among 'changed' rows. */
  def changedColumnCounts(diff: DataFrame): DataFrame =
    diff.filter(col("diff_status") === "changed")
      .select(explode(col("changed_cols")).as("column"))
      .groupBy("column").agg(count(lit(1)).as("n_changed"))
}
