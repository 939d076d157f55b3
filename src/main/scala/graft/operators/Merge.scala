package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch merge (upsert) operators for dimension maintenance — what a
  * warehouse's MERGE INTO does, expressed as plain joins + unions so it
  * runs on any parquet-backed table (no transactional format required;
  * the output is the next table VERSION, written wholesale — the
  * idempotent large-scale pattern: rewrite, don't mutate).
  */
object Merge {

  /** SCD type-2 merge: apply `updates` (schema: key + tracked attributes)
    * to `current` history, stamping `version`/`is_current`.
    *
    * Row fates (two outer joins on the key — `updates` is typically small
    * so AQE broadcasts both):
    *  - prior-version rows (`is_current = false`) pass through untouched;
    *  - open rows with NO update, or a no-op update (all tracked
    *    attributes identical, null-safe `<=>`), pass through;
    *  - open rows with a changing update are closed (`is_current = false`,
    *    version kept) and the update appends as `newVersion`;
    *  - brand-new keys append as `newVersion`.
    *
    * `current` must hold at most one `is_current = true` row per key. */
  def scd2Merge(
      current: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      newVersion: Int
  ): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty)
    val changed = trackedCols
      .map(c => !(col(s"cur.$c") <=> col(s"upd.$c")))
      .reduce(_ || _)
    val cur = current.filter(col("is_current")).as("cur")
    val upd = updates.as("upd")
    val joinCond = keyCols.map(k => col(s"cur.$k") === col(s"upd.$k")).reduce(_ && _)
    val updHit = col(s"upd.${keyCols.head}").isNotNull
    val curHit = col(s"cur.${keyCols.head}").isNotNull

    // every open row with its (optional) update
    val openJoined = cur.join(upd, joinCond, "left_outer")
    val curCols = current.columns.map(c => col(s"cur.$c"))
    val untouched = openJoined.filter(!updHit || !changed).select(curCols: _*)
    val closing = openJoined.filter(updHit && changed)
      .select(curCols: _*)
      .withColumn("is_current", lit(false))
    // changing or brand-new updates -> appended as the new version
    val incoming = upd.join(cur, joinCond, "left_outer")
      .filter(!curHit || changed)
      .select(updates.columns.map(c => col(s"upd.$c")): _*)
      .withColumn("version", lit(newVersion))
      .withColumn("is_current", lit(true))
    val history = current.filter(!col("is_current"))
    history.unionByName(untouched).unionByName(closing).unionByName(incoming)
  }

  /** CDC log compaction: keep each key's LATEST record by `(orderCol,
    * tieCol)` — the materialize-current-state step over an append-only
    * change log. One hash exchange on the key + a streaming per-group
    * row_number; no global sort. Ties on `orderCol` resolve by `tieCol`
    * so compaction is deterministic under any partitioning. */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      orderCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Changelog (CDC) replay: collapse an insert/update/delete ops log to
    * final table state. Input: one row per operation carrying `keyCols`, a
    * per-key strictly increasing `seqCol` (commit LSN / log offset), the
    * op code in `opCol`, and the payload. The highest-`seqCol` row decides
    * each key's fate: op == `deleteOp` → key absent from the result; any
    * other op → key present with that row's payload and `seqCol`.
    *
    * Unlike [[latestByKey]] (window row_number), this is ONE hash
    * aggregation — `max_by` over the payload struct — so partial
    * aggregation collapses each scan partition's ops BEFORE the single
    * keyed exchange and nothing is ever sorted: a 100 TB changelog with a
    * bounded key space reduces at scan speed. `seqCol` must be unique per
    * key (true of any real changelog position); ties would make `max_by`
    * nondeterministic. */
  def applyChangelog(ops: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String, payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty)
    val payload = struct((opCol +: payloadCols).map(col): _*)
    ops.groupBy(keyCols.map(col): _*)
      .agg(max(col(seqCol)).as(seqCol),
        max_by(payload, col(seqCol)).as("__last"))
      .filter(col(s"__last.$opCol") =!= lit(deleteOp))
      .select(keyCols.map(col) ++ (seqCol +: Nil).map(col) ++
        payloadCols.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Golden-record survivorship (MDM merge): collapse each key's
    * duplicate records to one, taking PER FIELD the most recent
    * non-null value (`max_by` over `seqCol`, which skips rows where the
    * field is null) — so a newer partial record overrides only the
    * fields it actually carries. One hash aggregation, no window sort;
    * `seqCol` must be unique per key for determinism. Output: key cols,
    * `seqCol` (latest seen), and the merged fields. */
  def goldenRecord(df: DataFrame, keyCols: Seq[String], seqCol: String,
      fieldCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && fieldCols.nonEmpty)
    val aggs = max(col(seqCol)).as(seqCol) +: fieldCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col(seqCol))).as(c))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Inverse of [[applyChangelog]]: diff two snapshots into the I/U/D
    * ops log that replays `prev` into `next` — the change-data-feed a
    * downstream incremental consumer wants instead of a full-table copy.
    * Same full-outer null-safe classification as
    * [[Reconcile.snapshotDiff]]; 'unchanged' keys emit nothing. `U` (and
    * `I`) rows carry the NEXT payload, `D`
    * rows null payloads. The roundtrip law — prev patched with the feed
    * (drop D/U/I keys, add back I/U payloads) reproduces next exactly —
    * is spec-asserted. */
  def toChangelog(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val p = prev.select((keyCols ++ payloadCols).map(col): _*)
      .withColumn("__in_prev", lit(1))
    val n = next.select(keyCols.map(col) ++
      payloadCols.map(c => col(c).as(s"__n_$c")): _*).withColumn("__in_next", lit(1))
    val joined = p.join(n, keyCols, "full_outer")
    val changed = payloadCols.map(c => !(col(c) <=> col(s"__n_$c"))).reduce(_ || _)
    val op = when(col("__in_prev").isNull, lit("I"))
      .when(col("__in_next").isNull, lit("D"))
      .when(changed, lit("U"))
    joined.withColumn("op", op).filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("op")) ++ payloadCols.map(c =>
        when(col("op") =!= "D", col(s"__n_$c")).as(c)): _*)
  }
}
