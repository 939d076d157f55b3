package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization over an event stream/table — a core
  * training-data-pipeline shape (group raw events into user sessions before
  * feature extraction). The reference has no time-series operators at all
  * (SURVEY.md §1: `FreshnessPeriod` enum is unused); this and
  * [[graft.streaming.StreamingDQ]] round out the temporal surface.
  *
  * Batch strategy: one hash exchange on the key + two window passes over the
  * same partitioning (Catalyst plans them in a single sort): a `lag` marks
  * session starts (gap exceeded), a running sum turns marks into session
  * ordinals. No self-join, no state blowup — cost is one shuffle + one sort
  * per key partition regardless of session count, so it scales linearly at
  * 100 TB. The streaming twin is Spark's built-in
  * `session_window(ts, gap)` aggregation (see [[sessionAggStreaming]]).
  */
object Sessionize {

  /** Assign a per-key session ordinal (`session_idx`, 1-based, ordered by
    * `tsCol`) to every row: a new session starts when the gap since the
    * previous event of the same key exceeds `gap` (same units as `tsCol`,
    * e.g. nanos for `events.ts`). */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val newSession: Column =
      when(col(tsCol) - lag(col(tsCol), 1).over(byKey) > gap, 1)
        .otherwise(when(lag(col(tsCol), 1).over(byKey).isNull, 1).otherwise(0))
    df.withColumn("__new", newSession)
      .withColumn("session_idx",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-key time-gap profile — the freshness/continuity twin of
    * sessionization: for every key, count the inter-event gaps exceeding
    * `gapThreshold` (same units as `tsCol`) and report the largest one.
    * Keys with no such gap are dropped. The missing-interval detector for
    * event streams (sensor dropouts, pipeline stalls, dead trackers).
    *
    * One hash exchange on the key; the lag window streams each key group
    * (no global sort), and the per-key aggregate is gap-count bounded.
    * Result is deterministic under timestamp ties: equal-ts rows are
    * interchangeable, so the multiset of gap values per key — and hence
    * count and max — is tie-order independent. */
  def timeGaps(df: DataFrame, keyCol: String, tsCol: String, gapThreshold: Long): DataFrame = {
    require(gapThreshold > 0)
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    df.withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(byKey))
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__gap") > gapThreshold, 1L).otherwise(0L)).as("n_gaps"),
        max(when(col("__gap") > gapThreshold, col("__gap"))).as("max_gap"))
      .filter(col("n_gaps") > 0)
  }

  /** Gaps-and-islands over an integer id column — contiguous runs of
    * present ids, the completeness audit that turns "some orderkeys are
    * missing" into an explicit list of covered ranges (and, by
    * complement, the holes an ingest job must backfill).
    *
    * Deliberately NOT the classic `id − row_number()` trick, whose global
    * row numbering is a single-reducer sort at corpus scale. Island
    * boundaries are found by two keyed ANTI-joins (a start has no `id−1`,
    * an end has no `id+1`) — fully distributed — and only the boundary
    * frames (bounded by the island count, typically ≪ rows) pass through
    * the rank-pairing window. Pure integer arithmetic throughout.
    * Returns `(island, start_id, end_id, len)` ordered by id. */
  def idIslands(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("__id"))
      .filter(col("__id").isNotNull).distinct()
    val a = ids.select(col("__id").as("id"))
    val b = ids.select(col("__id").as("nb"))
    val starts = a.join(b, col("id") - 1 === col("nb"), "left_anti")
      .select(col("id").as("start_id"))
    val ends = a.join(b, col("id") + 1 === col("nb"), "left_anti")
      .select(col("id").as("end_id"))
    // the k-th start pairs with the k-th end (islands cannot nest)
    val ws = Window.orderBy("start_id")
    val we = Window.orderBy("end_id")
    starts.withColumn("__rn", row_number().over(ws))
      .join(ends.withColumn("__rn", row_number().over(we)), "__rn")
      .select(col("__rn").as("island"), col("start_id"), col("end_id"),
        (col("end_id") - col("start_id") + 1).as("len"))
  }

  /** Sessionize and aggregate: one row per (key, session) with start/end
    * (in `tsCol` units), event count, and any extra aggregates. */
  def sessionAgg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Long,
      extraAggs: Seq[Column] = Seq.empty
  ): DataFrame = {
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    assignSessions(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming sessionization: built-in gap-based `session_window` over an
    * event-time timestamp column with a watermark bounding state. Works on
    * batch frames too (Spark evaluates session_window in batch), but the
    * batch path above is preferred there — it also yields per-row session
    * ids, not just aggregates. */
  def sessionAggStreaming(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapDuration: String,
      watermark: String,
      extraAggs: Seq[Column] = Seq.empty
  ): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_events")) ++ extraAggs
    val out = df.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gapDuration))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = out.columns.filterNot(c => c == keyCol || c == "session_window")
    out.select(
      col(keyCol) +:
        col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        aggCols.map(col).toSeq: _*)
  }

  /** Open-session state per key: bounds in epoch millis + event count. */
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  /** A CLOSED session, emitted once its gap has provably expired. */
  final case class ClosedSession(key: String, startMs: Long, endMs: Long, nEvents: Long)

  /** Custom-state streaming sessionization via `flatMapGroupsWithState` +
    * event-time timeout — for when the built-in `session_window` aggregate
    * isn't enough (emit exactly-once CLOSED sessions, keep arbitrary extra
    * state, or emit mid-session signals). A session closes when the
    * watermark passes `session_end + gap`; state per key is three longs,
    * evicted on close, so total state is O(open keys).
    *
    * Input needs a watermark on `tsCol` (event-time timeouts require it).
    * Output: one row per closed session, append semantics.
    */
  def sessionsCustomState(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      watermark: String
  ): Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"), col(tsCol).cast("timestamp").as("__t"))
      .withWatermark("__t", watermark) // after the cast, so the tag survives
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.startMs, s.endMs, s.n))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            var closed = List.empty[ClosedSession]
            var open = state.getOption
            times.foreach { t =>
              open = open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
                case Some(s) => // gap exceeded inside the batch: close eagerly
                  closed ::= ClosedSession(key, s.startMs, s.endMs, s.n)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout must stay ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Spark 4 `transformWithState` twin of [[sessionsCustomState]]: same
    * gap semantics, expressed with the new arbitrary-state API — a typed
    * `ValueState` for the open session plus explicit event-time TIMERS
    * (re-armed on every batch; the expired-timer callback emits the closed
    * session). Requires the RocksDB state store provider. Asserted
    * output-identical to the legacy twin in `SessionizeSpec`. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, java.sql.Timestamp), ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, java.sql.Timestamp)],
        tv: TimerValues): Iterator[ClosedSession] = {
      val times = rows.map(_._2.getTime).toArray.sorted
      var closed = List.empty[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      times.foreach { t =>
        cur = cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
          case Some(s) => // gap exceeded inside the batch: close eagerly
            closed ::= ClosedSession(key, s.startMs, s.endMs, s.n)
            Some(OpenSession(t, t, 1))
          case None => Some(OpenSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one live timer per key: drop stale ones, arm past the watermark
        getHandle.listTimers().foreach(ts =>
          getHandle.deleteTimer(ts.asInstanceOf[Long]))
        getHandle.registerTimer(
          math.max(s.endMs + gapMs, tv.getCurrentWatermarkInMs() + 1))
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(ClosedSession(key, s.startMs, s.endMs, s.n))
      } else Iterator.empty
    }
  }

  /** [[sessionsCustomState]] on the transformWithState API. */
  def sessionsTws(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      watermark: String
  ): Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("__k"), col(tsCol).cast("timestamp").as("__t"))
      .withWatermark("__t", watermark)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
