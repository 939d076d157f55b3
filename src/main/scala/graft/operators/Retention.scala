package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention, acquisition, and per-entity feature engineering over an
  * event log — the "did the users we ingested in week 0 come back in week k"
  * family every analytics stack ships, built as pure keyed aggregations so
  * each result is 1–2 shuffles regardless of event volume.
  *
  * Scale notes (100 TB event logs):
  *  - [[retentionMatrix]] is two keyed shuffles: one `groupBy(user)` for the
  *    cohort assignment (partial-aggregated map-side, so the shuffle carries
  *    ≤ one row per user per input partition) and one join of events back to
  *    that per-user frame on the SAME user key (AQE picks SMJ/shuffle-hash;
  *    co-partitioned with the first shuffle's output when reused). The final
  *    cohort×offset roll-up is bounded by (#periods)² rows.
  *  - [[cumulativeDistinct]] never holds a distinct-set: first occurrence per
  *    entity is a `min` aggregation, daily news are a count, and the running
  *    total is a window over ≤ #days rows (driver-scale by construction).
  *  - [[userFeatures]] is ONE pass with conditional aggregates — no
  *    self-joins per window, which is the textbook mistake that turns
  *    "counts over 3 lookback windows" into 3 extra scans.
  */
object Retention {

  /** Weekly cohort retention matrix. Each user's cohort is the period of
    * their FIRST event; for every (cohort, offset) cell, `n_active` counts
    * distinct users of that cohort with ≥1 event `offset` periods after
    * their cohort period, and `retention` divides by the cohort size.
    *
    * `periodOf` must map the (long) timestamp column to an integer period
    * index (e.g. epoch-week). Output is bounded by (#periods)² rows.
    */
  def retentionMatrix(df: DataFrame, userCol: String, tsCol: String,
      periodOf: Column => Column): DataFrame = {
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), periodOf(col(tsCol)).as("__p"))
    val cohorts = ev.groupBy("__u").agg(min("__p").as("cohort"))
    val sizes = cohorts.groupBy("cohort").agg(countDistinct("__u").as("cohort_size"))
    // events join back on the SAME key the cohort agg shuffled on
    val active = ev.join(cohorts, "__u")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .agg(countDistinct("__u").as("n_active"))
    active.join(sizes, "cohort")
      .select(col("cohort"), col("offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
  }

  /** Cumulative distinct entities over time (exact, no distinct-set state):
    * one row per period with `n_new` (entities whose FIRST event falls in
    * the period) and `n_cum` (running total = exact distinct-to-date). */
  def cumulativeDistinct(df: DataFrame, entityCol: String, tsCol: String,
      periodOf: Column => Column): DataFrame = {
    val firsts = df.filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol).as("__e"), periodOf(col(tsCol)).as("__p"))
      .groupBy("__e").agg(min("__p").as("period"))
    val daily = firsts.groupBy("period").agg(count(lit(1)).as("n_new"))
    // ≤ #periods rows reach this single-partition running window
    val w = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("period"), col("n_new"), sum("n_new").over(w).as("n_cum"))
  }

  /** Multi-lookback-window feature engineering in ONE scan: for each entity,
    * event counts / value sums / distinct event types within each trailing
    * window `[refTs - w, refTs]`, via conditional aggregation (no per-window
    * self-joins). `windows` maps feature suffix -> window length in the
    * timestamp unit. Adds `recency` = refTs − last event ts. */
  def userFeatures(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, refTs: Long, windows: Seq[(String, Long)]): DataFrame = {
    val inWin = windows.flatMap { case (suffix, len) =>
      val hit = col(tsCol) >= lit(refTs - len) && col(tsCol) <= lit(refTs)
      Seq(
        sum(when(hit, 1L).otherwise(0L)).as(s"n_$suffix"),
        // lit(0) coerces to valueCol's type, so a DECIMAL value column sums
        // exactly (partition-order independent) instead of being forced to
        // double
        sum(when(hit, col(valueCol)).otherwise(lit(0))).as(s"value_$suffix"))
    }
    df.filter(col(userCol).isNotNull && col(tsCol) <= lit(refTs))
      .groupBy(col(userCol))
      .agg(inWin.head, inWin.tail :+ (lit(refTs) - max(col(tsCol))).as("recency"): _*)
  }

  /** Seasonal (time-of-day) volume anomaly: buckets events into
    * (day, hour-of-day) cells, learns each hour-of-day's mean/stddev cell
    * volume across days, and flags cells whose volume deviates by more than
    * `k` sample standard deviations. Two aggregations; the per-hour baseline
    * is ≤ 24 rows (broadcast join). The daily-seasonality twin of
    * [[Profiler.volumeAnomaly]]'s global-trend check. */
  def seasonalVolumeAnomaly(df: DataFrame, dayCol: Column, hourCol: Column,
      k: Double = 3.0): DataFrame = {
    val cells = df.groupBy(dayCol.as("day"), hourCol.as("hour"))
      .agg(count(lit(1)).as("n"))
    val base = cells.groupBy("hour")
      .agg(avg("n").as("mu"), stddev("n").as("sigma"), count(lit(1)).as("n_days"))
    cells.join(broadcast(base), "hour")
      .select(col("day"), col("hour"), col("n"), col("mu"), col("sigma"),
        when(col("sigma") > 0, (col("n") - col("mu")) / col("sigma"))
          .otherwise(lit(0.0)).as("z"))
      .filter(abs(col("z")) > k)
  }

  /** Kaplan-Meier survival estimate of user lifetime (Kaplan & Meier 1958;
    * the standard churn-curve readout): per user, lifetime = days between
    * first and last event; users whose last event falls within
    * `censorDays` of the observation horizon are right-CENSORED (still at
    * risk, not churned). At each lifetime `t` with ≥ 1 churn,
    * `S(t) = Π_{t_j ≤ t} (1 − d_j / n_j)` with `d_j` churns at `t_j` and
    * `n_j` users whose lifetime ≥ `t_j`.
    *
    * Distributed shape: one `groupBy(user)` collapses the event log to a
    * per-user (lifetime, churned) pair — the only corpus-sized shuffle.
    * Everything after operates on ≤ #distinct-lifetime rows (day-bounded
    * by construction), so the cumulative windows are driver-scale; the
    * product is computed as `exp(Σ ln(1 − d/n))` over the time-ordered
    * window — a sequential fold both engines evaluate in the same order,
    * so the oracle matches to the ulp.
    *
    * `tsCol` must be epoch MICROS (the engine's events convention).
    * Returns `(t_days, n_at_risk, d_churned, survival)` for churn times. */
  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String,
      censorDays: Int): DataFrame = {
    val us = 86400000000L // µs per day
    val users = df.filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
    val horizon = users.agg(max(col("last_ts")).as("h"))
    val lifetimes = users.crossJoin(broadcast(horizon))
      .select(
        // integer `div`, not double `/`: exact day bucketing either engine
        expr(s"(last_ts - first_ts) div $us").as("t"),
        (col("last_ts") < col("h") - lit(censorDays.toLong * us))
          .cast("long").as("churned"))
    val byT = lifetimes.groupBy("t")
      .agg(count(lit(1)).as("c"), sum(col("churned")).as("d"))
    val total = lifetimes.count()
    // ≤ #distinct-day rows from here on: the unpartitioned windows run on
    // a day-bounded frame, not the event log
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("n_at_risk", lit(total) - coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .withColumn("survival",
        exp(sum(log(lit(1.0) - col("d").cast("double") / col("n_at_risk"))).over(wCum)))
      .filter(col("d") > 0)
      .select(col("t").as("t_days"), col("n_at_risk"),
        col("d").as("d_churned"), col("survival"))
  }
}
