package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event log.
  *
  * A user completes stage k iff they have at least one event of every stage
  * `0..k` and the *first occurrences* are in stage order
  * (`t0 <= t1 <= ... <= tk`). Classic product-analytics shape; here it is
  * ONE hash aggregation (`groupBy(user)` with a conditional `min(ts)` per
  * stage — partial aggregation map-side, so the shuffle carries one row per
  * user per partition at most), then a single global roll-up row per stage.
  * No self-joins, no windows — this survives arbitrarily many events per
  * user and arbitrarily many users.
  */
object Funnel {

  /** Per-user first-occurrence timestamps, one column `t0..t{n-1}` per
    * stage (null = user never reached that event type). */
  def firstTouch(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val aggs = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t$i")
    }
    df.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Funnel counts: one row per stage with `stage_idx`, `stage`, and
    * `n_users` = users whose first occurrences reach that stage in order. */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame =
    funnelCore(df, userCol, typeCol, tsCol, stages, maxGap = None)

  /** Time-bound funnel: stage k counts only users whose consecutive
    * first-touches are in order AND within `maxGap` timestamp units
    * ("clicked within an hour of viewing"). Same single-aggregation shape
    * as [[funnel]] — the bound is one more predicate on the 1-row roll-up,
    * not a join. First-touch semantics throughout: a later in-window
    * re-visit does not resurrect an expired step. */
  def funnelWindowed(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], maxGap: Long): DataFrame =
    funnelCore(df, userCol, typeCol, tsCol, stages, maxGap = Some(maxGap))

  private def funnelCore(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], maxGap: Option[Long]): DataFrame = {
    val ft = firstTouch(df, userCol, typeCol, tsCol, stages)
    // completed(k) = t0..tk all present, non-decreasing, within gap bound
    val completed: Seq[Column] = stages.indices.map { k =>
      val present = (0 to k).map(i => col(s"t$i").isNotNull).reduce(_ && _)
      val ordered =
        if (k == 0) lit(true)
        else (1 to k).map { i =>
          val step = col(s"t${i - 1}") <= col(s"t$i")
          maxGap match {
            case Some(g) => step && col(s"t$i") - col(s"t${i - 1}") <= g
            case None => step
          }
        }.reduce(_ && _)
      sum(when(present && ordered, 1L).otherwise(0L)).as(s"n$k")
    }
    val counts = ft.agg(completed.head, completed.tail: _*)
    // tiny (1-row) frame → explode to one row per stage, driver-free
    val stageRows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("stage_idx"), lit(st).as("stage"), col(s"n$i").as("n_users"))
    }
    counts.select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_users"))
  }

  /** Event-transition counts: for each user's event sequence (ordered by
    * `tsCol`, ties broken by `tieCol` for determinism), count
    * (from_type → to_type) adjacent transitions — the Markov-chain view of
    * an event log. One hash exchange on the user + per-user sorted `lead`
    * window (streams each user's events), then a small count aggregation
    * over at most |types|² groups. */
  def transitionCounts(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Pairwise item co-occurrence with lift: for every unordered item pair
    * `(a < b)`, the number of baskets containing both and
    * `lift = P(a,b) / (P(a)·P(b))` — the association-mining signal behind
    * "users who do X also do Y" (basket = user/session, item = event
    * type / product / tag). Lift > 1 = positive association.
    *
    * Dataflow: distinct (basket, item) → self equi-join ON THE BASKET for
    * within-basket pairs (pair count per basket is |items|², fine for
    * bounded item vocabularies — for unbounded ones cap items per basket
    * first with [[graft.operators.Splits.quotaCap]]) → pair counts; item
    * marginals and the basket total are dimension-sized frames broadcast
    * back. Everything shuffles on basket or pair keys only. */
  def cooccurrenceLift(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val bi = df.filter(col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).cast("string").as("i")).distinct()
    val pairs = bi.select(col("b"), col("i").as("item_a"))
      .join(bi.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
    val marg = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val total = bi.agg(countDistinct(col("b")).as("__n"))
    pairs
      .join(broadcast(marg.select(col("i").as("item_a"), col("n_i").as("n_a"))), Seq("item_a"))
      .join(broadcast(marg.select(col("i").as("item_b"), col("n_i").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") * col("__n") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }
}
