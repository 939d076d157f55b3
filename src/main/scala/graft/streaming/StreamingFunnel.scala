package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming funnel — the unbounded-stream twin of
  * [[graft.operators.Funnel.funnel]], with the SAME first-touch semantics:
  * a user completes stage k iff stages `0..k` all have a first occurrence
  * and those first occurrences are in order.
  *
  * Per-user state is the fixed-length vector of first-touch timestamps —
  * O(#stages) longs per user, independent of event volume, the only state
  * shape that survives an unbounded stream. Because the state stores MINIMA
  * per stage, the result is ARRIVAL-ORDER INDEPENDENT: whatever order
  * events land in (late, shuffled across micro-batches), once the same
  * event set has been absorbed, the emitted stage is identical to the batch
  * operator's — the spec replays a shuffled event log in three batches and
  * asserts exactly that.
  *
  * Each micro-batch emits (Update mode) one row per touched user with the
  * user's current completed stage (−1 = not even stage 0 yet); a downstream
  * `groupBy(stage).count()` gives the live funnel report.
  */
object StreamingFunnel {

  /** First-touch micros per stage index; -1 = unseen. */
  final case class FunnelState(firstTouch: Seq[Long])
  final case class FunnelUpdate(user: String, completed_stage: Int)

  final class FunnelProcessor(stages: Seq[String])
      extends StatefulProcessor[String, (String, String, Long), FunnelUpdate] {
    @transient private var state: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)
    private val stageIdx = stages.zipWithIndex.toMap

    override def handleInputRows(key: String, rows: Iterator[(String, String, Long)],
        timerValues: TimerValues): Iterator[FunnelUpdate] = {
      val ft = (if (state.exists()) state.get().firstTouch
                else Seq.fill(stages.size)(-1L)).toArray
      rows.foreach { case (_, tpe, ts) =>
        stageIdx.get(tpe).foreach { i =>
          if (ft(i) < 0 || ts < ft(i)) ft(i) = ts
        }
      }
      state.update(FunnelState(ft.toSeq))
      // completed stage = longest prefix of present, non-decreasing touches
      var k = -1
      var ok = true
      var i = 0
      while (ok && i < ft.length) {
        ok = ft(i) >= 0 && (i == 0 || ft(i - 1) <= ft(i))
        if (ok) k = i
        i += 1
      }
      Iterator.single(FunnelUpdate(key, k))
    }
  }

  /** Significance gate over the running funnel — conversion monitoring
    * WITH error control, not just a statistic: each micro-batch's touched
    * users give a (reached `fromStage`, reached `toStage`) cohort whose
    * conversion is two-proportion-z tested (pooled) against the baseline
    * counts; `onResult(batchId, nFrom, nTo, z, pValue, dropped)` fires
    * with `dropped = one-sided p < alpha` (drop direction only — a
    * conversion IMPROVEMENT is not an alarm). False-alarm rate per batch
    * is alpha by construction, the same control the batch SRM/χ² queries
    * carry. Per-batch cost: one aggregation over that batch's updates;
    * the z/p math is driver-side scalar
    * ([[graft.operators.Stats.twoProportionZ]]/`normalSf`). */
  def conversionGate(
      df: DataFrame,
      stages: Seq[String],
      fromStage: Int,
      toStage: Int,
      baselineFrom: Long,
      baselineTo: Long,
      alpha: Double = 0.01
  )(onResult: (Long, Long, Long, Double, Double, Boolean) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(fromStage < toStage, "fromStage must precede toStage")
    require(baselineFrom >= baselineTo && baselineTo >= 0 && baselineFrom > 0,
      "baseline counts must satisfy from >= to >= 0, from > 0")
    runningFunnel(df, stages).writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[FunnelUpdate], id: Long) =>
        if (!batch.isEmpty) {
          val r = batch.toDF().agg(
            sum(when(col("completed_stage") >= fromStage, 1L).otherwise(0L)).as("nf"),
            sum(when(col("completed_stage") >= toStage, 1L).otherwise(0L)).as("nt"))
            .head()
          val nFrom = r.getLong(0); val nTo = r.getLong(1)
          if (nFrom > 0) {
            val z = graft.operators.Stats.twoProportionZ(
              nTo, nFrom, baselineTo, baselineFrom)
            // one-sided: alarm only when conversion moved DOWN
            val p = graft.operators.Stats.normalSf(-z)
            onResult(id, nFrom, nTo, z, p, p < alpha)
          }
        }
      }
      .start()
  }

  /** Front door: input frame needs `user`, `event_type`, `ts` (long)
    * columns. Requires the RocksDB state-store provider, as all
    * `transformWithState` operators do. */
  def runningFunnel(df: DataFrame, stages: Seq[String]): Dataset[FunnelUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user").cast("string"), col("event_type").cast("string"),
        col("ts").cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.None(), OutputMode.Update())
  }
}
