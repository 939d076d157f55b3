package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming control charts — the unbounded-stream twins of
  * [[graft.operators.TimeSeries.ewma]] and
  * [[graft.operators.TimeSeries.cusum]], run as ONE `transformWithState`
  * processor with O(1) state per key.
  *
  * Where the batch EWMA's closed form carries an `r^{-i}` intermediate
  * that overflows doubles past ~`709/(-ln r)` rows per key, the recursive
  * forms here (`num_t = x_t + r·num_{t-1}`, `den_t = 1 + r·den_{t-1}`,
  * `ewma = num/den`; `S⁺_t = max(0, S⁺_{t-1} + x_t − target − slack)`)
  * have NO length bound — `num/den` converge to a bounded fixed range —
  * so this is the shape that survives an unbounded 100 TB stream: four
  * doubles of state per key, each event touched once.
  *
  * Within a micro-batch, rows are processed in ascending `ord` order
  * (sorted in the handler — Spark does not guarantee iterator order);
  * across batches the caller must feed non-decreasing `ord` per key, as
  * with any sequential smoother over a stream.
  */
object ControlCharts {

  final case class ChartState(num: Double, den: Double, sPos: Double, sNeg: Double)
  final case class ChartUpdate(key: String, ord: Long, value: Double,
      ewma: Double, s_pos: Double, s_neg: Double, alarm: Boolean)

  final class EwmaCusumProcessor(alpha: Double, target: Double, slack: Double, h: Double)
      extends StatefulProcessor[String, (String, Long, Double), ChartUpdate] {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    @transient private var state: ValueState[ChartState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ChartState]("chart",
        org.apache.spark.sql.Encoders.product[ChartState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[ChartUpdate] = {
      val r = 1.0 - alpha
      var st = if (state.exists()) state.get() else ChartState(0.0, 0.0, 0.0, 0.0)
      val out = rows.toSeq.sortBy(_._2).map { case (_, ord, x) =>
        val num = x + r * st.num
        val den = 1.0 + r * st.den
        val sPos = math.max(0.0, st.sPos + (x - target - slack))
        val sNeg = math.max(0.0, st.sNeg - (x - target + slack))
        st = ChartState(num, den, sPos, sNeg)
        ChartUpdate(key, ord, x, num / den, sPos, sNeg, sPos > h || sNeg > h)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Front door: input frame needs `key` (string), `ord` (long,
    * non-decreasing per key across batches), `value` (double). Emits one
    * row per input event with the post-event EWMA/CUSUM statistics
    * (Update mode). Requires the RocksDB state-store provider. */
  def runningCharts(df: DataFrame, alpha: Double, target: Double,
      slack: Double, h: Double): Dataset[ChartUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key").cast("string"), col("ord").cast("long"),
        col("value").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EwmaCusumProcessor(alpha, target, slack, h),
        TimeMode.None(), OutputMode.Update())
  }
}
