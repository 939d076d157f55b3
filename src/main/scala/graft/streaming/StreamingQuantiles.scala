package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key quantiles — the unbounded-stream twin of
  * [[graft.operators.Profiler.groupQuantilesApprox]] (batch
  * Greenwald–Khanna via `percentile_approx`): a `transformWithState`
  * processor maintaining one GK ε-approximate quantile summary per key
  * across micro-batches.
  *
  * The sketch is the published GK01 algorithm: sorted tuples
  * `(v, g, Δ)` where `g` counts observations collapsed into the tuple
  * and `Δ` bounds its rank uncertainty; inserts place `(v, 1, ⌊2εn⌋)`,
  * periodic compression merges neighbors while
  * `g_i + g_{i+1} + Δ_{i+1} < 2εn`, and any φ-quantile query returns a
  * value whose TRUE rank is within `εn` of `φn` (spec-asserted against
  * exact ranks). State is O((1/ε)·log(εn)) per key — bounded no matter
  * how long the stream runs, which is what a 100 TB stream demands;
  * each event is touched once.
  *
  * Approximate-by-contract: the returned value depends on arrival
  * order (any GK does), so the guarantee is the ε rank bound, not a
  * bit-stable value. */
object StreamingQuantiles {

  /** Serializable GK state: parallel arrays of the tuple fields. */
  final case class GKState(n: Long, vs: Array[Double], gs: Array[Long], ds: Array[Long])

  final case class QuantileUpdate(key: String, n: Long, prob: Double, value: Double)

  /** Mutable GK summary (driver/executor local; persisted via [[GKState]]). */
  final class GKSketch(val eps: Double) extends Serializable {
    require(eps > 0 && eps < 0.5)
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    private var count = 0L
    private val compressEvery = math.max(1, (1.0 / (2.0 * eps)).toInt)

    def n: Long = count
    def tupleCount: Int = buf.length

    def insert(v: Double): Unit = {
      var i = 0
      while (i < buf.length && buf(i)._1 <= v) i += 1
      val delta =
        if (i == 0 || i == buf.length) 0L
        else math.floor(2 * eps * count).toLong
      buf.insert(i, (v, 1L, delta))
      count += 1
      if (count % compressEvery == 0) compress()
    }

    /** Merge neighbors whose combined uncertainty stays within 2εn.
      * Scans right-to-left, never touching the extremes' tuples' bands
      * beyond the invariant — the GK01 COMPRESS. */
    def compress(): Unit = {
      val cap = math.floor(2 * eps * count).toLong
      var i = buf.length - 2
      while (i >= 1) {
        val (_, gi, _) = buf(i)
        val (v1, g1, d1) = buf(i + 1)
        if (gi + g1 + d1 < cap) {
          buf(i + 1) = (v1, gi + g1, d1)
          buf.remove(i)
        }
        i -= 1
      }
    }

    /** Value whose true rank is within `εn` of `⌈φn⌉` (GK01 QUANTILE). */
    def query(phi: Double): Double = {
      require(phi >= 0.0 && phi <= 1.0)
      require(buf.nonEmpty, "empty sketch")
      val r = math.max(1L, math.ceil(phi * count).toLong)
      val slack = math.ceil(eps * count).toLong
      var rmin = 0L
      var prev = buf.head._1
      var i = 0
      while (i < buf.length) {
        val (v, g, d) = buf(i)
        rmin += g
        if (rmin + d > r + slack) return prev
        prev = v
        i += 1
      }
      buf.last._1
    }

    def toState: GKState =
      GKState(count, buf.map(_._1).toArray, buf.map(_._2).toArray, buf.map(_._3).toArray)
  }

  object GKSketch {
    def fromState(eps: Double, s: GKState): GKSketch = {
      val sk = new GKSketch(eps)
      var i = 0
      while (i < s.vs.length) {
        sk.buf += ((s.vs(i), s.gs(i), s.ds(i)))
        i += 1
      }
      sk.count = s.n
      sk
    }
  }

  final class GKQuantileProcessor(probs: Seq[Double], eps: Double)
      extends StatefulProcessor[String, (String, Double), QuantileUpdate] {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    @transient private var state: ValueState[GKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GKState]("gk",
        Encoders.product[GKState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[QuantileUpdate] = {
      val sk = if (state.exists()) GKSketch.fromState(eps, state.get())
        else new GKSketch(eps)
      rows.foreach { case (_, v) => sk.insert(v) }
      sk.compress() // bound persisted state before serializing
      state.update(sk.toState)
      probs.iterator.map(p => QuantileUpdate(key, sk.n, p, sk.query(p)))
    }
  }

  /** Front door: input frame needs `key` (string) and `value` (double;
    * nulls dropped). Emits one row per (key, prob) per micro-batch with
    * the post-batch quantile estimate over ALL events seen so far
    * (Update mode). Requires the RocksDB state-store provider. */
  def runningGroupQuantiles(df: DataFrame, probs: Seq[Double],
      eps: Double = 0.01): Dataset[QuantileUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("value").isNotNull)
      .select(col("key").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new GKQuantileProcessor(probs, eps),
        TimeMode.None(), OutputMode.Update())
  }

  /** DDSketch-backed per-key streaming quantiles — state is the SAME
    * bucket-count representation as the batch
    * [[graft.functions.DDSketchQuantiles]] Aggregator (one
    * [[graft.functions.DDSketchBuf]] per key), updated and read through
    * the shared [[graft.functions.DdSketchAlgebra]]. Bucket-count
    * addition is order-independent, so after any micro-batch split the
    * per-key state — and every quantile read off it — is BIT-IDENTICAL
    * to the single-pass batch aggregation over the same rows
    * (spec-asserted), the property the order-dependent
    * [[GKQuantileProcessor]] cannot offer. Use GK when the ε-rank bound
    * per event matters; use this when batch/stream parity does. */
  /** [[graft.functions.DDSketchBuf]] flattened to parallel arrays — the
    * RocksDB state encoder (Avro) has no MapType, so the bucket maps are
    * persisted as (index[], count[]) pairs and rebuilt on read, exactly
    * like [[SSState]]/[[GKState]] flatten their sketches. */
  final case class DDState(negIdx: Array[Int], negCnt: Array[Long], zero: Long,
      posIdx: Array[Int], posCnt: Array[Long]) {
    def toBuf: graft.functions.DDSketchBuf = graft.functions.DDSketchBuf(
      negIdx.zip(negCnt).toMap, zero, posIdx.zip(posCnt).toMap)
  }

  object DDState {
    def fromBuf(b: graft.functions.DDSketchBuf): DDState = {
      val neg = b.neg.toArray.sortBy(_._1)
      val pos = b.pos.toArray.sortBy(_._1)
      DDState(neg.map(_._1), neg.map(_._2), b.zero, pos.map(_._1), pos.map(_._2))
    }
  }

  final class DDQuantileProcessor(probs: Seq[Double], alpha: Double)
      extends StatefulProcessor[String, (String, Double), QuantileUpdate] {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    require(alpha > 0 && alpha < 1)
    @transient private var state: ValueState[DDState] = _
    @transient private lazy val lnGamma =
      math.log(graft.functions.DdSketchAlgebra.gammaOf(alpha))

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DDState]("dd",
        Encoders.product[DDState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[QuantileUpdate] = {
      val alg = graft.functions.DdSketchAlgebra
      var buf = if (state.exists()) state.get().toBuf
        else graft.functions.DDSketchBuf(Map.empty, 0L, Map.empty)
      rows.foreach { case (_, v) => buf = alg.update(buf, v, lnGamma) }
      state.update(DDState.fromBuf(buf))
      val n = alg.totalCount(buf)
      val qs = alg.quantiles(buf, probs, alpha)
      probs.iterator.zip(qs.iterator).map { case (p, v) => QuantileUpdate(key, n, p, v) }
    }
  }

  /** Front door for [[DDQuantileProcessor]]: same input/output contract
    * as [[runningGroupQuantiles]], with batch-bit-identical state. */
  def runningGroupQuantilesDD(df: DataFrame, probs: Seq[Double],
      alpha: Double = 0.01): Dataset[QuantileUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("value").isNotNull)
      .select(col("key").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new DDQuantileProcessor(probs, alpha),
        TimeMode.None(), OutputMode.Update())
  }
}
