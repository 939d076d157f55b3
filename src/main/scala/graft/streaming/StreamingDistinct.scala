package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.functions.{HllAlgebra, HllEstimate}

/** Streaming distinct-count — the unbounded-stream twin of the batch
  * [[graft.operators.Sketches.hllDistinct]]: sharded HyperLogLog
  * registers maintained across micro-batches with `transformWithState`.
  *
  * Because HLL merge is element-wise register MAX (commutative,
  * associative, IDEMPOTENT), the merged streaming sketch is
  * BIT-IDENTICAL to the batch sketch over the same keys — under any
  * shard count, any micro-batch split, and even under replayed input
  * (at-least-once delivery cannot inflate the estimate; the spec
  * asserts exact equality, not a tolerance). State is 2^p bytes per
  * shard regardless of stream length — the property that makes
  * "distinct users ever seen" answerable on an unbounded 100 TB/day
  * stream where exact distinct state would grow without bound.
  */
object StreamingDistinct {

  final case class ShardRegisters(shard: Int, n: Long, regs: Array[Byte])

  final class HllProcessor(p: Int)
      extends StatefulProcessor[Int, (Int, String), ShardRegisters] {
    @transient private var state: ValueState[(Long, Array[Byte])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Array[Byte])]("hll",
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY), TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[ShardRegisters] = {
      val (n0, regs) =
        if (state.exists()) state.get() else (0L, new Array[Byte](1 << p))
      var n = n0
      rows.foreach { case (_, key) => HllAlgebra.update(regs, key, p); n += 1 }
      state.update((n, regs))
      Iterator.single(ShardRegisters(shard, n, regs))
    }
  }

  /** Front door: input frame needs a `key` column (cast to string, nulls
    * dropped). Emits each shard's full register array per micro-batch
    * (Update mode). Requires the RocksDB state-store provider. */
  def runningDistinct(df: DataFrame, p: Int = 8, nShards: Int = 8): Dataset[ShardRegisters] = {
    require(nShards >= 1 && p >= 8 && p <= 16)
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("key").isNotNull)
      .select(pmod(xxhash64(col("key")), lit(nShards)).cast("int").as("shard"),
        col("key").cast("string"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new HllProcessor(p),
        TimeMode.None(), OutputMode.Update())
  }

  /** Merge the latest per-shard register arrays into the global estimate
    * (register max across shards, then the shared finish algebra). */
  def mergedEstimate(latestRegs: Seq[Array[Byte]], p: Int = 8): HllEstimate = {
    val acc = new Array[Byte](1 << p)
    latestRegs.foreach(HllAlgebra.mergeInto(acc, _))
    HllAlgebra.estimate(acc, p)
  }

  // ---------------------------------------------------------------- KMV

  final case class ShardKmv(shard: Int, n: Long, mins: Array[Long])

  /** Streaming KMV twin: per-shard k smallest distinct hash60 values.
    * Insert is idempotent (a re-delivered key re-inserts the same hash,
    * which dedups), so like the HLL twin the merged streaming sketch is
    * BIT-IDENTICAL to the batch [[graft.functions.KmvSketchAgg]] under
    * any sharding, micro-batch split, or replay. */
  final class KmvProcessor(k: Int)
      extends StatefulProcessor[Int, (Int, String), ShardKmv] {
    @transient private var state: ValueState[(Long, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Array[Long])]("kmv",
        Encoders.tuple(Encoders.scalaLong,
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()),
        TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[ShardKmv] = {
      val (n0, mins0) =
        if (state.exists()) state.get() else (0L, Array.emptyLongArray)
      val agg = new graft.functions.KmvSketchAgg(k)
      var mins = mins0
      var n = n0
      rows.foreach { case (_, key) => mins = agg.reduce(mins, Some(key)); n += 1 }
      state.update((n, mins))
      Iterator.single(ShardKmv(shard, n, mins))
    }
  }

  /** Front door: `key` column, sharded as [[runningDistinct]]. */
  def runningKmv(df: DataFrame, k: Int = 64, nShards: Int = 8): Dataset[ShardKmv] = {
    require(nShards >= 1 && k >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("key").isNotNull)
      .select(pmod(xxhash64(col("key")), lit(nShards)).cast("int").as("shard"),
        col("key").cast("string"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new KmvProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Merge latest per-shard k-min arrays into the global sketch. */
  def mergedKmv(latest: Seq[Array[Long]], k: Int): Array[Long] = {
    val agg = new graft.functions.KmvSketchAgg(k)
    latest.foldLeft(Array.emptyLongArray)(agg.merge)
  }
}
