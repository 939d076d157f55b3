package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters — the unbounded-stream twin of the exact
  * batch [[graft.operators.Profiler.keySkew]] top-N: per-shard
  * SpaceSaving summaries (Metwally et al. 2005, the published
  * deterministic top-k sketch) maintained across micro-batches with
  * `transformWithState`.
  *
  * SpaceSaving keeps at most `k` counters. A tracked item increments its
  * counter; an untracked item REPLACES the minimum counter, inheriting
  * its count as the new item's overestimation `error`. Guarantees, per
  * shard with `n` observed events: every reported count satisfies
  * `count − error ≤ true ≤ count`, and ANY item with true frequency
  * > n/k is tracked — both spec-asserted. State is O(k) per shard
  * regardless of stream length or key cardinality.
  *
  * Sharding: heavy-hitter state is global, not per-key, so the stream is
  * hashed into `nShards` state groups (parallelism dial). Per-shard
  * reports merge by summing counts and errors per item — the bounds add,
  * so the merged `[count − error, count]` interval still brackets the
  * true global count ([[mergeReports]]). */
object StreamingHeavyHitters {

  final case class SSState(n: Long, keys: Array[String], counts: Array[Long],
      errors: Array[Long])

  final case class HitterUpdate(shard: Int, n: Long, item: String,
      count: Long, error: Long)

  /** Mutable SpaceSaving table (persisted via [[SSState]]). */
  final class SpaceSaving(val k: Int) extends Serializable {
    require(k >= 1)
    private val counts = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    private var total = 0L

    def n: Long = total
    def entries: Seq[(String, Long, Long)] =
      counts.iterator.map { case (key, (c, e)) => (key, c, e) }.toSeq

    def insert(item: String): Unit = {
      total += 1
      counts.get(item) match {
        case Some((c, e)) => counts.update(item, (c + 1, e))
        case None if counts.size < k => counts.update(item, (1L, 0L))
        case None =>
          val (minKey, (minC, _)) = counts.minBy(_._2._1)
          counts.remove(minKey)
          counts.update(item, (minC + 1, minC)) // inherit min as overestimate
      }
    }

    def toState: SSState = {
      val es = entries
      SSState(total, es.map(_._1).toArray, es.map(_._2).toArray, es.map(_._3).toArray)
    }
  }

  object SpaceSaving {
    def fromState(k: Int, s: SSState): SpaceSaving = {
      val ss = new SpaceSaving(k)
      var i = 0
      while (i < s.keys.length) {
        ss.counts.update(s.keys(i), (s.counts(i), s.errors(i)))
        i += 1
      }
      ss.total = s.n
      ss
    }
  }

  final class HeavyHitterProcessor(k: Int)
      extends StatefulProcessor[Int, (Int, String), HitterUpdate] {
    @transient private var state: ValueState[SSState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SSState]("ss",
        Encoders.product[SSState], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[HitterUpdate] = {
      val ss = if (state.exists()) SpaceSaving.fromState(k, state.get())
        else new SpaceSaving(k)
      rows.foreach { case (_, item) => ss.insert(item) }
      state.update(ss.toState)
      ss.entries.iterator.map { case (item, c, e) =>
        HitterUpdate(shard, ss.n, item, c, e)
      }
    }
  }

  /** Front door: input frame needs an `item` (string; nulls dropped)
    * column. Emits each shard's full SpaceSaving table per micro-batch
    * (Update mode). Requires the RocksDB state-store provider. */
  def runningHeavyHitters(df: DataFrame, k: Int, nShards: Int = 8): Dataset[HitterUpdate] = {
    require(nShards >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("item").isNotNull)
      .select(pmod(xxhash64(col("item")), lit(nShards)).cast("int").as("shard"),
        col("item").cast("string"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new HeavyHitterProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Merge the LATEST per-shard reports into global top items: counts and
    * errors sum (per-item shard intervals add), `top` rows by merged
    * count. Items are routed to exactly one shard by hash, so per-item
    * sums never double-count. */
  def mergeReports(latest: DataFrame, top: Int): DataFrame =
    latest.groupBy("item")
      .agg(sum("count").as("count"), sum("error").as("error"))
      .orderBy(col("count").desc, col("item"))
      .limit(top)

  final case class CmsUpdate(shard: Int, n: Long, regs: Array[Long])

  /** Streaming Count-Min registers — state is the SAME flat
    * `depth*width` counter array as the batch
    * [[graft.functions.CountMinSketchAgg]] Aggregator, updated through
    * the shared [[graft.functions.CmsAlgebra]]. CMS is linear (counters
    * add), so the shard registers summed with
    * [[mergedCmsRegisters]] equal the single-pass batch sketch
    * BIT-FOR-BIT under any sharding and any micro-batch split
    * (spec-asserted) — the count-estimate twin of
    * [[StreamingDistinct]]'s HLL contract. SpaceSaving
    * ([[runningHeavyHitters]]) remains the exact-top-k tracker; this is
    * the point-estimate store behind ad-hoc "how often did X occur so
    * far" probes with batch parity. */
  final class CmsRegistersProcessor(depth: Int, width: Int, md5Hash: Boolean)
      extends StatefulProcessor[Int, (Int, String), CmsUpdate] {
    require(depth >= 1 && width >= 1)
    @transient private var regsState: ValueState[Array[Long]] = _
    @transient private var nState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regsState = getHandle.getValueState[Array[Long]]("cms",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
        TTLConfig.NONE)
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[(Int, String)],
        timerValues: TimerValues): Iterator[CmsUpdate] = {
      val regs = if (regsState.exists()) regsState.get()
        else new Array[Long](depth * width)
      var n = if (nState.exists()) nState.get() else 0L
      rows.foreach { case (_, item) =>
        graft.functions.CmsAlgebra.update(regs, item, depth, width, md5Hash)
        n += 1
      }
      regsState.update(regs)
      nState.update(n)
      Iterator.single(CmsUpdate(shard, n, regs))
    }
  }

  /** Front door: input frame needs an `item` (string; nulls dropped)
    * column. Emits each shard's full register array per micro-batch
    * (Update mode). Requires the RocksDB state-store provider. */
  def runningCmsRegisters(df: DataFrame, depth: Int, width: Int,
      md5Hash: Boolean = true, nShards: Int = 8): Dataset[CmsUpdate] = {
    require(nShards >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("item").isNotNull)
      .select(pmod(xxhash64(col("item")), lit(nShards)).cast("int").as("shard"),
        col("item").cast("string"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .transformWithState(new CmsRegistersProcessor(depth, width, md5Hash),
        TimeMode.None(), OutputMode.Update())
  }

  /** Sum the latest per-shard register arrays into the global sketch —
    * equals the batch Aggregator's registers exactly (CMS linearity). */
  def mergedCmsRegisters(latest: Seq[Array[Long]], depth: Int, width: Int): Array[Long] =
    latest.foldLeft(new Array[Long](depth * width))(graft.functions.CmsAlgebra.mergeInto)
}
