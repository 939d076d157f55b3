package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions._

/** Whole-operator banded interval join as a native Catalyst citizen — the
  * range-join twin of [[AsofJoinNative]] (SURVEY.md §2c extension path (c)).
  *
  * The DataFrame formulations ([[graft.operators.Joins.rangeJoinBanded]],
  * `intervalOverlapJoin`) band-bucket both sides and run a stock equi-join
  * on the band id; correct and shuffle-minimal, but the hash join
  * materializes every same-band candidate pair before the `between` filter
  * and builds a hash table per band over one whole side. [[BandedIntervalJoinExec]]
  * keeps the banding (one keyed exchange per side — the minimum any
  * distributed interval join needs) and replaces the per-band hash join
  * with a PLANE SWEEP, the shape a native engine gives interval joins:
  *
  *  - `requiredChildDistribution` = `ClusteredDistribution(band)` per side —
  *    `EnsureRequirements` co-partitions the two banded streams;
  *  - `requiredChildOrdering` = `(band, lo)` per side — Spark plans
  *    per-partition sorts, each over one side only;
  *  - execution zips the two sorted partition iterators and sweeps in
  *    ascending `lo`: each arriving row evicts opposite-side actives with
  *    `hi < lo` and pairs with the survivors — every emitted pair overlaps
  *    BY CONSTRUCTION (partner.lo ≤ current.lo ≤ partner.hi), no
  *    re-filtering, and live state is only the intervals actually open at
  *    the sweep line (O(band occupancy), not O(band size)).
  *
  * Pairs spanning several shared bands are CLAIMED exactly once, by the
  * band containing `max(a.lo, b.lo)` — processed in `lo` order that is
  * always the CURRENT row's `lo`, so the claim is one predicate per row,
  * not per pair (the DataFrame twin pays a filter per candidate pair).
  * Output: `left.* ++ right.*` per overlapping pair, exactly the
  * DataFrame twins' inner-join semantics (null bounds never match).
  */
final case class BandedIntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBand: Attribute,
    leftLo: Attribute,
    leftHi: Attribute,
    rightBand: Attribute,
    rightLo: Attribute,
    rightHi: Attribute,
    bucketWidth: Double
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandedIntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandedIntervalJoin]] to [[BandedIntervalJoinExec]]. */
object BandedIntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandedIntervalJoin(l, r, lb, llo, lhi, rb, rlo, rhi, w) =>
      BandedIntervalJoinExec(planLater(l), planLater(r), lb, llo, lhi, rb, rlo, rhi, w) :: Nil
    case _ => Nil
  }
}

final case class BandedIntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBand: Attribute,
    leftLo: Attribute,
    leftHi: Attribute,
    rightBand: Attribute,
    rightLo: Attribute,
    rightHi: Attribute,
    bucketWidth: Double
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // One keyed exchange per side, on the band id — the minimum. Bucketed /
  // pre-partitioned children elide it entirely (EnsureRequirements).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBand)) :: ClusteredDistribution(Seq(rightBand)) :: Nil

  // Per-partition (band, lo) sort on each side: the sweep order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBand, Ascending), SortOrder(leftLo, Ascending)),
    Seq(SortOrder(rightBand, Ascending), SortOrder(rightLo, Ascending)))

  // Every output row's left half came from this partition's band set, so
  // the left child's hash partitioning survives.
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandedIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** One buffered side of the sweep: (lo, hi, row-copy) triples of the
    * intervals still open at the sweep line. */
  private type Active = ArrayBuffer[(Double, Double, InternalRow)]

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val (lb, llo, lhi) = (leftBand, leftLo, leftHi)
    val (rb, rlo, rhi) = (rightBand, rightLo, rightHi)
    val width = bucketWidth
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lBandE = BindReferences.bindReference[Expression](lb, lOut)
      val lLoE = BindReferences.bindReference[Expression](llo, lOut)
      val lHiE = BindReferences.bindReference[Expression](lhi, lOut)
      val rBandE = BindReferences.bindReference[Expression](rb, rOut)
      val rLoE = BindReferences.bindReference[Expression](rlo, rOut)
      val rHiE = BindReferences.bindReference[Expression](rhi, rOut)

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // lookahead row per side (copies: sorter output rows are reused)
        private var lHas = false; private var lBand = 0L
        private var lLo = 0.0; private var lHi = 0.0; private var lRow: InternalRow = _
        private var rHas = false; private var rBand = 0L
        private var rLo = 0.0; private var rHi = 0.0; private var rRow: InternalRow = _
        // open intervals of the CURRENT band, one buffer per side
        private var curBand = 0L
        private val activeL: Active = new Active
        private val activeR: Active = new Active
        // pending pairs from the row processed last
        private var pendingRow: InternalRow = _
        private var pendingLeftSide = false
        private var pendingFrom: Active = _
        private var pendingIdx = 0

        advanceLeft(); advanceRight()

        private def advanceLeft(): Unit = {
          lHas = false
          while (!lHas && lIter.hasNext) {
            val r = lIter.next()
            val band = lBandE.eval(r); val lo = lLoE.eval(r); val hi = lHiE.eval(r)
            // null band/bounds match nothing (inner-join semantics): drop
            if (band != null && lo != null && hi != null) {
              lBand = band.asInstanceOf[Long]
              lLo = lo.asInstanceOf[Double]; lHi = hi.asInstanceOf[Double]
              lRow = r.copy(); lHas = true
            }
          }
        }

        private def advanceRight(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val r = rIter.next()
            val band = rBandE.eval(r); val lo = rLoE.eval(r); val hi = rHiE.eval(r)
            if (band != null && lo != null && hi != null) {
              rBand = band.asInstanceOf[Long]
              rLo = lo.asInstanceOf[Double]; rHi = hi.asInstanceOf[Double]
              rRow = r.copy(); rHas = true
            }
          }
        }

        /** Evict intervals closed before the sweep line: `hi < lo`. */
        private def evict(buf: Active, lo: Double): Unit = {
          var w = 0; var i = 0
          while (i < buf.length) {
            if (buf(i)._2 >= lo) { if (w != i) buf(w) = buf(i); w += 1 }
            i += 1
          }
          buf.dropRightInPlace(buf.length - w)
        }

        /** Pull the next (band, lo)-smallest row, update sweep state, and
          * stage its partner pairs (if any). */
        private def step(): Unit = {
          pendingFrom = null; pendingIdx = 0
          val takeLeft = lHas && (!rHas || lBand < rBand || (lBand == rBand && lLo <= rLo))
          val (band, lo, hi, row) =
            if (takeLeft) (lBand, lLo, lHi, lRow) else (rBand, rLo, rHi, rRow)
          if (band != curBand) {
            curBand = band; activeL.clear(); activeR.clear()
          }
          val partners = if (takeLeft) activeR else activeL
          evict(partners, lo)
          // claim-once: the pair belongs to the band holding max(a.lo, b.lo)
          // = the CURRENT row's lo (partners all have lo <= this row's lo),
          // so the claim is one predicate per row, shared by all partners
          if (partners.nonEmpty && math.floor(lo / width).toLong == band) {
            pendingRow = row; pendingLeftSide = takeLeft
            pendingFrom = partners
          }
          (if (takeLeft) activeL else activeR) += ((lo, hi, row))
          if (takeLeft) advanceLeft() else advanceRight()
        }

        override def hasNext: Boolean = {
          while ((pendingFrom == null || pendingIdx >= pendingFrom.length) &&
              (lHas || rHas)) {
            step()
          }
          pendingFrom != null && pendingIdx < pendingFrom.length
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val partner = pendingFrom(pendingIdx)._3
          pendingIdx += 1
          numOutputRows += 1
          if (pendingLeftSide) joined(pendingRow, partner)
          else joined(partner, pendingRow)
        }
      }
    }
  }
}

/** Column-API front doors for the native banded interval join. */
object BandedRangeJoinNative {

  /** Registers [[BandedIntervalJoinStrategy]] on the session (idempotent). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(BandedIntervalJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ BandedIntervalJoinStrategy
  }

  private val BandCol = "__graft_band"
  private val LoCol = "__graft_lo"
  private val HiCol = "__graft_hi"

  /** Band-replicated projection with fresh attribute ids for every column
    * (Alias mints new exprIds — self-joins stay unambiguous). */
  private def banded(df: DataFrame, lo: Column, hi: Column, width: Double): DataFrame =
    df.filter(lo.isNotNull && hi.isNotNull && lo <= hi).select(
      df.columns.map(c => col(c).as(c)) ++ Seq(
        explode(sequence(
          floor(lo / width).cast("long"),
          floor(hi / width).cast("long"))).as(BandCol),
        lo.cast("double").as(LoCol),
        hi.cast("double").as(HiCol)): _*)

  private def attr(out: Seq[Attribute], name: String): Attribute =
    out.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))

  private def join(l: DataFrame, r: DataFrame, width: Double): DataFrame = {
    val spark = l.sparkSession
    ensureRegistered(spark)
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    val node = BandedIntervalJoin(
      lPlan, rPlan,
      attr(lPlan.output, BandCol), attr(lPlan.output, LoCol), attr(lPlan.output, HiCol),
      attr(rPlan.output, BandCol), attr(rPlan.output, LoCol), attr(rPlan.output, HiCol),
      width)
    org.apache.spark.sql.graft.Bridge.ofRows(spark, node)
      .drop(BandCol, LoCol, HiCol)
  }

  /** Native twin of [[graft.operators.Joins.rangeJoinBanded]]: inner-join
    * rows `pointDf.* ++ intervalDf.*` per containment `lo <= p <= hi`.
    * Points are degenerate `[p, p]` intervals in exactly one band, so the
    * claim predicate is vacuously true for them and every containment pair
    * is emitted exactly once. */
  def rangeJoin(
      pointDf: DataFrame,
      intervalDf: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0)
    join(
      banded(pointDf, col(pointCol), col(pointCol), bucketWidth),
      banded(intervalDf, col(loCol), col(hiCol), bucketWidth),
      bucketWidth)
  }

  /** Native twin of [[graft.operators.Joins.intervalOverlapJoin]]:
    * `aDf.* ++ bDf.*` per overlapping pair, claimed exactly once. */
  def intervalOverlapJoin(
      aDf: DataFrame,
      bDf: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0)
    join(
      banded(aDf, col(aLo), col(aHi), bucketWidth),
      banded(bDf, col(bLo), col(bHi), bucketWidth),
      bucketWidth)
  }
}
