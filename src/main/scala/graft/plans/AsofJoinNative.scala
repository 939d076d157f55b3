package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.{col, lit}

/** Whole-operator ASOF join as a first-class Catalyst citizen — the
  * "custom `LogicalPlan` + `Rule`/`SparkStrategy` + `SparkPlan`" extension
  * path (SURVEY.md §2c preference order (c)), used where composing stock
  * operators can't give the physical shape we want. Spark has no ASOF join
  * (tracked upstream as SPARK-22947); the window-based
  * [[graft.operators.Joins.asofJoin]] expresses it with a union + running
  * `last()` — one shuffle, but the sort must interleave BOTH tables into a
  * single window partition stream, every left row is widened with null
  * filler for the carry struct, and the window buffers frame state.
  *
  * [[AsofJoinExec]] instead merges the two sorted sides directly, the way
  * a native engine (DuckDB's ASOF, KDB's aj) does:
  *
  *  - `requiredChildDistribution` = `ClusteredDistribution(keys)` on each
  *    side — `EnsureRequirements` co-partitions the children (and elides
  *    the exchange entirely for bucketed/pre-partitioned inputs, which the
  *    union formulation can never do: its union node destroys the
  *    children's partitioning info);
  *  - `requiredChildOrdering` = (keys, ts) per side — Spark plans the
  *    per-partition sorts, each over ONE table's rows only;
  *  - execution is a single forward pass zipping the two partition
  *    iterators: O(1) state (the last matching right row per current key),
  *    no window buffering, no filler columns, no post-projection.
  *
  * Backward (`right.ts <= left.ts`, inclusive) ASOF-LEFT semantics, exactly
  * matching [[graft.operators.Joins.asofJoin]]: null join keys and null
  * timestamps match nothing but keep their left rows; `tolerance` nulls the
  * carried values of stale matches (row kept). Forward joins reuse the
  * backward machinery on negated timestamps, as in the window twin.
  */
final case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long]
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for [[AsofJoin]]: push `LocalLimit` into the LEFT child.
  * Valid because an ASOF-LEFT join emits exactly one output row per left
  * row, in order — so only `n` left rows are needed to produce `n` output
  * rows. Catalyst's own `LimitPushDown` cannot know this about a foreign
  * node; without the rule a `limit(n)` above the join scans and sorts the
  * full left side. The right side is untouched (any left row may still
  * need an arbitrarily early right match). Registered via
  * `injectOptimizerRule` — with `injectFunction` (custom expressions) and
  * `injectPlannerStrategy` (custom exec) this completes the three
  * `SparkSessionExtensions` surfaces the engine exercises. */
object AsofLimitPushDown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Project}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // row-count-preserving Projects (e.g. the front door's internal ts-col
    // drop) sit between the limit and the join: push through them too
    case ll @ LocalLimit(expr, p @ Project(_, j: AsofJoin))
        if !j.left.isInstanceOf[LocalLimit] =>
      ll.copy(child = p.copy(child = j.copy(left = LocalLimit(expr, j.left))))
    case ll @ LocalLimit(expr, j: AsofJoin) if !j.left.isInstanceOf[LocalLimit] =>
      ll.copy(child = j.copy(left = LocalLimit(expr, j.left)))
  }
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]; a no-op on every other node. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, rv, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv, tol) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  // Both sides clustered on the join keys: EnsureRequirements inserts
  // compatible hash exchanges (or none, when a child is already partitioned
  // suitably — e.g. a bucketed scan) and equalizes partition counts.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Per-partition (keys, ts) sort on each side; Spark reuses existing
  // orderings when satisfied.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // Left rows pass through in order with columns appended, so the left
  // child's partitioning and ordering survive verbatim.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val rValsB = rightValues
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projections/orderings are codegen'd lazily PER EXECUTOR here — the
      // closure must capture only serializable expression trees
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val rValProj = UnsafeProjection.create(rValsB, rOut)
      val lTsBound = BindReferences.bindReference[Expression](lTsB, lOut)
      val rTsBound = BindReferences.bindReference[Expression](rTsB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullVals = new GenericInternalRow(rValsB.length)
        // current (not yet consumed) right row's key/ts/values — copies,
        // because sorter output rows are reused buffers
        private var rHas = false
        private var rKey: UnsafeRow = _
        private var rTs = 0L
        private var rVals: InternalRow = _
        // last right row that matched the current key range
        private var mKey: UnsafeRow = _
        private var mTs = 0L
        private var mVals: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val ts = rTsBound.eval(r)
            // null right keys/timestamps match nothing: drop here
            if (!k.anyNull && ts != null) {
              rKey = k.copy()
              rTs = ts.asInstanceOf[Long]
              rVals = rValProj(r).copy()
              rHas = true
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lts = lTsBound.eval(l)
          numOutputRows += 1
          if (lk.anyNull || lts == null) return joined(l, nullVals)
          val ltsL = lts.asInstanceOf[Long]
          var c = if (rHas) keyOrd.compare(rKey, lk) else 1
          while (rHas && (c < 0 || (c == 0 && rTs <= ltsL))) {
            if (c == 0) { mKey = rKey; mTs = rTs; mVals = rVals }
            advanceRight()
            c = if (rHas) keyOrd.compare(rKey, lk) else 1
          }
          val fresh = mKey != null && keyOrd.compare(mKey, lk) == 0 &&
            tol.forall(t => ltsL - mTs <= t)
          joined(l, if (fresh) mVals else nullVals)
        }
      }
    }
  }
}

/** Column-API front door for the native ASOF join. */
object AsofJoinNative {

  /** Registers [[AsofJoinStrategy]] on the session's experimental strategy
    * list (idempotent) — works on ANY session, with or without
    * [[graft.GraftExtensions]]. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsofJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsofJoinStrategy
    if (!em.extraOptimizations.contains(AsofLimitPushDown))
      em.extraOptimizations = em.extraOptimizations :+ AsofLimitPushDown
  }

  /** Native-exec twin of [[graft.operators.Joins.asofJoin]] (same argument
    * contract and output schema; ts columns must be integral). The right
    * side is re-projected through fresh aliases so self-joins (both sides
    * derived from one scan) carry no conflicting attribute ids. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      forward: Boolean = false,
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(valueCols.forall(v => !left.columns.contains(v)),
      s"right value columns ${valueCols.mkString(",")} collide with left schema")
    val spark = left.sparkSession
    ensureRegistered(spark)
    def ts(c: Column) = if (forward) -c else c
    val lts = "__graft_lts"
    val lp = left.withColumn(lts, ts(col(leftTs)).cast("long"))
    // fresh exprIds for every right column (Alias always mints a new id)
    val rp = right.filter(col(rightTs).isNotNull).select(
      keyCols.map(c => col(c).as(s"__graft_rk_$c")) ++
        Seq(ts(col(rightTs)).cast("long").as("__graft_rts")) ++
        valueCols.map(c => col(c).as(c)): _*)
    val lPlan = lp.queryExecution.analyzed
    val rPlan = rp.queryExecution.analyzed
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsofJoin(
      lPlan, rPlan,
      keyCols.map(attr(lPlan.output, _)),
      keyCols.map(c => attr(rPlan.output, s"__graft_rk_$c")),
      attr(lPlan.output, lts),
      attr(rPlan.output, "__graft_rts"),
      valueCols.map(attr(rPlan.output, _)),
      tolerance)
    org.apache.spark.sql.graft.Bridge.ofRows(spark, node).drop(lts)
  }
}
