package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stage ("salted") aggregation for skewed group keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a whale key to one
  * reducer. Spark's partial aggregation already combines map-side, but when
  * a single key's PARTIAL states are still too hot (huge distinct-ish state,
  * or the downstream needs the pre-aggregated layout), the classic fix is:
  * stage 1 aggregates on (key, salt) — spreading each key over `saltFactor`
  * reducers — and stage 2 merges the per-salt partials by key. Only
  * decomposable aggregates are eligible (sum/count/min/max here; avg is
  * derived as sum/count at the end).
  *
  * Semantically identical to the unsalted aggregate for these functions —
  * verified by the oracle-checked `q_skew_agg` query.
  */
object SkewAgg {

  /** Supported ops: "sum" | "count" | "min" | "max". Returns one row per
    * key with columns named `<op>_<col>` (count uses `count_rows` when
    * `col` is "*"). */
  def aggBySalt(
      df: DataFrame,
      keyCols: Seq[String],
      ops: Seq[(String, String)],
      saltFactor: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    require(saltFactor >= 1)
    def outName(op: String, c: String) = if (c == "*") s"${op}_rows" else s"${op}_$c"
    val stage1 = ops.map {
      case ("count", "*") => count(lit(1)).as(outName("count", "*"))
      case ("count", c) => count(col(c)).as(outName("count", c))
      case ("sum", c) => sum(col(c)).as(outName("sum", c))
      case ("min", c) => min(col(c)).as(outName("min", c))
      case ("max", c) => max(col(c)).as(outName("max", c))
      case (op, c) => throw new IllegalArgumentException(s"non-decomposable op $op($c)")
    }
    // merge stage: sums/counts add, min/max fold
    val stage2 = ops.map {
      case ("count", c) => sum(col(outName("count", c))).as(outName("count", c))
      case ("sum", c) => sum(col(outName("sum", c))).as(outName("sum", c))
      case ("min", c) => min(col(outName("min", c))).as(outName("min", c))
      case ("max", c) => max(col(outName("max", c))).as(outName("max", c))
      case (op, c) => throw new IllegalArgumentException(s"non-decomposable op $op($c)")
    }
    df.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(stage1.head, stage1.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(stage2.head, stage2.tail: _*)
  }
}
