package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels over Spark's columnar `ArrayData` — shared by
  * interpreted eval and generated code (the codegen emits a single static
  * call into these, the same pattern Spark uses for `StaticInvoke`).
  *
  * Extension rationale (SURVEY.md §2c/§7): the reference has no vector ops;
  * the north-star similarity-search/dedup operators need a fast cosine. The
  * higher-order-function formulation
  * (`aggregate(zip_with(a,b,_*_),0d,_+_)`) allocates a lambda frame per
  * element; this kernel is one branch-free loop, stays inside whole-stage
  * codegen, and is the hot inner op of the O(n·k) ANN refine stage.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** dot/(|a|·|b|) with norms accumulated in the same pass; 0.0 on zero
    * norm. Formula matches DuckDB's `list_cosine_similarity`
    * (dot / (sqrt(na)*sqrt(nb))) so oracle values agree bit-for-bit. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      s += x * y; na += x * x; nb += y * y; i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else s / d
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  /** One-pass-per-phase int8-quantization audit (see [[graft.functions.QuantizeStats]]).
    * Two passes: (norm², maxabs, n_pos), then codes from the derived scale —
    * the code sums need the scale, which needs the full maxabs. */
  def quantizeStats(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var ss = 0.0; var maxabs = 0.0; var nPos = 0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      ss += x * x
      val a = math.abs(x)
      if (a > maxabs) maxabs = a
      if (x > 0) nPos += 1
      i += 1
    }
    val scale = if (maxabs > 0) maxabs / 127.0 else 1.0
    var cs = 0L; var cl1 = 0L
    i = 0
    while (i < n) {
      val c = math.floor(v.getFloat(i).toDouble / scale + 0.5).toLong
      cs += c; cl1 += math.abs(c)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(math.sqrt(ss), nPos, cs, cl1, scale)
  }
}

private[functions] trait VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def kernel: String // method name on VectorOps

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dot" => VectorOps.dot(x, y)
      case "cosine" => VectorOps.cosine(x, y)
      case "l2" => VectorOps.l2(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.$kernel($a, $b);")
}

/** `cosine_sim(array<float>, array<float>) -> double` (codegen'd). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected val kernel = "cosine"
  override def prettyName: String = "cosine_sim"
  protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `dot_product(array<float>, array<float>) -> double` (codegen'd). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected val kernel = "dot"
  override def prettyName: String = "dot_product"
  protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `l2_distance(array<float>, array<float>) -> double` (codegen'd). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected val kernel = "l2"
  override def prettyName: String = "l2_distance"
  protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `quantize_stats(array<float>) -> struct(l2_norm, n_pos, code_sum,
  * code_l1, scale)` — the int8-quantization audit of one vector in a
  * single kernel call: l2 norm, positive-component count, max-abs symmetric
  * scale (`maxabs/127`, 1.0 for the zero vector), and the sum / l1 of the
  * rounded int8 codes. Replaces a 6-HOF formulation whose interpreted
  * lambdas re-walked the array per metric (measured ~10× this kernel on
  * the sf0.1 audit). Accumulation is sequential left-to-right, matching
  * both the HOF `aggregate` order and DuckDB list aggregates, so oracle
  * values are bit-identical. */
case class QuantizeStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("l2_norm", DoubleType, nullable = false),
    StructField("n_pos", IntegerType, nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("code_l1", LongType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_stats"

  protected override def nullSafeEval(a: Any): Any =
    VectorOps.quantizeStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorOps.quantizeStats($c);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
