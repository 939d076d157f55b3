package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashing kernels over token arrays, shared by eval and codegen.
  *
  * Extension rationale: the MinHash/SimHash dedup operators (SURVEY.md §2c,
  * north-star) need k hash evaluations per token. Doing this with k
  * `xxhash64(...)` expression trees would rescan the array k times and blow
  * up the plan; these kernels do one pass per document and stay inside
  * whole-stage codegen via a single static call.
  *
  * Token hash = XXH64 over the token's UTF-8 bytes (Spark's own `xxhash64`
  * core, `org.apache.spark.sql.catalyst.expressions.XXH64`), seeded per hash
  * function — deterministic across runs/executors.
  */
object HashOps {
  private def tokenHash(t: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), seed)

  /** MinHash signature: sig[i] = min over tokens of xxh64(token, seed+i). */
  def minHash(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t)
        var i = 0
        while (i < numHashes) {
          val h = tokenHash(tok, seed + i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash: bit j of the result is 1 iff the sum over tokens of
    * ±1 (sign of bit j of xxh64(token)) is positive. */
  def simHash(tokens: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = tokenHash(tokens.getUTF8String(t), seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

private[functions] object HashExprChecks {
  def tokenArray(name: String, child: Expression): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string>, got ${other.simpleString}")
  }
}

/** `minhash_signature(array<string>) -> array<long>` — k-permutation MinHash
  * signature in one pass (codegen'd via static call). */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.minHash(tokens.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.minHash($c, $numHashes, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `simhash64(array<string>) -> long` (codegen'd via static call). */
case class SimHash64(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.tokenArray(prettyName, child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(tokens: Any): Any =
    HashOps.simHash(tokens.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.simHash($c, ${seed}L);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
