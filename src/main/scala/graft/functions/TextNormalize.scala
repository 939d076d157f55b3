package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus curation. Web-scraped text
  * mixes composed and decomposed forms of the same glyph ("é" as U+00E9
  * vs "e"+U+0301), which silently defeats exact dedup, fingerprinting and
  * token counting; NFC canonical composition makes byte-equal ⇔
  * glyph-equal for canonical equivalents. Spark has no normalization
  * builtin, so this is a native codegen'd expression over the JDK's
  * `java.text.Normalizer` (Unicode-conformant, no extra dependency);
  * DuckDB's independent `nfc_normalize` serves as the cross-engine
  * oracle.
  *
  * The ASCII fast path matters at 100 TB: normalization is O(n) with a
  * quick-check scan; pure-ASCII strings (the overwhelming majority of
  * web-corpus bytes) return the input UTF8String UNCOPIED.
  */
object TextNormOps {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII can't contain combining marks: quick reject without decoding
    val n = s.numBytes()
    var ascii = true
    var i = 0
    val base = s.getBaseObject
    val off = s.getBaseOffset
    while (ascii && i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) -> string` — Unicode NFC canonical composition
  * (codegen'd via static call; row-local, streaming-safe). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(s: Any): Any =
    TextNormOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNormOps.nfc($c);")

  protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
