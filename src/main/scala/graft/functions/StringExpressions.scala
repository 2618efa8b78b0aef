package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls (codegen emits a plain Java
  * static invocation; a Scala top-level object provides one). The ASCII
  * fast path skips the Normalizer entirely — web corpora are
  * overwhelmingly ASCII, and an ASCII string is NFC by construction.
  */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else {
      val j = s.toString
      if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
    }
  }
}

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Training-corpus text arrives in mixed normalization forms (decomposed
  * accents from mac filesystems, composed from everywhere else);
  * canonicalizing is a prerequisite for exact/near dedup — "café" in NFD
  * and NFC must hash identically. Spark has no normalization builtin, and
  * a Scala UDF would break whole-stage codegen on the hottest projection
  * in the cleaning pipeline, so this is a `UnaryExpression` with
  * `doGenCode` (same pattern as [[FloatVecDot]]). Both Java's
  * `java.text.Normalizer` and DuckDB's `nfc_normalize` implement the
  * Unicode canonical-composition algorithm, so outputs are bit-identical
  * across the engine and its oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
