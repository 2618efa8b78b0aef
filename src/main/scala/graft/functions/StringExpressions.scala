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

/** All 16 MinHash signature values of a shingle set in ONE native pass —
  * the codegen-class replacement for the nested higher-order-function
  * spelling `transform(sequence(0,15), i -> array_min(transform(
  * transform(shingles, s -> md5(s)), h -> rotate(h, 2i))))`.
  *
  * Semantics are BIT-IDENTICAL to that spelling (and to the DuckDB
  * oracle's list_transform/list_min twin): permutation i is the md5 hex
  * digest left-rotated by 2i characters, the signature value is the
  * lexicographic minimum over the document's shingles, an empty (or
  * all-null) shingle set yields 16 nulls (array_min over empty), and
  * null elements are skipped (array_min's null handling). Hex chars are
  * ASCII, so unsigned-byte order here equals UTF8String/VARCHAR order.
  *
  * Why native: higher-order functions evaluate INTERPRETED — per-element
  * lambda dispatch, boxed arrays, and no common-subexpression reuse
  * across the nested lambdas (under projection collapse the md5 map is
  * re-evaluated inside every rotation, and the whole 16-min computation
  * can re-run per exploded band). Measured on the 40× scale corpus, the
  * HOF spelling's signature stage swung between ~140 CPU-s and
  * ~6 300 CPU-s depending on evaluation context; this expression is one
  * md5 per shingle plus rotation COMPARES (no rotated strings are
  * materialized — candidate vs best compares walk the digest with
  * modular indexing, and most die on the first character), giving a
  * fixed ~40 CPU-s-class cost with no evaluation-context cliff.
  */
case class MinhashSignatures(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.ArrayType
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // current best per permutation, stored ROTATED (32 ASCII hex bytes)
    val best = new Array[Array[Byte]](16)
    val md = MinhashSignatures.digest.get()
    val hex = new Array[Byte](32)
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(e).getBytes)
        var b = 0
        while (b < 16) {
          val v = d(b) & 0xff
          hex(2 * b) = MinhashSignatures.hexChars(v >>> 4)
          hex(2 * b + 1) = MinhashSignatures.hexChars(v & 0xf)
          b += 1
        }
        var i = 0
        while (i < 16) {
          val off = 2 * i
          val cur = best(i)
          var smaller = cur == null
          if (!smaller) {
            // compare rotate(hex, off) vs cur without materializing
            var j = 0
            var cont = true
            while (cont && j < 32) {
              val c = hex((off + j) & 31) & 0xff
              val p = cur(j) & 0xff
              if (c < p) { smaller = true; cont = false }
              else if (c > p) cont = false
              else j += 1
            }
          }
          if (smaller) {
            val rot = if (cur == null) new Array[Byte](32) else cur
            var j = 0
            while (j < 32) { rot(j) = hex((off + j) & 31); j += 1 }
            best(i) = rot
          }
          i += 1
        }
      }
      e += 1
    }
    val out = new Array[Any](16)
    var i = 0
    while (i < 16) {
      if (best(i) != null) out(i) = UTF8String.fromBytes(best(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatures =
    copy(child = newChild)
}

object MinhashSignatures {
  private val hexChars: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
