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

/** Static helpers for the packed-set expressions below. A "packed set" is
  * one flat binary blob holding a doc's DISTINCT shingles in ascending
  * UTF8-binary order, each as a 4-byte big-endian length prefix + UTF8
  * bytes. One blob column instead of an array<string> column matters in
  * the verify joins: a non-codegen join materializing an output row
  * serializes an array<string> element by element (measured ~120 µs/row
  * across the two candidate-attach joins of `Dedup.exactJaccard` at
  * sf0.1 — 171 CPU-s for 1.5 M candidates), while a binary column is one
  * memcpy (~8× less CPU on the identical join shape, TmpMicro probe,
  * OPTIMIZATION_r11.md).
  */
object PackedSetUtil {
  /** Pack a SORTED array of distinct non-null strings. */
  def pack(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var bytes = 0
    var i = 0
    while (i < n) { bytes += 4 + arr.getUTF8String(i).numBytes(); i += 1 }
    val out = new Array[Byte](bytes)
    var pos = 0
    i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val len = s.numBytes()
      out(pos) = (len >>> 24).toByte
      out(pos + 1) = (len >>> 16).toByte
      out(pos + 2) = (len >>> 8).toByte
      out(pos + 3) = len.toByte
      s.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos + 4)
      pos += 4 + len
      i += 1
    }
    out
  }

  private def tokenLen(a: Array[Byte], pos: Int): Int =
    ((a(pos) & 0xff) << 24) | ((a(pos + 1) & 0xff) << 16) |
      ((a(pos + 2) & 0xff) << 8) | (a(pos + 3) & 0xff)

  /** Unsigned-byte lexicographic compare of two length-prefixed tokens —
    * exactly UTF8String's binary order (what `sort_array` sorted by).
    */
  private def cmpTok(a: Array[Byte], pa: Int, la: Int,
                     b: Array[Byte], pb: Int, lb: Int): Int = {
    val n = if (la < lb) la else lb
    var i = 0
    while (i < n) {
      val d = (a(pa + i) & 0xff) - (b(pb + i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    la - lb
  }

  /** |A ∩ B| by two-pointer merge over two packed sets. O(|a|+|b|) byte
    * compares, zero allocation.
    */
  def intersectCount(a: Array[Byte], b: Array[Byte]): Int = {
    var pa = 0
    var pb = 0
    var c = 0
    while (pa < a.length && pb < b.length) {
      val la = tokenLen(a, pa)
      val lb = tokenLen(b, pb)
      val d = cmpTok(a, pa + 4, la, b, pb + 4, lb)
      if (d == 0) { c += 1; pa += 4 + la; pb += 4 + lb }
      else if (d < 0) pa += 4 + la
      else pb += 4 + lb
    }
    c
  }
}

/** `pack_sorted_strings(array<string>) -> binary`: the packed-set builder
  * (see [[PackedSetUtil]]). Runs once per DOC in the doc-array build, so
  * its cost is amortized over every candidate pair the doc appears in.
  * PRECONDITION (caller: `Dedup.exactJaccard`): elements ascending in
  * UTF8 binary order, distinct, non-null — what
  * `sort_array(collect_list(...))` over a deduped posting frame yields.
  */
case class PackSortedStrings(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, BinaryType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pack_sorted_strings expects array<string>, got ${dt.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_sorted_strings"

  override protected def nullSafeEval(input: Any): Any =
    PackedSetUtil.pack(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PackedSetUtil.pack($a);")

  override protected def withNewChildInternal(newChild: Expression): PackSortedStrings =
    copy(child = newChild)
}

/** `packed_intersect_count(binary, binary) -> int`: |A ∩ B| over two
  * packed sets — the exact-Jaccard verify kernel.
  *
  * `size(array_intersect(a, b))` computes the same count, but
  * `ArrayIntersect` on string elements runs the interpreted set path (a
  * fresh hash set per ROW, every element boxed, the intersection array
  * materialized only to be counted) — measured 372 CPU-seconds for the
  * 1.5 M-candidate verify stage of `dedup_minhash_eval` at sf0.1
  * (~250 µs/row), and even with a cheap merge kernel the array<string>
  * payload itself costs ~120 µs/row in join-output serialization. Packed
  * blobs + this merge count cut the verify stage to single-digit CPU-s
  * (guide §1.2 step 2 / §4: replace the non-codegen hot path; §2.3:
  * narrow the payload).
  */
case class PackedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{BinaryType, IntegerType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_intersect_count expects two binary arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "packed_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedSetUtil.intersectCount(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PackedSetUtil.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedIntersectCount =
    copy(left = newLeft, right = newRight)
}
