package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bloom-filter kernel: Kirsch–Mitzenmacher double hashing
  * (k probe positions from two 64-bit hashes, "Less hashing, same
  * performance", ESA 2006) over a splitmix64-style finalizer (Steele et
  * al., public domain). Everything is static-forwarder-callable so the
  * probe's generated Java invokes it directly from whole-stage codegen.
  *
  * Wire format of a built filter (self-describing, so a probe needs no
  * out-of-band parameters): 4-byte big-endian numHashes, then the bit
  * words as 8-byte big-endian longs. An all-zero filter (built over zero
  * rows) matches nothing — the correct semantics for an empty build side.
  */
object BloomRuntime {

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Second, independent stream; forced odd so h1 + i*h2 walks all bits. */
  def mix64b(z: Long): Long = mix64(z ^ 0xC2B2AE3D27D4EB4FL) | 1L

  def setBits(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong << 6
    val h1 = mix64(key); val h2 = mix64b(key)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe a serialized filter. Stateless over the byte array (k random
    * 8-byte reads per call), so generated code needs no cached
    * deserialization — the fact-side filter stays inside codegen.
    */
  def mightContain(bf: Array[Byte], key: Long): Boolean = {
    if (bf == null) return false
    val k = ((bf(0) & 255) << 24) | ((bf(1) & 255) << 16) |
      ((bf(2) & 255) << 8) | (bf(3) & 255)
    val numWords = (bf.length - 4) >>> 3
    val numBits = numWords.toLong << 6
    if (numBits == 0) return false
    val h1 = mix64(key); val h2 = mix64b(key)
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      val off = 4 + ((pos >>> 6).toInt << 3)
      var word = 0L
      var j = 0
      while (j < 8) { word = (word << 8) | (bf(off + j) & 255L); j += 1 }
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](4 + words.length * 8)
    out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w); val off = 4 + w * 8
      var j = 0
      while (j < 8) { out(off + j) = (v >>> (56 - 8 * j)).toByte; j += 1 }
      w += 1
    }
    out
  }
}

/** `bloom_build(key, numBits, numHashes)`: aggregate a long-key column
  * into a serialized bloom filter (BinaryType).
  *
  * The runtime-filter build side of a semi-join prune: aggregate the
  * build table's keys (map-side partials merge by bitwise OR, so the
  * result is ORDER-INDEPENDENT and bit-deterministic — safe under any
  * shuffle schedule), broadcast the one-row result, and pre-filter the
  * probe side with `bloom_probe` BEFORE its shuffle. False positives
  * only let extra rows through to the exact join behind it; false
  * negatives are impossible — so the end-to-end result is exact while
  * the probe side's exchange shrinks by the build side's selectivity.
  * This is the always-available form of the engine-internal runtime
  * row-level filtering Spark applies only in narrow circumstances.
  */
case class BloomFilterBuildAgg(
    child: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  def this(child: Expression, numBits: Expression, numHashes: Expression) =
    this(child, numBits, numHashes, 0, 0)
  def this(child: Expression) =
    this(child, Literal(1 << 23), Literal(6))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType ||
        numBitsExpr.dataType != IntegerType ||
        numHashesExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_build expects (bigint, int, int) arguments, got " +
          children.map(_.dataType.sql).mkString(", "))
    else if (!numBitsExpr.foldable || !numHashesExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_build numBits/numHashes must be literals")
    else if (numBits <= 0 || numBits % 64 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build numBits must be a positive multiple of 64, got $numBits")
    else if (numHashes <= 0 || numHashes > 32)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build numHashes must be in [1, 32], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val numBits: Int = numBitsExpr.eval().asInstanceOf[Int]
  private lazy val numHashes: Int = numHashesExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.setBits(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomRuntime.toBytes(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomRuntime.toBytes(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((bytes.length - 4) >>> 3)
    var w = 0
    while (w < words.length) {
      val off = 4 + w * 8
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (bytes(off + j) & 255L); j += 1 }
      words(w) = v
      w += 1
    }
    words
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def children: Seq[Expression] =
    Seq(child, numBitsExpr, numHashesExpr)
  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterBuildAgg =
    copy(child = newChildren(0), numBitsExpr = newChildren(1),
      numHashesExpr = newChildren(2))
}

/** `mg_candidates(key, k)`: a Misra–Gries heavy-hitter summary over a
  * string column, evaluating to the ≤k candidate keys (sorted,
  * array<string>).
  *
  * The one-pass bounded-memory frequent-items sketch (Misra & Gries
  * 1982): k counters; a hit increments, a miss with spare capacity
  * inserts, a miss at capacity decrements ALL counters (evicting
  * zeros). Partials merge by summing shared keys then subtracting the
  * (k+1)-th largest count — the mergeable-summaries construction
  * (Agarwal et al., PODS 2012) that preserves the deterministic
  * GUARANTEE: every key with true frequency > n/(k+1) is in the result,
  * regardless of partition order. Borderline keys below the threshold
  * may come and go with merge order, so the summary is a CANDIDATE
  * GENERATOR, not an answer: follow it with an exact count of just the
  * candidates (broadcast the ≤k-entry array) and an exact threshold
  * filter — the same sketch-prunes-exact-verifies shape as the LSH and
  * bloom paths. Communication is ≤k entries per partition instead of a
  * full token shuffle, which is the 100 TB win.
  */
case class MisraGriesCandidates(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  def this(child: Expression, kExpr: Expression) = this(child, kExpr, 0, 0)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "mg_candidates expects (string, int) arguments, got " +
          children.map(_.dataType.sql).mkString(", "))
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("mg_candidates k must be a literal")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"mg_candidates k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else { // decrement-all: the classic MG miss-at-capacity step
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      buf.put(e.getKey, buf.get(e.getKey) + e.getValue) // absent boxes to 0
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤0 evicts
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = buf.keySet().toArray(new Array[String](0)).sorted
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      keys.map(org.apache.spark.unsafe.types.UTF8String.fromString))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `bloom_probe(bf, key)`: true iff `key` MIGHT be in the serialized
  * filter `bf` (never a false negative). Stateless byte-array probing
  * keeps it inside whole-stage codegen — the typical placement is a
  * `filter` directly over the fact scan, with `bf` arriving via a
  * broadcast one-row frame, so the pruned rows never reach the join
  * exchange.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects (binary, bigint) arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override protected def nullSafeEval(bf: Any, key: Any): Any =
    BloomRuntime.mightContain(bf.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bf, key) =>
      s"${ev.value} = graft.functions.BloomRuntime.mightContain($bf, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
