package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Portable Bloom filters over pre-hashed 64-bit keys — the broadcast
  * membership-prefilter primitive for 100 TB pipelines (see
  * [[graft.ops.Dedup.contaminationBloom]]):
  *
  *   - `graft_bloom_agg(hash64, numBits, numHashes)` — aggregate a column
  *     of xxhash64 values into a serialized filter (BINARY). Merging is
  *     bitwise OR, so partial aggregation is exact and re-aggregating any
  *     partitioning of the data yields BYTE-IDENTICAL filters.
  *   - `graft_bloom_contains(filter, hash64)` — scalar membership probe;
  *     no false negatives, false-positive rate set by the sizing below.
  *
  * Both sides take LONG keys on purpose: callers feed `xxhash64(x)` —
  * Spark's own codegen'd stable hash — so the whole probe pipeline stays
  * inside whole-stage codegen (this expression generates a static call,
  * never a UDF), and filters stay portable across jobs like the HLL
  * sketches ([[HllImpl]]). Probes read the serialized bytes directly; a
  * filter shipped as a literal costs no per-row deserialization.
  *
  * Sizing (standard formulas): for n expected keys at false-positive
  * rate p, bits m = -n·ln(p)/ln²2 and hashes k = (m/n)·ln2. Index i is
  * derived by double hashing h1 + i·h2 from the two halves of the key
  * (Kirsch & Mitzenmacher 2006).
  */
object BloomImpl {
  val Version: Byte = 1
  private val HeaderLen = 6 // version, k, numBits int

  def optimalNumBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1, "need n > 0 and 0 < fpp < 1")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    math.min(m, Int.MaxValue.toDouble - 64).toLong.max(64L).toInt
  }

  def optimalNumHashes(n: Long, m: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  def create(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 32, s"numHashes must be in [1,32], got $numHashes")
    val nBytes = (numBits + 7) / 8
    val out = new Array[Byte](HeaderLen + nBytes)
    out(0) = Version
    out(1) = numHashes.toByte
    out(2) = (numBits >>> 24).toByte
    out(3) = (numBits >>> 16).toByte
    out(4) = (numBits >>> 8).toByte
    out(5) = numBits.toByte
    out
  }

  def numBits(f: Array[Byte]): Int =
    ((f(2) & 0xff) << 24) | ((f(3) & 0xff) << 16) | ((f(4) & 0xff) << 8) | (f(5) & 0xff)

  private def checkHeader(f: Array[Byte]): Unit = {
    require(f.length > HeaderLen && f(0) == Version, "not a graft bloom filter")
    require(f.length == HeaderLen + (numBits(f) + 7) / 8, "bloom filter length mismatch")
  }

  def put(f: Array[Byte], hash: Long): Unit = {
    val m = numBits(f)
    val k = f(1).toInt
    val h1 = (hash >>> 32).toInt
    val h2 = hash.toInt
    var i = 0
    while (i < k) {
      var idx = (h1 + i * h2) % m
      if (idx < 0) idx += m
      f(HeaderLen + (idx >>> 3)) = (f(HeaderLen + (idx >>> 3)) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  /** Codegen entry point: membership probe straight off the bytes. */
  def mightContain(f: Array[Byte], hash: Long): Boolean = {
    val m = numBits(f)
    val k = f(1).toInt
    val h1 = (hash >>> 32).toInt
    val h2 = hash.toInt
    var i = 0
    while (i < k) {
      var idx = (h1 + i * h2) % m
      if (idx < 0) idx += m
      if ((f(HeaderLen + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** OR `other` into `acc`; both must be same-shape filters. */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Unit = {
    checkHeader(acc); checkHeader(other)
    require(acc.length == other.length && acc(1) == other(1),
      "bloom filter shape mismatch (numBits/numHashes)")
    var i = HeaderLen
    while (i < acc.length) {
      acc(i) = (acc(i) | other(i)).toByte
      i += 1
    }
  }
}

/** `graft_bloom_agg(hash64, numBits, numHashes)`: LONG column → filter. */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg takes a pre-hashed LONG key (use xxhash64), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = BloomImpl.create(numBits, numHashes)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.put(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    BloomImpl.mergeInto(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(filter, hash64)`: scalar probe, codegen'd. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains takes (BINARY filter, LONG hash), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(f: Any, h: Any): Any =
    BloomImpl.mightContain(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (f, h) => s"graft.functions.BloomImpl.mightContain($f, $h)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  private def intArg(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs => BloomAgg(exprs.head,
        if (exprs.size > 1) intArg(exprs(1), "numBits") else 1 << 20,
        if (exprs.size > 2) intArg(exprs(2), "numHashes") else 5), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", exprs => BloomMightContain(exprs.head, exprs(1)), "built-in")
  }
}
