package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable Count-Min sketches — approximate FREQUENCY tables for
  * vocabulary-scale columns, completing the sketch family (HLL =
  * distinct, Bloom = membership, Misra-Gries = heavy hitters, qsketch =
  * quantiles, CM = per-item counts):
  *
  *   - `graft_cm_sketch(item, weight[, width, depth])` — aggregate a
  *     STRING column (weight 1L for raw rows, a count for pre-grouped
  *     input) into a serialized depth×width grid of longs (BINARY).
  *     Merging is elementwise addition — associative and commutative —
  *     so ANY partitioning of the data yields BYTE-IDENTICAL sketches,
  *     and per-shard sketches persist/union like the HLL tables.
  *   - `graft_cm_union(sketch)` — re-aggregate persisted sketches.
  *   - `graft_cm_est(sketch, item)` — scalar estimate: min over rows of
  *     the item's cell. Never under-counts; over-counts by at most
  *     ε·N with ε = e/width at confidence 1 − e^(−depth).
  *
  * Engine parity: row r's bucket is the 52-bit md5 slice
  * `conv(substr(md5(r || '|' || item), 1, 13), 16, 10) % width` — the
  * same hash idiom every sampling/LSH op here uses — so a SQL engine
  * rebuilds the identical grid cell-for-cell and estimates match
  * EXACTLY, not just within ε (the oracle recomputes the min over
  * reconstructed cells).
  */
object CmImpl {
  val Version: Byte = 1
  private val HeaderLen = 6 // version, depth, width int

  def create(width: Int, depth: Int): Array[Byte] = {
    require(width >= 2 && width <= (1 << 24), s"width must be in [2, 2^24], got $width")
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val out = new Array[Byte](HeaderLen + depth * width * 8)
    out(0) = Version
    out(1) = depth.toByte
    out(2) = (width >>> 24).toByte
    out(3) = (width >>> 16).toByte
    out(4) = (width >>> 8).toByte
    out(5) = width.toByte
    out
  }

  def width(f: Array[Byte]): Int =
    ((f(2) & 0xff) << 24) | ((f(3) & 0xff) << 16) | ((f(4) & 0xff) << 8) | (f(5) & 0xff)
  def depth(f: Array[Byte]): Int = f(1).toInt

  private def checkHeader(f: Array[Byte]): Unit = {
    require(f.length > HeaderLen && f(0) == Version, "not a graft cm sketch")
    require(f.length == HeaderLen + depth(f) * width(f) * 8, "cm sketch length mismatch")
  }

  /** Row r's bucket: first 13 md5 hex nibbles of "r|item" as a 52-bit
    * big-endian value, mod width — `conv(substr(md5(..),1,13),16,10)`.
    */
  def bucket(r: Int, item: String, w: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest((r + "|" + item).getBytes("UTF-8"))
    var v = 0L
    var n = 0
    while (n < 13) {
      val b = digest(n >> 1) & 0xff
      val nib = if ((n & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      n += 1
    }
    (v % w).toInt
  }

  private def cellAt(f: Array[Byte], idx: Int): Long = {
    val o = HeaderLen + idx * 8
    ((f(o) & 0xffL) << 56) | ((f(o + 1) & 0xffL) << 48) |
      ((f(o + 2) & 0xffL) << 40) | ((f(o + 3) & 0xffL) << 32) |
      ((f(o + 4) & 0xffL) << 24) | ((f(o + 5) & 0xffL) << 16) |
      ((f(o + 6) & 0xffL) << 8) | (f(o + 7) & 0xffL)
  }

  private def setCell(f: Array[Byte], idx: Int, v: Long): Unit = {
    val o = HeaderLen + idx * 8
    f(o) = (v >>> 56).toByte; f(o + 1) = (v >>> 48).toByte
    f(o + 2) = (v >>> 40).toByte; f(o + 3) = (v >>> 32).toByte
    f(o + 4) = (v >>> 24).toByte; f(o + 5) = (v >>> 16).toByte
    f(o + 6) = (v >>> 8).toByte; f(o + 7) = v.toByte
  }

  def add(f: Array[Byte], item: String, n: Long): Unit = {
    val w = width(f); val d = depth(f)
    var r = 0
    while (r < d) {
      val idx = r * w + bucket(r, item, w)
      setCell(f, idx, cellAt(f, idx) + n)
      r += 1
    }
  }

  /** Codegen entry point: the min-over-rows estimate off the bytes. */
  def estimate(f: Array[Byte], item: UTF8String): Long = {
    val w = width(f); val d = depth(f)
    val s = item.toString
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = cellAt(f, r * w + bucket(r, s, w))
      if (c < best) best = c
      r += 1
    }
    best
  }

  def mergeInto(acc: Array[Byte], other: Array[Byte]): Unit = {
    checkHeader(acc); checkHeader(other)
    require(acc.length == other.length && acc(1) == other(1),
      "cm sketch shape mismatch (width/depth)")
    val cells = depth(acc) * width(acc)
    var i = 0
    while (i < cells) {
      setCell(acc, i, cellAt(acc, i) + cellAt(other, i))
      i += 1
    }
  }
}

/** `graft_cm_sketch(item, weight[, width, depth])`: STRING × LONG → sketch. */
case class CmSketchAgg(item: Expression, weight: Expression,
                       sketchWidth: Int, sketchDepth: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(item, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cm_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    (item.dataType, weight.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (i, w) => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_sketch takes (STRING item, LONG weight), got " +
          s"(${i.catalogString}, ${w.catalogString})")
    }

  override def createAggregationBuffer(): Array[Byte] =
    CmImpl.create(sketchWidth, sketchDepth)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val it = item.eval(input)
    val n = weight.eval(input)
    if (it != null && n != null)
      CmImpl.add(buffer, it.asInstanceOf[UTF8String].toString, n.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    CmImpl.mergeInto(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmSketchAgg =
    copy(item = newChildren(0), weight = newChildren(1))
}

/** `graft_cm_union(sketch)`: re-aggregate persisted sketches. */
case class CmUnionAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cm_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cm_union takes a cm sketch (BINARY), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val other = v.asInstanceOf[Array[Byte]]
      if (buffer.isEmpty) other.clone()
      else { CmImpl.mergeInto(buffer, other); buffer }
    }
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other
    else { CmImpl.mergeInto(buffer, other); buffer }

  override def eval(buffer: Array[Byte]): Any =
    if (buffer.isEmpty) null else buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): CmUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmUnionAgg =
    copy(child = newChildren.head)
}

/** `graft_cm_est(sketch, item)`: scalar estimate, codegen'd. */
case class CmEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_est"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_est takes (BINARY sketch, STRING item), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(f: Any, it: Any): Any =
    CmImpl.estimate(f.asInstanceOf[Array[Byte]], it.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (f, it) => s"graft.functions.CmImpl.estimate($f, $it)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}

object CmFunctions {
  private def intArg(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cm_sketch", exprs => CmSketchAgg(exprs(0), exprs(1),
        if (exprs.size > 2) intArg(exprs(2), "width") else 1024,
        if (exprs.size > 3) intArg(exprs(3), "depth") else 4), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cm_union", exprs => CmUnionAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cm_est", exprs => CmEstimate(exprs(0), exprs(1)), "built-in")
  }
}
