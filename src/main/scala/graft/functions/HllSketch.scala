package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** HyperLogLog distinct-count sketches with a PORTABLE serialization —
  * the sketch-table workflow Spark's `approx_count_distinct` cannot do
  * (its HLL++ buffer is engine-internal and cannot be persisted or merged
  * by user code):
  *
  *   - `graft_hll_sketch(col, p)` — aggregate a column into a sketch
  *     (BINARY: version byte, p, then 2^p one-byte registers). Store one
  *     per partition/day/source in an ordinary parquet column.
  *   - `graft_hll_union(sketch)` — aggregate already-built sketches into
  *     their union. Register-wise max, so unioning is associative,
  *     commutative and idempotent: re-aggregating any partitioning of the
  *     data yields BYTE-IDENTICAL sketches.
  *   - `graft_hll_est(sketch)` — scalar estimate from a sketch.
  *
  * At 100 TB this replaces repeated full-corpus distinct scans: each
  * ingest increment aggregates its own sketch (map-side partial merge,
  * constant memory), and any slice's cardinality is a union over a few
  * thousand sketch rows. Hashing is `xxhash64` (the stable public Spark
  * SQL hash), standard HLL bias handling: linear counting below 2.5m,
  * no large-range correction needed at 64-bit.
  */
object HllImpl {
  val Version: Byte = 1

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  def estimate(registers: Array[Byte]): Long = {
    val m = registers.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha(m) * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.round(corrected)
  }

  def serialize(p: Int, registers: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](2 + registers.length)
    out(0) = Version
    out(1) = p.toByte
    System.arraycopy(registers, 0, out, 2, registers.length)
    out
  }

  /** Returns (p, registers); validates the header. */
  def deserialize(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == Version, "not a graft HLL sketch")
    val p = bytes(1).toInt
    require(bytes.length == 2 + (1 << p), s"sketch length mismatch for p=$p")
    (p, java.util.Arrays.copyOfRange(bytes, 2, bytes.length))
  }

  def mergeInto(acc: Array[Byte], other: Array[Byte]): Unit = {
    var i = 0
    while (i < acc.length) {
      if (other(i) > acc(i)) acc(i) = other(i)
      i += 1
    }
  }

  /** Estimate straight from a serialized sketch (codegen entry point). */
  def estimateSerialized(bytes: Array[Byte]): Long = estimate(deserialize(bytes)._2)
}

/** `graft_hll_sketch(col, p)`: column → serialized HLL sketch. */
case class HllSketchAgg(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = if (rest == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(rest) + 1
      if (rank > buffer(idx)) buffer(idx) = rank.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllImpl.mergeInto(buffer, other)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = HllImpl.serialize(p, buffer)
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

/** `graft_hll_union(sketch)`: serialized sketches → their union sketch. */
case class HllUnionAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_union requires a binary sketch, got ${other.catalogString}")
  }

  // empty marker until the first sketch arrives (p is read from input)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val (_, regs) = HllImpl.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer.isEmpty) regs.clone()
      else { require(buffer.length == regs.length, "sketch p mismatch"); HllImpl.mergeInto(buffer, regs); buffer }
    }
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (buffer.isEmpty) other.clone()
    else if (other.isEmpty) buffer
    else { HllImpl.mergeInto(buffer, other); buffer }

  override def eval(buffer: Array[Byte]): Any =
    if (buffer.isEmpty) null
    else HllImpl.serialize(java.lang.Integer.numberOfTrailingZeros(buffer.length), buffer)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllUnionAgg =
    copy(child = newChildren.head)
}

/** `graft_hll_est(sketch)`: scalar cardinality estimate from a sketch. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_est"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_est requires a binary sketch, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HllImpl.estimateSerialized(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllImpl.estimateSerialized($c)")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_sketch", exprs => HllSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 12), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_union", exprs => HllUnionAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_est", exprs => HllEstimate(exprs.head), "built-in")
  }
}
