package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable quantile sketches via a DETERMINISTIC bottom-k sample —
  * completing graft's portable sketch family (HLL = distinct, Bloom =
  * membership, Misra-Gries = frequency, this = quantiles):
  *
  *   - `graft_qsketch(value, idStr, k)` — aggregate (value, unique-id)
  *     rows into the k rows whose md5-derived rank is smallest (BINARY:
  *     header + sorted (rank, value) pairs). A bottom-k-by-hash sample
  *     is a uniform sample of the rows, and bottom-k of a union equals
  *     bottom-k over the parts' bottom-k's — so the aggregate is
  *     associative, commutative, idempotent, and BYTE-IDENTICAL under
  *     any partitioning. Store one per day/source/shard.
  *   - `graft_qsketch_union(sketch)` — union already-built sketches.
  *   - `graft_qsketch_q(sketch, q)` — nearest-rank quantile estimate
  *     from a sketch (sorted-sample element at floor(q·(n−1))).
  *
  * Unlike t-digest/KLL (merge order changes the summary) or Spark's
  * `approx_percentile` (engine-internal buffer), the sample IS the
  * sketch: any engine that can md5 a string reproduces it exactly — the
  * driver's DuckDB oracle recomputes the identical sample and quantiles
  * in plain SQL (rank ≙ `('0x' || substr(md5(id),1,13))::BIGINT`).
  *
  * At 100 TB: one scan builds per-slice sketches (constant memory per
  * partial, k·16 bytes each); any slice's p50/p99 is a union over its
  * sketch rows — no raw-data rescan. Rank-space error of the k-sample
  * quantile is ~sqrt(q(1−q)/k) (k=1024 → ~1.6% at the median).
  *
  * The id must be row-unique (ranks of duplicated ids collide and the
  * collision's survival then depends on nothing else — ties break by
  * (rank, value) so the result stays deterministic regardless).
  */
object QSketchImpl {
  val Version: Byte = 1

  /** First 52 bits of md5(id) — the largest md5 slice a double holds
    * exactly, and exactly what SQL's 13-hex-char slice computes.
    */
  def rankOf(id: UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(id.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 56 bits collected, drop the low nibble -> 13 hex chars
  }

  /** Aggregation buffer: bounded worst-first heap of (rank, value). */
  final class Buf(val k: Int) {
    val heap = new java.util.PriorityQueue[(Long, Double)](
      math.max(1, k),
      // max-heap on (rank, value): head is the first pair to evict
      (a: (Long, Double), b: (Long, Double)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Double.compare(b._2, a._2)
      })

    def add(rank: Long, value: Double): Unit = {
      if (heap.size < k) heap.add((rank, value))
      else {
        val worst = heap.peek()
        if (rank < worst._1 || (rank == worst._1 && value < worst._2)) {
          heap.poll(); heap.add((rank, value))
        }
      }
    }

    def mergeFrom(pairs: Array[(Long, Double)]): Unit =
      pairs.foreach(p => add(p._1, p._2))

    /** Canonical (rank, value)-sorted pair list. */
    def sortedPairs: Array[(Long, Double)] = {
      val arr = heap.toArray(new Array[(Long, Double)](heap.size))
      scala.util.Sorting.stableSort(arr,
        (a: (Long, Double), b: (Long, Double)) =>
          a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
      arr
    }
  }

  def serialize(k: Int, pairs: Array[(Long, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 16 * pairs.length)
    bb.put(Version).putInt(k).putInt(pairs.length)
    pairs.foreach { case (r, v) => bb.putLong(r).putDouble(v) }
    bb.array()
  }

  /** Returns (k, pairs); validates the header. */
  def deserialize(bytes: Array[Byte]): (Int, Array[(Long, Double)]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.get() == Version, "not a graft quantile sketch")
    val k = bb.getInt
    val n = bb.getInt
    require(bytes.length == 9 + 16 * n, s"sketch length mismatch for n=$n")
    (k, Array.fill(n)((bb.getLong, bb.getDouble)))
  }

  /** Nearest-rank quantile from a serialized sketch (codegen entry). */
  def quantileSerialized(bytes: Array[Byte], q: Double): Double = {
    val values = deserialize(bytes)._2.map(_._2)
    require(values.nonEmpty, "empty quantile sketch")
    java.util.Arrays.sort(values)
    values(math.floor(q * (values.length - 1)).toInt)
  }
}

/** `graft_qsketch(value, idStr, k)`: rows → serialized bottom-k sample. */
case class QSketchAgg(value: Expression, id: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchImpl.Buf] {
  require(k >= 16 && k <= 65536, "k must be in [16, 65536]")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_qsketch"

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, id.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_qsketch requires (double, string), got $other")
    }

  override def createAggregationBuffer(): QSketchImpl.Buf = new QSketchImpl.Buf(k)

  override def update(buffer: QSketchImpl.Buf, input: InternalRow): QSketchImpl.Buf = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buffer.add(QSketchImpl.rankOf(i.asInstanceOf[UTF8String]),
        v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QSketchImpl.Buf, other: QSketchImpl.Buf): QSketchImpl.Buf = {
    buffer.mergeFrom(other.sortedPairs)
    buffer
  }

  override def eval(buffer: QSketchImpl.Buf): Any =
    QSketchImpl.serialize(k, buffer.sortedPairs)

  override def serialize(buffer: QSketchImpl.Buf): Array[Byte] =
    QSketchImpl.serialize(buffer.k, buffer.sortedPairs)

  override def deserialize(storageFormat: Array[Byte]): QSketchImpl.Buf = {
    val (kk, pairs) = QSketchImpl.deserialize(storageFormat)
    val b = new QSketchImpl.Buf(kk)
    b.mergeFrom(pairs)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QSketchAgg =
    copy(value = newChildren(0), id = newChildren(1))
}

/** `graft_qsketch_union(sketch)`: serialized sketches → union sketch. */
case class QSketchUnionAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchImpl.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_qsketch_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_qsketch_union requires a binary sketch, got ${other.catalogString}")
  }

  // k is read from the first input sketch; 0 marks "empty"
  override def createAggregationBuffer(): QSketchImpl.Buf = new QSketchImpl.Buf(0)

  private def mergeSketch(buffer: QSketchImpl.Buf, bytes: Array[Byte]): QSketchImpl.Buf = {
    val (kk, pairs) = QSketchImpl.deserialize(bytes)
    val target = if (buffer.k == 0) new QSketchImpl.Buf(kk) else buffer
    require(target.k == kk, "quantile sketch k mismatch")
    target.mergeFrom(pairs)
    target
  }

  override def update(buffer: QSketchImpl.Buf, input: InternalRow): QSketchImpl.Buf = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeSketch(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: QSketchImpl.Buf, other: QSketchImpl.Buf): QSketchImpl.Buf =
    if (other.k == 0) buffer
    else if (buffer.k == 0) other
    else { require(buffer.k == other.k, "quantile sketch k mismatch"); buffer.mergeFrom(other.sortedPairs); buffer }

  override def eval(buffer: QSketchImpl.Buf): Any =
    if (buffer.k == 0) null
    else QSketchImpl.serialize(buffer.k, buffer.sortedPairs)

  override def serialize(buffer: QSketchImpl.Buf): Array[Byte] =
    QSketchImpl.serialize(buffer.k, buffer.sortedPairs)

  override def deserialize(storageFormat: Array[Byte]): QSketchImpl.Buf = {
    val (kk, pairs) = QSketchImpl.deserialize(storageFormat)
    val b = new QSketchImpl.Buf(kk)
    b.mergeFrom(pairs)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QSketchUnionAgg =
    copy(child = newChildren.head)
}

/** `graft_qsketch_q(sketch, q)`: nearest-rank quantile from a sketch. */
case class QSketchQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_qsketch_q"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_qsketch_q requires (binary, double), got $other")
    }

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    QSketchImpl.quantileSerialized(sketch.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (s, q) =>
      s"graft.functions.QSketchImpl.quantileSerialized($s, $q)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QSketchQuantile =
    copy(left = newLeft, right = newRight)
}

object QSketchFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch", exprs => QSketchAgg(exprs(0), exprs(1),
        if (exprs.size > 2) exprs(2).eval(null).asInstanceOf[Int] else 1024), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch_union", exprs => QSketchUnionAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qsketch_q", exprs => QSketchQuantile(exprs(0), exprs(1)), "built-in")
  }
}
