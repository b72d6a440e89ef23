package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch: `graft_mg_sketch(col, k)` aggregates
  * a string column into the ≤ k candidate heavy hitters, in one pass and
  * O(k) memory per partial.
  *
  * The guarantee that makes the two-pass exact pattern work
  * ([[graft.ops.TextAnalysis.heavyHitters]]): with k counters over N
  * items, every item whose true count exceeds N/(k+1) is guaranteed to
  * survive — including across merges (Misra & Gries 1982; mergeability
  * per Agarwal et al. 2012, "Mergeable Summaries": sum counters, then
  * subtract the (k+1)-th largest and drop the non-positive). So the
  * sketch NEVER misses a true heavy hitter; it only over-generates
  * candidates, and a second exact counting pass over the candidate set —
  * a broadcast semi-join, shuffle O(candidates) — removes the noise. The
  * final answer is exact at 100 TB without ever shuffling the full
  * item-frequency table.
  *
  * Output is the sorted candidate item array (estimates are deliberately
  * not exposed: MG estimates are order-dependent, the confirm pass is
  * what produces numbers worth reporting).
  */
object MgImpl {
  val Version: Byte = 1

  def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Version)
    out.writeInt(m.size)
    m.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readByte() == Version, "not a graft MG sketch")
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  /** Add one occurrence of `s`, holding the map at ≤ k counters. */
  def add(m: mutable.HashMap[String, Long], s: String, k: Int): Unit = {
    m.get(s) match {
      case Some(c) => m.update(s, c + 1)
      case None if m.size < k => m.put(s, 1L)
      case None =>
        // decrement-all: every stored counter pays one; zeros drop out.
        // O(k), amortized O(1) per input (each decrement cancels an add).
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c == 1L) dead += key else m.update(key, c - 1)
        }
        dead.foreach(m.remove)
    }
  }

  /** Merge `other` into `acc` (sum, then MG-compress back to ≤ k). */
  def mergeInto(acc: mutable.HashMap[String, Long],
                other: mutable.HashMap[String, Long], k: Int): Unit = {
    other.foreach { case (s, c) => acc.update(s, acc.getOrElse(s, 0L) + c) }
    if (acc.size > k) {
      // subtract the (k+1)-th largest count from everything; ≥ k+1
      // counters hit zero or below and drop, restoring the bound
      val cut = acc.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      acc.foreach { case (s, c) =>
        if (c <= cut) dead += s else acc.update(s, c - cut)
      }
      dead.foreach(acc.remove)
    }
  }
}

/** `graft_mg_sketch(col, k)`: string column → sorted candidate array. */
case class MgSketchAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_sketch takes a STRING item column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MgImpl.add(buffer, v.asInstanceOf[UTF8String].toString, k)
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MgImpl.mergeInto(buffer, other, k)
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] =
    MgImpl.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[String, Long] =
    MgImpl.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSketchAgg =
    copy(child = newChildren.head)
}

object FreqFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mg_sketch", exprs => MgSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        } else 4096), "built-in")
  }
}
