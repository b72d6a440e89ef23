package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** K-Minimum-Values (theta-style) distinct-VALUE sketches with a portable
  * serialization — the SET-OPERATION half of the sketch family that HLL
  * (functions/HllSketch.scala) cannot provide: because a KMV sketch keeps
  * the k smallest distinct 64-bit hashes as an explicit sample of the
  * value universe, two sketches support INTERSECTION estimates (audience
  * overlap, cross-source shared-users, contamination overlap) while
  * remaining mergeable for unions like HLL. Public construction: Beyer et
  * al. 2007 ("On Synopses for Distinct-Value Estimation Under Multiset
  * Operations") and the Apache DataSketches theta design.
  *
  *   - `graft_kmv_sketch(col, k)` — aggregate a column into a sketch
  *     (BINARY: version, k, n, then n ascending unsigned hashes). While
  *     fewer than k distinct values have been seen the sketch IS the
  *     exact distinct hash set, so small-group estimates are exact.
  *   - `graft_kmv_union(sketch)` — aggregate sketches into their union
  *     (merge + keep the k smallest; associative, commutative,
  *     idempotent — any partitioning yields byte-identical sketches).
  *   - `graft_kmv_est(sketch)` — distinct estimate: exact `n` when
  *     un-full, else `(k-1)/θ` with `θ` the k-th smallest hash as a
  *     fraction of the hash space.
  *   - `graft_kmv_inter(a, b)` — intersection estimate: the two k-min
  *     samples combine into the union's k-min sample K; the match rate
  *     of K against both sides scales the union estimate (exact when
  *     both sketches are un-full).
  *
  * At 100 TB the workflow mirrors the HLL one: per-increment/per-source
  * sketch rows in ordinary parquet columns, constant memory per group,
  * map-side partial merges — and overlap matrices across N sources cost
  * N·k longs of driver-free arithmetic instead of N² distinct joins.
  * Hashing is `xxhash64` seed 42 (the same stable public Spark hash the
  * HLL sketch uses); hash order is UNSIGNED, matching the uniform map
  * onto [0,1).
  */
object KmvImpl {
  val Version: Byte = 1

  /** Mutable bounded set of the k smallest distinct unsigned hashes. */
  final class Buffer(val k: Int) {
    // unsigned ascending order
    val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
        if (set.add(h)) set.pollLast()
        ()
      }
    }

    def mergeFrom(hashes: Array[Long]): Unit = {
      var i = 0
      while (i < hashes.length) { add(hashes(i)); i += 1 }
    }

    def toArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  def serialize(k: Int, hashes: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 8 * hashes.length)
    bb.put(Version).putInt(k).putInt(hashes.length)
    hashes.foreach(bb.putLong)
    bb.array()
  }

  /** Returns (k, ascending-unsigned hashes); validates the header. */
  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    require(bytes.length >= 9 && bytes(0) == Version, "not a graft KMV sketch")
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
    val k = bb.getInt
    val n = bb.getInt
    require(k >= 1 && n >= 0 && n <= k && bytes.length == 9 + 8L * n,
      s"KMV sketch length mismatch for k=$k n=$n")
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = bb.getLong; i += 1 }
    (k, hashes)
  }

  /** Unsigned hash → uniform fraction of the 64-bit hash space. */
  private def frac(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L).toDouble) / 1.8446744073709552E19

  def estimate(k: Int, hashes: Array[Long]): Long =
    if (hashes.length < k) hashes.length.toLong
    else math.round((k - 1).toDouble / frac(hashes(k - 1)))

  def estimateSerialized(bytes: Array[Byte]): Long = {
    val (k, hashes) = deserialize(bytes)
    estimate(k, hashes)
  }

  /** Intersection estimate from two serialized sketches (Beyer et al.
    * 2007): combine into the union's k-min sample `K` (k = min of the
    * two sketch sizes), estimate the union from `K`, and scale by the
    * fraction of `K` present in BOTH sides. Exact when both sketches
    * are un-full (they are then the complete hash sets).
    */
  def intersectSerialized(a: Array[Byte], b: Array[Byte]): Long = {
    val (ka, ha) = deserialize(a)
    val (kb, hb) = deserialize(b)
    val k = math.min(ka, kb)
    val buf = new Buffer(k)
    buf.mergeFrom(ha)
    buf.mergeFrom(hb)
    val union = buf.toArray
    val sa = new java.util.HashSet[java.lang.Long]()
    ha.foreach(h => sa.add(h))
    val sb = new java.util.HashSet[java.lang.Long]()
    hb.foreach(h => sb.add(h))
    var both = 0
    union.foreach(h => if (sa.contains(h) && sb.contains(h)) both += 1)
    if (union.length < k) both.toLong // exact: union sample is complete
    else {
      val unionEst = estimate(k, union)
      math.round(both.toDouble / k.toDouble * unionEst.toDouble)
    }
  }
}

/** `graft_kmv_sketch(col, k)`: values → serialized k-min-hash sketch. */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvImpl.Buffer] {
  require(k >= 16 && k <= 65536, "k must be in [16, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): KmvImpl.Buffer = new KmvImpl.Buffer(k)

  override def update(buffer: KmvImpl.Buffer, input: InternalRow): KmvImpl.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(buffer: KmvImpl.Buffer, other: KmvImpl.Buffer): KmvImpl.Buffer = {
    buffer.mergeFrom(other.toArray)
    buffer
  }

  override def eval(buffer: KmvImpl.Buffer): Any =
    KmvImpl.serialize(k, buffer.toArray)

  override def serialize(buffer: KmvImpl.Buffer): Array[Byte] =
    KmvImpl.serialize(buffer.k, buffer.toArray)

  override def deserialize(storageFormat: Array[Byte]): KmvImpl.Buffer = {
    val (kk, hashes) = KmvImpl.deserialize(storageFormat)
    val buf = new KmvImpl.Buffer(kk)
    buf.mergeFrom(hashes)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** `graft_kmv_union(sketch)`: serialized sketches → their union sketch. */
case class KmvUnionAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[KmvImpl.Buffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_union requires binary sketches, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Option[KmvImpl.Buffer] = None

  private def fold(acc: Option[KmvImpl.Buffer], k: Int,
                   hashes: Array[Long]): Option[KmvImpl.Buffer] = acc match {
    case None =>
      val buf = new KmvImpl.Buffer(k)
      buf.mergeFrom(hashes)
      Some(buf)
    case Some(buf) =>
      require(buf.k == k, s"cannot union KMV sketches of different k: ${buf.k} vs $k")
      buf.mergeFrom(hashes)
      acc
  }

  override def update(buffer: Option[KmvImpl.Buffer], input: InternalRow): Option[KmvImpl.Buffer] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val (k, hashes) = KmvImpl.deserialize(v.asInstanceOf[Array[Byte]])
      fold(buffer, k, hashes)
    }
  }

  override def merge(buffer: Option[KmvImpl.Buffer],
                     other: Option[KmvImpl.Buffer]): Option[KmvImpl.Buffer] =
    other match {
      case None => buffer
      case Some(o) => fold(buffer, o.k, o.toArray)
    }

  override def eval(buffer: Option[KmvImpl.Buffer]): Any =
    buffer.map(b => KmvImpl.serialize(b.k, b.toArray)).orNull

  override def serialize(buffer: Option[KmvImpl.Buffer]): Array[Byte] =
    buffer.map(b => KmvImpl.serialize(b.k, b.toArray))
      .getOrElse(Array.emptyByteArray)

  override def deserialize(storageFormat: Array[Byte]): Option[KmvImpl.Buffer] =
    if (storageFormat.isEmpty) None
    else {
      val (k, hashes) = KmvImpl.deserialize(storageFormat)
      val buf = new KmvImpl.Buffer(k)
      buf.mergeFrom(hashes)
      Some(buf)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)
}

/** `graft_kmv_est(sketch)`: scalar distinct estimate from a sketch. */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_est"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_est requires a binary sketch, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    KmvImpl.estimateSerialized(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvImpl.estimateSerialized($c)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `graft_kmv_inter(a, b)`: intersection-cardinality estimate. */
case class KmvIntersect(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_inter"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_inter requires two binary sketches, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvImpl.intersectSerialized(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KmvImpl.intersectSerialized($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

object KmvFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_sketch", exprs => KmvSketchAgg(exprs.head,
        if (exprs.size > 1) exprs(1).eval(null).asInstanceOf[Int] else 4096), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_union", exprs => KmvUnionAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_est", exprs => KmvEstimate(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_inter", exprs => KmvIntersect(exprs(0), exprs(1)), "built-in")
  }
}
