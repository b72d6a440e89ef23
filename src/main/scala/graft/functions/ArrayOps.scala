package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Merge-intersection kernels over SORTED, DISTINCT long arrays.
  *
  * The triangle/truss closure intersects the two endpoints' oriented
  * adjacency arrays once per base edge — the single hottest stage of the
  * graph family (bench round 15: 341 CPU-s of `graph_ktruss`'s 300-CPU-s
  * isolated run inside one `array_intersect` stage). Spark's
  * `ArrayIntersect` builds a hash set per ROW (one `OpenHashSet` +
  * per-element hashing and a growable output buffer, regardless of input
  * order); the closure's inputs are `sort_array(collect_list(...))` over
  * deduped edges — already ascending and distinct — so a two-pointer
  * merge does the same work allocation-free per element and emits the
  * identical array (ascending order = `array_intersect`'s left-side
  * order for sorted inputs; distinct inputs need no dedup).
  *
  * Contract: both inputs MUST be ascending-sorted and element-distinct;
  * the result is then bit-identical to `array_intersect(a, b)`. The
  * count form skips materializing the intersection for consumers that
  * only read `size(...)` (the triangle counter).
  */
object SortedArrayOpsImpl {
  def intersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    ArrayData.toArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { k += 1; i += 1; j += 1 }
    }
    k
  }
}

private[functions] trait SortedLongArrayInputs { self: BinaryExpression =>
  def fnName: String
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$fnName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
}

/** `graft_sorted_intersect(a, b)`: merge intersection of two sorted
  * distinct long arrays — `array_intersect` minus the per-row hash set.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with SortedLongArrayInputs {
  override def fnName: String = "graft_sorted_intersect"
  override def prettyName: String = fnName
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayOpsImpl.intersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedArrayOpsImpl.intersect($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

/** `graft_sorted_inter_size(a, b)`: `size(array_intersect(a, b))` for
  * sorted distinct long arrays, without materializing the intersection.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with SortedLongArrayInputs {
  override def fnName: String = "graft_sorted_inter_size"
  override def prettyName: String = fnName
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayOpsImpl.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedArrayOpsImpl.intersectSize($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedArrayFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect", exprs => SortedIntersect(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_inter_size", exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
  }
}
