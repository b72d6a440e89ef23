package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.SparkSession

/** Vector kernels as native expressions.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate the
  * lambda per element in interpreted mode and allocate an intermediate
  * array — ~10× slower than this tight primitive loop, which also stays
  * inside whole-stage codegen via a static call. The fold is sequential
  * left-to-right in double, so results are bit-identical to the
  * `aggregate(zip_with(...))` formulation and to the oracle's ordered sum.
  */
object VectorOpsImpl {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class DotDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOpsImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

/** `graft_l2sq(a, b)`: squared L2 distance as the same sequential double
  * fold the `aggregate(zip_with(...))` spelling performs — bit-identical,
  * but one static call inside whole-stage codegen instead of two
  * interpreted lambdas per term (the PQ encode/ADC hot loop).
  */
case class L2SqDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_l2sq requires two array<double>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOpsImpl.l2sq($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2SqDouble =
    copy(left = newLeft, right = newRight)
}

/** The md5-derived SRP/JL hyperplane matrix and its projection kernel.
  *
  * Weight derivation must stay bit-identical to the SQL oracle's
  * `instr('0123456789abcdef', substr(md5(p || '|' || d), 1, 1)) - 1 - 7.5`
  * (the top nibble of md5("p|d") minus 7.5) — `graft.ops.Similarity
  * .planeWeights` delegates here so every SRP consumer shares one source.
  */
object JlProjectImpl {
  def planeWeights(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      md.reset()
      val digest = md.digest(s"$p|$d".getBytes("UTF-8"))
      (((digest(0) >> 4) & 0xf) - 7.5)
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def weights(planes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dims),
      k => planeWeights(k._1, k._2))

  private def roundHalfAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  /** All `planes` projections in one compiled pass: per term the exact
    * double product x·w·10⁶ is micro-rounded (half away from zero — SQL
    * `round` semantics) BEFORE the sequential long sum, so the result is
    * bit-identical to the `aggregate(zip_with(...))` spelling and to the
    * DuckDB oracle regardless of engine or partitioning.
    */
  def project(a: ArrayData, planes: Int, isFloat: Boolean): ArrayData = {
    val dims = a.numElements()
    val w = weights(planes, dims)
    val out = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0L
      var d = 0
      while (d < dims) {
        val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
        acc += roundHalfAway(x * wp(d) * 1000000.0)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `graft_jlproject(embedding, planes)`: array<float|double> →
  * array<bigint>[planes] of micro-rounded JL projections. The
  * higher-order-function spelling evaluates two lambdas per term in
  * interpreted mode; this is one static call inside whole-stage codegen
  * (same reasoning as [[DotDouble]], 4× on the projection bench query).
  */
case class JlProject(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jlproject"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (planes >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_jlproject needs planes >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_jlproject requires array<float|double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    JlProjectImpl.project(a.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.JlProjectImpl.project($c, $planes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotDouble(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2SqDouble(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jlproject", exprs => JlProject(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_jlproject planes must be an int literal, got $other")
      }), "built-in")
  }
}
