package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array in one native pass —
  * value-identical to the compositional form
  * `array_distinct(transform(sequence(0, size(words)-n),
  *   i -> concat(words[i], ' ', …)))` (and to the SQL oracle's
  * `words[i] || ' ' || … DISTINCT`), but without the interpreted
  * higher-order-function pipeline: Spark's `transform` evaluates its
  * lambda per element with variable substitution, which dominates the
  * shingling stage of every dedup query. First-occurrence order is
  * preserved exactly like `array_distinct`.
  */
object ShingleImpl {
  private val Space = UTF8String.fromString(" ")

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      var ok = true
      while (j < n) {
        val w = words.getUTF8String(i + j)
        if (w == null) ok = false else parts(j) = w
        j += 1
      }
      // a null token would null the whole concat in the compositional
      // form; array_distinct would keep one null — tokens from split()
      // are never null, so simply skip (defensive, value-equal on real
      // inputs)
      if (ok) seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
