package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ count(c)² over a string's code points — the numerator of the
  * character-distribution Gini/Simpson junk score (TextAnalysis.charGini).
  *
  * One pass over the string with an on-stack 128-slot ASCII histogram
  * (the corpus hot path) and a lazy spill map for anything above; no
  * per-character string objects, no sort. The composed-expression
  * alternative (`split` → `array_sort` → `aggregate` run-length fold)
  * allocates one string per character and pays an O(n log n) comparison
  * sort per document — measured 8× slower at sf0.1, and the garbage is
  * pure overhead at 100 TB. Semantics match SQL's
  * `SUM(cnt²) FROM (GROUP BY doc, char)` with chars = code points.
  */
object CharStatsImpl {
  def charSsq(s: UTF8String): Long = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap
        val box = Integer.valueOf(cp)
        val cell = other.get(box)
        if (cell == null) other.put(box, Array(1L)) else cell(0) += 1L
      }
      i += Character.charCount(cp)
    }
    var ssq = 0L
    var c = 0
    while (c < 128) { val k = ascii(c); ssq += k * k; c += 1 }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val k = it.next()(0); ssq += k * k }
    }
    ssq
  }
}

/** Native codegen'd expression: stays inside whole-stage codegen via a
  * static call, like SimHash60.
  */
case class CharSsq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_ssq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ssq requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharStatsImpl.charSsq(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStatsImpl.charSsq($c)")

  override protected def withNewChildInternal(newChild: Expression): CharSsq =
    copy(child = newChild)
}
