package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession

/** 60-bit SimHash over a token array.
  *
  * Bit b (0-based, b < 60) is derived from md5(token)'s hex digit b/4,
  * nibble bit b%4 — exactly the formula the SQL oracle can reproduce with
  * `strpos('0123456789abcdef', substr(md5(t), b//4+1, 1))`. 60 bits keeps
  * the value positive in an int64 on both engines. Deduplicates tokens
  * first (set semantics, like shingle-based MinHash).
  */
object SimHashImpl {
  val Bits = 60

  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val s = t.toString
        if (seen.add(s)) {
          md.reset()
          val digest = md.digest(s.getBytes("UTF-8"))
          var b = 0
          while (b < Bits) {
            val d = b >> 2 // hex digit index
            val byteVal = digest(d >> 1) & 0xff
            val nibble = if ((d & 1) == 0) (byteVal >> 4) & 0xf else byteVal & 0xf
            if (((nibble >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) >= 0) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Native Catalyst expression (codegen'd via a static call, so it stays
  * inside whole-stage codegen — no UDF serialization / row boxing).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** SQL-function registration — the public route to custom expressions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60", exprs => SimHash60(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSig(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_ssq", exprs => CharSsq(exprs.head), "built-in")
  }
}
