package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a string, as one native Catalyst
  * expression.
  *
  * Semantics match the declarative pipeline it replaces (and the DuckDB
  * oracle mirrors): tokens = runs of non-whitespace (Java regex `\s`
  * class, i.e. ASCII whitespace), shingle i = tokens[i..i+k-1] joined
  * with single spaces, fewer than k tokens → ONE shingle of all tokens
  * joined (empty string for an all-whitespace doc), first-occurrence-
  * order distinct.
  *
  * Why an expression and not `transform`/`slice`/`concat_ws`: the
  * declarative version is interpreted (higher-order functions fall out
  * of codegen), re-evaluated per consuming branch, and `array_distinct`
  * over n shingles is O(n²) string compares. This is a single pass with
  * a hash-set dedupe, and `doGenCode` keeps the surrounding projection
  * inside whole-stage codegen.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private def isWs(c: Char): Boolean = // Java regex \s (ASCII)
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Single-pass tokenize → shingle → distinct. Called from both the
    * interpreted path and the generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) tokens.add(str.substring(start, i))
    }
    val m = tokens.size()
    val out = new java.util.LinkedHashSet[String]()
    if (m < k) {
      out.add(String.join(" ", tokens))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= m - k) {
        sb.setLength(0)
        var t = 0
        while (t < k) {
          if (t > 0) sb.append(' ')
          sb.append(tokens.get(j + t))
          t += 1
        }
        out.add(sb.toString)
        j += 1
      }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }
}
