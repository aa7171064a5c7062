package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding character n-grams of a string, as one native Catalyst
  * expression.
  *
  * Semantics match the declarative spelling it replaces (and the DuckDB
  * oracle mirrors): gram i = code points [i, i+n) — every position, in
  * order, NOT distinct; fewer than n code points → empty array.
  *
  * Why an expression and not `transform(sequence(...), i → substr)`:
  * `substr` on a UTF8String locates code point i by scanning from the
  * string's first byte, so the declarative spelling is O(len²) PER
  * DOCUMENT — it was the whole cost of the LM scorer (h14, the suite's
  * slowest query at 4 s before this). This walks the UTF-8 byte
  * sequence ONCE, records code-point boundaries, and emits grams as
  * byte-range slices over one shared copy — O(len + grams), and
  * `doGenCode` keeps the surrounding projection in whole-stage codegen.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  /** One pass: UTF-8 code-point boundaries, then byte-range slices over
    * one shared byte copy. Called from both the interpreted path and
    * the generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes // one copy; every gram slices into it
    val nb = bytes.length
    // code-point start offsets (+ end sentinel)
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0; var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nb
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - n + 1)
    var j = 0
    while (j <= c - n) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
