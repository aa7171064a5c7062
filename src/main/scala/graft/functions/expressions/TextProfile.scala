package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All text-scoring counts in ONE pass over the (lowercased) document
  * bytes: token count, punctuation count, and per-language function-word
  * hits for each profile in [[graft.functions.TextFunctions.profiles]].
  *
  * Semantics are bit-identical to the declarative pipeline it replaces:
  * tokens = runs of non-whitespace (Java regex `\s` ASCII class);
  * punctuation = occurrences of `.,;:!?` (ASCII, so byte counting is
  * exact in UTF-8); profile hit = token string equality against the
  * lowercase word list (membership, counted once per occurrence). The
  * input must already be lowercased — `lower()` is a cheap codegen'd
  * builtin and keeping it outside preserves exact parity with the
  * `tokens(lower(text))` spelling the oracle mirrors.
  *
  * Why an expression: the declarative spelling runs one interpreted
  * higher-order `filter` + `isin` pass per profile plus one for the
  * token count — five array traversals with per-element predicate
  * evaluation. This is one byte scan with hash-set membership, and
  * `doGenCode` keeps the projection inside whole-stage codegen.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_profile requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = TextProfile.schema
  override def prettyName: String = "text_profile"

  override protected def nullSafeEval(input: Any): Any =
    TextProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.TextProfile.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {
  /** n_tokens, n_punct, then one hit-count per profile (profile order =
    * TextFunctions.profiles: en, de, fr, es; en doubles as the English
    * stopword count). */
  val schema: StructType = StructType(
    StructField("n_tokens", IntegerType, nullable = false) ::
    StructField("n_punct", IntegerType, nullable = false) ::
    graft.functions.TextFunctions.profiles.map { case (lang, _) =>
      StructField(s"n_$lang", IntegerType, nullable = false)
    }.toList)

  private val profileSets: Array[java.util.HashSet[UTF8String]] =
    graft.functions.TextFunctions.profiles.map { case (_, words) =>
      val set = new java.util.HashSet[UTF8String]()
      words.foreach(w => set.add(UTF8String.fromString(w)))
      set
    }.toArray

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?'

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val nProfiles = profileSets.length
    var nTok = 0
    var nPunct = 0
    val hits = new Array[Int](nProfiles)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) {
        if (isPunct(bytes(i))) nPunct += 1
        i += 1
      }
      if (i > start) {
        nTok += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        var p = 0
        while (p < nProfiles) {
          if (profileSets(p).contains(tok)) hits(p) += 1
          p += 1
        }
      }
    }
    val out = new Array[Any](2 + nProfiles)
    out(0) = nTok
    out(1) = nPunct
    var p = 0
    while (p < nProfiles) { out(2 + p) = hits(p); p += 1 }
    new GenericInternalRow(out)
  }
}
