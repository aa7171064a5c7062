package graft

import graft.functions.expressions.{CharNgrams, L2Normalize, OrderedPairs, PqAdc, SimHash60, SimHash64, TextProfile, VectorDot, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions.
  *
  * Cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes `word_shingles`, `vector_dot`, `l2_normalize` available to every
  * SQL user of the session. For an already-built session (tests, REPL),
  * [[GraftExtensions.register]] installs the same builders directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    GraftTableFunctions.builders.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "word_shingles" -> (args => WordShingles(args(0), intArg(args(1), "word_shingles"))),
    "char_ngrams" -> (args => CharNgrams(args(0), intArg(args(1), "char_ngrams"))),
    "vector_dot" -> (args => VectorDot(args(0), args(1))),
    "l2_normalize" -> (args => L2Normalize(args(0))),
    "pq_adc" -> (args => PqAdc(args(0), args(1))),
    "simhash64" -> (args => SimHash64(args(0))),
    "simhash60" -> (args => SimHash60(args(0))),
    "ordered_pairs" -> (args => OrderedPairs(args(0))),
    "text_profile" -> (args => TextProfile(args(0))),
    "nfc_normalize" -> (args => graft.functions.expressions.NfcNormalize(args(0))),
    // composed from standard codegen'd expressions, so SQL users get
    // the identical extraction the Scala htmlToText performs; the
    // EAGER converter yields a plain catalyst tree (the lazy Column
    // wrapper is unevaluable inside a SQL function registry entry)
    "html_to_text" -> (args => org.apache.spark.sql.graft.ColumnBridge
      .catalystExpression(graft.functions.TextFunctions.htmlToText(
        org.apache.spark.sql.graft.ColumnBridge.column(args(0))))),
    "flesch_score" -> (args => org.apache.spark.sql.graft.ColumnBridge
      .catalystExpression(graft.functions.TextFunctions.fleschScore(
        org.apache.spark.sql.graft.ColumnBridge.column(args(0))))),
    "canonicalize_url" -> (args => org.apache.spark.sql.graft.ColumnBridge
      .catalystExpression(graft.functions.TextFunctions.canonicalizeUrl(
        org.apache.spark.sql.graft.ColumnBridge.column(args(0))))),
    "filter_lines" -> (args => org.apache.spark.sql.graft.ColumnBridge
      .catalystExpression(graft.functions.TextFunctions.filterLines(
        org.apache.spark.sql.graft.ColumnBridge.column(args(0)),
        intArg(args(1), "filter_lines")))))

  /** Install the full surface (functions + strategy + optimizer rule)
    * on an existing session — parity with the `spark.sql.extensions`
    * path for sessions built before graft was on the classpath. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, name, builder)
    }
    GraftTableFunctions.builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerTableFunction(spark, name, builder)
    }
    graft.plans.TopKRewrite.ensureRegistered(spark)
  }
}
