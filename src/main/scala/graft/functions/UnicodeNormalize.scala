package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode normalization (NFC / NFD / NFKC / NFKD) — the
  * text-canonicalization step every dedup/tokenization pipeline wants
  * first (decomposed accents, ligatures, full-width forms all hash as
  * DIFFERENT strings until normalized, silently splitting duplicate
  * groups and vocab entries).
  *
  * Spark has no built-in for this; the usual fallback is a Scala udf
  * around `java.text.Normalizer` — a codegen barrier that boxes every
  * row. This is the same JDK normalizer as a real expression, projected
  * inside whole-stage codegen. Fast path: `Normalizer.isNormalized` is a
  * cheap scan that avoids any allocation for text that is already in the
  * target form — the overwhelmingly common case in a large corpus, which
  * makes the 100 TB cost of the op approximately one extra string scan.
  *
  * Null text → null. The form is fixed at plan time (a literal), so each
  * call site compiles to a branch-free helper call.
  *
  * Registered as SQL function `graft_normalize(text, form)` by
  * [[GraftExtensions]]. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // Canonical (uppercased) form, validated eagerly: a typo'd form fails
  // at plan time, not per row. Both eval paths MUST use this — the raw
  // `form` may be lowercase, which Form.valueOf rejects.
  private val canonicalForm: String = {
    val f = form.toUpperCase(java.util.Locale.ROOT)
    java.text.Normalizer.Form.valueOf(f) // throws on typos
    f
  }

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string column, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(t: Any): Any =
    UnicodeNormalize.compute(t.asInstanceOf[UTF8String], canonicalForm)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"""graft.functions.UnicodeNormalize.compute($t, "$canonicalForm")""")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  def compute(t: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, f)) t
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  /** Column wrapper via the SQL registry. */
  def normalize(text: Column, form: String): Column =
    call_function("graft_normalize", text, lit(form))
}
