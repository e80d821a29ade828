package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst shingle TEXT extractor — [[ShingleHashes]]'s sibling for
  * the consumers that need the gram STRINGS (md5-portable hashing, surfaced
  * gram text): distinct word-`n`-gram strings of a text column as
  * `array<string>`, bit-identical to
  * `array_distinct(ngramsOfTokens(tokens(text), n))` (lowercase, split on
  * space runs, empties dropped, single-space joined grams, first-occurrence
  * dedup by STRING equality — no hash-collision caveat) but computed in ONE
  * compiled pass instead of the interpreted zip_with/filter/array_distinct
  * lambda chain (the same CodegenFallback tax ShingleHashes removes; the
  * md5-lane ops — KMV sketches, minhash calibration, the LSH band curve —
  * kept paying it because their DuckDB oracles replay md5 over the gram
  * text, so the 8-byte xxhash64 keys are not an option there).
  *
  * Null semantics match the declarative pipeline: null text → null; docs
  * shorter than `n` tokens → empty array.
  *
  * Registered as SQL function `graft_shingle_text` by [[GraftExtensions]].
  */
case class ShingleText(text: Expression, size: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = size

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_text requires a string column, got ${text.dataType.simpleString}")
    else if (size.dataType != IntegerType || !size.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingle_text requires a foldable integer shingle size")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "graft_shingle_text"

  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleText.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleText.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleText =
    copy(text = newLeft, size = newRight)
}

/** [[ShingleText]] WITH multiplicity, in document order — the positional
  * n-gram extractor (`array<string>`; element i is the gram starting at
  * token i, so `posexplode` yields true token positions). Bit-identical
  * to `ngramsOfTokens(tokens(text), n)`. Registered as SQL function
  * `graft_ngram_text`. */
case class NgramText(text: Expression, size: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = size

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_text requires a string column, got ${text.dataType.simpleString}")
    else if (size.dataType != IntegerType || !size.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_ngram_text requires a foldable integer n-gram size")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "graft_ngram_text"

  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleText.computeGrams(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], distinct = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleText.computeGrams($t, $n, false);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramText =
    copy(text = newLeft, size = newRight)
}

object NgramText {
  /** Column wrapper via the SQL registry. */
  def ngramText(text: Column, n: Int): Column =
    call_function("graft_ngram_text", text,
      org.apache.spark.sql.functions.lit(n))
}

object ShingleText {

  /** One compiled pass: lowercase via UTF8String.toLowerCase (the same
    * call Spark's `lower()` makes), scan for space-separated tokens
    * (runs of ASCII 0x20, exactly `split(lower(text), " +")` with
    * empties dropped), then materialize each window of `n` tokens as a
    * single-space-joined UTF8String. Distinct keeps the FIRST occurrence
    * by string equality — exactly `array_distinct`. */
  def compute(text: UTF8String, n: Int): ArrayData =
    computeGrams(text, n, distinct = true)

  /** Shared gram scan; `distinct = false` keeps multiplicity and order
    * (the [[NgramText]] body). */
  def computeGrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    require(n >= 2, "shingle size must be >= 2")
    val b = text.toLowerCase.getBytes
    val len = b.length
    // token boundary scan (identical to ShingleHashes.compute)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nt = 0
    var i = 0
    while (i < len) {
      if (b(i) == ' ') i += 1
      else {
        val s = i
        while (i < len && b(i) != ' ') i += 1
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = s
        ends(nt) = i
        nt += 1
      }
    }
    val g = nt - n + 1
    if (g <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](g)
    var m = 0
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](g * 2) else null
    var gi = 0
    while (gi < g) {
      var need = n - 1
      var t = gi
      while (t < gi + n) { need += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](need)
      var p = 0
      t = gi
      while (t < gi + n) {
        if (t > gi) { buf(p) = ' '; p += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(b, starts(t), buf, p, tl)
        p += tl
        t += 1
      }
      val gram = UTF8String.fromBytes(buf)
      if (!distinct || seen.add(gram)) { out(m) = gram; m += 1 }
      gi += 1
    }
    new GenericArrayData(if (m == g) out else java.util.Arrays.copyOf(out, m))
  }

  /** Column wrapper via the SQL registry (sessions built with
    * [[GraftExtensions]] — all graft session builders are). */
  def shingleText(text: Column, n: Int): Column =
    call_function("graft_shingle_text", text,
      org.apache.spark.sql.functions.lit(n))
}
