package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst shingle hasher: distinct word-`n`-gram hashes of a text
  * column as `array<long>`, bit-identical to
  * `transform(TextOps.shingles(text, n), s => xxhash64(s))` (first-occurrence
  * order, Spark's default xxhash64 seed 42) but computed in ONE compiled pass
  * over the string bytes.
  *
  * Why it exists: the declarative shingle pipeline (lower → split → shifted
  * `zip_with` n-gram join → `array_distinct` → per-element `xxhash64`) is
  * built from higher-order functions, which are CodegenFallback — interpreted
  * lambda dispatch per token, measured ~1.5 ms/doc (7+ s to shingle 5k docs
  * at sf0.1; dominates every inverted-index dedup plan). This expression
  * tokenizes, joins, hashes, and dedups in a tight byte-level loop with zero
  * String/UTF8String allocation per gram, and hands downstream joins 8-byte
  * long keys instead of ~25-byte gram strings — halving the posting shuffle.
  *
  * Used by the dedup/contamination operators whose OUTPUTS never expose the
  * shingle itself (pair ids + counts + ratios), so swapping the internal key
  * from string to hash leaves every result bit-identical modulo xxhash64
  * collisions (~|grams|²/2⁶⁴ — at 2⁴⁰ corpus grams, P[any collision] <
  * 10⁻⁴; a collision could only merge two grams inside one (doc, doc) pair
  * count). Operators that surface the gram text keep [[graft.ops.TextOps
  * .shingles]].
  *
  * Null semantics: null text → null; docs shorter than `n` tokens → empty
  * array. `n` must be a foldable positive integer (it parameterizes the
  * loop, not the data).
  *
  * Registered as SQL function `graft_shingle_hashes` by [[GraftExtensions]].
  */
case class ShingleHashes(text: Expression, size: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = size

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes requires a string column, got ${text.dataType.simpleString}")
    else if (size.dataType != IntegerType || !size.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingle_hashes requires a foldable integer shingle size")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(text = newLeft, size = newRight)
}

object ShingleHashes {

  /** One compiled pass: lowercase (UTF8String.toLowerCase — the same call
    * Spark's `lower()` makes), scan for space-separated tokens (split on
    * runs of ASCII 0x20, exactly `split(lower(text), " +")` with empties
    * dropped), then for each window of `n` tokens copy the bytes with
    * single-space separators into a reused scratch buffer and XXH64 it with
    * Spark's default seed 42 — the identical bytes `xxhash64(gram_string)`
    * would hash. Distinct keeps first occurrence, mirroring
    * `array_distinct`. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    require(n >= 2, "shingle size must be >= 2")
    val b = text.toLowerCase.getBytes
    val len = b.length
    // token boundary scan
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
    if (g <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](g)
    var m = 0
    val seen = new java.util.HashSet[java.lang.Long](g * 2)
    var buf = new Array[Byte](128)
    var gi = 0
    while (gi < g) {
      var need = n - 1
      var t = gi
      while (t < gi + n) { need += ends(t) - starts(t); t += 1 }
      if (need > buf.length)
        buf = new Array[Byte](math.max(need, buf.length * 2))
      var p = 0
      t = gi
      while (t < gi + n) {
        if (t > gi) { buf(p) = ' '; p += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(b, starts(t), buf, p, tl)
        p += tl
        t += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, p, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      gi += 1
    }
    new GenericArrayData(if (m == g) out else java.util.Arrays.copyOf(out, m))
  }

  /** Column wrapper via the SQL registry (sessions built with
    * [[GraftExtensions]] — all graft session builders are). */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingle_hashes", text,
      org.apache.spark.sql.functions.lit(n))
}
