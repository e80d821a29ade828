package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Jaro / Jaro–Winkler string similarity — the classic
  * record-linkage measure (typo-tolerant name matching; complements the
  * edit-distance path in [[graft.ops.DedupOps.fuzzyNameMatch]], which
  * pontem's corpus tooling leaves to exact equality; ref: series.py:206
  * only ever compares values exactly).
  *
  * Why an expression and not a UDF / SQL composition: the similarity runs
  * on the CANDIDATE side of a blocked linkage join — millions of pairs per
  * block at corpus scale — and needs per-pair scratch arrays and two data-
  * dependent loops, which neither built-in functions nor higher-order
  * folds (interpreted, CodegenFallback) can express efficiently. Like
  * [[DotProduct]] it compiles to one tight JVM call inside whole-stage
  * codegen; a Scala `udf()` would add Row boxing + serde per pair.
  *
  * Semantics are pinned to the de-facto standard that DuckDB's
  * `jaro_winkler_similarity` implements (the verification oracle):
  *   - match window = max(|a|,|b|)/2 − 1 (floored, min 0);
  *   - transpositions = (mismatched matched positions) / 2 with INTEGER
  *     division;
  *   - either side empty → 0.0 (not the 1.0 some libraries return for
  *     two empties);
  *   - Winkler prefix boost `sim + ℓ·0.1·(1−sim)` only when jaro > 0.7,
  *     common prefix ℓ capped at 4.
  * Probe values asserted bit-for-bit in FunctionsSpec (MARTHA/MARHTA =
  * 0.9611…, DIXON/DICKSONX = 0.8133…, AB/BA = 0.0, ''/'' = 0.0).
  *
  * Comparison runs over UTF-8 BYTES: exact on ASCII corpora (the fixture
  * reality and the overwhelming name-linkage case); on multi-byte text it
  * is a byte-level similarity — documented, monotone, and consistent
  * between the two front doors. Null on either null input.
  *
  * Registered as SQL functions `graft_jaro` / `graft_jaro_winkler` by
  * [[GraftExtensions]]. */
case class JaroWinkler(left: Expression, right: Expression,
                       winkler: Boolean) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def prettyName: String =
    if (winkler) "graft_jaro_winkler" else "graft_jaro"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b, $winkler)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro(-Winkler) similarity over the strings' UTF-8 bytes. One scratch
    * boolean array per side; O(|a|·window) matching pass + O(|a|+|b|)
    * transposition pass. */
  def similarity(s: UTF8String, t: UTF8String, winkler: Boolean): Double = {
    val a = s.getBytes
    val b = t.getBytes
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var hit = false
      while (j <= hi && !hit) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfT = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    var sim = (mm / n + mm / m + (mm - halfT / 2) / mm) / 3.0
    if (winkler && sim > 0.7) {
      val cap = math.min(4, math.min(n, m))
      var l = 0
      while (l < cap && a(l) == b(l)) l += 1
      sim += l * 0.1 * (1.0 - sim)
    }
    sim
  }

  /** Column front doors via the SQL registry. */
  def jaro(a: Column, b: Column): Column = call_function("graft_jaro", a, b)
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)
}
