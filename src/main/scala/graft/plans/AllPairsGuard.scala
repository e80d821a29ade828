package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** The guard's own failure type — a stable surface we control. (The
  * guard used to raise AnalysisException via the internal
  * `_LEGACY_ERROR_TEMP_3100` error class; that id is a private Spark
  * surface a minor upgrade can remove, turning every rejection into a
  * SparkThrowable lookup failure.) */
final class AllPairsViolation(message: String)
    extends RuntimeException(message)

/** Optimizer guard against all-pairs joins — the PlanLint discipline
  * moved into the RUNTIME: on a 1000-executor cluster an accidental
  * cross join or equality-free join condition (which Spark plans as
  * `CartesianProduct` / `BroadcastNestedLoopJoin`) is a cluster-killer
  * that surfaces only hours in; with the guard armed it fails at
  * optimization time, before a single task launches.
  *
  * Armed per session via `SET spark.graft.blockAllPairs=true` (default
  * OFF — deliberate exhaustive baselines like the brute-force kNN run
  * with it unarmed, exactly as they are individually exempted in
  * PlanLintSpec). A join passes when ANY top-level conjunct of its
  * condition is an equality — the predicate a hash/sort-merge join can
  * key on; `a <> b` alone does not count (it still plans nested-loop).
  *
  * Registered by [[graft.functions.GraftExtensions]] through
  * `injectOptimizerRule` — the (c) rung of the custom-operator ladder
  * (expression → rule → strategy) exercised for real. The rule only
  * inspects (one tree walk, no rewrite), so it costs microseconds per
  * query and can never change results. */
case class AllPairsGuard(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def hasEqualityConjunct(cond: Expression): Boolean =
    conjuncts(cond).exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _                             => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.blockAllPairs", "false").toBoolean) {
      plan.foreach {
        case j: Join if j.joinType == Cross =>
          throw new AllPairsViolation(
            "graft all-pairs guard: CROSS join rejected " +
              "(spark.graft.blockAllPairs=true); add an equality " +
              "join key or disarm the guard for this query")
        case j: Join if j.condition.isEmpty =>
          throw new AllPairsViolation(
            "graft all-pairs guard: condition-less join rejected " +
              "(spark.graft.blockAllPairs=true)")
        case j: Join if !j.condition.exists(hasEqualityConjunct) =>
          throw new AllPairsViolation(
            "graft all-pairs guard: join condition has no equality " +
              "conjunct — Spark will plan a nested-loop over the " +
              "full pair space (spark.graft.blockAllPairs=true)")
        case _ => ()
      }
    }
    plan
  }
}
