package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Optimizer rules injected by [[GraftExtensions]] (the `Rule[LogicalPlan]`
  * extension point — SURVEY §4.2's "all stock Catalyst" policy holds for
  * plan *structure*; these are expression-level peepholes Catalyst lacks).
  */
object GraftRules {

  /** `round(round(x, s1), s2)` with `s2 >= s1` is the inner round alone:
    * a value already at s1 decimals re-rounds to >= s1 decimals
    * unchanged (Spark's Round goes through BigDecimal.valueOf, i.e. the
    * shortest decimal repr, so the identity holds for doubles too).
    * Arises when cleaning stages round defensively and an export rounds
    * again — e.g. Thresholds(scale=2) feeding a round(_, 4) projection.
    *
    * Floating types ONLY: on decimals, Round's result scale follows the
    * literal, so removing the outer round would change the expression's
    * data type (decimal(p,s2) → decimal(p,s1)) under the analyzed schema.
    */
  object RoundRoundFold extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case Round(inner @ Round(_, Literal(s1: Int, IntegerType), _),
            Literal(s2: Int, IntegerType), _)
            if s2 >= s1 &&
              (inner.dataType == DoubleType || inner.dataType == FloatType) =>
          inner
      }
  }
}
