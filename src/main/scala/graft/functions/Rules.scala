package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Attribute, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `cosine_similarity(x, x)` over the same attribute is
  * identically 1.0 (for any non-null, non-zero vector) — fold it to a
  * literal so self-similarity predicates (a common slip in pair-join
  * conditions, e.g. forgetting the `a.id < b.id` guard) cost nothing at
  * runtime and can cascade into further constant folding.
  *
  * Registered alongside the function itself in [[GraftExtensions]]
  * (`injectOptimizerRule`) and programmatically via
  * `spark.experimental.extraOptimizations` in
  * [[GraftFunctions.register]]. This completes the Catalyst extension
  * tiers used by this library: native Expression with codegen
  * (CosineSimilarity), optimizer Rule (this), planner Strategy +
  * physical operator (graft.plans.AsOfJoin).
  *
  * Note the null caveat: `cosine_similarity(x, x)` is null when x is
  * null, so the fold only fires on non-nullable attributes.
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a: Attribute, b: Attribute)
          if a.semanticEquals(b) && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}
