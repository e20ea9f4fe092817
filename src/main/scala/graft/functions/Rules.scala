package graft.functions

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `cosine_similarity(x, x)` over the same attribute
  * reads the array twice and runs three accumulators for a value a
  * single `s = Σx²` pass determines — rewrite it to the unary
  * [[SelfCosine]] kernel (one array read, one accumulator, same fused
  * codegen loop). Self-similarity shows up when a pair-join condition
  * forgets the `a.id < b.id` guard; this makes that slip cheap.
  *
  * The rewrite is bit-exact for EVERY input — zero/empty vectors (NaN),
  * NaN/∞ elements, nulls — because `CosineSimilarity(x, x)`'s three
  * accumulators are identical IEEE sequences (see [[SelfCosine]] docs).
  * An earlier version folded to literal 1.0, which was wrong for
  * zero-norm vectors (NaN → 1.0) and even 1 ulp off for ~half of all
  * ordinary vectors; a semantics-changing "optimization" is a bug.
  *
  * Registered alongside the function itself in [[GraftExtensions]]
  * (`injectOptimizerRule`) and programmatically via
  * `spark.experimental.extraOptimizations` in
  * [[GraftFunctions.register]]. This completes the Catalyst extension
  * tiers used by this library: native Expression with codegen
  * (CosineSimilarity), optimizer Rule (this), planner Strategy +
  * physical operator (graft.plans.AsOfJoin).
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a: Attribute, b: Attribute) if a.semanticEquals(b) =>
        SelfCosine(a)
    }
}
