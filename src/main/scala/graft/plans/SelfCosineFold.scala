package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: `cosine_sim(x, x)` ≡ 1.0 for any non-degenerate
  * vector — fold it to a literal so self-similarity terms (common in
  * similarity-matrix diagonals and normalized re-ranking) cost nothing.
  *
  * Registered through `GraftExtensions.apply` (injectOptimizerRule) —
  * the engine's demonstration of the Rule[LogicalPlan] extension level
  * of the customization ladder (expression < rule < strategy/plan).
  * Semantics note: strict equality of the child expression trees is
  * required; `cosine_sim(v, v)` of an all-zero vector is NaN, so the
  * fold is only applied when `graft.fold.selfCosine.strict=false`
  * semantics are acceptable — the engine's vectors are validated
  * non-zero at ingest (embeddings table contract).
  */
object SelfCosineFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
        // null-preserving: cosine_sim(NULL, NULL) is NULL, not 1.0
        if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
        else Literal(1.0, DoubleType)
    }
}
