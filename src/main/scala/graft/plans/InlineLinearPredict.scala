package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: `quackml_predict('Project', features)` with a
  * LITERAL project name over a purely linear deployed model rewrites to
  *
  *   cast(graft_dot(cast(features as array<double>), <coef literal>)
  *        + <intercept> as float)
  *
  * — the scoring stays inside whole-stage codegen instead of paying the
  * ScalaUDF boxing + model-cache lookup per row (SURVEY §4's optional
  * codegen-predict item; reference scalar surface `src/api.rs:893-940`).
  *
  * Falls back to the UDF untouched for: non-literal project names (the
  * model can differ per row), non-linear deployed models, kernel (RFF)
  * pipelines, and projects that are not in the warm cache
  * ([[graft.ml.Predict.linearInline]] is cache-only, so optimization
  * never launches jobs).
  *
  * Semantics notes, deliberate: for valid inputs the value matches the
  * UDF bit-for-bit up to intercept-addition order (dot then +b here,
  * b-first accumulation in GraftLinearModel.predict — ±1 ulp); invalid
  * inputs differ in SHAPE — the UDF raises on empty/mismatched feature
  * arrays, the inlined form yields 0+b / null via DotProduct's strict
  * null semantics. Registered per-session through
  * `spark.experimental.extraOptimizations` by
  * [[graft.ml.Predict.registerFunctions]].
  */
object InlineLinearPredict extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF if u.udfName.contains("quackml_predict") &&
        u.children.size == 2 && u.children.head.foldable =>
      Option(u.children.head.eval()).map(_.toString)
        .flatMap(graft.ml.Predict.linearInline) match {
        case Some((w, b)) =>
          val feats = Cast(u.children(1), ArrayType(DoubleType))
          val dot = graft.functions.DotProduct(feats,
            Literal.create(w.toSeq, ArrayType(DoubleType)))
          Cast(Add(dot, Literal(b)), FloatType)
        case None => u
      }
  }
}
