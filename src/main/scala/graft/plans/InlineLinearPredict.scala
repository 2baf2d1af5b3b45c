package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, Cast, Coalesce, CreateMap, EqualTo, GreaterThan, If, Literal, RaiseError, ScalaUDF, Size}
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
  * b-first accumulation in GraftLinearModel.predict — ±1 ulp). Invalid
  * inputs keep the UDF's ERROR shape too: a size guard around the dot
  * raises (codegen'd `RaiseError`) on null / empty / null-element /
  * dimension-mismatched feature arrays, exactly where the UDF's
  * `require` + BLAS-dot would — a bad feature pipeline fails loudly on
  * both paths instead of silently scoring null on the inlined one.
  * An array LONGER than the model dimension raises on both paths too:
  * GraftLinearModel.predict carries the same dimension `require` as
  * MLlib's BLAS.dot, so error semantics never depend on whether this
  * rule fired. Registered
  * per-session through `spark.experimental.extraOptimizations` by
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
          // size(null array) is null → If takes the else branch → raise,
          // matching the UDF's require(features != null && nonEmpty)
          val sizeOk = And(EqualTo(Size(feats), Literal(w.length)),
            GreaterThan(Size(feats), Literal(0)))
          val raise = new RaiseError(Literal("USER_RAISED_EXCEPTION"),
            CreateMap(Seq(Literal("errorMessage"), Literal(
              s"quackml_predict: feature vector must be non-empty with ${w.length} non-null elements"))),
            FloatType)
          // Coalesce catches the remaining silent-null case: a NULL
          // ELEMENT inside a correctly-sized array nulls the dot (strict
          // null semantics), which must raise like the UDF's Seq[Float]
          // deserialization does — never score null silently
          If(sizeOk, Coalesce(Seq(Cast(Add(dot, Literal(b)), FloatType), raise)), raise)
        case None => u
      }
  }
}
