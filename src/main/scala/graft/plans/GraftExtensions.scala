package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optional optimizer extensions for the engine, registered with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or per-session
  * via `spark.experimental.extraOptimizations`).
  *
  * One rule today: [[FuseCosineRule]] rewrites the composable
  * higher-order-function cosine pattern (Similarity.cosine — an
  * `aggregate(zip_with(a, b, *), 0.0, +)` dot product divided by the
  * product of two self-dot square roots) into the fused native
  * [[CosineSimilarity]] expression, so code written against the
  * portable HOF API gets the codegen'd single-pass loop for free.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => FuseCosineRule)
}

/** Conservative structural match: only the exact HOF cosine tree over
  * float-array inputs is rewritten (a double-native input is left
  * alone — the fused expression reads floats, and rewriting would
  * change precision). Semantics note: on a zero-norm vector the HOF
  * tree yields NaN (0.0/0.0) while the native expression yields null;
  * both mean "cosine undefined" and neither survives a comparison or
  * top-k filter, which is where this pattern appears.
  */
object FuseCosineRule extends Rule[LogicalPlan] {

  /** aggregate(zip_with(x, y, (p,q) => p*q), 0.0, (acc,v) => acc+v)
    * — the Similarity.dot tree. Returns the zip_with inputs. */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case aa: ArrayAggregate =>
        (aa.argument, aa.zero, aa.merge, aa.finish) match {
          case (zw: ZipWith, Literal(0.0, DoubleType),
                mergeFn: LambdaFunction, finishFn: LambdaFunction)
              if zw.function.isInstanceOf[LambdaFunction] &&
                 zw.function.asInstanceOf[LambdaFunction].function.isInstanceOf[Multiply] &&
                 mergeFn.function.isInstanceOf[Add] &&
                 finishFn.function.isInstanceOf[NamedLambdaVariable] =>
            Some((zw.left, zw.right))
          case _ => None
        }
      case _ => None
    }
  }

  /** Peel the `cast(v as array<double>)` Similarity.dot inserts and
    * require the underlying column to be array<float> — the only
    * input shape where the rewrite is precision-identical. */
  private def floatInput(e: Expression): Option[Expression] = e match {
    case c: Cast => c.child.dataType match {
      case ArrayType(FloatType, _) => Some(c.child)
      case _                       => None
    }
    case _ => e.dataType match {
      case ArrayType(FloatType, _) => Some(e)
      case _                       => None
    }
  }

  private def tryFuse(d: Divide): Option[Expression] =
    for {
      (x1, y1) <- DotAgg.unapply(d.left)
      m <- d.right match { case m: Multiply => Some(m); case _ => None }
      sx <- m.left match { case s: Sqrt => Some(s); case _ => None }
      sy <- m.right match { case s: Sqrt => Some(s); case _ => None }
      (x2, x3) <- DotAgg.unapply(sx.child)
      (y2, y3) <- DotAgg.unapply(sy.child)
      if x2.semanticEquals(x3) && y2.semanticEquals(y3) &&
        x1.semanticEquals(x2) && y1.semanticEquals(y2)
      a <- floatInput(x1)
      b <- floatInput(y1)
    } yield CosineSimilarity(a, b)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d: Divide => tryFuse(d).getOrElse(d)
    }
}
