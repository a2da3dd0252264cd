package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import graft.functions.{CosineSimilarity, L2Squared}

/** Optimizer rule (charter extension point `Rule[LogicalPlan]`):
  * rewrites the declarative higher-order-function forms of the two
  * vector kernels into graft's native codegen'd expressions —
  *
  *  - `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  *    becomes [[graft.functions.L2Squared]](a, b)
  *  - `aggregate(zip_with(a, b, _*_), 0.0, _+_) /
  *     (sqrt(self-dot(a)) * sqrt(self-dot(b)))`
  *    becomes [[graft.functions.CosineSimilarity]](a, b)
  *
  * Why a rule: higher-order functions are CodegenFallback — every
  * element evaluation is an interpreted lambda dispatch with boxing —
  * while the native kernels run a fused primitive loop inside
  * whole-stage codegen (measured 5× on the k-means assignment). The
  * rewrite is semantics-preserving because the native kernels
  * accumulate in the identical left-to-right order (bit-equality pinned
  * in FunctionsSpec), so users can keep writing the declarative form
  * and the optimizer supplies the fast plan — the same contract as
  * Catalyst's own expression rewrites.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule); the
  * rule is idempotent — the native nodes never match the patterns.
  */
object NativeKernelRule extends Rule[LogicalPlan] {

  /** A lambda variable, possibly cast to double (`x.cast("double")`). */
  private object VarD {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  /** `(acc, x) => acc + x` over the fold's own two variables. */
  private def isSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(VarD(a), VarD(x), _),
        Seq(av: NamedLambdaVariable, xv: NamedLambdaVariable), _) =>
      a.exprId == av.exprId && x.exprId == xv.exprId
    case _ => false
  }

  /** The identity finish lambda `aggregate` gets by default. */
  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(fv: NamedLambdaVariable), _) => v.exprId == fv.exprId
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  /** `aggregate(zip_with(a, b, (x,y) => body), 0.0, _+_ [, id])`. */
  private object FoldedZip {
    def unapply(e: Expression)
        : Option[(Expression, Expression, Expression, ExprId, ExprId)] =
      e match {
        case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(body,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero, merge, finish)
            if isZeroD(zero) && isSum(merge) && isIdentity(finish) =>
          Some((a, b, body, x.exprId, y.exprId))
        case _ => None
      }
  }

  /** Dot product: body = x * y (either operand order). */
  private object FoldedDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case FoldedZip(a, b, Multiply(VarD(l), VarD(r), _), xid, yid)
          if Set(l.exprId, r.exprId) == Set(xid, yid) =>
        Some((a, b))
      case _ => None
    }
  }

  /** Squared difference: body = (x-y)*(x-y). */
  private object FoldedL2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case FoldedZip(a, b,
          Multiply(Subtract(VarD(l1), VarD(r1), _),
            Subtract(VarD(l2), VarD(r2), _), _), xid, yid)
          if l1.exprId == xid && r1.exprId == yid &&
            l2.exprId == xid && r2.exprId == yid =>
        Some((a, b))
      case _ => None
    }
  }

  /** Cast to array<double> only when the input isn't one already. */
  private def asD(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case ArrayType(_, n) => Cast(e, ArrayType(DoubleType, n))
    case _ => e
  }

  private def sameVec(p: (Expression, Expression)): Boolean =
    p._1.semanticEquals(p._2)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(FoldedDot(a, b),
          Multiply(Sqrt(FoldedDot(a2, a3)), Sqrt(FoldedDot(b2, b3)), _), _)
          if sameVec((a2, a3)) && sameVec((b2, b3)) &&
            a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(asD(a), asD(b))
      case FoldedL2(a, b) => L2Squared(asD(a), asD(b))
    }
}
